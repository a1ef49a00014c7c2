"""Skew-kit queries: the salted two-phase aggregation and the
replicated-dim skew join, each oracle-checked against its plain
(unsalted) relational equivalent — the point being that the skew-safe
plan is *semantically identical* while spreading a hot key over
``n_salts`` tasks (functions/skew.py; AQE covers sort-merge skew, these
cover hot-key aggregation and broadcast-replica joins it does not).

The fixture's ``events.event_type`` is the textbook hot-key case: 5
keys over the whole table, so an unsalted groupBy funnels ~1/5 of the
corpus through single reducers at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.skew import replicated_skew_join, salted_agg
from . import QuerySpec

N_SALTS = 16


# ---------------------------------------------------------------------------
# Q89: salted two-phase aggregation over the 5-key events table.
# Phase 1 shuffles on (event_type, salt) — 80 groups instead of 5 —
# phase 2 merges 16 partial rows per key. Oracle: plain GROUP BY.
# ---------------------------------------------------------------------------

def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev, key="event_type", n_salts=N_SALTS,
        stable_cols=("event_id",),
        partials={
            "n": (F.count(F.lit(1)), F.sum("n")),
            "v_sum": (F.sum(F.col("value").cast("decimal(18,6)")),
                      F.sum("v_sum")),
            "v_max": (F.max("value"), F.max("v_max")),
            "v_min": (F.min("value"), F.min("v_min")),
        },
    )
    return out.select(
        "event_type", "n",
        F.col("v_sum").cast("double").alias("v_sum"),
        "v_max", "v_min",
    )


ORACLE_SALTED_AGG = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v_sum,
       max(value) AS v_max, min(value) AS v_min
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Q90: replicated-dim skew join — supplier dim exploded ×16, lineitem
# salted deterministically, join on (suppkey, salt): the hottest
# suppkey's rows land on 16 tasks. Oracle: the plain equi-join.
# ---------------------------------------------------------------------------

def q_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .relational import _dsum

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"),
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    supp = load_table(spark, sf_dir, "supplier") \
        .select("s_suppkey", "s_nationkey")
    joined = replicated_skew_join(
        li, supp, key="s_suppkey", n_salts=N_SALTS,
        stable_cols=("l_orderkey", "l_linenumber"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_lineitems"),
             _dsum(rev).alias("revenue"))
    )


ORACLE_SKEW_JOIN = """
SELECT s.s_nationkey, count(*) AS n_lineitems,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
"""


# ---------------------------------------------------------------------------
# Q116: Morton (Z-order) cell census over events(user_id, time) — the
# layout kit's clustering key (functions/layout.interleave_bits) made
# oracle-checkable. Each dimension quantizes to an 8-bit bucket with
# pure INTEGER arithmetic (((x−mn)·256) div (range+1) — no float
# boundary ULPs to diverge between engines), the indices interleave
# into a 16-bit Morton code, and the census reports per 64-code cell:
# row count and both dimensions' bounds. The bounds are the point of
# Z-order — every cell is a small rectangle in (user, time) space, so
# row-group min/max stats prune range predicates on EITHER column.
# land_zordered writes the physical form; this query hash-proves the
# key math the layout depends on.
# ---------------------------------------------------------------------------

Z_BITS = 8
Z_CELL_SHIFT = 6      # 16-bit code >> 6 → 1024 cells


def q_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.layout import interleave_bits

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        F.unix_timestamp("ts").alias("t"))
    stats = ev.agg(
        F.min("u").alias("u_mn"), F.max("u").alias("u_mx"),
        F.min("t").alias("t_mn"), F.max("t").alias("t_mx"))
    n = 1 << Z_BITS
    b = ev.crossJoin(F.broadcast(stats))

    def idx(col, mn, mx):
        return F.expr(f"(({col} - {mn}) * {n}) div ({mx} - {mn} + 1)")

    z = interleave_bits(
        [idx("u", "u_mn", "u_mx"), idx("t", "t_mn", "t_mx")],
        bits=Z_BITS)
    return (
        b.withColumn("cell", F.shiftright(z, Z_CELL_SHIFT))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"),
             F.min("u").alias("u_lo"), F.max("u").alias("u_hi"),
             F.min("t").alias("t_lo"), F.max("t").alias("t_hi"))
    )


def _oracle_zorder_cells() -> str:
    n = 1 << Z_BITS
    # identical additive form of the interleave: bit b of dim i lands
    # at position 2b + 1 - i (dim 0 = user owns the higher bit)
    terms = []
    for i, dim in enumerate(("iu", "it")):
        for b in range(Z_BITS):
            terms.append(f"((({dim} >> {b}) & 1) << {2 * b + 1 - i})")
    z = " | ".join(terms)
    return f"""
WITH ev AS (
  SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events
),
stats AS (
  SELECT min(u) AS u_mn, max(u) AS u_mx,
         min(t) AS t_mn, max(t) AS t_mx FROM ev
),
idx AS (
  SELECT u, t,
         ((u - u_mn) * {n}) // (u_mx - u_mn + 1) AS iu,
         ((t - t_mn) * {n}) // (t_mx - t_mn + 1) AS it
  FROM ev CROSS JOIN stats
),
coded AS (SELECT u, t, ({z}) >> {Z_CELL_SHIFT} AS cell FROM idx)
SELECT cell, count(*) AS n,
       min(u) AS u_lo, max(u) AS u_hi,
       min(t) AS t_lo, max(t) AS t_hi
FROM coded GROUP BY cell
"""


SPECS = [
    QuerySpec("q89_salted_agg", q_salted_agg, ORACLE_SALTED_AGG,
              "hot-key-safe two-phase salted aggregation",
              ("P2-skew", "D13")),
    QuerySpec("q90_skew_join", q_skew_join, ORACLE_SKEW_JOIN,
              "replicated-dim salted equi-join", ("P2-skew", "C1")),
    QuerySpec("q116_zorder_cells", q_zorder_cells, _oracle_zorder_cells,
              "Morton-key cell census (multi-dimensional clustering "
              "math, oracle-proven)", ("P2-layout",)),
]
