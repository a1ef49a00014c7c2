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


SPECS = [
    QuerySpec("q89_salted_agg", q_salted_agg, ORACLE_SALTED_AGG,
              "hot-key-safe two-phase salted aggregation",
              ("P2-skew", "D13")),
    QuerySpec("q90_skew_join", q_skew_join, ORACLE_SKEW_JOIN,
              "replicated-dim salted equi-join", ("P2-skew", "C1")),
]
