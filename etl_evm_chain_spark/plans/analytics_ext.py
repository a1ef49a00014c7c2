"""Extended analytics operators beyond the reference's own surface:
sessionization, rollup/grouping sets, unpivot, and dedup resolution —
standard warehouse operators a complete engine must carry (the
reference gets them "for free" the day it moves to this engine).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup as dd
from . import QuerySpec


# ---------------------------------------------------------------------------
# Q47: sessionization — lag-gap cumulative session ids per user, with
# per-session stats. One window partition per user; the standard
# distributed sessionize (no state store needed in batch).
# ---------------------------------------------------------------------------

GAP_S = 1800  # 30-minute inactivity closes a session


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_session = F.when(gap.isNull() | (gap > GAP_S), 1).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = (
        ev.withColumn("new_s", new_session)
        .withColumn("session_n", F.sum("new_s").over(wc))
    )
    return (
        sess.groupBy("user_id", "session_n")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_timestamp("ts")).alias("start_ts"),
            F.max(F.unix_timestamp("ts")).alias("end_ts"),
            (F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts")))
            .alias("duration_s"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


ORACLE_SESSIONIZE = f"""
WITH g AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > {GAP_S}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_n
  FROM g
)
SELECT user_id, session_n,
       count(*) AS n_events,
       min(CAST(floor(epoch(ts)) AS BIGINT)) AS start_ts,
       max(CAST(floor(epoch(ts)) AS BIGINT)) AS end_ts,
       max(CAST(floor(epoch(ts)) AS BIGINT))
         - min(CAST(floor(epoch(ts)) AS BIGINT)) AS duration_s,
       count(DISTINCT event_type) AS n_types
FROM s
GROUP BY user_id, session_n
"""


# ---------------------------------------------------------------------------
# Q48: rollup — hierarchical subtotals (returnflag → linestatus → all).
# ---------------------------------------------------------------------------

def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double").alias("total_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n", "total_price",
        )
    )


ORACLE_ROLLUP = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# Q49: unpivot (wide→long melt) — the inverse of D2, via stack().
# ---------------------------------------------------------------------------

def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    monetary = li.select(
        "l_orderkey", "l_linenumber",
        F.round("l_extendedprice", 2).alias("extendedprice"),
        F.round("l_discount", 2).alias("discount"),
        F.round("l_tax", 2).alias("tax"),
    )
    return monetary.selectExpr(
        "l_orderkey", "l_linenumber",
        "stack(3, 'extendedprice', extendedprice, 'discount', discount, "
        "'tax', tax) AS (measure, amount)",
    )


ORACLE_UNPIVOT = """
SELECT l_orderkey, l_linenumber, measure, amount
FROM (
  SELECT l_orderkey, l_linenumber,
         round(l_extendedprice, 2) AS extendedprice,
         round(l_discount, 2) AS discount,
         round(l_tax, 2) AS tax
  FROM lineitem
)
UNPIVOT (amount FOR measure IN (extendedprice, discount, tax))
"""


# ---------------------------------------------------------------------------
# Q41: dedup resolution — near-dup pairs → canonical survivor per
# connected component (min-label propagation vs recursive-CTE oracle).
# ---------------------------------------------------------------------------

def _resolved_landed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → canonical mapping, landed once per fixture (silver
    artifact): the LSH pair-gen + label propagation is the priciest
    subplan in the suite and feeds two release reports (q41, q82)."""
    from ..catalog import landed_parquet

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        pairs = dd.verified_near_dups(docs, threshold=0.5)
        return dd.resolve_duplicates(docs.select("doc_id"), pairs)

    return landed_parquet(
        spark, name="dedup_resolve",
        src_paths=[os.path.join(sf_dir, "documents.parquet")],
        build=build, params="lsh05",
    )


def q_dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    resolved = _resolved_landed(spark, sf_dir)
    return resolved.withColumn(
        "is_canonical", (F.col("doc_id") == F.col("canonical")).cast("int"))


def _oracle_dedup_resolve() -> str:
    from .llmdata import _oracle_lsh_near_dups

    pairs_sql = _oracle_lsh_near_dups().replace("ORDER BY id_a, id_b", "")
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
canon AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS canonical
  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
  GROUP BY d.doc_id
)
SELECT doc_id, canonical,
       CAST(doc_id = canonical AS INTEGER) AS is_canonical
FROM canon
"""


# ---------------------------------------------------------------------------
# Q77: robust outlier detection — median/MAD per event_type, flag rows
# whose robust z (|x − med| / (1.4826·MAD)) exceeds 3.5. Two grouped
# exact-median passes over a 5-key dim (both join back broadcast);
# the row-level scan is touched twice but shuffles only once per agg
# on the tiny event_type key. MAD beats stddev-z on the heavy-tailed
# value column (exactly why curation pipelines gate on it).
# ---------------------------------------------------------------------------

MAD_K = 1.4826      # normal-consistency constant
ROBUST_Z_CUT = 3.5


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type")
    mad = (dev.groupBy("event_type")
           .agg(F.first("med").alias("med"),
                F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"),
                F.count(F.lit(1)).alias("n")))
    rz = F.abs(F.col("value") - F.col("med")) / (MAD_K * F.col("mad"))
    scored = ev.join(F.broadcast(mad), "event_type").withColumn("rz", rz)
    return (
        scored.groupBy("event_type")
        .agg(F.first("n").alias("n"),
             F.round(F.first("med"), 6).alias("med"),
             F.round(F.first("mad"), 6).alias("mad"),
             F.sum((F.col("rz") > ROBUST_Z_CUT).cast("long"))
             .alias("n_outliers"),
             F.round(F.max("rz"), 6).alias("max_robust_z"))
    )


ORACLE_MAD = f"""
WITH med AS (
  SELECT event_type, CAST(median(value) AS DOUBLE) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, any_value(m.med) AS med,
         CAST(median(abs(e.value - m.med)) AS DOUBLE) AS mad,
         count(*) AS n
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_type, any_value(m.n) AS n,
       round(any_value(m.med), 6) AS med,
       round(any_value(m.mad), 6) AS mad,
       count(CASE WHEN abs(e.value - m.med) / ({MAD_K} * m.mad)
                       > {ROBUST_Z_CUT} THEN 1 END) AS n_outliers,
       round(max(abs(e.value - m.med) / ({MAD_K} * m.mad)), 6)
         AS max_robust_z
FROM events e JOIN mad m USING (event_type)
GROUP BY e.event_type
"""


# ---------------------------------------------------------------------------
# Q82: duplicate-cluster size histogram — the release-report view of
# q41's connected components (how much of the corpus sits in dup
# groups of size 2, 3, …). Two tiny aggs over the resolved mapping.
# ---------------------------------------------------------------------------

def q_dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    resolved = _resolved_landed(spark, sf_dir)
    comps = resolved.groupBy("canonical").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (
        comps.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"),
             (F.count(F.lit(1)) * F.col("cluster_size")).alias("n_docs"))
        .withColumn("n_docs", F.col("n_docs").cast("long"))
    )


def _oracle_dup_cluster_histogram() -> str:
    return f"""
WITH resolved AS ({_oracle_dedup_resolve()}),
comps AS (
  SELECT canonical, count(*) AS cluster_size
  FROM resolved GROUP BY canonical
)
SELECT cluster_size, count(*) AS n_clusters,
       CAST(count(*) * cluster_size AS BIGINT) AS n_docs
FROM comps GROUP BY cluster_size
"""


# ---------------------------------------------------------------------------
# Q91: CUBE subtotals — every grouping-set combination of
# (priority, status) in one pass (completes the D12 family next to
# q48's ROLLUP; Spark expands grouping sets inside a single agg).
# ---------------------------------------------------------------------------

def q_cube_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .relational import _dsum

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"),
             _dsum(F.col("o_totalprice")).alias("total_price"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n", "total_price",
        )
    )


ORACLE_CUBE = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
         AS total_price
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


# ---------------------------------------------------------------------------
# Q92: correlated scalar subquery through the SQL entry path — orders
# beating their customer's average by 50%. Catalyst decorrelates the
# subquery into an aggregate + join (no per-row re-execution); the
# registry otherwise exercises the DataFrame API, this proves the
# spark.sql surface end-to-end.
# ---------------------------------------------------------------------------

def q_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("""
        SELECT o.o_custkey, count(*) AS n_big_orders,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                 AS big_total
        FROM orders_v o
        WHERE o.o_totalprice > round(1.5 * (
            SELECT avg(i.o_totalprice) FROM orders_v i
            WHERE i.o_custkey = o.o_custkey), 6)
        GROUP BY o.o_custkey
    """)


ORACLE_ABOVE_AVG = """
SELECT o.o_custkey, count(*) AS n_big_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
         AS big_total
FROM orders o
WHERE o.o_totalprice > round(1.5 * (
    SELECT avg(i.o_totalprice) FROM orders i
    WHERE i.o_custkey = o.o_custkey), 6)
GROUP BY o.o_custkey
"""


# ---------------------------------------------------------------------------
# Q87: order-value deciles — ntile(10) ranking (a function family the
# reference lacks entirely; SURVEY §2.D notes "no ranking functions").
# Total order includes the unique key so both engines tile identically.
#
# Scale shape (round-3 rework of the r2 scale-killer; round-4 moved the
# machinery into the shared functions/ranking.bucketed_rank kit): the
# naive form is one global ntile window = a single-partition sort of the
# whole fact table. This form computes the identical tiling in two
# phases with no unbounded window:
#   1. deterministic value-range bucketing on (min,max) price bounds
#      (bucket count derived from spark.sql.shuffle.partitions via
#      scaled_buckets — per-bucket sort width tracks cluster
#      parallelism, not data size; bounds broadcast from a 1-row
#      aggregate — no sampled RangePartitioner, so both downstream
#      branches see the same assignment);
#   2. per-bucket counts (a tiny relation) → prefix-sum offsets →
#      per-bucket row_number + offset = exact global rank → ntile
#      arithmetic reproducing ntile(10)'s
#      first-(N%10)-buckets-get-one-extra distribution exactly.
# Heavy sorts are per-bucket and partition-parallel. edges="depth"
# places bucket boundaries at sampled quantiles of the full order
# tuple (RangePartitioner), so buckets stay balanced under arbitrary
# value skew — a zipf-shaped price column would concentrate most rows
# into a few equi-width buckets and re-grow the per-bucket sort toward
# the single-task funnel this plan exists to kill. Ranks are
# bit-identical between modes (bucket order is monotone in the total
# order either way); tests/test_ranking.py pins the balance claim on
# a zipf fixture.
# ---------------------------------------------------------------------------


def q_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import bucketed_rank, scaled_buckets
    from .relational import _dsum

    orders = load_table(spark, sf_dir, "orders")
    o = orders.select("o_orderkey", "o_totalprice")
    ranked = bucketed_rank(
        o, "o_totalprice", ["o_totalprice", "o_orderkey"],
        n_buckets=scaled_buckets(spark),
        rank_name="_rank", total_name="_total", edges="depth")
    # Exact ntile(10) arithmetic: the first (N mod 10) tiles hold
    # ceil(N/10) CONTIGUOUS rows, the rest floor(N/10). The simpler
    # floor((rank-1)*10/N)+1 spreads the remainder Bresenham-style and
    # diverges whenever N is not divisible by 10 (caught in round-3
    # self-review; the sf0.01/sf0.1 fixtures are divisible by 10 and
    # masked it).
    tile = ("CAST(CASE WHEN _rank <= _b THEN (_rank - 1) DIV (_q + 1) "
            "ELSE _rem + (_rank - 1 - _b) DIV _q END AS INT) + 1")
    tiled = (
        ranked
        .withColumn("_q", F.expr("_total DIV 10"))
        .withColumn("_rem", F.expr("_total % 10"))
        .withColumn("_b", F.expr("_rem * (_q + 1)"))
        # N < 10 ⇒ _q = 0, but then every rank ≤ _b = N, so the
        # ELSE branch (and its DIV _q) is never evaluated for a row
        .withColumn("decile", F.expr(tile))
    )
    return (
        tiled.groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.min("o_totalprice").alias("min_price"),
             F.max("o_totalprice").alias("max_price"),
             _dsum(F.col("o_totalprice")).alias("total_price"))
    )


ORACLE_VALUE_DECILES = """
WITH tiled AS (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT decile, count(*) AS n_orders,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
         AS total_price
FROM tiled GROUP BY decile
"""


# ---------------------------------------------------------------------------
# Q88: trailing-7-day distinct active users per day. Spark has no
# COUNT(DISTINCT) OVER RANGE — the scalable form explodes each
# (user, day) into the 7 report days it contributes to (a bounded ×7
# fan-out of an already-collapsed relation), then one countDistinct
# per day: shuffle-once, no inequality join, no per-day rescans.
# ---------------------------------------------------------------------------

def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_day = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    days = per_day.select("day").distinct()
    contrib = per_day.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.date_add("day", 6)))
        .alias("report_day"),
    )
    return (
        contrib.join(F.broadcast(days),
                     contrib.report_day == days.day, "left_semi")
        .groupBy(F.date_format("report_day", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
    )


ORACLE_ROLLING_ACTIVE = """
WITH per_day AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
days AS (SELECT DISTINCT day FROM per_day),
contrib AS (
  SELECT user_id, day + CAST(i AS INTEGER) AS report_day
  FROM per_day CROSS JOIN (SELECT unnest(range(0, 7)) AS i)
)
SELECT strftime(c.report_day, '%Y-%m-%d') AS day,
       count(DISTINCT c.user_id) AS active_users_7d
FROM contrib c
WHERE c.report_day IN (SELECT day FROM days)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q93: set-op customer segmentation — INTERSECT/EXCEPT (the set
# operators SURVEY §2.F notes the reference lacks and Spark provides
# for free). Catalyst plans both as hash aggregates + semi/anti joins;
# at scale each is one shuffle on the (already distinct-collapsed)
# key, never a sort.
# ---------------------------------------------------------------------------

def q_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    # intersect/subtract are the SET forms (INTERSECT / EXCEPT):
    # a customer with orders in both years must never reach "churned",
    # which bag-semantics exceptAll would allow when the 1996 order
    # count exceeds the 1997 one.
    repeat = y96.intersect(y97).withColumn("segment", F.lit("repeat"))
    churned = y96.subtract(y97).withColumn("segment", F.lit("churned"))
    new = y97.subtract(y96).withColumn("segment", F.lit("new"))
    return repeat.unionByName(churned).unionByName(new)


ORACLE_CUSTOMER_SEGMENTS = """
WITH y96 AS (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
), y97 AS (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
)
SELECT o_custkey, 'repeat' AS segment
  FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
UNION ALL
SELECT o_custkey, 'churned' AS segment
  FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
UNION ALL
SELECT o_custkey, 'new' AS segment
  FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y96)
"""


# ---------------------------------------------------------------------------
# Q94: event-time RANGE frame — trailing-1-hour mean per event_type
# over the IRREGULAR raw event stream (no resampling): the frame is
# value-based (`rangeBetween(-3600, 0)` on epoch seconds), so each
# row sees exactly the peers within the trailing hour, duplicates
# included — semantics no ROWS frame can express on uneven spacing.
# Exact decimal accumulation keeps the mean engine-deterministic.
# ---------------------------------------------------------------------------

def q_range_frame_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    w = (Window.partitionBy("event_type").orderBy("epoch")
         .rangeBetween(-3600, 0))
    xd = F.col("value").cast("decimal(18,6)")
    out = (
        ev.select("event_type", epoch.alias("epoch"), "value")
        .withColumn("n_1h", F.count("value").over(w))
        .withColumn("avg_1h",
                    F.round(F.sum(xd).over(w).cast("double") / F.col("n_1h"),
                            6))
    )
    return out.select("event_type", "epoch",
                      F.round("value", 6).alias("value"), "n_1h", "avg_1h")


ORACLE_RANGE_FRAME = """
WITH ev AS (
  -- floor, not cast: DuckDB BIGINT-casts fractional epoch seconds by
  -- rounding, Spark's unix_timestamp truncates.
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS epoch, value
  FROM events
)
SELECT event_type, epoch, round(value, 6) AS value,
       count(value) OVER w AS n_1h,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / count(value) OVER w, 6) AS avg_1h
FROM ev
WINDOW w AS (PARTITION BY event_type ORDER BY epoch
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


SPECS = [
    QuerySpec("q41_dedup_resolve", q_dedup_resolve, _oracle_dedup_resolve(),
              "near-dup connected components → canonical survivors",
              ("P2-dedup",)),
    QuerySpec("q47_sessionize", q_sessionize, ORACLE_SESSIONIZE,
              "lag-gap sessionization + per-session stats", ("D7", "F7")),
    QuerySpec("q48_rollup", q_rollup, ORACLE_ROLLUP,
              "hierarchical rollup subtotals", ("D12",)),
    QuerySpec("q49_unpivot", q_unpivot, ORACLE_UNPIVOT,
              "wide→long unpivot (stack)", ("D2", "F3")),
    QuerySpec("q77_mad_outliers", q_mad_outliers, ORACLE_MAD,
              "median/MAD robust-z outlier gate per event_type",
              ("D6", "D13")),
    QuerySpec("q82_dup_cluster_histogram", q_dup_cluster_histogram,
              _oracle_dup_cluster_histogram(),
              "duplicate-cluster size histogram over q41 components",
              ("P2-dedup", "D13")),
    QuerySpec("q87_value_deciles", q_value_deciles, ORACLE_VALUE_DECILES,
              "ntile(10) order-value deciles", ("D13", "F2")),
    QuerySpec("q88_rolling_active_users", q_rolling_active_users,
              ORACLE_ROLLING_ACTIVE,
              "trailing-7-day distinct users via bounded fan-out",
              ("D7", "D15")),
    QuerySpec("q91_cube_totals", q_cube_totals, ORACLE_CUBE,
              "CUBE grouping-set subtotals", ("D12",)),
    QuerySpec("q92_above_avg_orders", q_above_avg_orders, ORACLE_ABOVE_AVG,
              "correlated scalar subquery (spark.sql, decorrelated)",
              ("C4", "D13")),
    QuerySpec("q93_customer_segments", q_customer_segments,
              ORACLE_CUSTOMER_SEGMENTS,
              "INTERSECT/EXCEPT year-over-year customer segments",
              ("F3",)),
    QuerySpec("q94_range_frame_hourly", q_range_frame_hourly,
              ORACLE_RANGE_FRAME,
              "event-time RANGE frame: trailing-1h mean on raw stream",
              ("D7",)),
]


# ---------------------------------------------------------------------------
# Q100: event-time session windows via the STREAMING-native operator
# (F.session_window) run in batch — the same plan serves live and
# backfill (streaming/pipeline.session_stats is this exact shape with
# a watermark). Semantics: an event merges into a session iff it
# starts strictly before last_event + gap; window end = last event +
# gap. The DuckDB twin is the classic gaps-and-islands rewrite at
# exact microsecond precision (the fixture has sub-second
# timestamps, so second-floor arithmetic would misplace boundaries).
# ---------------------------------------------------------------------------

SESSION_GAP = "30 minutes"
_GAP_US = 30 * 60 * 1_000_000


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP).alias("w"),
                   F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,6)"))
             .cast("double").alias("total_value"))
        .select("user_id",
                F.unix_micros(F.col("w.start").cast("timestamp"))
                .alias("session_start_us"),
                F.unix_micros(F.col("w.end").cast("timestamp"))
                .alias("session_end_us"),
                "n_events", "total_value")
    )


ORACLE_SESSION_WINDOW = f"""
WITH g AS (
  SELECT user_id, value, epoch_us(ts) AS tus,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                             ROWS UNBOUNDED PRECEDING) AS session_n
  FROM g
)
SELECT user_id,
       min(tus) AS session_start_us,
       max(tus) + {_GAP_US} AS session_end_us,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM s
GROUP BY user_id, session_n
"""


SPECS.append(
    QuerySpec("q100_session_window", q_session_window,
              ORACLE_SESSION_WINDOW,
              "session_window (streaming-native gap sessions) in batch, "
              "microsecond-exact", ("H3", "D12")))
