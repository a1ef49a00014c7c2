"""Core relational queries (SURVEY §2.B/C/D/F) with DuckDB oracles.

Cross-engine hash-match discipline (the driver compares Spark output
to DuckDB output value-by-value):

- Large float SUMs are computed over ``DECIMAL(18,6)`` casts: per-row
  doubles are IEEE-identical across engines, the decimal cast of the
  same double is identical, and decimal summation is exact and
  order-independent — so the final ``CAST(... AS DOUBLE)`` is
  bit-identical no matter how partitions combine. (A plain double sum
  differs in the last bits between engines because addition order
  differs — at 100 TB that is also the *correct* way to get stable
  results.)
- Timestamps are emitted as epoch BIGINT or formatted strings, never
  raw timestamp values (avoids tz-naive/aware representation drift).
- Every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec


def _dsum(col):
    """Order-independent double sum via exact decimal accumulation."""
    return F.sum(col.cast("decimal(18,6)")).cast("double")


# ---------------------------------------------------------------------------
# Q1: pricing summary — the TPC-H Q1 shape (filter + groupBy + 8 aggs + sort).
# Exercises SURVEY B3 (pruning), B5 (cast), D12/D13 (group aggs), F1 (sort).
# Scale: map-side partial agg, single shuffle on 2 low-cardinality keys.
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),  # integral doubles: exact
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / F.count(F.lit(1))).alias("avg_price"),
            (_dsum(F.col("l_discount")) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q2: top revenue customers — 3-way join + group + top-k (C4, F2).
# Scale: lineitem⋈orders shuffles on orderkey; customer side broadcast
# when dim-sized; TakeOrderedAndProject avoids a global sort.
# ---------------------------------------------------------------------------

def q_top_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(_dsum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


ORACLE_TOP_REVENUE = """
SELECT c_custkey, c_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q3: local-supplier revenue — TPC-H Q5 shape: 6-way star join with
# broadcast dims (C1/C2/C3 enrichment-join pattern at scale).
# ---------------------------------------------------------------------------

def q_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(_dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


ORACLE_LOCAL_SUPPLIER = """
SELECT r_name, n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY r_name, n_name
ORDER BY revenue DESC, n_name ASC
"""


# ---------------------------------------------------------------------------
# Q4: semi-join (EXISTS) — orders having any line shipped after order date.
# Spark gets semi/anti joins for free (SURVEY §2.C note).
# ---------------------------------------------------------------------------

def q_order_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_shipdate") > F.lit("1995-06-01").cast("timestamp"))
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE_ORDER_PRIORITY_SEMI = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1995-06-01'
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q5: anti-join (NOT EXISTS) — customers with no orders, by market segment.
# ---------------------------------------------------------------------------

def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


ORACLE_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Q6: deterministic dedup by key (C6: reference drop_duplicates(tx_hash),
# `stable_fee_ml_bot.py:97-98` pyc). row_number keeps the EARLIEST row per
# key — deterministic, unlike dropDuplicates — and is the correct
# distributed dedup (one shuffle on the key, no driver involvement).
# ---------------------------------------------------------------------------

def q_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id", "user_id", "event_type",
            F.unix_timestamp("ts").alias("ts_epoch"),
            F.round("value", 4).alias("value"),
        )
    )


ORACLE_DEDUP_BY_KEY = """
SELECT event_id, user_id, event_type,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
       round(value, 4) AS value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id, event_type
"""


# ---------------------------------------------------------------------------
# Q7: coercing cast + regex projection (B5 coerce, F6 regex) — parse the
# numeric payload out of the JSON-ish props string; invalid → NULL → drop.
# Reference: pd.to_numeric(errors="coerce") + dropna
# (`stable_eth_meanrevert_bot.py:64-69`).
# ---------------------------------------------------------------------------

def q_coerce_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("long")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k").isNotNull())
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("k_sum"))
        .orderBy("k_mod")
    )


ORACLE_COERCE_PROPS = r"""
SELECT k % 10 AS k_mod, count(*) AS n, CAST(sum(k) AS BIGINT) AS k_sum
FROM (
  SELECT TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k
  FROM events
)
WHERE k IS NOT NULL
GROUP BY k % 10
ORDER BY k_mod
"""


# ---------------------------------------------------------------------------
# Q8: derived price/pct columns (B7/B8: tick→price 1.0001**q) + math
# scalar surface (F8/F9: abs/greatest/least/round — the clip/fill ops).
# Per-row IEEE arithmetic is engine-identical; round(6) guards libm pow.
# ---------------------------------------------------------------------------

def q_derived_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    q = F.col("value") - F.lit(250.0)  # center as a signed "tick"
    return ev.select(
        "event_id",
        F.round(F.pow(F.lit(1.0001), q), 6).alias("price"),
        F.round((F.pow(F.lit(1.0001), q) - 1) * 100, 6).alias("pct"),
        F.round(F.abs(q), 6).alias("abs_tick"),
        F.round(F.greatest(q, F.lit(0.0)), 6).alias("clip_lo"),
        F.round(F.least(q, F.lit(100.0)), 6).alias("clip_hi"),
    )


ORACLE_DERIVED_PRICE = """
SELECT event_id,
       round(pow(1.0001, value - 250.0), 6) AS price,
       round((pow(1.0001, value - 250.0) - 1) * 100, 6) AS pct,
       round(abs(value - 250.0), 6) AS abs_tick,
       round(greatest(value - 250.0, 0.0), 6) AS clip_lo,
       round(least(value - 250.0, 100.0), 6) AS clip_hi
FROM events
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Q9: polarity normalization (B9: flip series sign when median >= pivot;
# reference `stable_eth_meanrevert_bot.py:85-88`) — scalar median per
# group joined back (broadcast: one row per event_type).
# ---------------------------------------------------------------------------

def q_polarity_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    sign = F.when(F.col("med") >= 250.0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return (
        ev.join(F.broadcast(med), "event_type")
        .select(
            "event_id", "event_type",
            F.round(sign * F.col("value"), 6).alias("value_norm"),
            F.round("med", 6).alias("med"),
        )
    )


ORACLE_POLARITY_NORMALIZE = """
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
)
SELECT event_id, events.event_type,
       round(CASE WHEN med >= 250.0 THEN -1.0 ELSE 1.0 END * value, 6) AS value_norm,
       round(med, 6) AS med
FROM events JOIN med USING (event_type)
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Q10: calendar aggregation (D12: monthly/yearly pct_return sums,
# reference `stable_eth_meanrevert_bot.py:255-266`) on orders.
# ---------------------------------------------------------------------------

def q_calendar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(
            _dsum(F.col("o_totalprice")).alias("total"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("month")
    )


ORACLE_CALENDAR_AGG = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
       count(*) AS n_orders
FROM orders
GROUP BY 1
ORDER BY month
"""


# ---------------------------------------------------------------------------
# Q11: global summary + distincts (D13/D14/D15).
# ---------------------------------------------------------------------------

def q_global_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct("user_id").alias("n_users"),
        _dsum(F.col("value")).alias("value_sum"),
        (_dsum(F.col("value")) / F.count(F.lit(1))).alias("value_avg"),
    )


ORACLE_GLOBAL_SUMMARY = """
SELECT count(*) AS n_rows,
       count(DISTINCT event_type) AS n_types,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS value_avg
FROM events
"""


# ---------------------------------------------------------------------------
# Q12: top-k with deterministic tiebreak (F2/F4: sort desc + limit —
# Spark compiles to TakeOrderedAndProject, no global sort at scale).
# ---------------------------------------------------------------------------

def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("total"), F.asc("o_orderkey"))
        .limit(25)
    )


ORACLE_TOPK_ORDERS = """
SELECT o_orderkey, round(o_totalprice, 2) AS total,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority
FROM orders
ORDER BY total DESC, o_orderkey ASC
LIMIT 25
"""


# ---------------------------------------------------------------------------
# Q13: union/concat (F3: pd.concat → unionByName).
# ---------------------------------------------------------------------------

def q_union_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").withColumn("bucket_tag", F.lit("clicks"))
    b = ev.filter(F.col("value") > 400).withColumn("bucket_tag", F.lit("whales"))
    return (
        a.unionByName(b)
        .groupBy("bucket_tag", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket_tag", "event_type")
    )


ORACLE_UNION_CONCAT = """
SELECT bucket_tag, event_type, count(*) AS n
FROM (
  SELECT event_type, 'clicks' AS bucket_tag FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT event_type, 'whales' AS bucket_tag FROM events WHERE value > 400
)
GROUP BY bucket_tag, event_type
ORDER BY bucket_tag, event_type
"""


# ---------------------------------------------------------------------------
# Q14: string/regex scalar functions (F6) + date parts (F7) over documents
# and events.
# ---------------------------------------------------------------------------

def q_regex_dateparts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
            F.hour("ts").alias("h"),
            F.upper("event_type").alias("etype"),
        )
        .groupBy("y", "m", "d", "h", "etype")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_REGEX_DATEPARTS = """
SELECT year(ts) AS y, month(ts) AS m, day(ts) AS d, hour(ts) AS h,
       upper(event_type) AS etype, count(*) AS n
FROM events
GROUP BY 1, 2, 3, 4, 5
ORDER BY y, m, d, h, etype
"""


# ---------------------------------------------------------------------------
# Q15: time-ordered 70/30 split (E4, reference `stable_fee_ml_bot.py:283-287`
# pyc), in timestamp-cut form (round-3 rework of the r2 scale-killer:
# the old registry form ran a global row_number over all events plus a
# driver-side count). Semantics: the cut is the smallest whole second
# whose cumulative event count reaches ceil(0.7·total); train = events
# at or before the cut second. Ties at the cut second all go to train,
# so the split is a *timestamp* boundary (reproducible, leakage-free —
# exactly what operators/mlplane.time_split gives pipelines), not a
# row-rank boundary.
#
# Scale shape: per-second counts → equi-width second-bucketing on
# broadcast (min,max) bounds → per-bucket prefix sums (the only
# unbounded-ish structures are the tiny bucket-counts relations,
# prefix-summed via a triangular join) → broadcast 1-row cut.
# No unpartitioned window, no driver-side count. The bucket count is
# derived from spark.sql.shuffle.partitions (functions/ranking.
# scaled_buckets) so per-bucket cumulative-sum width is bounded by
# cluster parallelism, not data size (the input here is already the
# per-SECOND count relation, so buckets hold seconds, not raw rows).
# ---------------------------------------------------------------------------


def q_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import scaled_buckets

    n_buckets = scaled_buckets(spark, mult=8)
    ev = load_table(spark, sf_dir, "events").select(
        F.unix_timestamp("ts").alias("sec"))
    per_sec = ev.groupBy("sec").agg(F.count(F.lit(1)).alias("c"))
    stats = per_sec.agg(F.min("sec").alias("_lo"), F.max("sec").alias("_hi"),
                        F.sum("c").alias("_total"))
    width = F.greatest(
        (F.col("_hi") - F.col("_lo")) / n_buckets, F.lit(1e-9))
    b = (per_sec.crossJoin(F.broadcast(stats))
         .withColumn("_bkt", F.least(
             F.lit(n_buckets - 1),
             F.floor((F.col("sec") - F.col("_lo")) / width)).cast("int")))
    bcounts = b.groupBy("_bkt").agg(F.sum("c").alias("_cnt"))
    ca, cb = bcounts.alias("ca"), bcounts.alias("cb")
    offs = (
        ca.join(F.broadcast(cb),
                F.col("cb._bkt") < F.col("ca._bkt"), "left")
        .groupBy(F.col("ca._bkt").alias("_bkt"))
        .agg(F.coalesce(F.sum("cb._cnt"), F.lit(0)).alias("_off"))
    )
    w_loc = Window.partitionBy("_bkt").orderBy("sec")
    cum = (
        b.withColumn("_lcum", F.sum("c").over(w_loc))
        .join(F.broadcast(offs), "_bkt")
        .withColumn("_cum", F.col("_off") + F.col("_lcum"))
    )
    cut = (cum.filter(F.col("_cum") >= F.ceil(F.col("_total") * 0.7))
           .agg(F.min("sec").alias("cut_sec")))
    return (
        ev.crossJoin(F.broadcast(cut))
        .withColumn("split", F.when(F.col("sec") <= F.col("cut_sec"),
                                    "train").otherwise("test"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("sec").alias("min_ts"),
            F.max("sec").alias("max_ts"),
        )
        .orderBy("split")
    )


ORACLE_TIME_SPLIT = """
WITH ev AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
),
tot AS (SELECT count(*) AS total FROM ev),
per_sec AS (SELECT sec, count(*) AS c FROM ev GROUP BY 1),
cum AS (SELECT sec, sum(c) OVER (ORDER BY sec) AS cum FROM per_sec),
cut AS (
  SELECT min(sec) AS cut_sec FROM cum, tot
  WHERE cum >= ceil(0.7 * total)
)
SELECT CASE WHEN sec <= cut_sec THEN 'train' ELSE 'test' END AS split,
       count(*) AS n,
       min(sec) AS min_ts,
       max(sec) AS max_ts
FROM ev, cut
GROUP BY 1
ORDER BY split
"""


SPECS = [
    QuerySpec("q01_pricing_summary", q_pricing_summary, ORACLE_PRICING_SUMMARY,
              "TPC-H Q1 shape: filter + group + 8 aggregates", ("B3", "B5", "D12", "D13", "F1")),
    QuerySpec("q02_top_revenue_customers", q_top_revenue_customers, ORACLE_TOP_REVENUE,
              "3-way join + group + top-k", ("C4", "F2")),
    QuerySpec("q03_local_supplier_revenue", q_local_supplier_revenue, ORACLE_LOCAL_SUPPLIER,
              "star join with broadcast dims", ("C1", "C2", "C3", "C4")),
    QuerySpec("q04_order_priority_semi", q_order_priority_semi, ORACLE_ORDER_PRIORITY_SEMI,
              "left-semi join (EXISTS)", ("C4",)),
    QuerySpec("q05_customers_without_orders", q_customers_without_orders, ORACLE_CUSTOMERS_WITHOUT_ORDERS,
              "left-anti join (NOT EXISTS)", ("C4",)),
    QuerySpec("q06_dedup_by_key", q_dedup_by_key, ORACLE_DEDUP_BY_KEY,
              "deterministic dedup by key (drop_duplicates)", ("C6",)),
    QuerySpec("q07_coerce_props", q_coerce_props, ORACLE_COERCE_PROPS,
              "coercing cast + regex extraction", ("B4", "B5", "F6")),
    QuerySpec("q08_derived_price", q_derived_price, ORACLE_DERIVED_PRICE,
              "tick→price/pct derivations + clip/abs math surface", ("B7", "B8", "F8", "F9")),
    QuerySpec("q09_polarity_normalize", q_polarity_normalize, ORACLE_POLARITY_NORMALIZE,
              "median-sign polarity flip", ("B9", "D6")),
    QuerySpec("q10_calendar_agg", q_calendar_agg, ORACLE_CALENDAR_AGG,
              "calendar (monthly) aggregation", ("D12", "F7")),
    QuerySpec("q11_global_summary", q_global_summary, ORACLE_GLOBAL_SUMMARY,
              "global sums/counts/distincts", ("D13", "D14", "D15")),
    QuerySpec("q12_topk_orders", q_topk_orders, ORACLE_TOPK_ORDERS,
              "sort desc + limit (TakeOrderedAndProject)", ("F2", "F4")),
    QuerySpec("q13_union_concat", q_union_concat, ORACLE_UNION_CONCAT,
              "unionByName (pd.concat)", ("F3",)),
    QuerySpec("q14_regex_dateparts", q_regex_dateparts, ORACLE_REGEX_DATEPARTS,
              "string fns + date part extraction", ("F6", "F7")),
    QuerySpec("q15_time_split", q_time_split, ORACLE_TIME_SPLIT,
              "time-ordered train/test split", ("E4",)),
]
