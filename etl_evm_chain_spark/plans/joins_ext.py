"""Event-time join extensions: true as-of join and banded range join.

The reference's only temporal-alignment tool is resample+ffill+inner
join (SURVEY C5, `analytics/stable_eth_meanrevert_bot.py:98-123`) — a
step-function approximation that quantizes to a grid. A complete
engine needs the exact event-time forms; these queries prove them
against DuckDB's native `ASOF JOIN` and an inequality join.

Scale design (see operators/asof.py):
- q54 shuffles once on the key, then one partition-local sorted window
  pass — no nested loop, no row explosion, works unchanged on 100 TB.
- q55 pre-aggregates the point side to a tiny dim *before* the range
  join (the aggregate commutes with the interval containment), then
  does a banded equi-join that Catalyst broadcasts — the pattern that
  turns an O(|points|·|intervals|) theta join into a broadcast probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.asof import asof_join, range_join
from . import QuerySpec

DAY_S = 86400
WINDOW_S = 7 * DAY_S


# ---------------------------------------------------------------------------
# Q54: as-of join — each purchase gets the user's most recent prior
# (or same-instant) view: price-at-trade-time semantics.
# ---------------------------------------------------------------------------

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase") \
                  .select("user_id", "ts", F.col("value").alias("purchase_value"))
    views = ev.filter(F.col("event_type") == "view") \
              .select("user_id", "ts", F.col("value").alias("view_value"))
    out = asof_join(purchases, views, on="ts", by="user_id",
                    right_cols=["view_value"], matched_on="view_ts")
    return out.select(
        "user_id",
        F.unix_timestamp("ts").alias("ts"),
        "purchase_value",
        F.unix_timestamp("view_ts").alias("view_ts"),
        "view_value",
    )


ORACLE_ASOF_JOIN = """
WITH p AS (
  SELECT user_id, ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id, ts AS view_ts, value AS view_value
  FROM events WHERE event_type = 'view'
)
SELECT p.user_id,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS ts,
       p.purchase_value,
       CAST(floor(epoch(v.view_ts)) AS BIGINT) AS view_ts,
       v.view_value
FROM p ASOF LEFT JOIN v
  ON p.user_id = v.user_id AND p.ts >= v.view_ts
"""


# ---------------------------------------------------------------------------
# Q55: banded range join — shipments-per-day dim joined onto each
# order's 7-day fulfilment window [o_orderdate, +7d).
# ---------------------------------------------------------------------------

def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    # Pre-aggregate points → the range join probes a tiny broadcast dim
    # instead of exploding |lineitem| × |orders| pairs.
    daily = li.groupBy(
        ((F.unix_timestamp("l_shipdate") / DAY_S).cast("long") * DAY_S)
        .alias("day_ts")
    ).agg(F.count(F.lit(1)).alias("n_ship"))
    intervals = orders.select(
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("lo"),
        (F.unix_timestamp("o_orderdate") + WINDOW_S).alias("hi"),
    )
    joined = range_join(daily, intervals, point_on="day_ts", lo="lo", hi="hi",
                        bucket_width=WINDOW_S, inclusive="left")
    return (
        joined.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_ship_days"),
             F.sum("n_ship").alias("total_shipments"))
    )


ORACLE_RANGE_JOIN = f"""
WITH daily AS (
  SELECT CAST(floor(epoch(l_shipdate) / {DAY_S}) AS BIGINT) * {DAY_S} AS day_ts,
         count(*) AS n_ship
  FROM lineitem GROUP BY 1
)
SELECT o.o_orderkey,
       count(*) AS n_ship_days,
       CAST(sum(d.n_ship) AS BIGINT) AS total_shipments
FROM orders o JOIN daily d
  ON d.day_ts >= CAST(floor(epoch(o.o_orderdate)) AS BIGINT)
 AND d.day_ts <  CAST(floor(epoch(o.o_orderdate)) AS BIGINT) + {WINDOW_S}
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q86: nation-pair trade flows (the TPC-H Q7 "volume shipping" shape):
# revenue between every (supplier nation, customer nation) pair by
# order year. The one big shuffle is lineitem ⋈ orders on l_orderkey;
# customer, supplier and nation are broadcast dims folded in before
# and after, so the fact table is shuffled exactly once.
# ---------------------------------------------------------------------------

def q_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    supp_n = (supp.join(F.broadcast(nation),
                        supp.s_nationkey == nation.n_nationkey)
              .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cust_n = (cust.join(F.broadcast(nation),
                        cust.c_nationkey == nation.n_nationkey)
              .select("c_custkey", F.col("n_name").alias("cust_nation")))
    ord_n = (orders.join(F.broadcast(cust_n), orders.o_custkey == cust_n.c_custkey)
             .select("o_orderkey", "cust_nation",
                     F.year("o_orderdate").alias("trade_year")))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    from .relational import _dsum

    return (
        li.join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .join(ord_n, li.l_orderkey == ord_n.o_orderkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "trade_year")
        .agg(_dsum(rev).alias("revenue"),
             F.count(F.lit(1)).alias("n_lineitems"))
    )


ORACLE_NATION_TRADE = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(extract(year FROM o.o_orderdate) AS INTEGER) AS trade_year,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       count(*) AS n_lineitems
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


SPECS = [
    QuerySpec("q54_asof_join", q_asof_join, ORACLE_ASOF_JOIN,
              "true event-time as-of join (union-tag, one shuffle)",
              ("C5",)),
    QuerySpec("q55_range_join", q_range_join, ORACLE_RANGE_JOIN,
              "banded interval join over pre-aggregated points",
              ("C4", "D1")),
    QuerySpec("q86_nation_trade", q_nation_trade, ORACLE_NATION_TRADE,
              "nation-pair trade flows (TPC-H Q7 shape, one fact shuffle)",
              ("C4", "C1", "D12")),
]
