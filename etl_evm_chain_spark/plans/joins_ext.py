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


SPECS = [
    QuerySpec("q54_asof_join", q_asof_join, ORACLE_ASOF_JOIN,
              "true event-time as-of join (union-tag, one shuffle)",
              ("C5",)),
    QuerySpec("q55_range_join", q_range_join, ORACLE_RANGE_JOIN,
              "banded interval join over pre-aggregated points",
              ("C4", "D1")),
]
