"""Time-series queries (SURVEY §2.D windows + C5 as-of motif) with oracles.

These exercise the resample→ffill→pivot→rolling motif from the
reference's analytics layer (`stable_eth_meanrevert_bot.py:98-127`,
`stable_fee_ml_bot.py:107-139,236` pyc) on the `events` fixture
(event_type ≈ pool/fee key, value ≈ tick, ts ≈ trade time).

Exactness discipline: rolling mean/std are computed from window SUMs
over DECIMAL-cast values. Decimal sums are exact and order-independent,
so Spark and DuckDB produce bit-identical doubles after the final cast
— no float-tolerance needed for hash matching. (The production-path
``stddev_pop`` variant lives in functions/timeseries.py; the decimal
formulation here is the oracle-stable equivalent.)

Scale: every window partitions by the series key; the dense grid is
generated distributively (sequence+explode — no driver loop); the
consensus is a per-bucket window aggregate (single shuffle on bucket).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.timeseries import resample_ffill, resample_last
from . import QuerySpec

BUCKET_S = 300  # 5-minute grid for oracle-checked queries

TYPES = ["click", "error", "purchase", "signup", "view"]

# Shared DuckDB CTE: resample-last onto 300 s buckets (epoch bigint),
# then dense per-type grid + forward fill. Mirrors
# functions/timeseries.resample_ffill exactly.
_SQL_DENSE = """
WITH sampled AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 AS bucket,
         arg_max(value, ts) AS value
  FROM events
  GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket) AS b0, max(bucket) AS b1 FROM sampled GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(b0, b1, 300)) AS bucket FROM bounds
), dense AS (
  SELECT g.event_type, g.bucket,
         last_value(s.value IGNORE NULLS)
           OVER (PARTITION BY g.event_type ORDER BY g.bucket) AS value
  FROM grid g LEFT JOIN sampled s
    ON g.event_type = s.event_type AND g.bucket = s.bucket
)
"""


def _bucket_epoch(ts: str = "ts", seconds: int = BUCKET_S) -> Column:
    return (F.unix_timestamp(ts) / seconds).cast("long") * seconds


def _dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → per-type dense 300 s grid with ffilled value; bucket as epoch."""
    ev = load_table(spark, sf_dir, "events")
    dense = resample_ffill(ev, ts="ts", key="event_type", value="value",
                           seconds=BUCKET_S)
    return dense.select(
        "event_type",
        F.unix_timestamp("bucket_ts").alias("bucket"),
        "value",
    )


def _with_consensus(dense: DataFrame) -> DataFrame:
    """Per-bucket cross-type consensus mean via exact decimal sums
    (reference D4: ``df[pools].mean(axis=1)``)."""
    wb = Window.partitionBy("bucket")
    xd = F.col("value").cast("decimal(18,6)")
    cons = F.sum(xd).over(wb).cast("double") / F.count("value").over(wb)
    return dense.withColumn("consensus", cons) \
                .withColumn("dev", F.col("value") - F.col("consensus"))


def _with_rolling(df: DataFrame, value: str, n: int, min_periods: int) -> DataFrame:
    """Exact rolling mean/std(ddof=0) over the trailing n rows per type."""
    w = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(-(n - 1), 0)
    xd = F.col(value).cast("decimal(18,6)")
    s1 = F.sum(xd).over(w).cast("double")
    s2 = F.sum(xd * xd).over(w).cast("double")
    cnt = F.count(value).over(w)
    mean = s1 / cnt
    var = s2 / cnt - mean * mean
    return (
        df.withColumn("_cnt", cnt)
        .withColumn("roll_mean", F.when(cnt >= min_periods, mean))
        .withColumn("roll_std",
                    F.when(cnt >= min_periods,
                           F.sqrt(F.greatest(var, F.lit(0.0)))))
    )


_SQL_ROLL = """
, cons AS (
  SELECT event_type, bucket, value,
         CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY bucket) AS DOUBLE)
           / count(value) OVER (PARTITION BY bucket) AS consensus
  FROM dense
), dev AS (
  SELECT *, value - consensus AS dev FROM cons
), roll AS (
  SELECT *,
         count(dev) OVER w AS _cnt,
         CAST(sum(CAST(dev AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s1,
         CAST(sum(CAST(dev AS DECIMAL(18,6)) * CAST(dev AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s2
  FROM dev
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
), z AS (
  SELECT event_type, bucket, value, consensus, dev, _cnt,
         CASE WHEN _cnt >= 30 THEN s1 / _cnt END AS roll_mean,
         CASE WHEN _cnt >= 30 THEN sqrt(greatest(s2 / _cnt - (s1 / _cnt) * (s1 / _cnt), 0.0)) END AS roll_std
  FROM roll
)
"""


# ---------------------------------------------------------------------------
# Q16: resample-last (D1 — pandas resample(freq).last()).
# ---------------------------------------------------------------------------

def q_resample_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = resample_last(ev, ts="ts", key="event_type", value="value",
                        seconds=BUCKET_S)
    return out.select(
        "event_type", F.unix_timestamp("bucket_ts").alias("bucket"), "value",
    )


ORACLE_RESAMPLE_LAST = """
SELECT event_type,
       CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 AS bucket,
       arg_max(value, ts) AS value
FROM events
GROUP BY 1, 2
ORDER BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# Q17: dense grid + forward-fill — the implicit as-of alignment
# (C5 + D3: resample().last().ffill() as a step-function as-of join).
# ---------------------------------------------------------------------------

def q_asof_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dense(spark, sf_dir)


ORACLE_ASOF_FFILL = _SQL_DENSE + """
SELECT event_type, bucket, value FROM dense
ORDER BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# Q18: pivot long→wide (D2 — pivot_table(aggfunc='last') with explicit
# pivot values for deterministic columns; one value per cell after D1).
# ---------------------------------------------------------------------------

def q_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sampled = resample_last(ev, ts="ts", key="event_type", value="value",
                            seconds=BUCKET_S)
    return (
        sampled.withColumn("bucket", F.unix_timestamp("bucket_ts"))
        .groupBy("bucket").pivot("event_type", TYPES).agg(F.max("value"))
    )


ORACLE_PIVOT_WIDE = """
WITH sampled AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 AS bucket,
         arg_max(value, ts) AS value
  FROM events GROUP BY 1, 2
)
SELECT bucket,
       max(CASE WHEN event_type = 'click' THEN value END) AS click,
       max(CASE WHEN event_type = 'error' THEN value END) AS error,
       max(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
       max(CASE WHEN event_type = 'signup' THEN value END) AS signup,
       max(CASE WHEN event_type = 'view' THEN value END) AS view
FROM sampled
GROUP BY bucket
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Q19: row-wise consensus mean/median over the wide matrix (D4/D5 —
# pandas mean/median(axis=1, skipna=True)). The null-aware fold runs in
# fixed column order on both engines → bit-identical.
# ---------------------------------------------------------------------------

def q_consensus_rowwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = q_pivot_wide(spark, sf_dir)
    arr = F.array(*[F.col(t) for t in TYPES])
    vals = F.filter(arr, lambda x: x.isNotNull())
    n = F.size(vals)
    total = F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x)
    sorted_vals = F.array_sort(vals)
    mid_hi = F.element_at(sorted_vals, (n / 2).cast("int") + 1)
    mid_lo = F.element_at(sorted_vals, ((n + 1) / 2).cast("int"))
    return wide.select(
        "bucket",
        n.alias("n_series"),
        F.round(total / n, 6).alias("cons_mean"),
        F.round((mid_lo + mid_hi) / 2.0, 6).alias("cons_median"),
    )


ORACLE_CONSENSUS_ROWWISE = """
WITH sampled AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 AS bucket,
         arg_max(value, ts) AS value
  FROM events GROUP BY 1, 2
), wide AS (
  SELECT bucket,
         max(CASE WHEN event_type = 'click' THEN value END) AS click,
         max(CASE WHEN event_type = 'error' THEN value END) AS error,
         max(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
         max(CASE WHEN event_type = 'signup' THEN value END) AS signup,
         max(CASE WHEN event_type = 'view' THEN value END) AS view
  FROM sampled GROUP BY bucket
), folded AS (
  SELECT bucket,
         list_filter([click, error, purchase, signup, view], x -> x IS NOT NULL) AS vals
  FROM wide
)
SELECT bucket,
       len(vals) AS n_series,
       round(list_aggregate(vals, 'sum') / len(vals), 6) AS cons_mean,
       round((list_sort(vals)[CAST(floor((len(vals) + 1) / 2) AS INTEGER)]
            + list_sort(vals)[CAST(floor(len(vals) / 2) AS INTEGER) + 1]) / 2.0, 6) AS cons_median
FROM folded
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Q20: rolling z-score over deviations (D7/D8/D11 — rolling mean/std
# ddof=0 then (dev−μ)/σ; reference `stable_eth_meanrevert_bot.py:195-200`).
# ---------------------------------------------------------------------------

def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_rolling(_with_consensus(_dense(spark, sf_dir)), "dev", 30, 30)
    z = F.when(F.col("roll_std") != 0,
               (F.col("dev") - F.col("roll_mean")) / F.col("roll_std"))
    return (
        df.withColumn("z", z)
        .filter(F.col("roll_mean").isNotNull())
        .select("event_type", "bucket",
                F.round("dev", 6).alias("dev"),
                F.round("roll_mean", 6).alias("roll_mean"),
                F.round("roll_std", 6).alias("roll_std"),
                F.round("z", 6).alias("z"))
    )


ORACLE_ROLLING_ZSCORE = _SQL_DENSE + _SQL_ROLL + """
SELECT event_type, bucket,
       round(dev, 6) AS dev,
       round(roll_mean, 6) AS roll_mean,
       round(roll_std, 6) AS roll_std,
       round(CASE WHEN roll_std != 0 THEN (dev - roll_mean) / roll_std END, 6) AS z
FROM z
WHERE roll_mean IS NOT NULL
ORDER BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# Q21: leading-window max label (D10 + B13 — future-horizon labeling,
# reference `stable_fee_ml_bot.py:150-156` pyc).
# ---------------------------------------------------------------------------

def q_lead_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    dense = _dense(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(1, 12)
    lead_max = F.max("value").over(w)
    return (
        dense.withColumn("lead_max", lead_max)
        .withColumn("y", F.when(F.col("lead_max") - F.col("value") >= 25.0, 1)
                          .otherwise(0))
        .select("event_type", "bucket", "value", "lead_max", "y")
    )


ORACLE_LEAD_LABEL = _SQL_DENSE + """
SELECT event_type, bucket, value,
       max(value) OVER (PARTITION BY event_type ORDER BY bucket
                        ROWS BETWEEN 1 FOLLOWING AND 12 FOLLOWING) AS lead_max,
       CASE WHEN max(value) OVER (PARTITION BY event_type ORDER BY bucket
                                  ROWS BETWEEN 1 FOLLOWING AND 12 FOLLOWING)
                 - value >= 25.0
            THEN 1 ELSE 0 END AS y
FROM dense
ORDER BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# Q22: multi-way inner equi-join on the time key (C4 — fold of pairwise
# merges onto the common grid, reference `stable_eth_meanrevert_bot.py:121-123`).
# ---------------------------------------------------------------------------

def q_multiway_ts_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sampled = resample_last(ev, ts="ts", key="event_type", value="value",
                            seconds=BUCKET_S) \
        .withColumn("bucket", F.unix_timestamp("bucket_ts"))
    series = [
        sampled.filter(F.col("event_type") == t)
        .select("bucket", F.col("value").alias(f"v_{t}"))
        for t in ("click", "purchase", "view")
    ]
    joined = reduce(lambda a, b: a.join(b, "bucket", "inner"), series)
    return joined


ORACLE_MULTIWAY_TS_JOIN = """
WITH sampled AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 AS bucket,
         arg_max(value, ts) AS value
  FROM events GROUP BY 1, 2
)
SELECT a.bucket, a.value AS v_click, b.value AS v_purchase, c.value AS v_view
FROM      (SELECT bucket, value FROM sampled WHERE event_type = 'click') a
JOIN (SELECT bucket, value FROM sampled WHERE event_type = 'purchase') b USING (bucket)
JOIN     (SELECT bucket, value FROM sampled WHERE event_type = 'view') c USING (bucket)
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Q23: threshold signal gate (B11/B12/B14 — entry when |z| ≥ entry_z,
# side by sign; reference `stable_eth_meanrevert_bot.py:215-234`).
# ---------------------------------------------------------------------------

def q_signal_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_rolling(_with_consensus(_dense(spark, sf_dir)), "dev", 30, 30)
    z = F.when(F.col("roll_std") != 0,
               (F.col("dev") - F.col("roll_mean")) / F.col("roll_std"))
    return (
        df.withColumn("z", z)
        .filter(F.abs(F.col("z")) >= 1.5)
        .withColumn("side", F.when(F.col("z") <= -1.5, "LONG").otherwise("SHORT"))
        .select("event_type", "bucket", F.round("z", 6).alias("z"), "side")
    )


ORACLE_SIGNAL_GATE = _SQL_DENSE + _SQL_ROLL + """
SELECT event_type, bucket,
       round((dev - roll_mean) / roll_std, 6) AS z,
       CASE WHEN (dev - roll_mean) / roll_std <= -1.5 THEN 'LONG' ELSE 'SHORT' END AS side
FROM z
WHERE roll_std IS NOT NULL AND roll_std != 0
  AND abs((dev - roll_mean) / roll_std) >= 1.5
ORDER BY event_type, bucket
"""


SPECS = [
    QuerySpec("q16_resample_last", q_resample_last, ORACLE_RESAMPLE_LAST,
              "tumbling-window downsample keeping last observation", ("B6", "D1", "H3")),
    QuerySpec("q17_asof_ffill", q_asof_ffill, ORACLE_ASOF_FFILL,
              "dense grid + forward-fill (as-of alignment)", ("C5", "D3")),
    QuerySpec("q18_pivot_wide", q_pivot_wide, ORACLE_PIVOT_WIDE,
              "long→wide pivot with explicit values", ("D2",)),
    QuerySpec("q19_consensus_rowwise", q_consensus_rowwise, ORACLE_CONSENSUS_ROWWISE,
              "row-wise mean/median consensus", ("D4", "D5")),
    QuerySpec("q20_rolling_zscore", q_rolling_zscore, ORACLE_ROLLING_ZSCORE,
              "rolling mean/std + z-score", ("D7", "D8", "D11")),
    QuerySpec("q21_lead_label", q_lead_label, ORACLE_LEAD_LABEL,
              "future-horizon max labeling", ("D10", "B13")),
    QuerySpec("q22_multiway_ts_join", q_multiway_ts_join, ORACLE_MULTIWAY_TS_JOIN,
              "multi-way inner join on time key", ("C4", "F5")),
    QuerySpec("q23_signal_gate", q_signal_gate, ORACLE_SIGNAL_GATE,
              "threshold entry signals from z-scores", ("B11", "B12", "B14")),
]
