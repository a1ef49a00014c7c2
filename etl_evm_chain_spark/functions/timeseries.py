"""Time-series kit: the resample → ffill → pivot → rolling motif.

The reference's analytics layer repeats one motif in all four of its
pipelines (reference `analytics/stable_eth_meanrevert_bot.py:98-127`,
`stable_fee_ml_bot.py:107,236` via bytecode): resample an irregular
tick stream onto a fixed grid keeping the last observation, forward
fill gaps, pivot series to a wide matrix, then compute rolling
statistics. This module packages that motif as composable DataFrame
transforms, expressed with built-in functions only (JVM-side,
whole-stage-codegen'd — no Python in the hot path).

Scale notes
-----------
- Everything partitions by the series key; window state is per-key and
  ordered by the bucket timestamp, so a 1000-executor cluster shuffles
  once on the key and streams each series through a single task.
- ``resample_last`` is a hash aggregation with map-side partial
  aggregation (max_by combines associatively) — no sort needed.
- ``ffill`` is one window per key; Spark sorts within partitions only.
- ``pivot_last`` requires explicit pivot values (avoids the extra
  distinct job AND makes output column order deterministic, which the
  hash-matching oracle needs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts: Column | str, seconds: int) -> Column:
    """Floor a timestamp to a `seconds`-wide tumbling bucket.

    Equivalent to pandas ``resample(f"{seconds}s")`` bucket labels
    (reference `stable_eth_meanrevert_bot.py:98-104`). Uses integer
    arithmetic on unix seconds: deterministic and codegen-friendly.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_seconds(
        (F.unix_timestamp(c) / seconds).cast("long") * seconds
    )


def resample_last(df: DataFrame, *, ts: str, key: str, value: str,
                  seconds: int, bucket_col: str = "bucket_ts",
                  value_alias: str | None = None) -> DataFrame:
    """Tumbling-window downsample keeping the last value per bucket.

    Reference semantics: ``set_index(ts).resample(freq).last()``
    (`stable_eth_meanrevert_bot.py:98-104`). Implemented as
    ``max_by(value, ts)`` — an associative aggregate, so Spark does
    map-side partial aggregation and a single shuffle on
    ``(key, bucket)``; no window sort required.
    """
    value_alias = value_alias or value
    return (
        df.groupBy(F.col(key), time_bucket(ts, seconds).alias(bucket_col))
        .agg(F.max_by(F.col(value), F.col(ts)).alias(value_alias))
    )


def ffill(df: DataFrame, *, cols: list[str], key: str | None,
          order: str) -> DataFrame:
    """Forward-fill nulls per key in time order.

    Reference: ``.ffill()`` after resample
    (`stable_eth_meanrevert_bot.py:100`; `stable_fee_ml_bot.py:241` pyc).
    ``last(col, ignorenulls=True)`` over a growing frame — one window
    pass per key, partition-local after the shuffle on `key`.
    """
    w = (Window.partitionBy(key) if key else Window.partitionBy()) \
        .orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def time_grid(df: DataFrame, *, ts: str, key: str, seconds: int,
              bucket_col: str = "bucket_ts") -> DataFrame:
    """Dense regular grid per key spanning each key's [min, max] time.

    The scaffold of the implicit as-of join (reference
    `stable_eth_meanrevert_bot.py:98-123`): resample+ffill+inner-join is
    a step-function as-of alignment onto a regular grid. ``sequence``
    + ``explode`` generates the grid distributively (one row per key
    in, grid rows out — no driver-side loop).
    """
    c = F.col(ts)
    bounds = df.groupBy(key).agg(
        F.min(time_bucket(c, seconds)).alias("_t0"),
        F.max(time_bucket(c, seconds)).alias("_t1"),
    )
    return bounds.select(
        key,
        F.explode(
            F.sequence("_t0", "_t1", F.expr(f"interval {seconds} seconds"))
        ).alias(bucket_col),
    )


def resample_ffill(df: DataFrame, *, ts: str, key: str, value: str,
                   seconds: int, bucket_col: str = "bucket_ts") -> DataFrame:
    """resample(last) onto a dense grid, then forward-fill: the full
    pandas ``resample(freq).last().ffill()`` motif, distributed.
    """
    sampled = resample_last(df, ts=ts, key=key, value=value,
                            seconds=seconds, bucket_col=bucket_col)
    grid = time_grid(df, ts=ts, key=key, seconds=seconds, bucket_col=bucket_col)
    dense = grid.join(sampled, [key, bucket_col], "left")
    return ffill(dense, cols=[value], key=key, order=bucket_col)


def pivot_last(df: DataFrame, *, index: str, pivot: str, value: str,
               pivot_values: list[str]) -> DataFrame:
    """Long→wide pivot keeping the last value per cell.

    Reference: ``pivot_table(index, columns, values, aggfunc='last')``
    (`stable_fee_ml_bot.py:236` pyc). Explicit ``pivot_values`` avoids
    the extra distinct-scan job and pins deterministic column order.
    """
    return (
        df.groupBy(index)
        .pivot(pivot, pivot_values)
        .agg(F.last(value, ignorenulls=True))
    )


def rolling_mean_std(df: DataFrame, *, value: str, key: str | None, order: str,
                     n: int, min_periods: int | None = None,
                     ddof: int = 0, mean_col: str = "roll_mean",
                     std_col: str = "roll_std") -> DataFrame:
    """Trailing-row rolling mean and std with a min_periods mask.

    Reference: ``rolling(lookback, min_periods=lookback).mean()/.std(ddof)``
    (`stable_eth_meanrevert_bot.py:198-199`; `stable_fee_ml_bot.py:132` pyc).
    """
    min_periods = n if min_periods is None else min_periods
    w = (Window.partitionBy(key) if key else Window.partitionBy()) \
        .orderBy(order).rowsBetween(-(n - 1), 0)
    std_fn = F.stddev_pop if ddof == 0 else F.stddev_samp
    cnt = F.count(value).over(w)
    return (
        df.withColumn(mean_col, F.when(cnt >= min_periods, F.avg(value).over(w)))
        .withColumn(std_col, F.when(cnt >= min_periods, std_fn(value).over(w)))
    )


def zscore(value: Column | str, mean: Column | str, std: Column | str) -> Column:
    """(x − μ)/σ, null when σ is null/zero (reference
    `stable_eth_meanrevert_bot.py:200`)."""
    v = F.col(value) if isinstance(value, str) else value
    m = F.col(mean) if isinstance(mean, str) else mean
    s = F.col(std) if isinstance(std, str) else std
    return F.when(s != 0, (v - m) / s)


def lead_window_max(df: DataFrame, *, value: str, key: str | None, order: str,
                    horizon: int, out_col: str = "lead_max") -> DataFrame:
    """Max over the next ``horizon`` rows (strictly future frame).

    Reference labeling window: ``max(future devdt)`` over
    ``iloc[i+1 : i+1+horizon]`` (`stable_fee_ml_bot.py:150-156` pyc).
    """
    w = (Window.partitionBy(key) if key else Window.partitionBy()) \
        .orderBy(order).rowsBetween(1, horizon)
    return df.withColumn(out_col, F.max(value).over(w))


def rowwise_mean(cols: list[str]) -> Column:
    """Null-aware mean across columns (pandas ``mean(axis=1)``,
    reference `stable_eth_meanrevert_bot.py:142,195`)."""
    arr = F.array(*[F.col(c) for c in cols])
    vals = F.filter(arr, lambda x: x.isNotNull())
    return F.when(
        F.size(vals) > 0,
        F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x) / F.size(vals),
    )


def rowwise_median(cols: list[str]) -> Column:
    """Null-aware median across columns (pandas ``median(axis=1,
    skipna=True)``, reference `stable_fee_ml_bot.py:118` pyc).

    Sorted-array expression: interpolates the middle two for even
    counts, matching pandas/DuckDB median semantics.
    """
    arr = F.array_sort(F.filter(F.array(*[F.col(c) for c in cols]),
                                lambda x: x.isNotNull()))
    n = F.size(arr)
    mid_hi = F.element_at(arr, (n / 2).cast("int") + 1)
    mid_lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    return F.when(n > 0, (mid_lo + mid_hi) / 2.0)
