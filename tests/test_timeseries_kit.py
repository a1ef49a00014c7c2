"""Unit tests for the time-series kit on handcrafted micro-data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_evm_chain_spark.functions.timeseries import (
    ffill,
    lead_window_max,
    resample_ffill,
    resample_last,
    rolling_mean_std,
    rowwise_mean,
    rowwise_median,
    time_grid,
)

UTC = dt.timezone.utc


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second, tzinfo=UTC)


def _series(spark):
    rows = [
        ("a", _ts(0, 10), 1.0),
        ("a", _ts(0, 50), 2.0),   # same bucket, later → wins
        ("a", _ts(3, 5), 5.0),    # gap of 2 buckets → ffill
        ("b", _ts(1, 0), 10.0),
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, v double")


def test_resample_last_keeps_latest(spark):
    out = resample_last(_series(spark), ts="ts", key="key", value="v", seconds=60)
    got = {(r["key"], r["bucket_ts"].minute): r["v"] for r in out.collect()}
    assert got[("a", 0)] == 2.0
    assert got[("a", 3)] == 5.0
    assert got[("b", 1)] == 10.0


def test_time_grid_dense(spark):
    grid = time_grid(_series(spark), ts="ts", key="key", seconds=60)
    a = [r["bucket_ts"].minute for r in grid.filter("key='a'").orderBy("bucket_ts").collect()]
    assert a == [0, 1, 2, 3]
    b = [r["bucket_ts"].minute for r in grid.filter("key='b'").collect()]
    assert b == [1]


def test_resample_ffill_fills_gaps(spark):
    out = resample_ffill(_series(spark), ts="ts", key="key", value="v", seconds=60)
    a = [(r["bucket_ts"].minute, r["v"])
         for r in out.filter("key='a'").orderBy("bucket_ts").collect()]
    assert a == [(0, 2.0), (1, 2.0), (2, 2.0), (3, 5.0)]


def test_ffill_respects_key_boundaries(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 7.0), ("a", 3, None), ("b", 1, None)],
        "key string, t int, v double",
    )
    out = ffill(df, cols=["v"], key="key", order="t")
    got = {(r["key"], r["t"]): r["v"] for r in out.collect()}
    assert got[("a", 1)] is None       # nothing before first obs
    assert got[("a", 3)] == 7.0
    assert got[("b", 1)] is None       # b never sees a's values


def test_rolling_mean_std_min_periods(spark):
    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(5)], "key string, t int, v double"
    )
    out = rolling_mean_std(df, value="v", key="key", order="t", n=3,
                           min_periods=3, ddof=0).orderBy("t").collect()
    assert out[0]["roll_mean"] is None and out[1]["roll_mean"] is None
    assert out[2]["roll_mean"] == 1.0  # mean(0,1,2)
    assert abs(out[4]["roll_std"] - 0.816496580927726) < 1e-12  # std_pop(2,3,4)


def test_lead_window_max(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 9.0), ("a", 3, 4.0)], "key string, t int, v double"
    )
    out = lead_window_max(df, value="v", key="key", order="t", horizon=2)
    got = {r["t"]: r["lead_max"] for r in out.collect()}
    assert got[1] == 9.0 and got[2] == 4.0 and got[3] is None


def test_rowwise_mean_median_null_aware(spark):
    df = spark.createDataFrame(
        [(1.0, None, 3.0), (None, None, None)], "a double, b double, c double"
    )
    out = df.select(
        rowwise_mean(["a", "b", "c"]).alias("m"),
        rowwise_median(["a", "b", "c"]).alias("md"),
    ).collect()
    assert out[0]["m"] == 2.0 and out[0]["md"] == 2.0
    assert out[1]["m"] is None and out[1]["md"] is None
