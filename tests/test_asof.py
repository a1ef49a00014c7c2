"""As-of and range join unit tests: pandas merge_asof is the ground
truth for asof semantics; a brute-force theta join for range_join."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from etl_evm_chain_spark.operators.asof import asof_join, range_join


def _frames():
    trades = pd.DataFrame({
        "key": ["a"] * 4 + ["b"] * 3,
        "t": [10, 20, 30, 40, 5, 25, 100],
        "px": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
    })
    quotes = pd.DataFrame({
        "key": ["a"] * 3 + ["b"] * 2 + ["c"],
        "t": [5, 20, 35, 30, 90, 1],
        "bid": [0.9, 1.9, 3.4, 5.5, 6.9, 0.1],
    })
    return trades, quotes


def _expected(direction: str, tolerance=None):
    trades, quotes = _frames()
    return pd.merge_asof(
        trades.sort_values("t"), quotes.sort_values("t"),
        on="t", by="key", direction=direction,
        tolerance=tolerance,
    ).sort_values(["key", "t"]).reset_index(drop=True)


def _run(spark, direction: str, tolerance=None):
    trades, quotes = _frames()
    out = asof_join(
        spark.createDataFrame(trades), spark.createDataFrame(quotes),
        on="t", by="key", right_cols=["bid"], direction=direction,
        tolerance=tolerance, matched_on="q_t",
    )
    return (out.select("key", "t", "px", "bid")
            .toPandas().sort_values(["key", "t"]).reset_index(drop=True))


def test_asof_backward_matches_pandas(spark):
    got = _run(spark, "backward")
    exp = _expected("backward")[["key", "t", "px", "bid"]]
    pd.testing.assert_frame_equal(got, exp)


def test_asof_forward_matches_pandas(spark):
    got = _run(spark, "forward")
    exp = _expected("forward")[["key", "t", "px", "bid"]]
    pd.testing.assert_frame_equal(got, exp)


def test_asof_tolerance(spark):
    got = _run(spark, "backward", tolerance=5)
    exp = _expected("backward", tolerance=5)[["key", "t", "px", "bid"]]
    pd.testing.assert_frame_equal(got, exp)


def test_asof_exact_timestamp_is_inclusive(spark):
    got = _run(spark, "backward")
    # trade (a, t=20) must see quote (a, t=20), not the earlier one
    assert got[(got.key == "a") & (got.t == 20)].bid.iloc[0] == 1.9


def test_asof_single_shuffle(spark):
    trades, quotes = _frames()
    out = asof_join(spark.createDataFrame(trades), spark.createDataFrame(quotes),
                    on="t", by="key", right_cols=["bid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union-tag algorithm: exactly one exchange (on the by-key), no join node
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_range_join_matches_bruteforce(spark):
    points = spark.createDataFrame(
        [(t, float(t)) for t in range(0, 100, 7)], "t long, v double")
    intervals = spark.createDataFrame(
        [(i, i * 10, i * 10 + 25) for i in range(9)], "iid long, lo long, hi long")
    got = range_join(points, intervals, point_on="t", lo="lo", hi="hi",
                     bucket_width=10).select("iid", "t")
    brute = points.crossJoin(intervals) \
        .filter((F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi"))) \
        .select("iid", "t")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, brute.collect()))


def test_range_join_inclusive_both(spark):
    points = spark.createDataFrame([(10,), (20,)], "t long")
    intervals = spark.createDataFrame([(1, 0, 10)], "iid long, lo long, hi long")
    left = range_join(points, intervals, point_on="t", lo="lo", hi="hi",
                      bucket_width=5, inclusive="left")
    both = range_join(points, intervals, point_on="t", lo="lo", hi="hi",
                      bucket_width=5, inclusive="both")
    assert left.count() == 0
    assert both.count() == 1
