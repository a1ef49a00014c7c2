"""Tests for the two-phase bucketed-ranking kit
(functions/ranking.py) and the queries built on it (q53/q87/q15) —
including correctness under a NON-default
``spark.sql.shuffle.partitions`` (the bucket counts derive from it, so
a changed setting must change only the plan, never the answer; VERDICT
r3 ask #3)."""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_evm_chain_spark.functions.ranking import bucketed_rank, scaled_buckets

from conftest import SF_SMALL


@contextmanager
def shuffle_partitions(spark, n: int):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _window_rank(df, order_cols, part_cols=()):
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return df.withColumn("_want", F.row_number().over(w).cast("long"))


def test_bucketed_rank_equals_window_rank_global(spark):
    rows = [(i, float((i * 37) % 101) / 7.0) for i in range(500)]
    # duplicate values so ties exercise the within-bucket tiebreak
    rows += [(1000 + i, rows[i][1]) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = bucketed_rank(df, "v", ["v", "id"], n_buckets=13,
                        rank_name="r", total_name="t").collect()
    want = {(r["id"]): r["_want"]
            for r in _window_rank(df, ["v", "id"]).collect()}
    assert len(got) == 550
    for r in got:
        assert r["r"] == want[r["id"]]
        assert r["t"] == 550


def test_bucketed_rank_equals_window_rank_grouped(spark):
    rows = [(i, i % 3, float((i * 53) % 89)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g int, v double")
    got = bucketed_rank(df, "v", ["v", "id"], part_cols=("g",),
                        n_buckets=7, rank_name="r",
                        total_name="t").collect()
    want = {r["id"]: r["_want"]
            for r in _window_rank(df, ["v", "id"], ["g"]).collect()}
    for r in got:
        assert r["r"] == want[r["id"]]
        assert r["t"] == 100


def test_bucketed_rank_single_value_degenerate(spark):
    # all rows share one value → one bucket holds everything; the
    # width floor (1e-9) must not divide by zero and ranks stay exact
    df = spark.createDataFrame([(i, 5.0) for i in range(20)],
                               "id long, v double")
    got = sorted(r["r"] for r in bucketed_rank(
        df, "v", ["v", "id"], n_buckets=8, rank_name="r").collect())
    assert got == list(range(1, 21))


def test_bucketed_rank_requires_value_leading_order(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError, match="lead"):
        bucketed_rank(df, "v", ["id", "v"])


def test_scaled_buckets_tracks_shuffle_partitions(spark):
    with shuffle_partitions(spark, 100):
        assert scaled_buckets(spark) == 200
    with shuffle_partitions(spark, 3):
        assert scaled_buckets(spark) == 16      # floor
    with shuffle_partitions(spark, 5000):
        assert scaled_buckets(spark) == 4096    # cap


def test_rank_queries_invariant_to_shuffle_partitions(spark):
    """q53/q87/q15 must return identical answers when
    spark.sql.shuffle.partitions (hence the derived bucket counts)
    changes — the bucket count is a physical knob, not a semantic one."""
    from etl_evm_chain_spark.plans.analytics_ext import q_value_deciles
    from etl_evm_chain_spark.plans.relational import q_time_split
    from etl_evm_chain_spark.plans.warehouse import q_approx_stats

    for fn in (q_approx_stats, q_value_deciles, q_time_split):
        base = sorted(map(tuple, fn(spark, SF_SMALL).collect()))
        with shuffle_partitions(spark, 7):
            alt = sorted(map(tuple, fn(spark, SF_SMALL).collect()))
        assert alt == base, fn.__name__
