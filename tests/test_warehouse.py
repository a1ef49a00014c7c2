"""Warehouse operators: MERGE upsert semantics, SCD2, approximate
aggregate accuracy bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_evm_chain_spark.catalog import load_table
from etl_evm_chain_spark.operators.merge import merge_scd2, merge_upsert

from conftest import SF_SMALL


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double")
    source = spark.createDataFrame(
        [(2, "b2", 25.0), (4, "d", 40.0)], "k long, name string, v double")
    got = {r["k"]: (r["name"], r["v"])
           for r in merge_upsert(target, source, key="k").collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 25.0),
                   3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_scd2_versions(spark):
    current = spark.createDataFrame(
        [(1, "x", 100, None), (2, "y", 100, None), (1, "old", 50, 100)],
        "k long, val string, valid_from long, valid_to long")
    updates = spark.createDataFrame(
        [(1, "x2", 200)], "k long, val string, ts long")
    out = merge_scd2(current, updates, key="k", ts_col="ts")
    rows = {(r["k"], r["val"]): (r["valid_from"], r["valid_to"])
            for r in out.collect()}
    assert rows[(1, "old")] == (50, 100)      # historical row untouched
    assert rows[(1, "x")] == (100, 200)       # open row closed at update ts
    assert rows[(1, "x2")] == (200, None)     # new open version
    assert rows[(2, "y")] == (100, None)      # unrelated key untouched


def test_approx_stats_within_bounds(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    approx = li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("a"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50"),
    ).collect()[0]
    exact = li.agg(
        F.countDistinct("l_partkey").alias("e"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("m"),
    ).collect()[0]
    assert abs(approx["a"] - exact["e"]) / exact["e"] < 0.05
    assert abs(approx["p50"] - exact["m"]) / exact["m"] < 0.05


def test_landed_parquet_builds_once_and_rebuilds_on_stale(spark, tmp_path):
    import os

    from etl_evm_chain_spark.catalog import landed_parquet

    src = tmp_path / "src.txt"
    src.write_text("v1")
    builds = []

    def build():
        builds.append(1)
        return spark.range(5).withColumnRenamed("id", "k")

    import uuid

    # unique per run: the landed store is /tmp-persistent, and the
    # utime(1,1) key below would otherwise hit a previous run's copy
    kw = dict(name=f"t_landed_{uuid.uuid4().hex[:8]}",
              src_paths=[str(src)], params="p1")
    assert landed_parquet(spark, build=build, **kw).count() == 5
    assert landed_parquet(spark, build=build, **kw).count() == 5
    assert len(builds) == 1                      # second read served landed

    os.utime(src, (1, 1))                        # new source identity
    assert landed_parquet(spark, build=build, **kw).count() == 5
    assert len(builds) == 2                      # stale key → rebuilt

    kw2 = dict(kw, params="p2")                  # params key separates
    assert landed_parquet(spark, build=build, **kw2).count() == 5
    assert len(builds) == 3


def test_snapshot_diff_classifies_all_four_states(spark):
    from etl_evm_chain_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", None)],
        "id long, v string, w string")
    new = spark.createDataFrame(
        [(2, "b", "y"), (3, "CHANGED", None), (4, "d", "z")],
        "id long, v string, w string")
    got = {r["id"]: r["status"]
           for r in snapshot_diff(old, new, key="id",
                                  compare=["v", "w"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_null_safe_compare(spark):
    from etl_evm_chain_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, None)], "id long, v string")
    new = spark.createDataFrame([(1, None)], "id long, v string")
    assert snapshot_diff(old, new, key="id",
                         compare=["v"]).collect()[0]["status"] == "unchanged"


def test_two_phase_decile_matches_ntile_any_count(spark, tmp_path, monkeypatch):
    """The q87 two-phase tiling must reproduce ntile(10) EXACTLY for
    counts not divisible by 10 (first N%10 tiles get one extra
    contiguous row — round-3 self-review caught a Bresenham-spread
    formula that only agreed on divisible counts)."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_evm_chain_spark.plans.analytics_ext import q_value_deciles

    for n in (25, 1007, 9, 10, 11):
        df = spark.range(n).select(
            F.col("id").alias("o_orderkey"),
            # non-monotone values force real sorting; ties impossible
            # with the unique-key tiebreaker
            ((F.col("id") * 7919) % 1000).cast("double")
            .alias("o_totalprice"),
            F.lit("x").alias("o_orderstatus"))
        d = str(tmp_path / f"sf_{n}")
        os.makedirs(d, exist_ok=True)
        df.write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
        got = {r["decile"]: r["n_orders"]
               for r in q_value_deciles(spark, d).collect()}
        w = Window.orderBy("o_totalprice", "o_orderkey")
        exp_df = (df.withColumn("t", F.ntile(10).over(w))
                  .groupBy("t").count().collect())
        exp = {r["t"]: r["count"] for r in exp_df}
        assert got == exp, (n, got, exp)
