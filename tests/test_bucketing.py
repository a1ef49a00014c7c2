"""Bucketed-table co-location: the join must plan with zero Exchange."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_evm_chain_spark.catalog import load_table
from etl_evm_chain_spark.functions.bucketing import (
    colocated_join,
    exchange_count,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    write_bucketed(load_table(spark, SF, "orders"),
                   table="b_orders", key="o_orderkey", buckets=8,
                   path=str(base / "orders"))
    write_bucketed(
        load_table(spark, SF, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"),
        table="b_lineitem", key="o_orderkey", buckets=8,
        path=str(base / "lineitem"))
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_colocated_join_has_no_shuffle(spark, bucketed):
    joined = colocated_join(spark, "b_lineitem", "b_orders", "o_orderkey")
    agg = joined.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    # join on the bucket key: both scans are pre-partitioned → 0 Exchange;
    # the follow-on groupBy on the same key reuses the bucketing too
    assert exchange_count(agg) == 0


def test_colocated_join_matches_plain_join(spark, bucketed):
    joined = colocated_join(spark, "b_lineitem", "b_orders", "o_orderkey")
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
    assert joined.count() == plain.count()


def test_unbucketed_join_does_shuffle(spark):
    li = load_table(spark, SF, "lineitem").hint("merge")
    orders = load_table(spark, SF, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey) \
        .groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    assert exchange_count(j) > 0


def test_range_sorted_layout_prunes_row_groups(spark, tmp_path):
    """A key-range filter over a range-sorted lake must decode a small
    fraction of the rows (row-group min/max skipping); the same filter
    over a key-shuffled layout decodes far more."""
    from pyspark.sql import functions as F

    from etl_evm_chain_spark.functions.layout import (land_range_sorted,
                                                      scan_metrics)

    n = 200_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"))

    sorted_path = str(tmp_path / "sorted")
    land_range_sorted(df, sorted_path, by=["k"], n_files=8)
    shuffled_path = str(tmp_path / "shuffled")
    # order by a hash → every row group spans the whole key range
    df.orderBy("payload").coalesce(8).write.parquet(shuffled_path)

    pred = (F.col("k") >= 10_000) & (F.col("k") < 12_000)
    m_sorted = scan_metrics(spark.read.parquet(sorted_path).filter(pred))
    m_shuffled = scan_metrics(spark.read.parquet(shuffled_path).filter(pred))

    assert m_sorted["numOutputRows"] < n * 0.2          # groups skipped
    assert m_sorted["numOutputRows"] < m_shuffled["numOutputRows"]
    # correctness unchanged by layout
    assert spark.read.parquet(sorted_path).filter(pred).count() == 2_000


def test_zorder_layout_prunes_on_both_dimensions(spark, tmp_path):
    """Morton-key clustering trades a little single-column locality
    for pruning on EVERY participating column: the x-sorted layout
    cannot skip anything for a y filter, the z-ordered one skips on
    both."""
    from pyspark.sql import functions as F

    from etl_evm_chain_spark.functions.layout import (land_range_sorted,
                                                      land_zordered,
                                                      scan_metrics)

    n = 200_000
    df = spark.range(n).select(
        (F.col("id") % 500).alias("x"),
        F.floor(F.col("id") / 500).alias("y"),
        F.md5(F.col("id").cast("string")).alias("payload"))
    zo, xs = str(tmp_path / "zo"), str(tmp_path / "xs")
    land_zordered(df, zo, by=["x", "y"], bits=8, n_files=16)
    land_range_sorted(df, xs, by=["x"], n_files=16)

    fx = (F.col("x") >= 100) & (F.col("x") < 120)
    fy = (F.col("y") >= 100) & (F.col("y") < 120)
    z, x = spark.read.parquet(zo), spark.read.parquet(xs)
    assert scan_metrics(x.filter(fy))["numOutputRows"] == n   # no skip
    # row-group sizing varies with writer memory pressure; the point
    # is material skipping on BOTH dims, not an exact fraction
    assert scan_metrics(z.filter(fy))["numOutputRows"] < n * 0.7
    assert scan_metrics(z.filter(fx))["numOutputRows"] < n * 0.7
    # correctness unchanged by layout
    assert z.filter(fx).count() == x.filter(fx).count() \
        == df.filter(fx).count()


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    from etl_evm_chain_spark.functions.layout import compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(50_000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("p"))
    df.repartition(64).write.parquet(path)          # 64 small files
    import glob
    assert len(glob.glob(f"{path}/*.parquet")) == 64
    before = spark.read.parquet(path).agg(F.sum("id")).collect()[0][0]
    n = compact_parquet(spark, path, target_mb=512)
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) == n == 1                      # tiny table → 1 file
    assert spark.read.parquet(path).agg(F.sum("id")).collect()[0][0] == before


def test_interleave_bits_positions(spark):
    # bit b of dim i lands at position 2b + 1 - i (dim 0 higher).
    from etl_evm_chain_spark.functions.layout import interleave_bits
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0b10, 0b01), (0b11, 0b11), (0, 0), (0b11, 0)],
        "x long, y long")
    got = [r["z"] for r in df.select(
        interleave_bits([F.col("x"), F.col("y")], bits=2)
        .alias("z")).collect()]
    # x=10,y=01 → z bits (x1 y1 x0 y0) = 1001; 11/11 → 1111; 11/00 → 1010
    assert got == [0b1001, 0b1111, 0, 0b1010]
