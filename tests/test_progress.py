"""Batch resume cursor + partition-pruned layout tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_evm_chain_spark.functions.bucketing import (
    partition_filters,
    write_partitioned,
)
from etl_evm_chain_spark.sources import progress as pg
from etl_evm_chain_spark.sources.abi import RAW_LOG_SCHEMA, decode_event
from tests.test_evm import SWAPISH, _mklog, _word


def _raw(spark, blocks):
    return spark.createDataFrame(
        [_mklog([SWAPISH.topic0, "0x" + _word(b)], [_word(b * 10), _word(b)],
                block=b, idx=b) for b in blocks],
        RAW_LOG_SCHEMA)


def test_incremental_decode_resumes_from_watermark(spark, tmp_path):
    prog = str(tmp_path / "progress")
    out = str(tmp_path / "decoded")
    decode = lambda df: decode_event(df, SWAPISH, contract_name="Pool")  # noqa: E731

    # run 1: blocks 1-5 land
    n1 = pg.incremental_decode(spark, raw=_raw(spark, [1, 2, 3, 4, 5]),
                               progress_path=prog, out_dir=out,
                               decode=decode, latest=5)
    assert n1 == 5
    assert pg.read_watermark(spark, prog) == 5

    # run 2: same lake now holds blocks 1-8 → only 6-8 decode
    n2 = pg.incremental_decode(spark, raw=_raw(spark, list(range(1, 9))),
                               progress_path=prog, out_dir=out,
                               decode=decode, latest=8)
    assert n2 == 3
    got = spark.read.parquet(out)
    assert got.count() == 8                      # no re-decode duplicates
    assert pg.read_watermark(spark, prog) == 8

    # run 3: caught up → no-op
    assert pg.incremental_decode(spark, raw=_raw(spark, list(range(1, 9))),
                                 progress_path=prog, out_dir=out,
                                 decode=decode, latest=8) == 0


def test_resume_bounds_fresh_and_caught_up(spark, tmp_path):
    prog = str(tmp_path / "p2")
    assert pg.resume_bounds(spark, prog, start=10, latest=20) == (10, 20)
    pg.commit_watermark(spark, prog, 15)
    assert pg.resume_bounds(spark, prog, start=10, latest=20) == (16, 20)
    pg.commit_watermark(spark, prog, 20)
    assert pg.resume_bounds(spark, prog, start=10, latest=20) is None
    # watermark is monotone even after an out-of-order append
    pg.commit_watermark(spark, prog, 12)
    assert pg.read_watermark(spark, prog) == 20


def test_partitioned_write_prunes_scan(spark, tmp_path):
    path = str(tmp_path / "by_day")
    df = spark.createDataFrame(
        [(i, "2024-01-%02d" % (i % 5 + 1), float(i)) for i in range(100)],
        "id long, day string, v double")
    write_partitioned(df, path, keys=["day"])

    pruned = spark.read.parquet(path).filter(F.col("day") == "2024-01-03")
    assert "day" in partition_filters(pruned)    # directory-level pruning
    assert pruned.count() == 20

    full = spark.read.parquet(path)
    assert partition_filters(full) == ""         # nothing to prune


def test_incremental_decode_replay_is_idempotent(spark, tmp_path):
    """Crash between the data write and the cursor commit: the replay
    must overwrite its own increment directory — even when `latest`
    moved in between — never append a duplicate copy."""
    prog = str(tmp_path / "p_replay")
    out = str(tmp_path / "d_replay")
    decode = lambda df: decode_event(df, SWAPISH, contract_name="Pool")  # noqa: E731

    pg.incremental_decode(spark, raw=_raw(spark, [1, 2, 3]),
                          progress_path=prog, out_dir=out,
                          decode=decode, latest=3)

    # crash-sim: run the increment for 4-6 but skip the cursor commit
    real_commit = pg.commit_watermark
    try:
        pg.commit_watermark = lambda *a, **k: None
        pg.incremental_decode(spark, raw=_raw(spark, [1, 2, 3, 4, 5, 6]),
                              progress_path=prog, out_dir=out,
                              decode=decode, latest=6)
    finally:
        pg.commit_watermark = real_commit
    assert pg.read_watermark(spark, prog) == 3   # cursor never moved

    # replay with MORE data available (latest moved 6 -> 7)
    n = pg.incremental_decode(spark, raw=_raw(spark, list(range(1, 8))),
                              progress_path=prog, out_dir=out,
                              decode=decode, latest=7)
    assert n == 4
    got = spark.read.parquet(out)
    assert got.count() == 7                      # no duplicates
    assert got.select("block_number").distinct().count() == 7


def test_incremental_decode_refuses_legacy_flat_layout(spark, tmp_path):
    """Round-4 advice: an out_dir populated by the pre-round-4 flat
    append layout (root-level parquet files) must fail loudly — mixing
    it with inc= partition dirs breaks partition discovery and would
    double-count the already-decoded rows."""
    import pytest

    prog = str(tmp_path / "progress_legacy")
    out = str(tmp_path / "decoded_legacy")
    # simulate the old layout: data files directly under out_dir
    spark.range(3).coalesce(1).write.parquet(out)
    decode = lambda df: decode_event(df, SWAPISH, contract_name="Pool")  # noqa: E731
    with pytest.raises(ValueError, match="flat-append layout"):
        pg.incremental_decode(spark, raw=_raw(spark, [1, 2, 3]),
                              progress_path=prog, out_dir=out,
                              decode=decode, latest=3)
