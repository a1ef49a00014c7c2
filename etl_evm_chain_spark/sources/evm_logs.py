"""Chunked EVM log source (SURVEY §2.A1/A2/H1).

The reference scans ``[start_block, latest]`` in fixed chunks through
a worker pool (`internal/indexer/indexer.go:121-189`). The Spark-first
shape: the chunk list IS the partitioning — ``spark.range`` over block
numbers, re-partitioned so each task owns a contiguous chunk, with the
fetch inside ``mapPartitions``. Tasks are the workers; task retry is
the retry decorator (`internal/sink/retry.go` → spark.task.maxFailures).

Two paths:
- ``read_raw_logs``: pre-landed raw logs (parquet/json) — the normal
  batch path; Catalyst pushes contract/topic filters into the scan.
- ``fetch_logs``: live-RPC-shaped path over block ranges with a
  pluggable fetcher callable (tests inject a deterministic fake; a
  real deployment injects an ``eth_getLogs`` JSON-RPC client). The
  address/topic filter is applied inside the fetcher — source-level
  predicate pushdown (B1), exactly like the reference's server-side
  filtering (`internal/indexer/indexer.go:223-235`).
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from .abi import RAW_LOG_SCHEMA

DEFAULT_CHUNK = 1000  # blocks per fetch, reference `config.go:143-145`

# A fetcher takes (from_block, to_block, addresses, topic0s) and yields
# raw-log dicts with RAW_LOG_SCHEMA fields.
Fetcher = Callable[[int, int, tuple[str, ...], tuple[str, ...]], Iterable[dict]]


def block_chunks(spark: SparkSession, start: int, latest: int,
                 chunk: int = DEFAULT_CHUNK) -> DataFrame:
    """One row per chunk: (from_block, to_block) covering [start, latest].

    Mirrors the job enumeration at `internal/indexer/indexer.go:172-189`.
    """
    return (
        spark.range(start, latest + 1, chunk)
        .select(
            F.col("id").alias("from_block"),
            F.least(F.col("id") + chunk - 1, F.lit(latest)).alias("to_block"),
        )
    )


def fetch_logs(spark: SparkSession, *, start: int, latest: int,
               fetcher: Fetcher, addresses: tuple[str, ...] = (),
               topic0s: tuple[str, ...] = (),
               chunk: int = DEFAULT_CHUNK,
               tasks: int | None = None) -> DataFrame:
    """Distributed chunked fetch: each task pulls its chunks via the
    fetcher and emits raw-log Rows. No driver-side loop, no collect —
    1000 executors each own a slice of the block range.
    """
    chunks = block_chunks(spark, start, latest, chunk)
    if tasks:
        chunks = chunks.repartition(tasks)

    field_names = RAW_LOG_SCHEMA.fieldNames()

    def run(rows: Iterator[Row]) -> Iterator[Row]:
        for r in rows:
            for log in fetcher(r.from_block, r.to_block, addresses, topic0s):
                yield Row(**{k: log.get(k) for k in field_names})

    return spark.createDataFrame(
        chunks.rdd.mapPartitions(run), RAW_LOG_SCHEMA
    )


def read_raw_logs(spark: SparkSession, path: str, *,
                  addresses: tuple[str, ...] = (),
                  topic0s: tuple[str, ...] = ()) -> DataFrame:
    """Pre-landed raw logs with source-level filters (pushed to the
    parquet scan by Catalyst — check `.explain` for PushedFilters)."""
    df = spark.read.schema(RAW_LOG_SCHEMA).parquet(path)
    if addresses:
        df = df.filter(F.lower(F.col("address")).isin(*[a.lower() for a in addresses]))
    if topic0s:
        df = df.filter(F.col("topics")[0].isin(*list(topic0s)))
    return df


def latest_block(df: DataFrame) -> int:
    """Height probe (A2) for pre-landed data: max block in the lake."""
    return df.agg(F.max("block_number")).collect()[0][0]


def fetch_blocks(spark: SparkSession, numbers: DataFrame, *,
                 fetcher) -> DataFrame:
    """Live blocks dim (A3): fetch (block_number, timestamp) headers
    for each DISTINCT block via ``JsonRpcClient.get_block`` inside
    mapPartitions — the reference's per-log memoized header lookup
    (`internal/rpc/client.go:124-148`, `parser.go:119-130`) becomes
    one RPC call per distinct block, distributed. Feed the result to
    ``abi.enrich(decoded, blocks=...)``.
    """
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("block_number", T.LongType()),
        T.StructField("timestamp", T.LongType()),
    ])

    def run(rows: Iterator[Row]) -> Iterator[Row]:
        for r in rows:
            b = fetcher.get_block(int(r["block_number"]))
            if b is not None:
                yield Row(block_number=b["block_number"],
                          timestamp=b["timestamp"])

    distinct = numbers.select("block_number").distinct()
    return spark.createDataFrame(distinct.rdd.mapPartitions(run), schema)
