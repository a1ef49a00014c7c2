"""Ingest-format round-trip queries: JSONL and ORC sources.

A training-data pipeline's corpus usually ARRIVES as JSONL (web-scrape
shards) or ORC (warehouse extracts); parquet is what the lake lands,
not what the world sends. These queries prove the non-parquet ingest
plane end-to-end with the q109-style round-trip oracle: Spark exports
the fixture table to the format under test (build-once via the lake),
reads it back through ``sources/files.py``, and the projection must
value-hash-match DuckDB computing the same answer straight from the
parquet fixture — so any loss in the write→read trip (unicode/control
character escaping in JSON, NULL round-tripping, double/timestamp
fidelity in ORC) shows up as a driver hash mismatch, not a silent
corruption.

Scale notes:
- The JSONL read is schema'd (no inference pass) and PERMISSIVE with a
  corrupt-capture column — on a real corpus the malformed lines become
  a quarantinable split rather than lost rows; here zero corrupt rows
  is part of the checked answer (a dropped row changes the counts).
- Both exports land at cluster parallelism (``n_files``), so the
  read-back side scans with full task fan-out — same discipline as the
  synthetic log lakes (catalog.landed_parquet n_files rationale).
- The aggregates use the exact-decimal ``_dsum`` convention from
  ``plans/relational.py`` so double sums hash identically.

Reference parity: the reference's only file formats are CSV scans and
CSV sinks (SURVEY §2 A6/A9-A11; bots read ``data/*.csv`` —
``/root/reference/bots``); JSONL/ORC extend that source plane for the
LLM-data pipeline (task brief: multimodal/text corpora ingest).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import landed_artifact, load_table
from ..sources.files import read_jsonl, read_orc, write_jsonl, write_orc
from . import QuerySpec


def _sf_key(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)) or "sf"


_DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def documents_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table round-tripped through a landed JSONL export,
    read back schema'd + PERMISSIVE (corrupt lines captured)."""
    n_files = spark.sparkContext.defaultParallelism
    path = landed_artifact(
        name="docs_jsonl", src_paths=[os.path.join(sf_dir, "documents.parquet")],
        params=f"{_sf_key(sf_dir)}_f{n_files}",
        write=lambda tmp: write_jsonl(
            load_table(spark, sf_dir, "documents"), tmp, n_files=n_files))
    return read_jsonl(spark, path, _DOCS_SCHEMA)


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents_jsonl(spark, sf_dir)
    # Corrupt lines would change the group counts below → hash mismatch;
    # filtering (rather than asserting driver-side) keeps the plan
    # distributed and the quarantine split explicit.
    clean = docs.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    return (
        clean.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").alias("sum_chars"),
             F.sum(F.length("text").cast("long")).alias("sum_text_len"),
             F.min("doc_id").alias("min_doc"), F.max("doc_id").alias("max_doc"))
        .orderBy("lang", "source"))


ORACLE_JSONL_ROUNDTRIP = """
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


def lineitem_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem round-tripped through a landed ORC export (embedded
    schema; native reader with pushdown/pruning like parquet)."""
    n_files = spark.sparkContext.defaultParallelism
    path = landed_artifact(
        name="lineitem_orc", src_paths=[os.path.join(sf_dir, "lineitem.parquet")],
        params=f"{_sf_key(sf_dir)}_f{n_files}",
        write=lambda tmp: write_orc(
            load_table(spark, sf_dir, "lineitem"), tmp, n_files=n_files))
    return read_orc(spark, path)


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = lineitem_orc(spark, sf_dir)
    # filter BELOW the round-trip so ORC predicate pushdown is on the
    # measured path (explain shows PushedFilters into the ORC scan)
    return (
        li.filter(F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("l_quantity").cast("decimal(18,6)"))
             .cast("double").alias("sum_qty"),
             F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
             .cast("double").alias("sum_price"),
             F.min("l_shipdate").alias("first_ship"),
             F.max("l_shipdate").alias("last_ship"))
        .orderBy("l_returnflag"))


ORACLE_ORC_ROUNDTRIP = """
SELECT l_returnflag,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
       min(l_shipdate) AS first_ship,
       max(l_shipdate) AS last_ship
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


SPECS = [
    QuerySpec("q111_jsonl_roundtrip", q_jsonl_roundtrip,
              ORACLE_JSONL_ROUNDTRIP,
              "JSONL corpus ingest round-trip: schema'd PERMISSIVE read "
              "of a landed newline-JSON export, corrupt-capture column, "
              "lossless unicode/NULL fidelity vs the parquet fixture",
              ("A9", "P1-ingest")),
    QuerySpec("q112_orc_roundtrip", q_orc_roundtrip,
              ORACLE_ORC_ROUNDTRIP,
              "ORC warehouse-extract ingest round-trip: native reader "
              "with pushdown, double/timestamp fidelity vs the parquet "
              "fixture", ("A9", "P1-ingest")),
]
