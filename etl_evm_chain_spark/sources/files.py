"""File-format ingest/export beyond parquet + CSV: JSONL, ORC, and
raw text lines.

A 100 TB training-data pipeline rarely gets to choose its input
format — web-scrape corpora arrive as (gzipped) JSONL, warehouse
extracts as ORC, raw dumps as newline text. These helpers wrap the
built-in Spark datasources with the pipeline-safe defaults that
actually matter at scale:

- **Never infer schemas.** JSON inference is a full extra pass over
  the data AND widens types nondeterministically across samples;
  every reader here requires an explicit schema (or none, for
  formats like ORC that embed one).
- **Never drop bad records silently.** JSONL readers run PERMISSIVE
  with a ``_corrupt`` capture column so malformed lines are
  quarantinable rows, not lost data (``FAILFAST`` available via
  ``mode``).
- **Land at cluster parallelism.** Exports take ``n_files`` so the
  written file count — every downstream scan's task count — is an
  explicit choice, not whatever the upstream partitioning was.

The reference's only file IO is CSV analytics scans + CSV sinks
(SURVEY §2 A6/A9-A11; ``/root/reference`` bots read
``data/*.csv``); these formats are the LLM-data-pipeline extension
of the same source/sink plane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "read_jsonl", "write_jsonl", "read_orc", "write_orc",
    "read_text_lines",
]


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType, *,
               mode: str = "PERMISSIVE",
               corrupt_col: str = "_corrupt") -> DataFrame:
    """Read newline-delimited JSON with an EXPLICIT schema.

    In ``PERMISSIVE`` mode the returned frame carries ``corrupt_col``:
    NULL for clean rows, the raw line for malformed ones (parse the
    corpus, then ``filter(col(corrupt_col).isNotNull())`` to route the
    quarantine split). The schema requirement is deliberate — see the
    module docstring. Compressed inputs (``.gz``) are handled
    transparently by the datasource, and the reader is
    glob/directory-friendly like every Spark path.

    Implementation: a splittable text scan + ``from_json`` rather than
    ``spark.read.json`` — the native JSON source REFUSES any query
    whose referenced columns are only the corrupt record
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) unless the
    parsed frame is cached first, and caching a 100 TB corpus to count
    its bad lines is not a plan. ``from_json`` runs the same
    JacksonParser but yields the corrupt capture as an ordinary
    computed column with no such restriction, and Catalyst still
    prunes unused fields out of the parse (OptimizeJsonExprs).
    """
    if mode.upper() == "PERMISSIVE" and corrupt_col not in schema.names:
        full = T.StructType(
            list(schema.fields) + [T.StructField(corrupt_col,
                                                 T.StringType())])
    else:
        full = schema
    return _parse_jsonl_lines(spark.read.text(path), full, mode,
                              corrupt_col)


def _parse_jsonl_lines(raw: DataFrame, full: T.StructType, mode: str,
                       corrupt_col: str) -> DataFrame:
    """Shared parse for the batch and streaming JSONL readers.

    Two non-record line shapes that ``from_json`` does NOT route to
    the corrupt capture (it returns a NULL struct instead, which a
    bare ``_j.*`` would surface as a phantom all-NULL "clean" row):

    - whitespace-only lines: skipped entirely — the JSONL convention
      treats blank lines as separators, not records;
    - lines whose JSON value is not an object (a literal ``null``,
      a bare scalar): captured verbatim into ``corrupt_col`` so they
      quarantine like any other malformed line.
    """
    lines = raw.filter(F.trim("value") != "")
    parsed = lines.select(
        "value",
        F.from_json("value", full,
                    {"mode": mode, "columnNameOfCorruptRecord": corrupt_col}
                    ).alias("_j"))
    cols = [F.col(f"_j.{f.name}").alias(f.name) for f in full.fields
            if f.name != corrupt_col]
    if corrupt_col in full.names:
        cols.append(
            F.when(F.col("_j").isNull(), F.col("value"))
            .otherwise(F.col(f"_j.{corrupt_col}")).alias(corrupt_col))
    return parsed.select(*cols)


def write_jsonl(df: DataFrame, path: str, *, n_files: int | None = None,
                compression: str | None = None,
                ignore_null: bool = False) -> None:
    """Export as newline-delimited JSON (one object per line).

    ``ignore_null=False`` keeps NULL fields as explicit ``null`` keys
    so a round-trip through :func:`read_jsonl` reproduces the schema
    even when an entire file's worth of a column is NULL.
    """
    if n_files:
        df = df.repartition(n_files)
    w = df.write.mode("overwrite").option(
        "ignoreNullFields", "true" if ignore_null else "false")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_orc(spark: SparkSession, path: str,
             schema: T.StructType | None = None) -> DataFrame:
    """Read ORC (schema embedded in the file footer; pass ``schema``
    only to pin/prune — Spark pushes filters and prunes columns into
    the native ORC reader the same as parquet)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(df: DataFrame, path: str, *, n_files: int | None = None,
              compression: str = "zlib") -> None:
    if n_files:
        df = df.repartition(n_files)
    (df.write.mode("overwrite").option("compression", compression)
     .orc(path))


def read_text_lines(spark: SparkSession, path: str, *,
                    with_file: bool = False) -> DataFrame:
    """Raw corpus lines: one row per line in column ``value``; with
    ``with_file`` adds the source path (lineage for
    mixture/provenance accounting). Splittable for uncompressed
    inputs; a ``.gz`` file is one task — recompress or pre-split
    large gzipped dumps before reading at scale."""
    df = spark.read.text(path)
    if with_file:
        df = df.withColumn("src_file", F.input_file_name())
    return df
