"""Bucketed tables: shuffle-free co-located joins and aggregations.

The reference always pays a per-row lookup for enrichment
(`internal/parser/parser.go:119-130`) and its pandas layer joins
in-memory. At warehouse scale the analogous cost is the shuffle under
every fact⋈fact join; bucketing is Spark's answer — write both tables
hash-partitioned into the same number of buckets on the join key, and
every future equi-join or aggregation on that key reads co-located
buckets with NO Exchange in the plan. For a 100 TB lineitem⋈orders
this removes the single largest network cost in the pipeline; the
write-side cost is paid once.

Bucketed layout only survives through ``saveAsTable`` (the bucket
metadata lives in the catalog, not the parquet footer), hence the
table-based API here rather than plain ``parquet(path)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, *, table: str, key: str | list[str],
                   buckets: int, path: str | None = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (and in-bucket sorted) table.

    Sorting by the bucket key lets sort-merge joins skip the per-task
    sort too (plan shows neither Exchange nor Sort). ``path`` makes it
    an external table (useful for tests / scratch dirs); otherwise the
    session's warehouse dir is used.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.format("parquet").mode(mode) \
        .bucketBy(buckets, keys[0], *keys[1:]) \
        .sortBy(keys[0], *keys[1:])
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With matching bucket counts Catalyst plans a sort-merge join whose
    both sides scan pre-bucketed files — zero Exchange. Broadcast is
    disabled for this plan via a join hint so the shuffle-free property
    is what actually executes (and is assertable in tests).
    """
    lt = spark.table(left_table).hint("merge")
    rt = spark.table(right_table)
    return lt.join(rt, on, how)


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) nodes in the executed plan —
    the metric bucketing is meant to drive to zero."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def write_partitioned(df: DataFrame, path: str, *, keys: list[str],
                      mode: str = "overwrite") -> None:
    """Hive-style directory partitioning — the complement to bucketing:
    bucketing kills join/agg shuffles, partitioning kills scan I/O.
    A filter on a partition key prunes whole directories at plan time
    (`PartitionFilters` in the scan node), so a day-filter over a
    100 TB date-partitioned lake reads one day, not 100 TB. Low-
    cardinality keys only (a per-id directory would melt the metastore
    and produce millions of tiny files)."""
    df.write.mode(mode).partitionBy(*keys).parquet(path)


def partition_filters(df: DataFrame) -> str:
    """The PartitionFilters clause of the scan — empty string when the
    plan would read every partition (the thing to assert against)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            start = line.index("PartitionFilters: [") + len("PartitionFilters: [")
            depth, out = 1, []
            for ch in line[start:]:
                depth += (ch == "[") - (ch == "]")
                if depth == 0:
                    break
                out.append(ch)
            return "".join(out).strip()
    return ""
