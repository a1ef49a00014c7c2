"""Physical data layout for scan pruning (the 100 TB storage contract).

Complements ``functions/bucketing.py`` (hash bucketing → 0-Exchange
equi-joins) with the other half of warehouse layout: *range-sorted*
files whose parquet row-group min/max statistics turn key-range
predicates into row-group (and, within a group, page) skipping.

At 100 TB the difference is structural: a time-range query over an
unsorted lake decodes every row group of every file because each
group's [min,max] spans the whole keyspace; over a range-sorted lake
the reader's pushed filter eliminates all but the overlapping groups
from the footer stats alone — I/O proportional to the answer, not
the table. The reference has no layout story at all (single CSV per
event, `internal/sink/csv.go:65`); this is the Spark-first upgrade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def land_range_sorted(df: DataFrame, path: str, *, by: list[str],
                      n_files: int | None = None,
                      mode: str = "overwrite") -> None:
    """Write ``df`` as parquet with disjoint key ranges per file:
    ``repartitionByRange`` (sampled range boundaries → one task per
    range) then ``sortWithinPartitions`` so every row group's min/max
    is tight. ``n_files`` caps output files (defaults to
    spark.sql.shuffle.partitions)."""
    out = (df.repartitionByRange(n_files, *by) if n_files
           else df.repartitionByRange(*by))
    out.sortWithinPartitions(*by).write.mode(mode).parquet(path)


def scan_metrics(df: DataFrame) -> dict:
    """Executed-plan metrics of the (first) file scan after an action —
    numFiles / numOutputRows / filesSize — the observable proof that a
    layout prunes. Test/diagnostic helper; collects THIS df (an
    aggregate like count() would plan its own execution and leave
    these metrics untouched).
    """
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()  # noqa: SLF001
    m = leaves.apply(0).metrics()
    it = m.iterator()
    out = {}
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out
