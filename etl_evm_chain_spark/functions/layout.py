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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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


def zorder_key(df: DataFrame, cols: list[str], *, bits: int = 16,
               out_col: str = "_zkey") -> DataFrame:
    """Morton (Z-order) clustering key over 2+ numeric columns: each
    column quantizes to a ``bits``-bit uniform-width bucket index
    against its [min, max] (one lightweight agg pass, inlined as
    literals), and the indices bit-interleave into one long. Sorting
    files by the key gives
    every column locality at once, so row-group min/max stats prune
    range predicates on ANY of the participating columns — the
    multi-dimensional upgrade of ``land_range_sorted``'s single-key
    clustering. Pure expressions (width_bucket + shifts), no UDF.
    """
    # the interleaved key must fit a signed long: cap bits so
    # len(cols)·bits ≤ 63 (silent truncation would shift the COARSE
    # bucket bits — the ones that cluster — off the top)
    bits = min(bits, 63 // max(1, len(cols)))
    n_buckets = 1 << bits
    # one min/max pass over all participating columns (uniform-width
    # buckets; heavily skewed columns would want quantile boundaries,
    # at the cost of a percentile pass — same interleave either way)
    stats = df.agg(*[f for c in cols
                     for f in (F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
                               F.max(F.col(c).cast("double")).alias(f"mx_{c}"))
                     ]).collect()[0]
    idx_cols = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None or mx <= mn:
            idx_cols.append(F.lit(0).cast("long"))
            continue
        idx = (F.width_bucket(F.col(c).cast("double"), F.lit(float(mn)),
                              F.lit(float(mx)), F.lit(n_buckets)) - 1) \
            .cast("long")
        idx_cols.append(F.greatest(F.lit(0), F.least(idx,
                                                     F.lit(n_buckets - 1))))
    return df.withColumn(out_col, interleave_bits(idx_cols, bits=bits))


def interleave_bits(idx_cols: list, *, bits: int):
    """Morton interleave of ``bits``-bit bucket indices (Column
    expression): bit b of column i lands at position
    ``b·len(cols) + (len(cols) − 1 − i)`` — column 0 owns the most
    significant bit of each round (for 2 columns: ``2b + 1 − i``,
    matching the q116 oracle). Pure shifts and ORs — any engine with
    integer bitwise ops reproduces it exactly."""
    z = F.lit(0).cast("long")
    for b in range(bits - 1, -1, -1):
        for idx in idx_cols:
            z = F.shiftleft(z, 1).bitwiseOR(
                F.shiftright(idx, b).bitwiseAND(F.lit(1).cast("long")))
    return z


def land_zordered(df: DataFrame, path: str, *, by: list[str],
                  bits: int = 8, n_files: int | None = None,
                  mode: str = "overwrite") -> None:
    """Write parquet clustered by the Morton key of ``by`` — range
    predicates on any participating column skip row groups."""
    keyed = zorder_key(df, by, bits=bits)
    out = (keyed.repartitionByRange(n_files, "_zkey") if n_files
           else keyed.repartitionByRange("_zkey"))
    out.sortWithinPartitions("_zkey").drop("_zkey") \
       .write.mode(mode).parquet(path)


def compact_parquet(spark, path: str, *, target_mb: int = 512,
                    sort_within_by: list[str] | None = None) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ⌈total_bytes / target_mb⌉ files. Streaming sinks and incremental
    batch appends accumulate small files whose per-file open/footer
    cost dominates scans at 100 TB; periodic compaction — optionally
    re-sorting within partitions to restore row-group stats tightness
    — is the standard maintenance pass. Returns the new file count.

    Swap semantics: build-aside + two renames. POSIX cannot exchange
    two directories atomically, so there is a moment where ``path`` is
    absent (a true atomic swap needs a table format — Delta/Iceberg —
    whose manifest IS the atomic pointer). On a crash between the
    renames the data survives intact at ``<path>.old-<pid>`` /
    ``<path>.compact-<pid>``; a failed second rename is rolled back.
    Hive-partitioned datasets (``col=value/`` subdirectories) are
    refused rather than silently flattened.
    """
    import os
    import shutil

    subdirs = [d for d in os.listdir(path)
               if os.path.isdir(os.path.join(path, d)) and "=" in d]
    if subdirs:
        raise ValueError(
            f"{path} is hive-partitioned ({subdirs[0]}/ …); compact each "
            "partition directory individually to preserve the layout")

    total = sum(os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(path)
                for f in fs if f.endswith(".parquet"))
    n_files = max(1, -(-total // (target_mb << 20)))
    df = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp = f"{path}.compact-{os.getpid()}"
    out.write.mode("overwrite").parquet(tmp)
    old = f"{path}.old-{os.getpid()}"
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(old, path)               # roll back; original intact
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(old, ignore_errors=True)
    return n_files
