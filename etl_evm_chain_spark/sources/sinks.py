"""Sinks (SURVEY §2.A6/A7/A8/A11).

The reference writes one CSV per (contract, event) behind a mutex
(`internal/sink/csv.go:50-118`) and declares-but-stubs a MySQL sink
(`internal/sink/mysql.go:3`). The Spark shape removes the shared-sink
bottleneck entirely: partitioned writers emit per-partition files
under ``contract_name=X/event_name=Y/`` directories, and the JDBC
sink is the built-in writer. Retry (A8) is platform-level
(spark.task.maxFailures; foreachBatch retries in streaming) instead
of a hand-rolled decorator (`internal/sink/retry.go:29-63`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_event_csv(df: DataFrame, out_dir: str, *, mode: str = "append") -> None:
    """CSV sink partitioned by (contract_name, event_name) — the
    distributed analog of one-file-per-event (`csv.go:65,84-99`).
    Headers are schema-driven, not first-row-frozen (SURVEY §7 hard
    part 4: we deliberately fix that fragility)."""
    (df.write.mode(mode)
       .partitionBy("contract_name", "event_name")
       .option("header", True)
       .csv(out_dir))


def write_event_parquet(df: DataFrame, out_dir: str, *, mode: str = "append") -> None:
    """Parquet sink, same layout — the scale-correct default (columnar,
    pushdown-friendly, ~10× smaller than CSV)."""
    (df.write.mode(mode)
       .partitionBy("contract_name", "event_name")
       .parquet(out_dir))


def write_event_jdbc(df: DataFrame, url: str, *, event_name: str,
                     mode: str = "append", **options) -> None:
    """JDBC sink: one table per event, types from the ABI-derived
    schema (implements the declared-but-stubbed MySQL sink,
    `README.md:168-172`)."""
    (df.write.mode(mode)
       .format("jdbc")
       .option("url", url)
       .option("dbtable", f"event_{event_name}")
       .options(**options)
       .save())


def export_signals_csv(df: DataFrame, path: str) -> None:
    """Single-file signals export (A11,
    `stable_fee_ml_bot.py:330-333` pyc). coalesce(1) is fine here:
    signal sets are tiny by construction (top-k per market)."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
