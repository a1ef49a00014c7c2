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


def mysql_jdbc_url(host: str, db: str, *, port: int = 3306,
                   user: str | None = None,
                   password: str | None = None) -> str:
    """MySQL JDBC URL with the flags a bulk event sink needs:
    rewriteBatchedStatements turns Spark's per-row INSERT batches into
    multi-row statements (~10× on MySQL), and a UTC session timezone
    keeps TIMESTAMP columns aligned with the engine's UTC convention.
    """
    from urllib.parse import quote_plus

    creds = ""
    if user is not None:
        # URL-encode: an '&'/'%'/'#' in a password would otherwise be
        # parsed as URL structure and silently detach the flags below
        creds = f"user={quote_plus(user)}&" + (
            f"password={quote_plus(password)}&"
            if password is not None else "")
    return (f"jdbc:mysql://{host}:{port}/{db}?{creds}"
            "rewriteBatchedStatements=true&connectionTimeZone=UTC")


def mysql_ddl(df: DataFrame, table: str, *, event=None) -> str:
    """CREATE TABLE DDL in MySQL dialect from the ABI-derived schema —
    the analog of the reference's GORM auto-migrate for its declared
    MySQL sink (`README.md:168-172`, `internal/sink/mysql.go:3`).
    Emitted as a string (executed via JDBC ``createTableOptions`` or
    out-of-band) so the mapping is testable without a server: no MySQL
    exists in CI, and the write path itself is exercised against
    embedded Derby (tests/test_evm.py).

    Type mapping notes: addresses/hashes are fixed-width hex →
    VARCHAR(66) (indexable, unlike TEXT). The fixed-width set covers
    the meta columns (tx_hash/tx_from/contract/address) and ``_hex``
    twins by name; pass the decoded ``event`` (AbiEvent) to also map
    its address/bytesN-typed params — schema alone cannot tell an
    address string from free text.
    """
    from pyspark.sql import types as T

    hex_width: dict[str, int] = {}
    if event is not None:
        for inp in event.inputs:
            if inp.type == "address":
                hex_width[inp.name] = 42
            elif (inp.type.startswith("bytes") and inp.type != "bytes"
                  and inp.type[5:].isdigit()):
                hex_width[inp.name] = 2 + 2 * int(inp.type[5:])

    def mysql_type(f: T.StructField) -> str:
        dt = f.dataType
        if isinstance(dt, T.LongType):
            return "BIGINT"
        if isinstance(dt, T.IntegerType):
            return "INT"
        if isinstance(dt, T.DoubleType):
            return "DOUBLE"
        if isinstance(dt, T.BooleanType):
            return "TINYINT(1)"
        if isinstance(dt, T.DecimalType):
            return f"DECIMAL({dt.precision},{dt.scale})"
        if isinstance(dt, T.TimestampType):
            return "TIMESTAMP"
        if isinstance(dt, T.StringType):
            if f.name in hex_width:
                return f"VARCHAR({max(hex_width[f.name], 42)})"
            # hex-valued meta columns are fixed-width: 0x + 64
            # (hashes) is the widest; VARCHAR beats TEXT for indexes
            if f.name in ("tx_hash", "tx_from", "contract", "address") \
                    or f.name.endswith("_hex"):
                return "VARCHAR(66)"
            return "TEXT"
        raise NotImplementedError(
            f"no MySQL mapping for column {f.name}: {dt.simpleString()} "
            "(project complex types to scalars before a JDBC sink)")

    cols = ",\n  ".join(f"`{f.name}` {mysql_type(f)}"
                        for f in df.schema.fields)
    return f"CREATE TABLE IF NOT EXISTS `{table}` (\n  {cols}\n)"


def export_signals_csv(df: DataFrame, path: str) -> None:
    """Single-file signals export (A11,
    `stable_fee_ml_bot.py:330-333` pyc). coalesce(1) is fine here:
    signal sets are tiny by construction (top-k per market)."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
