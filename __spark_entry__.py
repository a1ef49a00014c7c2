"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``etl_evm_chain_spark/``; this module is the
thin contract surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_evm_chain_spark.plans import registry as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The consensus-deviation pipeline (SURVEY §7 minimum slice):
    resample `events.value` per event_type onto a 1-minute grid,
    forward-fill, cross-type consensus mean, rolling z-score of the
    deviation, return rows where |z| ≥ 2.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_evm_chain_spark.catalog import load_table
    from etl_evm_chain_spark.functions.timeseries import (
        resample_ffill, rolling_mean_std, zscore,
    )

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events")
    dense = resample_ffill(ev, ts="ts", key="event_type", value="value",
                           seconds=60)
    wb = Window.partitionBy("bucket_ts")
    dense = dense.withColumn(
        "consensus",
        F.avg("value").over(wb),
    ).withColumn("dev", F.col("value") - F.col("consensus"))
    rolled = rolling_mean_std(dense, value="dev", key="event_type",
                              order="bucket_ts", n=30, min_periods=30, ddof=0)
    out = (
        rolled.withColumn("z", zscore("dev", "roll_mean", "roll_std"))
        .filter(F.abs(F.col("z")) >= 2.0)
        .select("event_type", "bucket_ts", "value", "consensus",
                "dev", "roll_mean", "roll_std", "z")
        .orderBy("event_type", "bucket_ts")
    )
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    ops → driver records a rows-only check)."""
    return _registry.oracle_sql()
