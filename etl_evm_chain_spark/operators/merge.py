"""MERGE INTO (upsert) emulation without a table format.

Delta/Iceberg jars aren't in this environment; the classic emulation
is anti-join + union (per the standard Spark playbook): rows of the
target whose key has no update survive, updated/new rows come from
the source. With a table format this becomes a real MERGE INTO; the
logical semantics (and this operator's output) are identical.

Scale: one shuffle on the merge key for the anti join; the union is
free (no shuffle). For partitioned targets, pair with dynamic
partition overwrite so only touched partitions rewrite.

Also provides SCD2 (`merge_scd2`): expire current rows that changed
and append new versions with validity ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, *,
                 key: str | list[str]) -> DataFrame:
    """UPDATE matched + INSERT unmatched (whole-row update semantics).

    Column sets must match (unionByName enforces it).
    """
    keys = [key] if isinstance(key, str) else list(key)
    kept = target.join(source.select(*keys), keys, "left_anti")
    return kept.unionByName(source)


def merge_scd2(current: DataFrame, updates: DataFrame, *,
               key: str | list[str], ts_col: str,
               valid_from: str = "valid_from",
               valid_to: str = "valid_to") -> DataFrame:
    """Slowly-changing-dimension type 2: close out changed rows
    (valid_to = update ts) and append the new versions as open rows
    (valid_to = NULL). `current` must carry valid_from/valid_to."""
    keys = [key] if isinstance(key, str) else list(key)
    upd_keys = updates.select(*keys, F.col(ts_col).alias("_new_ts"))
    closed = (
        current.join(F.broadcast(upd_keys), keys, "inner")
        .filter(F.col(valid_to).isNull())
        .withColumn(valid_to, F.col("_new_ts"))
        .drop("_new_ts")
    )
    untouched = (
        current.join(upd_keys.select(*keys), keys, "left_anti")
        .unionByName(
            current.join(F.broadcast(upd_keys.select(*keys)), keys, "left_semi")
            .filter(F.col(valid_to).isNotNull())
        )
    )
    opened = (
        updates.withColumn(valid_from, F.col(ts_col))
        .withColumn(valid_to, F.lit(None).cast(current.schema[valid_to].dataType))
        .drop(ts_col) if ts_col not in current.columns
        else updates.withColumn(valid_from, F.col(ts_col))
        .withColumn(valid_to, F.lit(None).cast(current.schema[valid_to].dataType))
    )
    return untouched.unionByName(closed).unionByName(opened, allowMissingColumns=True)
