"""Skew-handling kit: salted aggregation and salted broadcast-side
replication for hot keys.

AQE (`spark.sql.adaptive.skewJoin.enabled`, on in session.py) handles
sort-merge-join skew at runtime by splitting oversized partitions.
These helpers cover the cases AQE does not:

- ``salted_agg``: a high-cardinality aggregation where ONE key owns a
  large share of rows (e.g. a zero-address contract, a bot wallet).
  Two-phase: aggregate on (key, salt) map-side-combinable partials,
  then merge partials per key. Works for any algebraic aggregate.
- ``replicated_skew_join``: fact⋈dim equi-join where fact keys are
  hot but the dim is broadcastable per hot key: explode the dim with
  all salt values, salt the fact randomly — every fact row still
  matches exactly one replicated dim row, and the hot key spreads
  over ``n_salts`` tasks.

Salting uses a deterministic hash of stable columns when provided
(reproducible plans beat rand() for debugging and for the oracle).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(n_salts: int, *stable_cols: str | Column) -> Column:
    """Deterministic salt in [0, n_salts): xxhash of stable columns
    (falls back to a random salt when none are given)."""
    if stable_cols:
        cols = [F.col(c) if isinstance(c, str) else c for c in stable_cols]
        return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")
    return (F.rand() * n_salts).cast("int")


def salted_agg(df: DataFrame, *, key: str, n_salts: int,
               partials: dict[str, tuple[Column, Column]],
               stable_cols: Sequence[str] = ()) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``partials`` maps output name → (phase1_agg_expr, phase2_merge_expr)
    where phase2 operates on the phase-1 column of the same name, e.g.::

        salted_agg(ev, key="user_id", n_salts=32, partials={
            "n":     (F.count(F.lit(1)),        F.sum("n")),
            "v_sum": (F.sum("value"),           F.sum("v_sum")),
            "v_max": (F.max("value"),           F.max("v_max")),
        })

    Phase 1 shuffles on (key, salt) — the hot key spreads over
    n_salts reducers; phase 2 merges n_salts rows per key (tiny).
    """
    salted = df.withColumn("_salt", salt_column(n_salts, *stable_cols))
    phase1 = salted.groupBy(key, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in partials.items()])
    return phase1.groupBy(key).agg(
        *[merge.alias(name) for name, (_, merge) in partials.items()])


def replicated_skew_join(fact: DataFrame, dim: DataFrame, *, key: str,
                         n_salts: int,
                         stable_cols: Sequence[str] = ()) -> DataFrame:
    """Equi-join with the dim side replicated across n_salts salts.

    Each fact row gets one salt; the dim is exploded to every salt, so
    the join key becomes (key, salt) and the hot key's rows land on
    n_salts tasks instead of one. Dim grows n_salts× — keep it
    broadcast-sized per replica.
    """
    fact_s = fact.withColumn("_salt", salt_column(n_salts, *stable_cols))
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = fact_s.join(dim_s, [key, "_salt"])
    return out.drop("_salt")
