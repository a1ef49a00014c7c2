"""Incremental materialized-aggregate maintenance (algebraic state).

The reference recomputes its analytics from full CSV scans every run
(``/root/reference/bots`` reload ``data/*.csv`` per invocation); at
100 TB a pipeline instead maintains a MATERIALIZED aggregate and folds
each new batch into it. The classic warehouse treatment: keep the
aggregate's ALGEBRAIC state — per group ``(n, sum, min, max)`` — which
forms a commutative monoid under ``merge_states``, so

    state(A ∪ B) == merge(state(A), state(B))

for any partitioning of the input into batches, in any order, with
empty batches as the identity. Derived measures (avg) are computed
only at ``finalize_state`` time, never stored — finalizing is a pure
projection, so the landed state stays mergeable forever.

Scale shape:
- ``aggregate_state`` is a plain hash aggregate (map-side partials);
  each incremental batch touches only ITS groups.
- ``merge_states`` shuffles on the group key once, and the left side
  is the (small, |groups|-sized) state, not the fact table — the fact
  table is scanned exactly once ever, at its arrival batch.
- Sums use exact decimals (``decimal(38,6)``) so incremental vs
  one-shot agree bit-for-bit — a double sum would drift with fold
  order and break both the monoid law and the DuckDB oracle.

The streaming twin is ``foreachBatch(merge into landed state)`` with
the epoch-ledger idempotence used by ``stream_token_sketch``
(streaming/pipeline.py); the batch operators here are the fold.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUM_TYPE = "decimal(38,6)"


def aggregate_state(df: DataFrame, keys: str | Sequence[str],
                    value: str) -> DataFrame:
    """Algebraic aggregate state of ``value`` per ``keys``:
    ``(*keys, n, sum, min, max)``. NULL values count toward no
    measure (SQL aggregate semantics) but rows still exist: groups
    whose values are all NULL get n=0 and NULL sum/min/max."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    v = F.col(value)
    return df.groupBy(*ks).agg(
        F.count(v).cast("long").alias("n"),
        F.sum(v.cast(_SUM_TYPE)).alias("sum"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
    )


def merge_states(a: DataFrame, b: DataFrame,
                 keys: str | Sequence[str]) -> DataFrame:
    """Monoid combine: union the states and re-fold per group. Every
    state column folds with its own combiner (n/sum add, min/max
    lattice), so merge is associative + commutative and the empty
    state is the identity."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    return a.unionByName(b).groupBy(*ks).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum(F.col("sum").cast(_SUM_TYPE)).alias("sum"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
    )


def finalize_state(state: DataFrame) -> DataFrame:
    """Pure projection adding derived measures (avg as double; NULL
    for all-NULL groups). The input state is untouched/re-mergeable."""
    return state.select(
        *[c for c in state.columns],
        F.when(F.col("n") > 0,
               F.col("sum").cast("double") / F.col("n"))
         .alias("avg"),
    )
