"""Incremental materialized-aggregate maintenance (algebraic state).

The reference recomputes its analytics from full CSV scans every run
(``/root/reference/bots`` reload ``data/*.csv`` per invocation); at
100 TB a pipeline instead maintains a MATERIALIZED aggregate and folds
each new batch into it. The classic warehouse treatment: keep the
aggregate's ALGEBRAIC state — per group ``(n, sum, sumsq, min, max)``
— which forms a commutative monoid under ``merge_states``, so

    state(A ∪ B) == merge(state(A), state(B))

for any partitioning of the input into batches, in any order, with
empty batches as the identity. Derived measures (avg, population
variance/stddev) are computed only at ``finalize_state`` time, never
stored — finalizing is a pure projection, so the landed state stays
mergeable forever. ``sumsq`` is an exact decimal too (values squared
at ``decimal(18,6)`` so the product stays inside 38 digits in any
engine): variance from float-accumulated engine aggregates would be
fold-order-dependent, but ``(sumsq − sum²/n)/n`` over exact decimal
inputs is one deterministic double expression.

DOMAIN: the exact square bounds ``|value| < 1e12`` (beyond that the
(18,6) cast overflows — loudly under ANSI mode, the session default).
``n/sum/min/max/avg`` keep the full decimal(38,6) domain. For
wider-domain values (wei-scale integers), pre-scale the column to the
unit that matters before aggregating. State schema v2: ledgers landed
before the sumsq column need a one-time rewrite (merge_states and the
ledger folds fail loudly on the missing column rather than silently
computing partial squares).

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
# squares computed at (18,6)x(18,6) -> scale 12, well inside 38 digits
# in both Spark and DuckDB; the sum then holds ~1e26 of headroom
_SQ_IN_TYPE = "decimal(18,6)"
_SUMSQ_TYPE = "decimal(38,12)"


def aggregate_state(df: DataFrame, keys: str | Sequence[str],
                    value: str) -> DataFrame:
    """Algebraic aggregate state of ``value`` per ``keys``:
    ``(*keys, n, sum, sumsq, min, max)``. NULL values count toward no
    measure (SQL aggregate semantics) but rows still exist: groups
    whose values are all NULL get n=0 and NULL sum/min/max."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    v = F.col(value)
    sq = v.cast(_SQ_IN_TYPE) * v.cast(_SQ_IN_TYPE)
    # count(sq)==count(v) guard: under non-ANSI an out-of-domain value
    # squares to NULL and a plain sum would silently hold a PARTIAL
    # sum of squares — null the whole cell instead (var/std become
    # NULL-unknown); under ANSI the cast already fails loudly
    return df.groupBy(*ks).agg(
        F.count(v).cast("long").alias("n"),
        F.sum(v.cast(_SUM_TYPE)).alias("sum"),
        F.when(F.count(sq) == F.count(v), F.sum(sq))
         .cast(_SUMSQ_TYPE).alias("sumsq"),
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
        # NULL-poisoned sumsq (out-of-domain input, n>0) must stay
        # NULL through merges, not be skipped into a partial sum — but
        # an n=0 state's NULL sumsq is the monoid identity and folds
        # away freely (all-NULL-value epochs must not poison a group)
        F.when(F.sum(((F.col("n") > 0) & F.col("sumsq").isNull())
                     .cast("int")) == 0, F.sum("sumsq"))
         .cast(_SUMSQ_TYPE).alias("sumsq"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
    )


def finalize_state(state: DataFrame) -> DataFrame:
    """Pure projection adding derived measures (avg, population
    var/std as doubles; NULL for all-NULL groups). The input state is
    untouched/re-mergeable. The variance expression is written the
    same way as the DuckDB oracle's — identical double operation
    order over identical decimal inputs means bit-identical output."""
    sum_d = F.col("sum").cast("double")
    var = (F.col("sumsq").cast("double")
           - sum_d * sum_d / F.col("n")) / F.col("n")
    # guard tiny negative float residue so std's sqrt never NaNs
    var = F.greatest(var, F.lit(0.0))
    # sumsq NULL with n>0 = out-of-domain values squared under
    # non-ANSI (cast returned NULL): var must be NULL (unknown), not
    # the greatest() clamp's confident 0.0
    has_sq = (F.col("n") > 0) & F.col("sumsq").isNotNull()
    return state.select(
        *[c for c in state.columns],
        F.when(F.col("n") > 0, sum_d / F.col("n")).alias("avg"),
        F.when(has_sq, var).alias("var"),
        F.when(has_sq, F.sqrt(var)).alias("std"),
    )
