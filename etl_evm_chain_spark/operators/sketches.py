"""K-minimum-values (KMV) distinct-count sketches — deterministic,
engine-portable, mergeable.

The reference's only distinct-count surface is pandas ``unique()``
(SURVEY §2 D15); at 100 TB the interesting form is the *sketch*: a
bounded summary per group/shard that (a) estimates the distinct count
and (b) merges across shards/epochs without rescanning, so a daily
landed sketch table answers "distinct users last quarter" by folding
90 tiny arrays. HyperLogLog (Spark's approx_count_distinct, DuckDB's
approx_distinct) has exactly those properties but engine-specific
register layouts — the two engines' estimates can never hash-match.
KMV over a shared md5-derived 60-bit hash is deterministic in ANY
engine that can md5: the sketch is literally the k smallest distinct
hash values, and the classic order-statistic estimator

    D_hat = (k - 1) / (h_k / 2^60)        [Bar-Yossef et al. 2002]

is a pure function of the k-th value. Every arithmetic step below is
written identically in the q115 DuckDB oracle.

Scale shape: one dedup shuffle on (group, hash) with map-side combine,
then the two-phase bucketed ranking kit (functions/ranking.py) takes
the k smallest per group — no low-cardinality-partition window. The
sketches themselves are arrays of ≤ k longs; ``kmv_merge_expr`` folds
two sketches with pure array expressions (concat → distinct → sort →
slice), so incremental maintenance is an expression over a landed
sketch table, not a re-scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.ranking import bucketed_rank, scaled_buckets
from ..functions.text import hash15

__all__ = ["KMV_K", "kmv_estimator_constant", "kmv_hash", "kmv_sketch",
           "kmv_sketch_many", "kmv_estimate_expr", "kmv_merge_expr",
           "CM_DEPTH", "CM_WIDTH", "cm_cells", "cm_sketch", "cm_estimate",
           "cm_merge"]

KMV_K = 64  # relative stderr ≈ 1/sqrt(k-2) ≈ 12.7%

# 2^60 as an exact double (a power of two is exactly representable;
# mirrored in the SQL oracle via kmv_estimator_constant)
_TWO_60 = float(1 << 60)


def kmv_estimator_constant(k: int = KMV_K) -> float:
    """(k-1)·2^60 as the exact double both engines must use — the
    q115 oracle embeds repr() of THIS value so a tuned k can never
    leave the SQL stale."""
    return float(k - 1) * _TWO_60


def kmv_hash(col: Column, *, salt: str = "kmv") -> Column:
    """60-bit uniform hash: the repo-wide hash15 convention (md5 hex
    prefix) over the salted string form of the key."""
    return hash15(F.concat(F.lit(salt + ":"), col.cast("string")))


def kmv_sketch(df: DataFrame, key_col: str, *,
               group_cols: Sequence[str] = (), k: int = KMV_K,
               salt: str = "kmv", out_col: str = "sketch") -> DataFrame:
    """Per-group KMV sketch: the sorted array of the k smallest
    DISTINCT 60-bit hashes of ``key_col`` (fewer if the group has
    fewer distinct keys). NULL keys are excluded (COUNT DISTINCT
    semantics).

    Two shuffles: the (group, hash) dedup and the bucketed-rank
    phase; the output relation is |groups| rows of ≤ k longs.
    """
    groups = list(group_cols)
    dist = (
        df.filter(F.col(key_col).isNotNull())
        .select(*groups, kmv_hash(F.col(key_col), salt=salt).alias("_h"))
        .distinct()
    )
    ranked = bucketed_rank(
        dist, "_h", ["_h"], part_cols=groups,
        n_buckets=scaled_buckets(df.sparkSession), rank_name="_r")
    return (
        ranked.filter(F.col("_r") <= k)
        .groupBy(*groups)
        .agg(F.array_sort(F.collect_list("_h")).alias(out_col))
    )


def kmv_sketch_many(df: DataFrame, keys: "dict[str, str]", *,
                    group_cols: Sequence[str] = (), k: int = KMV_K,
                    salts: "dict[str, str] | None" = None,
                    exact_counts: bool = False) -> DataFrame:
    """Sketch SEVERAL key columns in one ranking pass.

    ``keys`` maps output column name → key column; the per-key hash
    relations are unioned under a ``_kind`` discriminator that joins
    the ranking kit's partition key, so N sketches cost one dedup
    shuffle + one bucketed-rank pass instead of N of each (the
    fixed-cost jobs — bounds, counts, prefix offsets — dominate for
    sketch-sized outputs). Returns one row per group with an
    ``array<long>`` sketch column per key.

    ``exact_counts`` additionally emits ``x_<name>`` exact
    distinct-count columns from the SAME single pass (round-10, the
    q135 one-logical-scan restructure): the union carries the raw key
    beside its hash, dedups on (group, kind, key) — the hash is a
    function of the key, so the distinct hash SET is unchanged — and
    counts rows per (group, kind) before reducing to distinct hashes
    for the ranking. Equal to ``countDistinct(<key>)`` per group by
    construction (NULL keys excluded on both paths), without the
    second scan + expand-distinct pass over the input.
    """
    if not keys:
        raise ValueError("keys must map at least one output name to a "
                         "key column")
    groups = list(group_cols)
    salts = salts or {}
    part: DataFrame | None = None
    raw = [F.col("_raw")] if exact_counts else []
    for name, col in keys.items():
        rel = (
            df.filter(F.col(col).isNotNull())
            .select(*groups, F.lit(name).alias("_kind"),
                    *([F.col(col).cast("string").alias("_raw")]
                      if exact_counts else []),
                    kmv_hash(F.col(col),
                             salt=salts.get(name, f"kmv-{name}"))
                    .alias("_h"))
        )
        part = rel if part is None else part.unionByName(rel)
    dist = part.distinct()
    exact = None
    if exact_counts:
        # string cast is injective for the scalar key types sketched
        # here, so count(distinct raw) == countDistinct(key)
        exact = (dist.groupBy(*groups)
                 .pivot("_kind", list(keys))
                 .agg(F.count(F.lit(1)))
                 .select(*groups,
                         *[F.coalesce(F.col(n), F.lit(0)).cast("long")
                           .alias(f"x_{n}") for n in keys]))
        dist = dist.drop("_raw").distinct()
    ranked = bucketed_rank(
        dist, "_h", ["_h"], part_cols=groups + ["_kind"],
        n_buckets=scaled_buckets(df.sparkSession), rank_name="_r")
    kept = (
        ranked.filter(F.col("_r") <= k)
        .groupBy(*groups, "_kind")
        .agg(F.array_sort(F.collect_list("_h")).alias("_sk"))
    )
    out = (kept.groupBy(*groups)
           .pivot("_kind", list(keys))
           .agg(F.first("_sk")))
    # a group whose key column is ALL NULL has no hash rows for that
    # kind → the pivot fills NULL; canonicalize to the empty sketch
    # (0 distinct) so estimate/merge expressions never see NULL
    empty = F.array().cast("array<long>")
    for name in keys:
        out = out.withColumn(name, F.coalesce(F.col(name), empty))
    if exact is not None:
        out = out.join(exact, groups) if groups else out.crossJoin(exact)
    return out


def kmv_estimate_expr(sketch: Column, *, k: int = KMV_K) -> Column:
    """Distinct-count estimate from a sketch array (BIGINT).

    A sketch shorter than k saw every distinct value — its size IS the
    exact count (a NULL/empty sketch is 0). Otherwise
    (k-1) * 2^60 / h_k, floored. (k-1) * 2^60 is exact in a double for
    k ≤ 2^52; the division and floor are IEEE-deterministic, so any
    engine computes the identical estimate.
    """
    h_k = F.greatest(F.element_at(sketch, k), F.lit(1).cast("long"))
    est = F.floor(F.lit(kmv_estimator_constant(k)) / h_k.cast("double"))
    return (F.when(sketch.isNull() | (F.size(sketch) < k),
                   F.coalesce(F.size(sketch), F.lit(0)).cast("long"))
            .otherwise(est.cast("long")))


def kmv_merge_expr(a: Column, b: Column, *, k: int = KMV_K) -> Column:
    """Fold two sketches into the sketch of the UNION of their key
    sets: concat → distinct → sort → first k. Exact by construction
    (the k smallest of a union are among the union of each side's k
    smallest), which the equivalence test asserts against a one-shot
    sketch of the concatenated input. A NULL side folds as empty.
    """
    empty = F.array().cast("array<long>")
    return F.slice(
        F.array_sort(F.array_distinct(F.concat(
            F.coalesce(a, empty), F.coalesce(b, empty)))), 1, k)


# ---------------------------------------------------------------------------
# Count-min sketch — the FREQUENCY companion to KMV's distinct count.
#
# KMV answers "how many distinct keys"; count-min answers "about how
# often does key x occur" from a summary of fixed size d·w counters,
# no matter how many distinct keys the corpus has [Cormode &
# Muthukrishnan 2005]. Cell (i, h_i(x) mod w) accumulates the weight
# of every x that lands there; the estimate min_i cell(i, h_i(x)) is
# NEVER below the true count (counters only over-count on collision)
# and exceeds it by > 2N/w with probability ≤ 2^-d. Counters are
# plain sums, so the sketch relation merges across shards/epochs by
# cell-wise addition — union + re-aggregate — making incremental
# maintenance over a landed sketch table exact, not approximate.
#
# Scale shape: ONE projection fans each input row into d (depth,
# cell) pairs, and one shuffle with map-side combine folds them into
# ≤ d·w rows — the reduce side is bounded by the sketch size, not the
# data. The hash is the repo-wide md5 hash15 convention, so the q117
# DuckDB oracle computes bit-identical cells.
# ---------------------------------------------------------------------------

CM_DEPTH = 4     # error probability factor 2^-4
CM_WIDTH = 1024  # over-count ≤ 2·N/1024 w.p. ≥ 1 - 2^-depth


def cm_cells(key: Column, *, depth: int = CM_DEPTH, width: int = CM_WIDTH,
             salt: str = "cm") -> Column:
    """array<struct<depth,cell>> — the d cells ``key`` touches. Each
    row of the depth axis uses an independently salted hash15
    (md5("cm<i>:" || key)); hash15 is non-negative, so plain ``%``
    agrees between Spark and the SQL oracle."""
    s = key.cast("string")
    return F.array(*[
        F.struct(
            F.lit(i).alias("depth"),
            (hash15(F.concat(F.lit(f"{salt}{i}:"), s)) % width)
            .alias("cell"))
        for i in range(depth)])


def cm_sketch(df: DataFrame, key_col: str, *, weight_col: str | None = None,
              depth: int = CM_DEPTH, width: int = CM_WIDTH,
              salt: str = "cm") -> DataFrame:
    """Build the sketch relation (depth int, cell bigint, cnt bigint,
    geom string), ≤ depth·width rows. NULL keys are excluded.
    ``weight_col`` lets a pre-aggregated (key, count) relation stand
    in for raw occurrences — the cell sums are identical, and
    sketching the aggregate skips a second pass over the corpus.

    ``geom`` stamps the build geometry ("depth/width/salt") on every
    counter row: estimates against a sketch built with different
    parameters would silently undercount (probe cells land in the
    wrong counter space), so :func:`cm_estimate` and :func:`cm_merge`
    ASSERT geometry agreement at execution time instead.
    """
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(F.explode(cm_cells(F.col(key_col), depth=depth,
                                   width=width, salt=salt)).alias("dc"),
                w.alias("_w"))
        .groupBy(F.col("dc.depth").alias("depth"),
                 F.col("dc.cell").alias("cell"))
        .agg(F.sum("_w").alias("cnt"))
        .withColumn("geom", F.lit(_cm_geom(depth, width, salt)))
    )


def _cm_geom(depth: int, width: int, salt: str) -> str:
    return f"{depth}/{width}/{salt}"


def cm_estimate(sketch: DataFrame, probes: DataFrame, key_col: str, *,
                depth: int = CM_DEPTH, width: int = CM_WIDTH,
                salt: str = "cm", out_col: str = "est_cnt") -> DataFrame:
    """Estimate each probe key's count: min over the d cells it
    hashes to. The sketch (≤ d·w rows) broadcasts to the probe side;
    a cell no key ever touched is absent from the relation and reads
    as 0. Returns (key_col, out_col) — distinct probe keys.

    The sketch's geometry stamp is verified by a 1-row assertion
    relation crossJoined into the plan (the scalar-subquery shape) —
    a sketch built with different depth/width/salt would otherwise
    read as zeros and silently break the est ≥ true guarantee. The
    checked bit multiplies into the output expression, so column
    pruning can never elide the assertion. ``key_col`` may be any
    name except the sketch columns'.
    """
    if key_col in ("depth", "cell", "cnt", "geom"):
        raise ValueError(f"probe key column {key_col!r} collides with a "
                         "sketch column; rename the probe column")
    expected = _cm_geom(depth, width, salt)
    pe = (
        probes.select(F.col(key_col))
        .filter(F.col(key_col).isNotNull()).distinct()
        .select(key_col,
                F.explode(cm_cells(F.col(key_col), depth=depth,
                                   width=width, salt=salt)).alias("_dc"))
        .select(key_col, F.col("_dc.depth").alias("depth"),
                F.col("_dc.cell").alias("cell"))
    )
    # an EMPTY sketch (no input rows) is valid for any geometry
    geom_ok = F.coalesce(
        (F.min("geom") == expected) & (F.max("geom") == expected),
        F.lit(True))
    chk = sketch.agg(
        F.when(
            F.assert_true(
                geom_ok,
                F.concat(
                    F.lit("count-min geometry mismatch: sketch built "
                          "with "),
                    F.coalesce(F.min("geom"), F.lit("<empty>")),
                    F.lit(f", probed with {expected}"))).isNull(),
            F.lit(1).cast("long")).alias("_geom_ok"))
    return (
        pe.join(F.broadcast(sketch), ["depth", "cell"], "left")
        .crossJoin(F.broadcast(chk))
        .groupBy(key_col)
        .agg((F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
              * F.first("_geom_ok")).alias(out_col))
    )


def cm_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketch of the combined input: cell-wise counter addition.
    Exact (counters are sums), which the merge-law test asserts
    against a one-shot sketch of the unioned input. Folding sketches
    of different geometry is meaningless — a 1-row assertion over the
    union's geometry stamps crossJoins into the plan (as in
    :func:`cm_estimate`), and its checked bit multiplies into the
    counters so column pruning can never elide it."""
    u = a.unionByName(b)
    chk = u.agg(
        F.when(
            F.assert_true(
                F.coalesce(F.min("geom") == F.max("geom"), F.lit(True)),
                F.concat(F.lit("count-min geometry mismatch: "),
                         F.concat_ws(" vs ", F.min("geom"),
                                     F.max("geom")))).isNull(),
            F.lit(1).cast("long")).alias("_geom_ok"))
    return (u.crossJoin(F.broadcast(chk))
            .groupBy("depth", "cell")
            .agg((F.sum("cnt") * F.first("_geom_ok")).alias("cnt"),
                 F.min("geom").alias("geom")))
