"""Declarative data-quality expectations (dbt-test / Great-Expectations
style) evaluated as Spark aggregates.

A training-data pipeline gates every ingest behind validation rules:
not-null, domain membership, value ranges, key uniqueness, referential
integrity. The reference ships the hand-rolled versions of these
(``/root/reference/bots``' CSV loaders drop NaN rows and coerce dtypes
inline; the indexer validates log→config joins implicitly); this module
makes the rules first-class and *compiled*, not interpreted:

- All row-level predicate checks and uniqueness checks over one table
  compile into a SINGLE conditional-aggregate pass (one scan of the
  fact table, map-side partial aggregation, one 1-row result) — at
  100 TB, k rules cost one scan, not k scans.
- Referential-integrity checks are LEFT ANTI join counts; the dim side
  is broadcast when small (the common case: code/config/dimension
  tables), so the fact table is scanned once per FK rule with no
  shuffle.
- The report is a tiny long-form relation (one row per rule), so the
  union of per-table passes is driver-free.

NULL semantics: a predicate that evaluates to NULL counts as a
VIOLATION (same as SQL ``CHECK`` constraints' inverse — we flag rows
where the condition is not definitely true). Uniqueness counts
duplicate tuples with NULL fields as equal (struct equality), matching
``GROUP BY`` semantics rather than SQL UNIQUE-constraint semantics —
the variant a dedup pipeline wants.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One validation rule. ``kind`` is one of:

    - ``"expr"``: row-level predicate (``cond`` Column); violation =
      rows where the predicate is false or NULL.
    - ``"unique"``: tuple uniqueness over ``cols``; violations = number
      of surplus rows (n_rows - n_distinct_tuples).
    - ``"foreign_key"``: every ``cols`` tuple must exist in
      ``dim.select(dim_cols)``; violations = orphan fact rows.
    """

    name: str
    kind: str
    cond: Optional[Column] = None
    cols: tuple[str, ...] = ()
    dim: Optional[DataFrame] = None
    dim_cols: tuple[str, ...] = ()


def expect(name: str, cond: Column) -> Expectation:
    return Expectation(name, "expr", cond=cond)


def expect_not_null(name: str, col: str) -> Expectation:
    return Expectation(name, "expr", cond=F.col(col).isNotNull())


def expect_in_set(name: str, col: str, allowed: Sequence[str]) -> Expectation:
    return Expectation(name, "expr", cond=F.col(col).isin(list(allowed)))


def expect_unique(name: str, cols: str | Sequence[str]) -> Expectation:
    cs = (cols,) if isinstance(cols, str) else tuple(cols)
    return Expectation(name, "unique", cols=cs)


def expect_foreign_key(name: str, cols: str | Sequence[str],
                       dim: DataFrame,
                       dim_cols: str | Sequence[str]) -> Expectation:
    cs = (cols,) if isinstance(cols, str) else tuple(cols)
    ds = (dim_cols,) if isinstance(dim_cols, str) else tuple(dim_cols)
    if len(cs) != len(ds):
        raise ValueError(f"{name}: fact cols {cs} vs dim cols {ds} arity")
    return Expectation(name, "foreign_key", cols=cs, dim=dim, dim_cols=ds)


def run_expectations(df: DataFrame, checks: Sequence[Expectation],
                     *, broadcast_dims: bool = True) -> DataFrame:
    """Evaluate ``checks`` against ``df``; returns one row per check:
    ``(check string, violations long, total long, passed int)``.

    All expr/unique checks share ONE aggregate scan; each FK check adds
    one anti-join scan (dim broadcast unless ``broadcast_dims=False``).
    """
    if not checks:
        raise ValueError("no expectations given")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names: {names}")
    for n in names:
        # names become column aliases re-resolved via F.col — a dot or
        # backtick would parse as struct access / break quoting (the
        # same reserved-name trap the sketch tier guards against)
        if "." in n or "`" in n:
            raise ValueError(f"expectation name {n!r} must not contain "
                             "'.' or '`'")

    scan_aggs: list[Column] = [F.count(F.lit(1)).alias("__total")]
    scan_names: list[str] = []
    fk_checks: list[Expectation] = []
    for c in checks:
        if c.kind == "expr":
            # NULL predicate counts as a violation: NOT coalesce(p, false)
            bad = ~F.coalesce(c.cond, F.lit(False))
            # coalesce: sum over ZERO rows is NULL — an empty ingest
            # must report 0 violations / passed, not NULLs
            scan_aggs.append(
                F.coalesce(F.sum(bad.cast("long")), F.lit(0))
                 .alias(f"__v_{c.name}"))
            scan_names.append(c.name)
        elif c.kind == "unique":
            tup = F.struct(*[F.col(x) for x in c.cols])
            scan_aggs.append(
                (F.count(F.lit(1)) - F.count_distinct(tup))
                .alias(f"__v_{c.name}"))
            scan_names.append(c.name)
        elif c.kind == "foreign_key":
            fk_checks.append(c)
        else:
            raise ValueError(f"unknown expectation kind {c.kind!r}")

    parts: list[DataFrame] = []
    if scan_names:
        one = df.agg(*scan_aggs)
        pairs: list[Column] = []
        for n in scan_names:
            pairs += [F.lit(n), F.col(f"__v_{n}")]
        parts.append(
            one.select(F.col("__total"),
                       F.explode(F.create_map(*pairs))
                        .alias("check", "violations"))
               .select("check", F.col("violations").cast("long"),
                       F.col("__total").cast("long").alias("total")))

    for c in fk_checks:
        # one scan: left-join a hit marker, count misses and rows together
        dim = (c.dim.select(
                   *[F.col(d).alias(f) for f, d in zip(c.cols, c.dim_cols)])
               .dropDuplicates(list(c.cols))
               .withColumn("__hit", F.lit(1)))
        if broadcast_dims:
            dim = F.broadcast(dim)
        joined = df.select(*c.cols).join(dim, on=list(c.cols), how="left")
        parts.append(
            joined.agg(
                F.coalesce(F.sum(F.col("__hit").isNull().cast("long")),
                           F.lit(0))
                 .cast("long").alias("violations"),
                F.count(F.lit(1)).cast("long").alias("total"))
            .select(F.lit(c.name).alias("check"), "violations", "total"))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check", "violations", "total",
        (F.col("violations") == 0).cast("int").alias("passed"))


def histogram_counts(df: DataFrame, value: str, *, n_bins: int = 16,
                     lo: float = 0.0, hi: float = 1.0,
                     keys: Sequence[str] = ()) -> DataFrame:
    """Fixed-edge histogram: ``(keys..., bin, n)`` counts of ``value``
    over ``n_bins`` equal-width bins on [lo, hi) — the distribution
    fingerprint the drift monitor (:func:`tv_drift`) compares across
    ingest epochs. Counts are a commutative monoid, so per-epoch
    histograms land under the epoch-directory ledger
    (streaming/pipeline.stream_matview keyed by (epoch, bin)) and
    fold by addition — incremental == one-shot, tested.

    NULL/NaN values are excluded (the SQL twins mirror the predicate);
    out-of-range values — ±Infinity included — clamp to the edge bins
    so the relation is never wider than keys × n_bins. The clamp runs
    on the DOUBLE ratio BEFORE any integral cast: a huge/infinite
    value would otherwise reach ``cast(... as int)`` out of range and
    throw CAST_OVERFLOW under the repo's ANSI sessions instead of
    clamping (the SQL twin orders its least/greatest/cast the same
    way). One hash aggregate with map-side combine; at 100 TB the
    shuffle carries keys × n_bins rows, never the corpus."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    v = F.col(value).cast("double")
    w = (v - F.lit(float(lo))) / F.lit(float(hi - lo))
    wc = F.least(F.greatest(w, F.lit(0.0)), F.lit(1.0))
    b = F.least(F.floor(wc * n_bins).cast("int"), F.lit(n_bins - 1))
    cols = [F.col(k) for k in keys] + [b.alias("bin")]
    return (df.filter(v.isNotNull() & ~F.isnan(v))
            .groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("n")))


def tv_drift(hist: DataFrame, *, key: str = "epoch",
             bin_col: str = "bin", n_col: str = "n",
             baseline) -> DataFrame:
    """Exact total-variation drift of each key's distribution vs the
    ``baseline`` key — the distribution-shift monitor a training-data
    ingest runs per crawl batch ("did this epoch's quality histogram
    move?"). TV distance is ``0.5 · Σ|p_i − q_i|``; with histogram
    counts that is the rational ``Σ|n_i·M − m_i·N| / (2·N·M)``, so the
    NUMERATOR is returned as an exact integer (decimal internally —
    counts at 100 TB overflow a long product) alongside both totals:
    no floats, no engine wobble, consumers divide when they want the
    normalized statistic.

    Shapes: one tiny spine (distinct keys × distinct bins, both
    bounded by geometry), equi-joins against the baseline slice and
    the per-key totals, one 1-row broadcast of the baseline total
    (the scalar-subquery shape), and a keys-sized aggregate. Nothing
    corpus-sized moves."""
    spine = (hist.select(key).distinct()
             .crossJoin(hist.select(bin_col).distinct()))
    full = (spine.join(hist, [key, bin_col], "left")
            .select(key, bin_col,
                    F.coalesce(F.col(n_col), F.lit(0)).alias("_n"))
            .alias("f"))
    # every side is qualified (f/t/b/bt): all four relations descend
    # from ``hist``, and Spark's self-join attribute dedup leaves
    # bare name refs AMBIGUOUS_REFERENCE-prone (hit in round 7) —
    # qualified refs resolve deterministically. The spine zero-fill
    # changes no sum (an added bin contributes 0), so totals and the
    # baseline slice aggregate ``hist`` directly.
    tot = hist.groupBy(key).agg(F.sum(n_col).alias("_N")).alias("t")
    base = (hist.filter(F.col(key) == baseline)
            .groupBy(bin_col).agg(F.sum(n_col).alias("_m")).alias("b"))
    base_tot = (hist.filter(F.col(key) == baseline)
                .agg(F.sum(n_col).alias("_M")).alias("bt"))
    term = F.abs(F.col("f._n").cast("decimal(38,0)") * F.col("bt._M")
                 - F.coalesce(F.col("b._m"), F.lit(0))
                 .cast("decimal(38,0)") * F.col("t._N"))
    # a baseline key with NO histogram rows is a misconfigured
    # monitor, not a zero-drift one — sum(NULL) would return NULL
    # tv_nums silently; assert loudly instead (the _cm_epoch_fold
    # pattern: the checked bit multiplies into an output so pruning
    # can never elide it)
    base_ok = F.when(
        F.assert_true(
            F.col("bt._M").isNotNull(),
            F.lit("tv_drift: baseline key has no histogram rows")
        ).isNull(), F.lit(1).cast("long"))
    return (full
            .join(base, F.col(f"f.{bin_col}") == F.col(f"b.{bin_col}"),
                  "left")
            .join(tot, F.col(f"f.{key}") == F.col(f"t.{key}"))
            .crossJoin(F.broadcast(base_tot))
            .groupBy(F.col(f"f.{key}").alias(key))
            .agg((F.max("t._N") * F.first(base_ok)).alias("n_rows"),
                 F.max("bt._M").alias("base_rows"),
                 F.sum(term).cast("decimal(38,0)").alias("tv_num")))
