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
