"""As-of and range (interval) joins — the scale-path forms.

The reference only ever approximates as-of alignment by resampling to a
regular grid and forward-filling (`analytics/stable_eth_meanrevert_bot.py:98-123`,
`stable_fee_ml_bot.py:107` pyc — SURVEY C5). These operators provide the
*true* event-time forms Spark lacks natively, built so they scale:

- ``asof_join``: union-tag algorithm — tag both sides, union, one
  window pass per key carrying the last (or next) right-side row
  forward. Exactly ONE shuffle on the join key and a partition-local
  sort; no row explosion, no range-condition nested loop. This is the
  standard scalable formulation (a sort-merge join in disguise) and is
  skew-safe to the same degree as any keyed window.
- ``range_join``: banded interval join — bucketize the point side and
  explode each interval onto the buckets it overlaps, turning a theta
  join (which Spark would plan as BroadcastNestedLoopJoin) into an
  equi-join on ``(key?, bucket)`` + a residual filter. Bucket width is
  the tuning knob: pick it near the median interval length so each
  interval lands on O(1) buckets.

Both are pure DataFrame compositions — JVM-side, codegen'd, no Python
in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *, on: str,
              by: str | list[str], right_cols: list[str] | None = None,
              direction: str = "backward", tolerance: int | None = None,
              matched_on: str = "matched_on") -> DataFrame:
    """Event-time as-of join: for each left row, attach the most recent
    right row at-or-before it (``backward``, pandas/DuckDB default) or
    the earliest at-or-after it (``forward``), per ``by`` key.

    Parameters
    ----------
    on : ordering column, numeric or timestamp, present on both sides.
    by : equi-join key(s) present on both sides.
    right_cols : right-side payload columns to attach (default: all
        non-key, non-``on`` columns).
    tolerance : max allowed ``|left.on - right.on|`` in the ``on``
        column's own units (seconds for timestamps); matches farther
        away are nulled, like pandas ``merge_asof(tolerance=...)``.
    matched_on : name of the output column holding the matched right
        row's ``on`` value (null when no match).

    Scale: one shuffle on ``by``; each key's rows stream through a
    single sorted window. Contrast with the naive
    ``left.join(right, cond).groupBy(...).agg(max_by(...))`` which
    explodes |left|×|right| per key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    by_cols = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by_cols + [on]]

    payload = F.struct(F.col(on).alias("_on"),
                       *[F.col(c) for c in right_cols]).alias("_r")
    r = right.select(*by_cols, F.col(on).alias("_ts"), payload) \
             .withColumn("_is_left", F.lit(0))
    l = left.withColumn("_ts", F.col(on)) \
            .withColumn("_r", F.lit(None).cast(
                r.schema["_r"].dataType)) \
            .withColumn("_is_left", F.lit(1))
    unified = l.unionByName(r, allowMissingColumns=True)

    # Backward: right rows sort before left rows at equal _ts, so an
    # exact-timestamp right row IS visible to the left row (inclusive
    # semantics, matching DuckDB `ASOF JOIN ... ON l.ts >= r.ts` and
    # pandas merge_asof). Forward mirrors the frame.
    if direction == "backward":
        w = (Window.partitionBy(*by_cols).orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
             .rowsBetween(Window.unboundedPreceding, 0))
    else:
        w = (Window.partitionBy(*by_cols).orderBy(F.col("_ts").desc(), F.col("_is_left").asc())
             .rowsBetween(Window.unboundedPreceding, 0))
    matched = unified.withColumn("_m", F.last("_r", ignorenulls=True).over(w)) \
                     .filter(F.col("_is_left") == 1)

    if tolerance is not None:
        lhs, rhs = F.col("_ts"), F.col("_m._on")
        if dict(matched.dtypes)["_ts"].startswith("timestamp"):
            lhs, rhs = F.unix_timestamp(lhs), F.unix_timestamp(rhs)
        dist = F.abs(lhs - rhs)
        matched = matched.withColumn(
            "_m", F.when(dist <= tolerance, F.col("_m")))

    out = matched.withColumn(matched_on, F.col("_m._on"))
    for c in right_cols:
        out = out.withColumn(c, F.col(f"_m.{c}"))
    return out.drop("_ts", "_r", "_is_left", "_m")


def _bucket(c: Column, width: int) -> Column:
    return F.floor(c.cast("double") / width).cast("long")


def range_join(points: DataFrame, intervals: DataFrame, *, point_on: str,
               lo: str, hi: str, bucket_width: int,
               by: str | list[str] | None = None,
               inclusive: str = "left") -> DataFrame:
    """Banded interval join: pair every point with every interval that
    contains it, without a nested-loop plan.

    ``points[point_on]`` and ``intervals[lo]/[hi]`` must be mutually
    comparable numerics (cast timestamps to epoch first). ``inclusive``
    is ``"left"`` ([lo, hi)) or ``"both"`` ([lo, hi]).

    How it scales: both sides get a ``_bucket`` column (intervals via
    ``sequence`` + ``explode`` over the buckets they span), the join is
    a plain equi-join on ``(by?, _bucket)`` that Catalyst/AQE plans as
    hash or sort-merge with skew splitting, and the exact range
    predicate runs as a residual filter. Output cardinality equals the
    true match count — the only overhead is interval replication
    (≈ interval_len / bucket_width + 1 copies each).
    """
    by_cols = ([by] if isinstance(by, str) else list(by)) if by else []
    p = points.withColumn("_bucket", _bucket(F.col(point_on), bucket_width))
    i = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(_bucket(F.col(lo), bucket_width),
                             _bucket(F.col(hi), bucket_width))))
    joined = p.join(i, by_cols + ["_bucket"])
    upper = (F.col(point_on) < F.col(hi)) if inclusive == "left" \
        else (F.col(point_on) <= F.col(hi))
    return joined.filter((F.col(point_on) >= F.col(lo)) & upper) \
                 .drop("_bucket")
