"""Stateful sequential operators: EWM smoothing and the two
mean-reversion backtest FSMs (SURVEY §2.E).

These are the reference's analytics core:

- EWM bias estimate — pandas ``ewm(alpha, adjust=False).mean()``
  (reference `stable_fee_ml_bot.py:120-129` pyc). The recursion
  ``y_t = (1-α)·y_{t-1} + α·x_t`` has no Catalyst expression; we run
  pandas itself inside a grouped-map UDF so semantics (including
  ``min_periods`` masking) match the reference bit-for-bit
  (SURVEY §7 hard part 2).
- Trade FSMs — per-key order-dependent state machines emitting closed
  trades (reference `stable_eth_meanrevert_bot.py:131-178` pct mode,
  `:182-251` z-score mode with time stop).

Scale notes: ``applyInPandas`` groups by the series key — one shuffle,
then each series streams through a single task. Per-group data must
fit one worker (SURVEY §7 hard part 3): per-pool series are tiny
relative to executor memory even at 100 TB total, because the key
cardinality grows with the data. Ordering inside the group is
re-established with ``sort_values`` — never rely on shuffle order.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRADES_SCHEMA = (
    "pool string, side string, entry_ts long, exit_ts long, "
    "entry_price double, exit_price double, pct_return double"
)

TRADES_Z_SCHEMA = TRADES_SCHEMA + ", entry_z double, exit_z double, held_rows long"


def pow2_frac_table(halflife: int, sign: int) -> list[float]:
    """The ``h`` fractional powers ``2^(sign·r/h)``, r = 0..h−1, as
    plain floats — the shared literal table behind the exact EWM
    rescale (both the Spark expression and the DuckDB oracle SQL embed
    these same literals, so the decomposition is engine-identical by
    construction)."""
    return [2.0 ** (sign * r / halflife) for r in range(halflife)]


def _pow2_exact(i, halflife: int, sign: int):
    """``2^(sign·i/h)`` for integer ``i ≥ 0`` and INTEGRAL ``h``,
    decomposed as ``2^(sign·(i div h)) · 2^(sign·(i mod h)/h)``.

    Why: ``pow(2.0, i/h)`` routes through libm, whose last bit differs
    between the JVM and other engines — a 1-ulp wobble that surfaces
    as round-6 knife edges in the EWM family's oracles at larger
    fixtures. In this form the first factor is an exact power of two
    (integral exponent — representable, returned exactly) and the
    second is one of ``h`` literals shared verbatim with the oracle
    SQL, so the product is the same correctly-rounded double in every
    engine."""
    frac = pow2_frac_table(halflife, sign)
    whole = F.pow(F.lit(2.0), (sign * F.floor(i / halflife)).cast("double"))
    part = F.element_at(F.array(*[F.lit(v) for v in frac]),
                        (i % halflife).cast("int") + 1)
    return whole * part


def ewm_mean(df: DataFrame, *, value: str, key: str, order: str,
             halflife: float, min_periods: int,
             out_col: str = "ewm", method: str = "native") -> DataFrame:
    """Per-key EWM mean, pandas ``adjust=False`` semantics.

    alpha = 1 − 0.5^(1/halflife) exactly as the reference derives it
    (`stable_fee_ml_bot.py:120-123` pyc).

    ``method="native"`` (default) evaluates the recursion
    ``y_t = (1-α)·y_{t-1} + α·x_t`` in closed form as a cumulative
    window sum, entirely JVM-side: with ``1-α = 0.5^(1/h)``,

        y_t = 2^(−t/h) · Σ_{i≤t} c_i · x_i · 2^(i/h),   c_0 = 1, c_i = α

    — one shuffle on the key, no Python workers, and the exact same
    arithmetic is expressible in ANSI SQL (DuckDB oracle parity).
    Domain bound: the rescale factor 2^(t/h) overflows double when a
    single key has more than ≈1000·h rows; callers with unbounded
    per-key series (or null gaps — the closed form assumes a dense
    non-null series) should pass ``method="pandas"``, which runs the
    reference's own pandas recursion in a grouped-map UDF.
    """
    alpha = 1.0 - 0.5 ** (1.0 / halflife)
    cols = df.columns

    if method == "native":
        from pyspark.sql import Window

        w = Window.partitionBy(key).orderBy(order)
        wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        i = F.row_number().over(w) - 1
        df = df.withColumn("__i", i)
        # integral halflife (the shipped configs): exact power-of-two
        # decomposition — engine-identical rescale, no libm pow of a
        # fractional exponent (see _pow2_exact); fractional halflife
        # keeps the plain pow (no oracle pins those)
        if float(halflife).is_integer():
            h = int(halflife)
            up = _pow2_exact(F.col("__i"), h, 1)
            down = _pow2_exact(F.col("__i"), h, -1)
        else:
            up = F.pow(F.lit(2.0), F.col("__i") / halflife)
            down = F.pow(F.lit(2.0), -F.col("__i") / halflife)
        term = (
            F.when(F.col("__i") == 0, 1.0).otherwise(alpha)
            * F.col(value) * up
        )
        y = down * F.sum(term).over(wcum)
        # Domain guard: the 2^(i/h) rescale overflows double past
        # i/h ≈ 1024, turning the result into silent NaN (Inf·0).
        # assert_true is NULL on success (coalesced to +0.0) and raises
        # a clear error instead of NaN when a key outgrows the bound.
        chk = F.assert_true(
            F.col("__i") < F.lit(1000.0 * halflife),
            F.lit("ewm_mean(method='native'): per-key series exceeds "
                  "~1000*halflife rows; the closed-form rescale would "
                  "overflow double — use method='pandas'"),
        )
        y = y + F.coalesce(chk.cast("double"), F.lit(0.0))
        out = F.when(F.col("__i") + 1 >= min_periods, y)
        return df.withColumn(out_col, out).drop("__i")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        pdf[out_col] = (
            pdf[value].ewm(alpha=alpha, adjust=False, min_periods=min_periods)
            .mean()
        )
        return pdf

    schema = ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}" for c in cols)
    schema += f", `{out_col}` double"
    return df.groupBy(key).applyInPandas(fn, schema)


def _close(trades: list, pool: str, side: str, entry_i: int, exit_i: int,
           ts, price, extra: tuple = ()) -> None:
    entry_p, exit_p = price[entry_i], price[exit_i]
    # pandas inf-semantics made explicit (a synthetic price underflowing
    # to 0 must not spray RuntimeWarnings across a bench run): 0-entry →
    # ±inf return, 0/0 → nan — exactly what the ufunc would produce.
    if entry_p == 0.0:
        ret = float("nan") if exit_p == 0.0 else float("inf") * exit_p
    else:
        ret = (exit_p / entry_p - 1.0) * 100.0
    if side == "short":
        ret = -ret
    trades.append((pool, side, int(ts[entry_i]), int(ts[exit_i]),
                   float(entry_p), float(exit_p), float(ret), *extra))


def meanrevert_fsm_pct(df: DataFrame, *, pool: str = "pool", ts: str = "ts",
                       price: str = "price", dev: str = "dev",
                       threshold: float) -> DataFrame:
    """Percent-deviation FSM (reference E1, `stable_eth_meanrevert_bot.py:131-178`).

    Per pool, in time order: open LONG when dev ≤ −thr, SHORT when
    dev ≥ +thr; close when dev crosses back through 0; emit the closed
    trade. At most one open position per pool; open position at end of
    data is dropped (matches the reference, which only emits closes).
    """

    prepared = df.select(
        F.col(pool).alias("pool"),
        F.unix_timestamp(ts).alias("ts") if dict(df.dtypes)[ts].startswith("timestamp")
        else F.col(ts).cast("long").alias("ts"),
        F.col(price).alias("price"),
        F.col(dev).alias("dev"),
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts", kind="mergesort").reset_index(drop=True)
        p = str(pdf["pool"].iloc[0]) if len(pdf) else ""
        tsv = pdf["ts"].to_numpy()
        pricev = pdf["price"].to_numpy()
        devv = pdf["dev"].to_numpy()
        trades: list = []
        side, entry_i = None, -1
        for i in range(len(pdf)):
            d = devv[i]
            if d != d:
                continue
            if side is None:
                if d <= -threshold:
                    side, entry_i = "long", i
                elif d >= threshold:
                    side, entry_i = "short", i
            elif side == "long" and d >= 0:
                _close(trades, p, side, entry_i, i, tsv, pricev)
                side = None
            elif side == "short" and d <= 0:
                _close(trades, p, side, entry_i, i, tsv, pricev)
                side = None
        return pd.DataFrame(trades, columns=[
            "pool", "side", "entry_ts", "exit_ts",
            "entry_price", "exit_price", "pct_return",
        ])

    return prepared.groupBy("pool").applyInPandas(run, TRADES_SCHEMA)


def meanrevert_fsm_zscore(df: DataFrame, *, pool: str = "pool", ts: str = "ts",
                          price: str = "price", z: str = "z",
                          entry_z: float, exit_z: float,
                          max_hold: int) -> DataFrame:
    """Z-score FSM with time stop (reference E2,
    `stable_eth_meanrevert_bot.py:182-251`).

    Entry when |z| ≥ entry_z (sign picks the side: z ≤ −entry_z →
    LONG); exit when |z| ≤ exit_z or the position has been held
    max_hold rows; emits entry/exit z and held_rows.
    """
    prepared = df.select(
        F.col(pool).alias("pool"),
        F.unix_timestamp(ts).alias("ts") if dict(df.dtypes)[ts].startswith("timestamp")
        else F.col(ts).cast("long").alias("ts"),
        F.col(price).alias("price"),
        F.col(z).alias("z"),
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts", kind="mergesort").reset_index(drop=True)
        p = str(pdf["pool"].iloc[0]) if len(pdf) else ""
        tsv = pdf["ts"].to_numpy()
        pricev = pdf["price"].to_numpy()
        zv = pdf["z"].to_numpy()
        trades: list = []
        side, entry_i = None, -1
        for i in range(len(pdf)):
            zi = zv[i]
            if zi != zi:
                continue
            if side is None:
                if zi <= -entry_z:
                    side, entry_i = "long", i
                elif zi >= entry_z:
                    side, entry_i = "short", i
            else:
                held = i - entry_i
                if abs(zi) <= exit_z or held >= max_hold:
                    _close(trades, p, side, entry_i, i, tsv, pricev,
                           (float(zv[entry_i]), float(zi), int(held)))
                    side = None
        return pd.DataFrame(trades, columns=[
            "pool", "side", "entry_ts", "exit_ts",
            "entry_price", "exit_price", "pct_return",
            "entry_z", "exit_z", "held_rows",
        ])

    return prepared.groupBy("pool").applyInPandas(run, TRADES_Z_SCHEMA)


def calendar_returns(trades: DataFrame, *, ts_col: str = "exit_ts") -> DataFrame:
    """Monthly pct_return sums over the trade list (reference D12,
    `stable_eth_meanrevert_bot.py:255-266`).

    The sum runs through DECIMAL(27,12): a plain double sum folds in
    partition order, so its low bits vary run-to-run and engine-to-
    engine — the decimal path is exact and order-independent (the
    `_dsum` discipline), then surfaces as double. Non-finite returns
    (a trade entered at a 0.0 price yields ±inf/nan — reachable on the
    synthetic sf0.1 prices) are EXCLUDED from the sum and surfaced in
    their own count instead: casting them to decimal would throw under
    ANSI and silently NULL otherwise, both worse than an explicit
    ledger line. ``n_trades`` still counts every trade.

    The bucket predicate is |p| < 1e15, not IEEE-finiteness: a
    finite-but-huge return (near-zero nonzero entry price) overflows
    decimal(27,12), where non-ANSI Spark NULLs it (silently vanishing
    from the sum without a count) while DuckDB's identical cast
    throws — bounding the predicate below the decimal's 15 integer
    digits makes both engines classify the row identically, as
    "non-finite" ledger lines."""
    month = F.date_format(F.timestamp_seconds(ts_col), "yyyy-MM").alias("month")
    p = F.col("pct_return")
    finite = ~F.isnan(p) & (F.abs(p) < F.lit(1e15))
    return (
        trades.groupBy(month)
        .agg(F.sum(F.when(finite, p).cast("decimal(27,12)"))
             .cast("double").alias("pct_return"),
             F.count(F.lit(1)).alias("n_trades"),
             F.sum((~finite).cast("long")).alias("n_nonfinite"))
        .orderBy("month")
    )
