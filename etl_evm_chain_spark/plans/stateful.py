"""Stateful/sequential queries (SURVEY §2.E): EWM, backtest FSMs, ML.

The EWM pipeline (q24, q28) is oracle-checked: the adjust=False
recursion has a closed form (see operators/backtest.ewm_mean) that
both Spark and DuckDB evaluate as a cumulative window sum. The trade
FSMs and iterative training (q25-q27, q29) are genuinely
non-SQL-expressible, but since round 5 they are value-checked too:
plans/groundtruth.py pins their discrete decisions from independent
single-process reruns (the q98 pattern) and the oracles recompute the
float surface engine-side. Golden-output tests remain in
tests/test_stateful.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import backtest as bt
from ..operators import mlplane as ml
from . import QuerySpec, groundtruth
from .timeseries_q import _SQL_DENSE, _dense, _with_consensus, _with_rolling

# Closed-form EWM shared by the q24/q28 oracles — the exact arithmetic
# operators/backtest.ewm_mean(method="native") runs in Spark:
#   y_t = 2^(−t/h) · Σ_{i≤t} c_i·x_i·2^(i/h),  c_0 = 1, c_i = α,
# with α inlined at full double precision so both engines fold the
# same literal. The 2^(±i/h) rescale uses the same exact power-of-two
# decomposition as the Spark side (bt._pow2_exact): libm pow of a
# fractional exponent differs by 1 ulp between engines, which showed
# up as a round-6 sigma knife edge at sf0.1. min_periods=5 masks the
# first four rows per key.
_EWM_ALPHA = repr(1.0 - 0.5 ** (1.0 / 10.0))


def _sql_pow2(i_expr: str, h: int, sign: int) -> str:
    lits = ", ".join(repr(v) for v in bt.pow2_frac_table(h, sign))
    s = "-" if sign < 0 else ""
    return (f"(pow(2.0, CAST({s}(({i_expr}) // {h}) AS DOUBLE)) * "
            f"(LIST_VALUE({lits}))[(({i_expr}) % {h}) + 1])")


_SQL_EWM = _SQL_DENSE + f"""
, idx AS (
  SELECT event_type, bucket, value,
         row_number() OVER (PARTITION BY event_type ORDER BY bucket) - 1 AS i
  FROM dense
), ewm AS (
  SELECT event_type, bucket, value, i,
         {_sql_pow2('i', 10, -1)} * sum(
           (CASE WHEN i = 0 THEN 1.0 ELSE {_EWM_ALPHA} END)
           * value * {_sql_pow2('i', 10, 1)}
         ) OVER (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y
  FROM idx
), biased AS (
  SELECT event_type, bucket, value, i,
         CASE WHEN i + 1 >= 5 THEN y END AS bias
  FROM ewm
)
"""


# ---------------------------------------------------------------------------
# Q24: EWM bias estimate (D9 — pandas ewm(adjust=False) recursion).
# ---------------------------------------------------------------------------

def q_ewm_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    dense = _dense(spark, sf_dir)
    out = bt.ewm_mean(dense, value="value", key="event_type", order="bucket",
                      halflife=10.0, min_periods=5, out_col="bias")
    return out.select(
        "event_type", "bucket", "value", F.round("bias", 6).alias("bias"),
    )


ORACLE_EWM_BIAS = _SQL_EWM + """
SELECT event_type, bucket, value, round(bias, 6) AS bias
FROM biased
"""


# ---------------------------------------------------------------------------
# Q25: percent-deviation trade FSM (E1).
# ---------------------------------------------------------------------------

def q_backtest_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_consensus(_dense(spark, sf_dir))
    # try_divide: an all-zero consensus bucket has no defined
    # deviation — NULL skips the row in the FSM (plain division would
    # THROW under ANSI; the ground-truth loop mirrors the skip)
    df = df.withColumn("dev_pct",
                       (F.try_divide(F.col("value"), F.col("consensus"))
                        - 1.0) * 100.0)
    trades = bt.meanrevert_fsm_pct(
        df, pool="event_type", ts="bucket", price="value", dev="dev_pct",
        threshold=30.0,
    )
    return trades.orderBy("pool", "entry_ts")


# ---------------------------------------------------------------------------
# Q26: z-score trade FSM with time stop (E2).
# ---------------------------------------------------------------------------

def q_backtest_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_rolling(_with_consensus(_dense(spark, sf_dir)), "dev", 30, 30)
    df = df.withColumn(
        "z", F.when(F.col("roll_std") != 0,
                    (F.col("dev") - F.col("roll_mean")) / F.col("roll_std")))
    trades = bt.meanrevert_fsm_zscore(
        df, pool="event_type", ts="bucket", price="value", z="z",
        entry_z=1.5, exit_z=0.5, max_hold=60,
    )
    # entry/exit z surface rounded to 6 (the q20/q23 convention): the
    # rolling std's decimal→double cast differs by 1 ulp between
    # engines on rare values, which a raw-double hash would trip on
    return trades.withColumn("entry_z", F.round("entry_z", 6)) \
                 .withColumn("exit_z", F.round("exit_z", 6)) \
                 .orderBy("pool", "entry_ts")


# ---------------------------------------------------------------------------
# Q27: calendar aggregation of backtest returns (D12 over E2 output).
# ---------------------------------------------------------------------------

def q_calendar_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bt.calendar_returns(q_backtest_zscore(spark, sf_dir))


# ---------------------------------------------------------------------------
# Q28: supervised ML dataset (E3: EWM bias + windowed features + label).
# ---------------------------------------------------------------------------

def _ml_dataset_landed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q28/q29 feature dataset as a landed silver table: the
    window-heavy build (dense grid → EWM → rolling std → leading max)
    runs once per scale factor and every consumer — the oracle-checked
    dataset query AND the iterative trainer — scans the landed copy.
    The build is fully deterministic, so landing changes no values
    (doubles round-trip parquet exactly)."""
    import os

    from ..catalog import landed_parquet

    key = os.path.basename(os.path.normpath(sf_dir)) or "sf"

    def build() -> DataFrame:
        dense = bt.ewm_mean(
            _dense(spark, sf_dir), value="value", key="event_type",
            order="bucket", halflife=10.0, min_periods=5, out_col="bias")
        return ml.build_ml_dataset(
            dense, key="event_type", ts="bucket", value="value",
            std_win=30, sigma_min=0.5, horizon=12, target=25.0)

    # params carry a build-semantics version: v2 = exact-decimal sigma
    # + exact power-of-two EWM rescale (round 5) — bumping it is what
    # invalidates the landed copy built by the previous arithmetic
    return landed_parquet(
        spark, name="mldataset",
        src_paths=[os.path.join(sf_dir, "events.parquet")],
        build=build, params=f"{key}_h10mp5w30s05hz12t25v2")


def q_ml_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = _ml_dataset_landed(spark, sf_dir)
    return ds.select(
        "event_type", "bucket",
        F.round("z", 6).alias("z"), F.round("devdt", 6).alias("devdt"),
        F.round("bias", 6).alias("bias"), F.round("sigma", 6).alias("sigma"),
        "y",
    )


# Mirrors operators/mlplane.build_ml_dataset: devdt = value − bias,
# sigma = sample std of devdt over the trailing 30 rows via exact
# decimal window sums (masked below min_periods=max(5,30//3)=10
# observations, clipped to 0.5), z = devdt/sigma, label y from the
# 12-row leading max; keep rows with devdt < 0 and a defined
# label/bias. devdt is bit-identical across engines (same closed-form
# bias with the exact pow2 rescale), so the float filter is exact.
# Full-precision dataset CTEs, shared by the q28 oracle (rounded
# display) and the q29 ground-truth trainer (plans/groundtruth.py,
# which needs the raw features).
_SQL_ML_SCORED = _SQL_EWM + """
, feat AS (
  SELECT event_type, bucket, bias, value - bias AS devdt,
         count(value) OVER wstd AS cnt,
         count(value - bias) OVER wstd AS c2,
         CAST(sum(CAST(value - bias AS DECIMAL(18,6))) OVER wstd AS DOUBLE)
           AS s1,
         CAST(sum(CAST(value - bias AS DECIMAL(19,6))
                  * CAST(value - bias AS DECIMAL(19,6))) OVER wstd AS DOUBLE)
           AS s2,
         max(value - bias) OVER wlead AS lead_max
  FROM biased
  WINDOW
    wstd AS (PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN 29 PRECEDING AND CURRENT ROW),
    wlead AS (PARTITION BY event_type ORDER BY bucket
              ROWS BETWEEN 1 FOLLOWING AND 12 FOLLOWING)
), sigrows AS (
  -- exact decimal window sums (mirrors mlplane.build_ml_dataset's
  -- non-streaming sigma; DECIMAL(19,6) forces hugeint so the square
  -- cannot overflow DuckDB's int64 decimal); ddof=1
  SELECT *, CASE WHEN c2 >= 2 THEN
              sqrt(greatest((s2 - s1 * s1 / c2) / (c2 - 1), 0.0)) END
            AS sigma_raw
  FROM feat
), scored AS (
  SELECT event_type, bucket, bias, devdt,
         greatest(coalesce(CASE WHEN cnt >= 10 THEN sigma_raw END, 0.5), 0.5)
           AS sigma,
         CAST(lead_max - devdt >= 25.0 AS INT) AS y
  FROM sigrows
  WHERE round(devdt, 6) < 0 AND lead_max IS NOT NULL AND bias IS NOT NULL
)
"""

ORACLE_ML_DATASET = _SQL_ML_SCORED + """
SELECT event_type, bucket,
       round(devdt / sigma, 6) AS z, round(devdt, 6) AS devdt,
       round(bias, 6) AS bias, round(sigma, 6) AS sigma, y
FROM scored
"""


# ---------------------------------------------------------------------------
# Q29: train + evaluate + NOW signals (E5-E8).
# ---------------------------------------------------------------------------

def q_ml_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5-E8 with an oracle-pinnable surface (round-5): tol=1e-12 runs
    L-BFGS to the unique convex optimum (22 vs 15 iterations at
    sf0.01 — the loose sklearn-default 1e-4 stops ~1e-4 away from the
    optimum, which no independent solver could reproduce; converged,
    the oracle's Newton solve matches probabilities to ~2e-8).
    Probabilities surface on a 1e-4 grid (≫ the solver-parity delta),
    features on the q28 round-6 convention, accuracy/AUC are exact
    integer-ratio statistics (see operators/mlplane.exact_auc)."""
    ds = _ml_dataset_landed(spark, sf_dir)
    train, test = ml.time_split(ds, ts="bucket", frac=0.7)
    model, metrics = ml.train_and_eval(train, test, tol=1e-12)
    sigs = ml.now_signals(model, ds, key="event_type", ts="bucket",
                          prob_thr=0.6, round_to=4)
    # one result set: per-key signal rows + the metrics as extra columns
    m = metrics.collect()[0]
    return (sigs
            .withColumn("z", F.round("z", 6))
            .withColumn("devdt", F.round("devdt", 6))
            .withColumn("sigma", F.round("sigma", 6))
            .withColumn("accuracy", F.round(F.lit(m["accuracy"]), 6))
            # auc pins at 1e-3: adjacent test probabilities closer
            # than the solver-parity delta can swap order between
            # runs, wobbling AUC by ~n_swappable/(n₊·n₋) — up to
            # ~6.5e-6 at sf0.1 — and the grid must dominate 10× that
            # bound at every fixture (review catch; the ground-truth
            # builder asserts the margin per-fixture)
            .withColumn("auc", F.round(F.lit(m["auc"]), 3)))


SPECS = [
    QuerySpec("q24_ewm_bias", q_ewm_bias, ORACLE_EWM_BIAS,
              "per-key EWM mean (adjust=False recursion, closed form)", ("D9",)),
    # FSM oracles (round-5, the r4 verdict's top ask): literal ground
    # truth of the trade DECISIONS from an independent single-process
    # rerun (plans/groundtruth.py), with prices/returns/z recomputed by
    # DuckDB from its own dense-grid CTEs — the q98 pattern, lazy
    # because the build replays the FSM driver-side.
    QuerySpec("q25_backtest_pct", q_backtest_pct,
              groundtruth.oracle_backtest_pct,
              "pct-threshold mean-reversion trade FSM (oracle = pinned "
              "ground-truth decisions + engine-side price joins)",
              ("E1", "B11")),
    QuerySpec("q26_backtest_zscore", q_backtest_zscore,
              groundtruth.oracle_backtest_zscore,
              "z-score trade FSM with time stop (pinned decisions "
              "oracle)", ("E2", "B12")),
    QuerySpec("q27_calendar_returns", q_calendar_returns,
              groundtruth.oracle_calendar_returns,
              "monthly return aggregation over trades (exact decimal "
              "sums over the pinned-decision trades)", ("D12",)),
    QuerySpec("q28_ml_dataset", q_ml_dataset, ORACLE_ML_DATASET,
              "supervised feature/label dataset (EWM + windows)", ("E3", "D10", "B13")),
    QuerySpec("q29_ml_signals", q_ml_signals,
              groundtruth.oracle_ml_signals,
              "scaler+logreg training, eval, NOW signals (oracle = "
              "margin-checked independent Newton solve to the convex "
              "optimum; quantized probability surface)",
              ("E5", "E6", "E7", "E8", "B14")),
]
