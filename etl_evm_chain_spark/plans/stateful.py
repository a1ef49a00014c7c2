"""Stateful/sequential queries (SURVEY §2.E): EWM, backtest FSMs, ML.

These are the non-SQL-expressible operators (grouped-map pandas state,
iterative training) → no oracle entries; the driver records rows-only
checks and pytest holds golden-output tests (tests/test_stateful.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import backtest as bt
from ..operators import mlplane as ml
from . import QuerySpec
from .timeseries_q import _dense, _with_consensus, _with_rolling


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


# ---------------------------------------------------------------------------
# Q25: percent-deviation trade FSM (E1).
# ---------------------------------------------------------------------------

def q_backtest_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_consensus(_dense(spark, sf_dir))
    df = df.withColumn("dev_pct",
                       (F.col("value") / F.col("consensus") - 1.0) * 100.0)
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
    return trades.orderBy("pool", "entry_ts")


# ---------------------------------------------------------------------------
# Q27: calendar aggregation of backtest returns (D12 over E2 output).
# ---------------------------------------------------------------------------

def q_calendar_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bt.calendar_returns(q_backtest_zscore(spark, sf_dir))


# ---------------------------------------------------------------------------
# Q28: supervised ML dataset (E3: EWM bias + windowed features + label).
# ---------------------------------------------------------------------------

def q_ml_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    dense = bt.ewm_mean(_dense(spark, sf_dir), value="value", key="event_type",
                        order="bucket", halflife=10.0, min_periods=5,
                        out_col="bias")
    ds = ml.build_ml_dataset(dense, key="event_type", ts="bucket",
                             value="value", std_win=30, sigma_min=0.5,
                             horizon=12, target=25.0)
    return ds.select(
        "event_type", "bucket",
        F.round("z", 6).alias("z"), F.round("devdt", 6).alias("devdt"),
        F.round("bias", 6).alias("bias"), F.round("sigma", 6).alias("sigma"),
        "y",
    )


# ---------------------------------------------------------------------------
# Q29: train + evaluate + NOW signals (E5-E8).
# ---------------------------------------------------------------------------

def q_ml_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    dense = bt.ewm_mean(_dense(spark, sf_dir), value="value", key="event_type",
                        order="bucket", halflife=10.0, min_periods=5,
                        out_col="bias")
    ds = ml.build_ml_dataset(dense, key="event_type", ts="bucket",
                             value="value", std_win=30, sigma_min=0.5,
                             horizon=12, target=25.0).cache()
    train, test = ml.time_split(ds, ts="bucket", frac=0.7)
    model, metrics = ml.train_and_eval(train, test)
    sigs = ml.now_signals(model, ds, key="event_type", ts="bucket",
                          prob_thr=0.6)
    # one result set: per-key signal rows + the metrics as extra columns
    m = metrics.collect()[0]
    return sigs.withColumn("accuracy", F.round(F.lit(m["accuracy"]), 6)) \
               .withColumn("auc", F.round(F.lit(m["auc"]), 6))


SPECS = [
    QuerySpec("q24_ewm_bias", q_ewm_bias, None,
              "per-key EWM mean (pandas adjust=False recursion)", ("D9",)),
    QuerySpec("q25_backtest_pct", q_backtest_pct, None,
              "pct-threshold mean-reversion trade FSM", ("E1", "B11")),
    QuerySpec("q26_backtest_zscore", q_backtest_zscore, None,
              "z-score trade FSM with time stop", ("E2", "B12")),
    QuerySpec("q27_calendar_returns", q_calendar_returns, None,
              "monthly return aggregation over trades", ("D12",)),
    QuerySpec("q28_ml_dataset", q_ml_dataset, None,
              "supervised feature/label dataset (EWM + windows)", ("E3", "D10", "B13")),
    QuerySpec("q29_ml_signals", q_ml_signals, None,
              "scaler+logreg training, eval, NOW signals", ("E5", "E6", "E7", "E8", "B14")),
]
