"""Golden tests for the stateful operators (EWM recursion, trade FSMs,
ML dataset) — oracle SQL can't express these, so correctness is pinned
against hand-computed expectations and pandas itself."""

from __future__ import annotations

import pandas as pd

from etl_evm_chain_spark.operators import backtest as bt
from etl_evm_chain_spark.operators import mlplane as ml


def test_ewm_matches_pandas_exactly(spark):
    vals = [1.0, 5.0, 3.0, 8.0, 2.0, 9.0, 4.0, 7.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "key string, t long, v double"
    )
    out = bt.ewm_mean(df, value="v", key="key", order="t",
                      halflife=3.0, min_periods=2).orderBy("t").collect()
    alpha = 1.0 - 0.5 ** (1.0 / 3.0)
    expected = pd.Series(vals).ewm(alpha=alpha, adjust=False, min_periods=2).mean()
    got = [r["ewm"] for r in out]
    assert got[0] is None  # min_periods mask
    for g, e in zip(got[1:], expected[1:]):
        assert abs(g - e) < 1e-15


def test_fsm_pct_long_roundtrip(spark):
    # dev dips to -5 (open long at t=1, price 90), recovers through 0
    # at t=3 (close at price 105) → one long trade, +16.67%.
    rows = [
        ("p", 0, 100.0, -1.0),
        ("p", 1, 90.0, -5.0),
        ("p", 2, 95.0, -2.0),
        ("p", 3, 105.0, 0.5),
        ("p", 4, 100.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "pool string, ts long, price double, dev double")
    trades = bt.meanrevert_fsm_pct(df, threshold=4.0).collect()
    assert len(trades) == 1
    t = trades[0]
    assert t["side"] == "long" and t["entry_ts"] == 1 and t["exit_ts"] == 3
    assert abs(t["pct_return"] - (105.0 / 90.0 - 1) * 100) < 1e-12


def test_fsm_pct_short_and_open_position_dropped(spark):
    rows = [
        ("p", 0, 100.0, 5.0),   # open short
        ("p", 1, 95.0, -0.5),   # close short → +5.26%
        ("p", 2, 90.0, -6.0),   # open long, never closes
    ]
    df = spark.createDataFrame(rows, "pool string, ts long, price double, dev double")
    trades = bt.meanrevert_fsm_pct(df, threshold=4.0).collect()
    assert len(trades) == 1
    t = trades[0]
    assert t["side"] == "short"
    assert abs(t["pct_return"] - -(95.0 / 100.0 - 1) * 100) < 1e-12


def test_fsm_zscore_time_stop(spark):
    # |z| stays above exit_z forever → position closes via max_hold.
    rows = [("p", i, 100.0 + i, -2.0 if i == 0 else -1.5) for i in range(6)]
    df = spark.createDataFrame(rows, "pool string, ts long, price double, z double")
    trades = bt.meanrevert_fsm_zscore(df, entry_z=1.8, exit_z=0.5,
                                      max_hold=3).collect()
    assert len(trades) == 1
    t = trades[0]
    assert t["entry_ts"] == 0 and t["exit_ts"] == 3 and t["held_rows"] == 3
    assert t["entry_z"] == -2.0 and t["exit_z"] == -1.5


def test_fsm_groups_isolated(spark):
    # two pools, each with its own open/close — no cross-pool state.
    rows = [
        ("a", 0, 100.0, -5.0), ("a", 1, 110.0, 1.0),
        ("b", 0, 50.0, 5.0), ("b", 1, 45.0, -1.0),
    ]
    df = spark.createDataFrame(rows, "pool string, ts long, price double, dev double")
    trades = {r["pool"]: r for r in bt.meanrevert_fsm_pct(df, threshold=4.0).collect()}
    assert trades["a"]["side"] == "long" and trades["b"]["side"] == "short"


def test_ml_dataset_label_and_filter(spark):
    # bias constant 10 → devdt = v - 10; keep devdt < 0 rows only;
    # label: future-horizon max(devdt) - devdt >= 2.
    rows = [("k", 0, 8.0), ("k", 1, 7.0), ("k", 2, 10.5), ("k", 3, 9.0),
            ("k", 4, 8.5)]
    df = spark.createDataFrame(rows, "event_type string, bucket long, value double") \
        .withColumn("bias", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(10.0))
    ds = ml.build_ml_dataset(df, key="event_type", ts="bucket", value="value",
                             std_win=3, sigma_min=0.5, horizon=2, target=2.0)
    got = {r["bucket"]: r["y"] for r in ds.collect()}
    # t=0: devdt=-2, future max(-3, 0.5) - (-2) = 2.5 >= 2 → y=1
    # t=1: devdt=-3, future max(0.5, -1) + 3 = 3.5 → y=1
    # t=2 excluded (devdt=0.5 not < 0)
    # t=3: devdt=-1, future max(-1.5) + 1 = -0.5 → y=0
    # t=4: no future rows → lead_max null → dropped
    assert got == {0: 1, 1: 1, 3: 0}
