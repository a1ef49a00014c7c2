"""Property-based tests (hypothesis): invariants that must hold for
ANY input series, not just the fixtures — the test strategy the
reference lacks entirely (SURVEY §5)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_evm_chain_spark.operators import backtest as bt
from etl_evm_chain_spark.functions.timeseries import resample_ffill

SETTINGS = dict(max_examples=12, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5000),      # ts seconds
        st.floats(min_value=-1e4, max_value=1e4,
                  allow_nan=False, allow_infinity=False),
    ),
    min_size=1, max_size=60, unique_by=lambda t: t[0],
)


@given(series_strategy)
@settings(**SETTINGS)
def test_resample_ffill_invariants(spark, series):
    df = spark.createDataFrame(
        [("k", t, v) for t, v in series], "key string, t long, v double"
    ).selectExpr("key", "timestamp_seconds(t) AS ts", "v")
    out = resample_ffill(df, ts="ts", key="key", value="v", seconds=60) \
        .orderBy("bucket_ts").collect()
    # dense: buckets are contiguous at 60s spacing
    buckets = [r["bucket_ts"] for r in out]
    for a, b in zip(buckets, buckets[1:]):
        assert (b - a).total_seconds() == 60
    # no nulls after ffill (grid starts at first observation)
    assert all(r["v"] is not None for r in out)
    # every output value is one of the input values (last-obs carry)
    vals = {v for _, v in series}
    assert all(r["v"] in vals for r in out)


@given(series_strategy, st.floats(min_value=0.5, max_value=50))
@settings(**SETTINGS)
def test_fsm_pct_trade_invariants(spark, series, threshold):
    df = spark.createDataFrame(
        [("p", t, 100.0 + abs(v) / 100, v / 100) for t, v in series],
        "pool string, ts long, price double, dev double")
    trades = bt.meanrevert_fsm_pct(df, threshold=threshold) \
        .orderBy("entry_ts").collect()
    for t in trades:
        assert t["exit_ts"] > t["entry_ts"]
        assert t["side"] in ("long", "short")
        assert t["entry_price"] > 0 and t["exit_price"] > 0
    # positions never overlap in time
    for a, b in zip(trades, trades[1:]):
        assert b["entry_ts"] >= a["exit_ts"]


@given(st.lists(st.floats(min_value=-100, max_value=100,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=40),
       st.floats(min_value=1.1, max_value=20))
@settings(**SETTINGS)
def test_ewm_matches_pandas_on_random_series(spark, vals, halflife):
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "key string, t long, v double")
    got = [r["ewm"] for r in
           bt.ewm_mean(df, value="v", key="key", order="t",
                       halflife=halflife, min_periods=1).orderBy("t").collect()]
    alpha = 1.0 - 0.5 ** (1.0 / halflife)
    expected = pd.Series(vals).ewm(alpha=alpha, adjust=False, min_periods=1).mean()
    for g, e in zip(got, expected):
        assert g == pytest.approx(e, rel=1e-12, abs=1e-12)


@given(st.lists(
    st.lists(st.floats(min_value=-1e3, max_value=1e3,
                       allow_nan=False, allow_infinity=False,
                       width=32),
             min_size=4, max_size=4),
    min_size=2, max_size=25))
@settings(**SETTINGS)
def test_quantize_int8_invariants(spark, vecs):
    from etl_evm_chain_spark.operators.similarity import (
        dequantize_error_micros,
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    out = dequantize_error_micros(quantize_int8(df, keep_stats=True)) \
        .collect()
    assert len(out) == len(vecs)
    mins = [min(v[j] for v in vecs) for j in range(4)]
    maxs = [max(v[j] for v in vecs) for j in range(4)]
    for r in out:
        codes = r["codes"]
        assert all(-128 <= c <= 127 for c in codes)
        # per-dim reconstruction error ≤ (half a quantization step)²,
        # so the micros sum is bounded by the summed step bound
        bound = sum(((mx - mn) / 255 / 2 + 1e-9) ** 2 * 1e6 + 1
                    for mn, mx in zip(mins, maxs))
        assert 0 <= r["err_micros"] <= bound
        # extremes map to the code range ends
        for j in range(4):
            if vecs[r["vec_id"]][j] == mins[j] and maxs[j] > mins[j]:
                assert codes[j] == -128


@given(st.dictionaries(st.sampled_from("abcdef"),
                       st.integers(min_value=1, max_value=400),
                       min_size=2, max_size=6))
@settings(**SETTINGS)
def test_temperature_sample_rate_monotone_in_count(spark, sizes):
    from etl_evm_chain_spark.operators.curation import temperature_sample

    rows, base = [], 0
    for k, n in sorted(sizes.items()):
        rows += [(base + i, k) for i in range(n)]
        base += n
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_sample(df, key="lang", id_col="doc_id", alpha=0.5)
    rates = {r["lang"]: r["rate_ppm"]
             for r in kept.select("lang", "rate_ppm").distinct().collect()}
    min_n = min(sizes.values())
    for k, n in sizes.items():
        if n == min_n:
            assert rates.get(k) == 1_000_000   # floor category keeps all
    # bigger categories never get a higher keep rate
    for ka, ra in rates.items():
        for kb, rb in rates.items():
            if sizes[ka] < sizes[kb]:
                assert ra >= rb


@given(st.lists(st.integers(min_value=0, max_value=300),
                min_size=1, max_size=120))
@settings(**SETTINGS)
def test_two_phase_time_split_matches_naive_cut(spark, secs):
    """q15's bucketed prefix-sum cut must equal the naive definition
    (smallest second whose cumulative count reaches ceil(0.7*total))
    for ANY multiset of event seconds — heavy duplicate seconds,
    single-second corpora, values hugging bucket boundaries."""
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from etl_evm_chain_spark.plans.relational import q_time_split
    import os
    import tempfile

    # naive python reference
    total = len(secs)
    target = math.ceil(0.7 * total)
    cum, cut = 0, None
    for s in sorted(set(secs)):
        cum += Counter(secs)[s]
        if cum >= target:
            cut = s
            break
    train = [s for s in secs if s <= cut]
    test = [s for s in secs if s > cut]

    d = tempfile.mkdtemp()
    import datetime as _dt

    spark.createDataFrame(
        [(i, _dt.datetime.fromtimestamp(s, _dt.timezone.utc)
             .replace(tzinfo=None))
         for i, s in enumerate(secs)],
        "event_id long, ts timestamp",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {r["split"]: (r["n"], r["min_ts"], r["max_ts"])
           for r in q_time_split(spark, d).collect()}
    assert got["train"] == (len(train), min(train), max(train))
    if test:
        assert got["test"] == (len(test), min(test), max(test))
    else:
        assert "test" not in got


# JSON strings may carry any unicode except unpaired surrogates
# (which cannot round-trip through UTF-8 files at all)
_jsonable_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=120)


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=2**40),
                          st.one_of(st.none(), _jsonable_text)),
                min_size=1, max_size=25))
@settings(**SETTINGS)
def test_jsonl_roundtrip_property(spark, rows):
    """write_jsonl → read_jsonl is the identity for arbitrary unicode
    (control chars, quotes, newlines, astral planes) and NULLs."""
    import tempfile

    from pyspark.sql import functions as F
    from etl_evm_chain_spark.sources.files import read_jsonl, write_jsonl

    data = [(i, t) for i, (k, t) in enumerate(rows)]
    schema = "id long, text string"
    df = spark.createDataFrame(data, schema)
    d = tempfile.mkdtemp()
    write_jsonl(df, d, n_files=2)
    back = read_jsonl(spark, d, df.schema)
    assert back.filter(F.col("_corrupt").isNotNull()).count() == 0
    got = sorted((r.id, r.text) for r in back.collect())
    assert got == sorted(data)


# --------------------- bucketed ranking kit vs window ---------------------

rank_rows = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2", None]),            # group (incl NULL)
        st.integers(min_value=-1000, max_value=1000),   # value
        st.integers(min_value=0, max_value=10**6),      # tiebreak id
    ),
    min_size=1, max_size=80, unique_by=lambda t: t[2],
)


@given(rank_rows, st.integers(min_value=1, max_value=7),
       st.sampled_from(["width", "depth"]))
@settings(**SETTINGS)
def test_bucketed_rank_matches_window_on_random_data(spark, rows, nb,
                                                     edges):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_evm_chain_spark.functions.ranking import bucketed_rank

    df = spark.createDataFrame(rows, "g string, v long, id long")
    got = bucketed_rank(df, "v", ["v", "id"], part_cols=["g"],
                        n_buckets=nb, rank_name="r", total_name="m",
                        edges=edges)
    w = Window.partitionBy("g").orderBy("v", "id")
    want = (df.withColumn("r", F.row_number().over(w))
            .withColumn("m", F.count(F.lit(1)).over(
                Window.partitionBy("g"))))
    a = {(x["g"], x["id"]): (x["r"], x["m"]) for x in got.collect()}
    b = {(x["g"], x["id"]): (x["r"], x["m"]) for x in want.collect()}
    assert a == b


@given(st.lists(st.integers(min_value=0, max_value=10**6),
                min_size=1, max_size=200, unique=True),
       st.integers(min_value=0, max_value=200))
@settings(**SETTINGS)
@pytest.mark.slow
def test_kmv_merge_is_union_sketch_on_random_splits(spark, keys, cut):
    from pyspark.sql import functions as F

    from etl_evm_chain_spark.operators.sketches import (
        kmv_merge_expr, kmv_sketch)

    cut = min(cut, len(keys))
    left, right = keys[:cut] or [keys[0]], keys[cut:] or [keys[-1]]

    def sk(vals):
        df = spark.createDataFrame([(v,) for v in vals], "k long") \
            .withColumn("g", F.lit("g"))
        return kmv_sketch(df, "k", group_cols=["g"], k=16) \
            .collect()[0]["sketch"]

    both = spark.createDataFrame([(sk(left), sk(right))],
                                 "a array<bigint>, b array<bigint>")
    merged = both.select(
        kmv_merge_expr(F.col("a"), F.col("b"), k=16).alias("m")
    ).collect()[0]["m"]
    assert merged == sk(list(dict.fromkeys(left + right)))


# --------------------- budget mix: maximal-prefix law ---------------------

mix_rows = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2", None]),          # source (incl NULL)
        st.integers(min_value=0, max_value=10**6),    # doc id (unique)
        st.integers(min_value=1, max_value=500),      # cost
    ),
    min_size=1, max_size=60, unique_by=lambda t: t[1],
)


@given(mix_rows, st.integers(min_value=1, max_value=9))
@settings(**SETTINGS)
@pytest.mark.slow
def test_budget_mix_selects_maximal_hash_prefix(spark, rows, rate):
    """For every group: the selection is exactly the LONGEST prefix of
    the md5(doc_id) order whose cumulative cost fits the budget —
    computed independently in Python from first principles."""
    import hashlib

    from pyspark.sql import functions as F

    from etl_evm_chain_spark.operators.curation import budget_mix

    df = spark.createDataFrame(rows, "src string, doc_id long, cost long")
    sel = budget_mix(df, part_col="src", cost_col="cost",
                     rate_col=F.lit(rate), key="doc_id", n_buckets=5)
    got = {}
    for r in sel.collect():
        got.setdefault(r["src"], set()).add(r["doc_id"])

    by_src = {}
    for src, did, cost in rows:
        by_src.setdefault(src, []).append((did, cost))
    for src, docs in by_src.items():
        budget = (rate * sum(c for _, c in docs)) // 10
        docs.sort(key=lambda t: (hashlib.md5(str(t[0]).encode())
                                 .hexdigest(), t[0]))
        want, cum = set(), 0
        for did, cost in docs:
            if cum + cost > budget:
                break
            cum += cost
            want.add(did)
        assert got.get(src, set()) == want, (src, budget)
