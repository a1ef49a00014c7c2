"""Tests for operators/expectations.py and operators/matview.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_evm_chain_spark.operators.expectations import (
    expect, expect_foreign_key, expect_in_set, expect_not_null,
    expect_unique, run_expectations)
from etl_evm_chain_spark.operators.matview import (
    aggregate_state, finalize_state, merge_states)


def _report(df, checks):
    rows = run_expectations(df, checks).collect()
    return {r["check"]: (r["violations"], r["total"], r["passed"])
            for r in rows}


def test_expectations_expr_unique_fk(spark):
    fact = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", -5.0), (3, None, 3.0),
         (3, "a", None), (4, "z", 7.0)],
        "id long, code string, val double")
    dim = spark.createDataFrame([("a",), ("b",), ("c",)], "code string")
    rep = _report(fact, [
        expect_not_null("code_not_null", "code"),
        expect("val_positive", F.col("val") > 0),      # NULL val → violation
        expect_in_set("code_domain", "code", ["a", "b", "c"]),
        expect_unique("id_unique", "id"),
        expect_foreign_key("code_fk", "code", dim, "code"),
    ])
    assert rep["code_not_null"] == (1, 5, 0)
    assert rep["val_positive"] == (2, 5, 0)            # -5 and NULL
    assert rep["code_domain"] == (2, 5, 0)             # None and 'z'
    assert rep["id_unique"] == (1, 5, 0)               # id=3 twice
    assert rep["code_fk"] == (2, 5, 0)                 # None and 'z' orphans


def test_expectations_all_pass(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, c string")
    rep = _report(df, [expect_not_null("nn", "c"),
                       expect_unique("uq", ["id", "c"])])
    assert rep == {"nn": (0, 2, 1), "uq": (0, 2, 1)}


def test_expectations_validation_errors(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="no expectations"):
        run_expectations(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        run_expectations(df, [expect_not_null("a", "id"),
                              expect_unique("a", "id")])
    with pytest.raises(ValueError, match="arity"):
        expect_foreign_key("fk", ["id"], df, ["a", "b"])


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_matview_monoid_merge_orders(spark):
    df = spark.createDataFrame(
        [("a", 1.5), ("a", 2.5), ("b", -1.0), ("b", None),
         ("c", None), ("a", 4.0), ("b", 0.25)],
        "k string, v double")
    one_shot = aggregate_state(df, "k", "v")
    parts = [df.filter(F.crc32(F.concat_ws("|", "k", "v")) % 3 == i)
             for i in range(3)]
    states = [aggregate_state(p, "k", "v") for p in parts]
    # two different fold orders, both must equal the one-shot state
    left = merge_states(merge_states(states[0], states[1], "k"),
                        states[2], "k")
    right = merge_states(states[0],
                         merge_states(states[2], states[1], "k"), "k")
    assert _rows(left) == _rows(one_shot)
    assert _rows(right) == _rows(one_shot)


def test_matview_empty_identity_and_nulls(spark):
    df = spark.createDataFrame([("a", 1.0), ("n", None)],
                               "k string, v double")
    state = aggregate_state(df, "k", "v")
    empty = aggregate_state(df.limit(0), "k", "v")
    assert _rows(merge_states(state, empty, "k")) == _rows(state)
    fin = {r["k"]: r for r in finalize_state(state).collect()}
    assert fin["a"]["n"] == 1 and fin["a"]["avg"] == 1.0
    # all-NULL group: n=0, measures NULL, avg NULL (no divide-by-zero)
    assert fin["n"]["n"] == 0 and fin["n"]["sum"] is None
    assert fin["n"]["avg"] is None


def test_expectations_empty_input_reports_zero_violations(spark):
    df = spark.createDataFrame([], "id long, c string")
    dim = spark.createDataFrame([(1,)], "id long")
    rep = _report(df, [
        expect_not_null("nn", "c"),
        expect_unique("uq", "id"),
        expect_foreign_key("fk", "id", dim, "id"),
    ])
    # an empty ingest is vacuously valid: 0 violations, passed=1, no NULLs
    assert rep == {"nn": (0, 0, 1), "uq": (0, 0, 1), "fk": (0, 0, 1)}


def test_expectations_reject_dotted_names(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="must not contain"):
        run_expectations(df, [expect_not_null("a.b", "id")])
    with pytest.raises(ValueError, match="must not contain"):
        run_expectations(df, [expect_not_null("a`b", "id")])


def test_matview_var_std_match_population_stats(spark):
    import math
    vals = [3.25, 7.5, 7.5, 11.0, 42.125, 0.5]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "k string, v double")
    fin = finalize_state(aggregate_state(df, "k", "v")).first()
    mean = sum(vals) / len(vals)
    var = sum((v - mean) ** 2 for v in vals) / len(vals)
    assert fin["avg"] == pytest.approx(mean, rel=1e-12)
    assert fin["var"] == pytest.approx(var, rel=1e-9)
    assert fin["std"] == pytest.approx(math.sqrt(var), rel=1e-9)
    # single value: exact zero variance (the clamp guards residue)
    one = finalize_state(aggregate_state(
        spark.createDataFrame([("g", 5.5)], "k string, v double"),
        "k", "v")).first()
    assert one["var"] == 0.0 and one["std"] == 0.0


def test_matview_out_of_domain_var_is_null_not_zero(spark):
    """Values past the (18,6) square domain: ANSI raises loudly; with
    ANSI off the squares are NULL and var/std must be NULL-unknown —
    never the clamp's confident 0.0 — and merging must not turn a
    poisoned cell into a partial sum, while n=0 identity states must
    not poison good groups."""
    df = spark.createDataFrame(
        [("big", 2.0e12), ("big", 5.0), ("ok", 3.0), ("nul", None)],
        "k string, v double")
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        st = aggregate_state(df, "k", "v")
        fin = {r["k"]: r for r in finalize_state(st).collect()}
        assert fin["big"]["n"] == 2 and fin["big"]["sumsq"] is None
        assert fin["big"]["var"] is None and fin["big"]["std"] is None
        assert fin["ok"]["var"] == 0.0
        # merge: poisoned stays poisoned; identity (n=0) never poisons
        merged = {r["k"]: r for r in merge_states(
            st, aggregate_state(df.filter("v is null"), "k", "v"),
            "k").collect()}
        assert merged["big"]["sumsq"] is None
        assert merged["ok"]["sumsq"] is not None
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_histogram_counts_bins_clamp_and_null_exclusion(spark):
    from etl_evm_chain_spark.operators.expectations import histogram_counts

    rows = [(0, -0.5), (0, 0.0), (0, 0.49), (0, 0.5), (0, 0.999),
            (0, 1.0), (0, 7.5), (0, None), (0, float("nan")),
            (1, 0.25), (1, float("inf")), (1, float("-inf")),
            (1, 1e300)]
    df = spark.createDataFrame(rows, "epoch int, v double")
    got = {(r["epoch"], r["bin"]): r["n"]
           for r in histogram_counts(df, "v", n_bins=4,
                                     keys=("epoch",)).collect()}
    # -0.5 clamps to bin 0; 1.0 and 7.5 clamp to bin 3; NULL/NaN drop;
    # ±Infinity and beyond-long doubles clamp to the edge bins instead
    # of throwing CAST_OVERFLOW under ANSI (the clamp runs on the
    # double ratio BEFORE the int cast — ADVICE r7)
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (0, 3): 3,
                   (1, 0): 1, (1, 1): 1, (1, 3): 2}
    import pytest
    with pytest.raises(ValueError):
        histogram_counts(df, "v", n_bins=0)
    with pytest.raises(ValueError):
        histogram_counts(df, "v", lo=1.0, hi=1.0)


def test_tv_drift_exact_numerator_vs_python(spark):
    from etl_evm_chain_spark.operators.expectations import tv_drift

    # bins missing on either side must zero-fill into the numerator
    hist_rows = [(0, 0, 4), (0, 1, 6),            # baseline: N=10
                 (1, 0, 1), (1, 2, 9),            # epoch 1: N=10, bin 2 new
                 (2, 1, 5)]                       # epoch 2: N=5
    hist = spark.createDataFrame(hist_rows, "epoch int, bin int, n long")
    got = {r["epoch"]: (r["n_rows"], r["base_rows"], int(r["tv_num"]))
           for r in tv_drift(hist, key="epoch", baseline=0).collect()}

    counts = {e: {} for e in (0, 1, 2)}
    for e, b, n in hist_rows:
        counts[e][b] = n
    bins = {b for _, b, _ in hist_rows}
    base, m_tot = counts[0], sum(counts[0].values())
    want = {}
    for e, c in counts.items():
        n_tot = sum(c.values())
        tv = sum(abs(c.get(b, 0) * m_tot - base.get(b, 0) * n_tot)
                 for b in bins)
        want[e] = (n_tot, m_tot, tv)
    assert got == want
    assert got[0][2] == 0                          # baseline drift is 0
    # identical distributions at different sizes drift by 0
    h2 = spark.createDataFrame([(0, 0, 2), (0, 1, 2),
                                (1, 0, 6), (1, 1, 6)],
                               "epoch int, bin int, n long")
    r = {x["epoch"]: int(x["tv_num"])
         for x in tv_drift(h2, key="epoch", baseline=0).collect()}
    assert r == {0: 0, 1: 0}


def test_histogram_epochs_fold_like_matview(spark, tmp_path):
    """Per-epoch histograms are a count monoid: landing each chunk's
    histogram through the stream_matview epoch ledger keyed
    (epoch, bin) and folding (read_matview) must equal the one-shot
    histogram of the full corpus — the incremental == one-shot law
    for the drift monitor's state."""
    from etl_evm_chain_spark.catalog import load_table
    from etl_evm_chain_spark.functions.text import quality_score
    from etl_evm_chain_spark.operators.expectations import histogram_counts
    from etl_evm_chain_spark.streaming import pipeline as sp

    docs = (load_table(spark, "/root/testdata/sf0.001", "documents")
            .filter(F.col("text").isNotNull()))
    scored = docs.select(
        F.pmod(F.col("doc_id"), F.lit(3)).cast("int").alias("epoch"),
        quality_score("text").alias("q"),
        F.col("doc_id"))
    binned = scored.select(
        "epoch",
        F.least(F.greatest(F.floor(F.col("q") * 16).cast("int"),
                           F.lit(0)), F.lit(15)).alias("bin"),
        F.lit(1.0).alias("v"))
    src = str(tmp_path / "drift_src")
    std = str(tmp_path / "drift_state")
    for c in range(2):
        binned.filter(F.col("epoch") % 2 == c).coalesce(1) \
            .write.mode("append").parquet(src)
    stream = spark.readStream.schema("epoch int, bin int, v double") \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = sp.stream_matview(stream, state_dir=std,
                          checkpoint=str(tmp_path / "drift_ckpt"),
                          keys=["epoch", "bin"], value="v")
    q.awaitTermination(120)
    folded = {(r["epoch"], r["bin"]): r["n"]
              for r in sp.read_matview(spark, std,
                                       ["epoch", "bin"]).collect()}
    oneshot = {(r["epoch"], r["bin"]): r["n"]
               for r in histogram_counts(scored, "q", n_bins=16,
                                         keys=("epoch",)).collect()}
    assert folded == oneshot


def test_tv_drift_missing_baseline_trips(spark):
    import pytest

    from etl_evm_chain_spark.operators.expectations import tv_drift

    hist = spark.createDataFrame([(1, 0, 4), (2, 1, 6)],
                                 "epoch int, bin int, n long")
    with pytest.raises(Exception, match="baseline key has no"):
        tv_drift(hist, key="epoch", baseline=0).collect()


# ---------------------------------------------------------------------------
# q135 sketch-accuracy gate: the floors a KMV_K / CM_WIDTH retune must
# re-prove (tools/check_gates.py runs the same assertions at every sf;
# the r7 lesson is that hash-parity alone cannot catch an accuracy
# regression in an approximation).
# ---------------------------------------------------------------------------

def test_sketch_error_gate_floors_sf0001(spark):
    from etl_evm_chain_spark.operators.sketches import KMV_K
    from etl_evm_chain_spark.plans.quality_q import q_sketch_error_gate

    rows = q_sketch_error_gate(spark, "/root/testdata/sf0.001").collect()
    methods = {r["method"] for r in rows}
    assert methods == {"kmv", "cm", "samp"}
    for r in rows:
        assert r["within"] == 1, (
            f"{r['method']} {r['grp']} outside its guarantee: "
            f"exact {r['exact_n']} est {r['est_n']} err {r['err_ppm']}")
        assert r["err_ppm"] >= 0
    # count-min can only over-count — a single under-count means the
    # probe read the wrong counter space
    for r in rows:
        if r["method"] == "cm":
            assert r["est_n"] >= r["exact_n"]
    # groups whose cardinality is under k take the sketch's exact
    # branch — the estimate IS the count, so the error must be zero
    # (user_id cardinality at sf0.001 is far below KMV_K)
    exact_branch = [r for r in rows
                    if r["method"] == "kmv"
                    and r["grp"].startswith("users:")
                    and r["exact_n"] < KMV_K]
    assert exact_branch, "fixture drifted: no exact-branch group left"
    assert all(r["err_ppm"] == 0 for r in exact_branch)


def test_sketch_gate_err_ppm_is_integer_division(spark):
    # the statistic must be engine-portable integer arithmetic:
    # (err * 1e6) div exact with truncation — both operands
    # non-negative, so Spark `div` and DuckDB `//` agree exactly
    df = spark.createDataFrame([(7, 3)], "e long, x long")
    got = df.select(
        F.expr("(e * 1000000) div greatest(x, 1)").alias("p")).first()["p"]
    assert got == 7000000 // 3
