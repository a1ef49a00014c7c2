"""Salted aggregation / replicated skew join: results must equal the
unsalted equivalents on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_evm_chain_spark.functions.skew import replicated_skew_join, salted_agg


def _skewed(spark):
    # key "hot" owns 90% of rows
    rows = [("hot" if i % 10 != 0 else f"k{i}", float(i)) for i in range(2000)]
    return spark.createDataFrame(rows, "key string, v double")


def test_salted_agg_equals_plain_agg(spark):
    df = _skewed(spark)
    got = {
        r["key"]: (r["n"], r["v_sum"], r["v_max"])
        for r in salted_agg(
            df, key="key", n_salts=16, stable_cols=["v"],
            partials={
                "n": (F.count(F.lit(1)), F.sum("n")),
                "v_sum": (F.sum("v"), F.sum("v_sum")),
                "v_max": (F.max("v"), F.max("v_max")),
            }).collect()
    }
    want = {
        r["key"]: (r["n"], r["v_sum"], r["v_max"])
        for r in df.groupBy("key").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("v_sum"),
            F.max("v").alias("v_max")).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0] and got[k][2] == want[k][2]
        assert abs(got[k][1] - want[k][1]) < 1e-6


def test_replicated_skew_join_equals_plain_join(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k0", "ZERO"), ("k10", "TEN")],
        "key string, label string")
    salted = replicated_skew_join(fact, dim, key="key", n_salts=8,
                                  stable_cols=["v"])
    plain = fact.join(dim, "key")
    assert salted.count() == plain.count()
    got = salted.groupBy("label").count().collect()
    want = plain.groupBy("label").count().collect()
    assert {(r["label"], r["count"]) for r in got} == \
           {(r["label"], r["count"]) for r in want}
