"""Unit tests for operators/sketches.py (KMV distinct sketches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_evm_chain_spark.operators.sketches import (
    KMV_K, kmv_estimate_expr, kmv_merge_expr, kmv_sketch,
    kmv_sketch_many)


def _ids(spark, lo, hi, grp="g"):
    return spark.range(lo, hi).select(
        F.lit(grp).alias("g"), F.col("id").alias("k"))


def test_kmv_exact_below_k(spark):
    # 10 distinct < k: the sketch holds everything, estimate is exact.
    df = _ids(spark, 0, 10)
    sk = kmv_sketch(df, "k", group_cols=["g"])
    out = sk.select("g", kmv_estimate_expr(F.col("sketch"))
                    .alias("est")).collect()
    assert out[0]["est"] == 10


def test_kmv_estimate_within_stderr(spark):
    # 5000 distinct, k=64 → stderr ≈ 1/sqrt(62) ≈ 12.7%; assert 4σ.
    df = _ids(spark, 0, 5000)
    sk = kmv_sketch(df, "k", group_cols=["g"])
    est = sk.select(kmv_estimate_expr(F.col("sketch"))
                    .alias("e")).collect()[0]["e"]
    assert abs(est - 5000) / 5000 < 0.51


def test_kmv_duplicates_do_not_inflate(spark):
    # 100 distinct keys repeated 50×: same sketch as one copy.
    once = _ids(spark, 0, 100)
    many = once.unionByName(once).unionByName(once)
    s1 = kmv_sketch(once, "k", group_cols=["g"]).collect()[0]["sketch"]
    s2 = kmv_sketch(many, "k", group_cols=["g"]).collect()[0]["sketch"]
    assert s1 == s2


def test_kmv_merge_equals_oneshot(spark):
    # sketch(A ∪ B) == merge(sketch(A), sketch(B)) — incl. overlap.
    a = _ids(spark, 0, 3000)
    b = _ids(spark, 2000, 6000)
    sa = kmv_sketch(a, "k", group_cols=["g"])
    sb = kmv_sketch(b, "k", group_cols=["g"])
    merged = (sa.withColumnRenamed("sketch", "s1")
              .join(sb.withColumnRenamed("sketch", "s2"), "g")
              .select(kmv_merge_expr(F.col("s1"), F.col("s2"))
                      .alias("m")).collect()[0]["m"])
    oneshot = kmv_sketch(a.unionByName(b), "k",
                         group_cols=["g"]).collect()[0]["sketch"]
    assert merged == oneshot
    assert len(merged) == KMV_K


def test_kmv_sketch_many_matches_single(spark):
    # the fused multi-key pass returns exactly the per-key sketches.
    df = spark.range(0, 500).select(
        F.lit("g").alias("g"), F.col("id").alias("x"),
        (F.col("id") % 37).alias("y"))
    fused = kmv_sketch_many(df, {"xs": "x", "ys": "y"}, group_cols=["g"],
                            salts={"xs": "sx", "ys": "sy"}).collect()[0]
    sx = kmv_sketch(df, "x", group_cols=["g"],
                    salt="sx").collect()[0]["sketch"]
    sy = kmv_sketch(df, "y", group_cols=["g"],
                    salt="sy").collect()[0]["sketch"]
    assert fused["xs"] == sx and fused["ys"] == sy


def test_kmv_null_keys_excluded(spark):
    df = spark.range(0, 20).select(
        F.lit("g").alias("g"),
        F.when(F.col("id") < 5, F.col("id")).alias("k"))
    sk = kmv_sketch(df, "k", group_cols=["g"])
    out = sk.select(kmv_estimate_expr(F.col("sketch"))
                    .alias("e")).collect()
    assert out[0]["e"] == 5


def test_kmv_sketch_many_all_null_group_is_empty_sketch(spark):
    # g2's x is entirely NULL: the fused pass must emit an EMPTY
    # sketch (0 distinct), never a NULL that the estimator would turn
    # into a saturated Long.
    from pyspark.sql import types as T
    df = spark.createDataFrame(
        [("g1", 1, 10), ("g1", 2, 11), ("g2", None, 12)],
        T.StructType([
            T.StructField("g", T.StringType()),
            T.StructField("x", T.LongType()),
            T.StructField("y", T.LongType())]))
    out = {r["g"]: r for r in kmv_sketch_many(
        df, {"xs": "x", "ys": "y"}, group_cols=["g"]).collect()}
    assert out["g2"]["xs"] == []
    est = out["g2"]
    got = spark.createDataFrame([(est["xs"],)], "s array<bigint>").select(
        kmv_estimate_expr(F.col("s")).alias("e")).collect()[0]["e"]
    assert got == 0
    # single-key form: a group with zero non-null keys drops entirely
    # (kmv_sketch COUNT-DISTINCT semantics), it never emits NULL
    single = kmv_sketch_many(df, {"xs": "x"}, group_cols=["g"])
    assert {r["g"] for r in single.collect()} == {"g1"}


def test_kmv_estimate_and_merge_tolerate_null_sketch(spark):
    df = spark.createDataFrame([(None,)], "s array<bigint>")
    got = df.select(
        kmv_estimate_expr(F.col("s")).alias("e"),
        kmv_merge_expr(F.col("s"), F.array(F.lit(7)).cast("array<long>"))
        .alias("m")).collect()[0]
    assert got["e"] == 0 and got["m"] == [7]


def test_kmv_sketch_many_rejects_empty_keys(spark):
    import pytest
    with pytest.raises(ValueError, match="at least one"):
        kmv_sketch_many(spark.range(1), {})
