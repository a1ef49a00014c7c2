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


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

from etl_evm_chain_spark.operators.sketches import (  # noqa: E402
    CM_DEPTH, CM_WIDTH, cm_estimate, cm_merge, cm_sketch)


def _occurrences(spark, counts: dict):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_cm_estimate_never_undercounts(spark):
    # the CM guarantee: est >= true for EVERY key, even with a tiny
    # width forcing heavy collisions
    counts = {f"w{i}": (i % 7) + 1 for i in range(500)}
    occ = _occurrences(spark, counts)
    sk = cm_sketch(occ, "k", width=32)
    probes = occ.select("k").distinct()
    est = {r["k"]: r["est_cnt"]
           for r in cm_estimate(sk, probes, "k", width=32).collect()}
    assert len(est) == 500
    assert all(est[k] >= n for k, n in counts.items())


def test_cm_exact_without_collisions(spark):
    # few keys, default width: whp no collisions → estimates exact
    counts = {"alpha": 5, "beta": 3, "gamma": 11}
    occ = _occurrences(spark, counts)
    sk = cm_sketch(occ, "k")
    est = {r["k"]: r["est_cnt"]
           for r in cm_estimate(sk, occ, "k").collect()}
    assert est == counts


def test_cm_weighted_equals_occurrences(spark):
    # sketching the (key, count) aggregate must equal sketching the
    # raw occurrence stream — identical cell sums
    counts = {f"t{i}": i + 1 for i in range(50)}
    occ = _occurrences(spark, counts)
    agg = occ.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    s1 = {(r["depth"], r["cell"]): r["cnt"]
          for r in cm_sketch(occ, "k").collect()}
    s2 = {(r["depth"], r["cell"]): r["cnt"]
          for r in cm_sketch(agg, "k", weight_col="n").collect()}
    assert s1 == s2


def test_cm_merge_equals_oneshot(spark):
    a = _occurrences(spark, {"x": 3, "y": 2})
    b = _occurrences(spark, {"y": 4, "z": 1})
    merged = {(r["depth"], r["cell"]): r["cnt"]
              for r in cm_merge(cm_sketch(a, "k"),
                                cm_sketch(b, "k")).collect()}
    oneshot = {(r["depth"], r["cell"]): r["cnt"]
               for r in cm_sketch(a.unionByName(b), "k").collect()}
    assert merged == oneshot


def test_cm_sketch_bounded_and_null_free(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",), ("a",)], "k string")
    sk = cm_sketch(df, "k")
    rows = sk.collect()
    # NULL keys excluded: total mass = 3 occurrences × depth rows
    assert sum(r["cnt"] for r in rows) == 3 * CM_DEPTH
    assert sk.count() <= CM_DEPTH * CM_WIDTH
    assert all(0 <= r["cell"] < CM_WIDTH and 0 <= r["depth"] < CM_DEPTH
               for r in rows)


def test_cm_probe_of_unseen_key_is_zero(spark):
    occ = _occurrences(spark, {"seen": 4})
    sk = cm_sketch(occ, "k")
    probes = spark.createDataFrame([("nope",)], "k string")
    est = cm_estimate(sk, probes, "k").collect()
    # an unseen key may collide into a counted cell, but with one key
    # in a 4×1024 sketch a collision across all 4 depths is
    # deterministic-hash-impossible here
    assert est[0]["est_cnt"] == 0


def test_cm_geometry_mismatch_raises(spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    occ = _occurrences(spark, {"a": 3, "b": 2})
    sk_narrow = cm_sketch(occ, "k", width=32)
    # estimating with the default width against a width-32 sketch
    # must FAIL LOUDLY, not silently undercount
    with pytest.raises(Exception) as ei:
        cm_estimate(sk_narrow, occ, "k").collect()
    assert "geometry mismatch" in str(ei.value)
    # merging sketches of different geometry likewise
    sk_wide = cm_sketch(occ, "k")
    with pytest.raises((Py4JJavaError, Exception)):
        cm_merge(sk_narrow, sk_wide).collect()


def test_cm_estimate_rejects_colliding_key_name(spark):
    import pytest

    occ = _occurrences(spark, {"a": 1})
    sk = cm_sketch(occ, "k")
    probes = occ.select(F.col("k").alias("cell"))
    with pytest.raises(ValueError, match="collides"):
        cm_estimate(sk, probes, "cell")


def test_stream_token_sketch_rejects_zero_geometry(spark):
    import pytest

    from etl_evm_chain_spark.streaming import pipeline as sp

    with pytest.raises(ValueError, match="positive"):
        sp.stream_token_sketch(spark.range(1), sketch_dir="/tmp/x",
                               checkpoint="/tmp/y", depth=0)
