"""Curation-operator semantics on micro-data: split stability,
sampling determinism, top-k ties, packing boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from etl_evm_chain_spark.operators.curation import (
    hash_split,
    pack_sequences,
    stratified_sample,
    temperature_sample,
    topk_per_group,
)


def test_hash_split_is_stable_and_partitions(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    a = {r["id"]: r["split"] for r in hash_split(df, key="id").collect()}
    b = {r["id"]: r["split"] for r in hash_split(df, key="id").collect()}
    assert a == b                            # pure function of the key
    counts = {s: list(a.values()).count(s) for s in ("train", "val", "test")}
    assert sum(counts.values()) == 500
    assert counts["train"] > counts["val"]   # ~80/10/10
    assert counts["train"] > counts["test"]


def test_hash_split_membership_survives_new_data(spark):
    small = spark.createDataFrame([(i,) for i in range(100)], "id long")
    big = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    a = {r["id"]: r["split"]
         for r in hash_split(small, key="id").collect()}
    b = {r["id"]: r["split"]
         for r in hash_split(big, key="id").collect() if r["id"] < 100}
    assert a == b                            # no migration when corpus grows


def test_stratified_sample_fraction_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "s%d" % (i % 4)) for i in range(4000)], "id long, src string")
    s1 = stratified_sample(df, key="id", fraction=0.2)
    n = s1.count()
    assert abs(n / 4000 - 0.2) < 0.05        # concentrates near fraction
    assert s1.count() == n                   # deterministic re-run
    per = {r["src"]: r["n"] for r in
           s1.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    for v in per.values():
        assert abs(v / 1000 - 0.2) < 0.08    # each stratum near fraction


def test_topk_per_group_deterministic_ties(spark):
    rows = [("g", 1, 5.0), ("g", 2, 5.0), ("g", 3, 4.0), ("h", 9, 1.0)]
    df = spark.createDataFrame(rows, "grp string, id long, score double")
    got = topk_per_group(df, group="grp",
                         order=[F.desc("score"), F.asc("id")], k=2)
    sel = sorted((r["grp"], r["rank"], r["id"]) for r in got.collect())
    assert sel == [("g", 1, 1), ("g", 2, 2), ("h", 1, 9)]  # tie → lower id


def test_pack_sequences_boundaries(spark):
    rows = [("s", 1, 100), ("s", 2, 100), ("s", 3, 60), ("s", 4, 100)]
    df = spark.createDataFrame(rows, "src string, id long, n long")
    got = {r["id"]: (r["pack_id"], r["start_offset"])
           for r in pack_sequences(df, group="src", order="id", length="n",
                                   context=128).collect()}
    # doc1 starts at 0 → pack0; doc2 starts at 100 → pack0 (straddles);
    # doc3 starts at 200 → pack1; doc4 starts at 260 → pack2
    assert got == {1: (0, 0), 2: (0, 100), 3: (1, 200), 4: (2, 260)}


def test_temperature_sample_flattens_head(spark):
    # 4000 "en" docs vs 250 "fr" docs (16:1) → sqrt flattening keeps
    # fr fully and en at ~sqrt(250/4000)=25%, i.e. a 4:1 kept ratio.
    rows = [(i, "en") for i in range(4000)] + \
           [(4000 + i, "fr") for i in range(250)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_sample(df, key="lang", id_col="doc_id", alpha=0.5)
    per = {r["lang"]: r["n"] for r in
           kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per["fr"] == 250                     # floor category keeps all
    assert abs(per["en"] / 4000 - 0.25) < 0.03  # head tempered to sqrt rate
    rates = {r["lang"]: r["rate_ppm"]
             for r in kept.select("lang", "rate_ppm").distinct().collect()}
    assert rates == {"fr": 1_000_000, "en": 250_000}
    assert kept.count() == per["fr"] + per["en"]  # deterministic re-run


def test_temperature_sample_alpha_one_and_bad_alpha(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, k string")
    all_kept = temperature_sample(df, key="k", id_col="doc_id", alpha=1.0)
    assert all_kept.count() == 2
    with pytest.raises(ValueError):
        temperature_sample(df, key="k", id_col="doc_id", alpha=0.3)


def test_weighted_sample_favors_heavy_rows(spark):
    from etl_evm_chain_spark.operators.curation import weighted_sample

    # 200 light rows (w=1) + 20 heavy rows (w=50): heavy rows are 50x
    # likelier per row — the 30-row sample should be mostly heavy
    rows = [(i, 1) for i in range(200)] + [(1000 + i, 50) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, w int")
    got = [r["id"] for r in
           weighted_sample(df, key="id", weight="w", k=30).collect()]
    heavy = sum(1 for i in got if i >= 1000)
    assert len(got) == 30
    assert heavy >= 12  # expected ~25; deterministic given the hash


def test_weighted_sample_null_weight_is_neutral(spark):
    from etl_evm_chain_spark.operators.curation import weighted_sample

    # NULL weight must behave like weight=1, not clamp to max_weight
    # (least/greatest skip NULLs — ADVICE r2)
    rows = [(i, None) for i in range(200)] + [(1000 + i, 50)
                                              for i in range(20)]
    df = spark.createDataFrame(rows, "id long, w int")
    got = [r["id"] for r in
           weighted_sample(df, key="id", weight="w", k=30).collect()]
    heavy = sum(1 for i in got if i >= 1000)
    assert heavy >= 12  # heavy rows still dominate the null-weight mass
    # and a NULL-weight corpus alone still samples (keys defined)
    nulls_only = spark.createDataFrame(
        [(i, None) for i in range(50)], "id long, w int")
    assert len(weighted_sample(nulls_only, key="id", weight="w",
                               k=10).collect()) == 10


def test_weighted_sample_is_deterministic(spark):
    from etl_evm_chain_spark.operators.curation import weighted_sample

    df = spark.createDataFrame([(i, i % 5 + 1) for i in range(100)],
                               "id long, w int")
    a = {r["id"] for r in weighted_sample(df, key="id", weight="w",
                                          k=10).collect()}
    b = {r["id"] for r in weighted_sample(
        df.repartition(7), key="id", weight="w", k=10).collect()}
    assert a == b  # partitioning-independent


def test_export_shards_layout_and_manifest(spark, tmp_path):
    from etl_evm_chain_spark.operators.curation import (export_shards,
                                                        shard_assignment,
                                                        shard_manifest)

    docs = spark.createDataFrame(
        [(i, f"doc text {i} " * (i % 5 + 1)) for i in range(200)],
        "doc_id long, text string")
    out = str(tmp_path / "shards")
    manifest = export_shards(docs, out, key="doc_id", n_shards=8).collect()

    import os
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(dirs) == len(manifest)  # every manifest shard has a dir
    # files round-trip: per-shard counts match the manifest receipt
    back = spark.read.parquet(out)
    got = {r["shard"]: r["count"] for r in
           back.groupBy("shard").count().collect()}
    assert got == {r["shard"]: r["n_docs"] for r in manifest}
    assert sum(got.values()) == 200
    # recomputing the manifest from the LANDED files reproduces the
    # checksums (content receipt property)
    relanded = shard_manifest(back, key="doc_id").collect()
    assert {r["shard"]: r["checksum"] for r in relanded} == \
        {r["shard"]: r["checksum"] for r in manifest}
    # determinism: a differently-partitioned input assigns identically
    m2 = shard_manifest(shard_assignment(
        docs.repartition(13), key="doc_id", n_shards=8)).collect()
    assert {r["shard"]: (r["n_docs"], r["checksum"]) for r in m2} == \
        {r["shard"]: (r["n_docs"], r["checksum"]) for r in manifest}


def test_budget_mix_strict_budgets_and_order(spark):
    from etl_evm_chain_spark.operators.curation import budget_mix

    rows = [("a", i, 100) for i in range(10)]          # tot=1000
    rows += [("b", 100 + i, 400) for i in range(3)]    # tot=1200
    df = spark.createDataFrame(rows, "src string, doc_id long, cost long")
    # rate 2 tenths => budgets: a=200 (2 docs), b=240 (0 docs: first
    # row alone costs 400 > 240 — strict cut selects nothing)
    sel = budget_mix(df, part_col="src", cost_col="cost",
                     rate_col=F.lit(2), key="doc_id", n_buckets=4)
    got = sel.groupBy("src").count().collect()
    assert {r["src"]: r["count"] for r in got} == {"a": 2}
    picked = sorted(r["doc_id"] for r in sel.collect())
    # selection = the 2 lowest md5(doc_id) keys of group a
    import hashlib
    want = sorted(range(10),
                  key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:2]
    assert picked == sorted(want)
    # _cum carries the running cost; max selected cum <= budget
    assert sel.agg(F.max("_cum")).first()[0] <= 200


def test_budget_mix_null_group_key(spark):
    from etl_evm_chain_spark.operators.curation import budget_mix

    rows = [("a", i, 100) for i in range(4)]
    rows += [(None, 100 + i, 100) for i in range(4)]
    df = spark.createDataFrame(rows, "src string, doc_id long, cost long")
    # rate 5 tenths => each group's budget 200 => 2 docs per group,
    # including the NULL-source group (a real window partition)
    sel = budget_mix(df, part_col="src", cost_col="cost",
                     rate_col=F.lit(5), key="doc_id", n_buckets=4)
    got = {r["src"]: r["n"] for r in
           sel.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {"a": 2, None: 2}


# ---------------------------------------------------------------------------
# curation_funnel: end-to-end disposition ledger. The registry fixture
# never exercises exact_dup or NULL text, so this synthetic corpus
# drives every stage and the first-stage-wins precedence rule.
# ---------------------------------------------------------------------------

_FB = ("the quick brown fox jumps over the lazy dog and the sleepy "
       "cat of the old town walks to the green river in the quiet "
       "night while the birds of the valley sing and the wind of "
       "the hills blows softly over the fields near the farm")
_FE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
_FC = ("the story of the morning begins and the light of the sun "
       "rises to the top of the hill in the cold air " + _FE)


def _funnel_rows():
    return [
        (1, "srcA", _FB + " one"),
        # same normalized text as 1 (case + whitespace differences)
        (2, "srcA", "  " + (_FB + " one").upper().replace(" ", "  ")),
        # shares the long base prefix with 1: near-dup, not exact
        (3, "srcA", _FB + " two three four five six"),
        (4, "srcA", "!!! ??? ;;; ,,, ..."),          # punct soup
        (5, "srcA", None),                             # NULL text
        (6, "srcA", _FC),                              # embeds eval doc
        (7, "srcA", _FB.replace("fox", "owl").replace("dog", "hen")
                        .replace("cat", "bee").replace("town", "port")
                        .replace("river", "ridge").replace("night", "noon")
                        .replace("birds", "goats").replace("valley", "plain")
                        .replace("wind", "rain").replace("hills", "dunes")
                        .replace("fields", "yards").replace("farm", "mill")
                        .replace("quick", "small").replace("brown", "plump")
                        .replace("lazy", "tall").replace("sleepy", "proud")
                        .replace("old", "new").replace("green", "grey")
                        .replace("quiet", "loud") + " seven"),
        # exact copy of the quality-failing 4: precedence — labeled
        # quality, never reaches the exact-dedup stage
        (11, "srcA", "!!! ??? ;;; ,,, ..."),
    ]


def test_curation_funnel_dispositions(spark):
    from etl_evm_chain_spark.operators.curation import curation_funnel

    docs = spark.createDataFrame(
        [(i, s, t, len(t) if t else 0) for i, s, t in _funnel_rows()],
        "doc_id long, source string, text string, n_chars long")
    evaldf = spark.createDataFrame([(100, "eval", _FE, len(_FE))],
                                   docs.schema)
    out = curation_funnel(docs, eval_docs=evaldf, part_col="source",
                          rate_col=F.lit(5), min_quality=0.45,
                          n_buckets=8)
    got = {r["doc_id"]: r["stage"] for r in out.collect()}
    # every input doc appears exactly once
    assert sorted(got) == [r[0] for r in _funnel_rows()]
    assert got[2] == "exact_dup"
    assert got[3] == "near_dup"
    assert got[4] == "quality"
    assert got[5] == "quality"          # NULL text scores 0
    assert got[11] == "quality"         # precedence over exact_dup
    assert got[6] == "contaminated"
    # rate 5 → budget = floor((230+226)/2) = 228 chars, and the FIXED
    # md5 order puts doc 7 (226 chars, md5("7") < md5("1")) first:
    # cum 226 <= 228 keeps it, doc 1's cum 456 is over. NOTE the strict
    # prefix rule is order-sensitive — resizing either text can
    # legitimately change BOTH labels (e.g. first doc already > budget
    # → zero kept), so pin the exact expected dispositions:
    assert got[7] == "kept" and got[1] == "over_budget"
    # stage column is exhaustive
    assert set(got.values()) <= {"quality", "exact_dup", "near_dup",
                                 "contaminated", "over_budget", "kept"}


def test_curation_funnel_conservation(spark):
    """Disposition is a PARTITION of the input: n_docs and n_chars per
    source are conserved across stages (no doc lost or double-counted
    by the six union branches)."""
    from etl_evm_chain_spark.operators.curation import curation_funnel

    docs = spark.createDataFrame(
        [(i, s, t, len(t) if t else 0) for i, s, t in _funnel_rows()],
        "doc_id long, source string, text string, n_chars long")
    evaldf = spark.createDataFrame([(100, "eval", _FE, len(_FE))],
                                   docs.schema)
    out = curation_funnel(docs, eval_docs=evaldf, part_col="source",
                          rate_col=F.lit(5), min_quality=0.45,
                          n_buckets=8)
    a = out.agg(F.count("*"), F.sum("n_chars")).collect()[0]
    b = docs.agg(F.count("*"), F.sum("n_chars")).collect()[0]
    assert tuple(a) == tuple(b)


def test_leakage_safe_split_never_straddles_clusters(spark):
    """Property: every near-dup cluster lands wholly inside one split,
    where the plain doc-id hash_split demonstrably straddles some
    cluster on the same data (i.e. the operator changes the outcome,
    not just relabels it)."""
    from etl_evm_chain_spark.operators.curation import (hash_split,
                                                        leakage_safe_split)
    from etl_evm_chain_spark.operators.dedup import (resolve_duplicates,
                                                     verified_near_dups)

    # 40 clusters of 3 near-identical docs each: ids i, i+1000, i+2000
    rows = []
    for i in range(40):
        t = _FB + f" cluster{i} marker{i} extra{i}"
        rows.append((i, "s", t))
        rows.append((i + 1000, "s", t + " tail"))
        rows.append((i + 2000, "s", t + " coda end"))
    docs = spark.createDataFrame(
        [(i, s, t, len(t)) for i, s, t in rows],
        "doc_id long, source string, text string, n_chars long")
    pairs = verified_near_dups(docs, threshold=0.5)
    resolved = resolve_duplicates(docs.select("doc_id"), pairs)

    def straddles(assigned):
        return (assigned.join(resolved, "doc_id")
                .groupBy(F.col("canonical").alias("c"))
                .agg(F.countDistinct("split").alias("ns"))
                .filter(F.col("ns") > 1).count())

    safe = leakage_safe_split(docs, resolved=resolved)
    assert straddles(safe.select("doc_id", "split")) == 0
    # members of one cluster differ in doc_id, so the id-hash split
    # scatters at least one cluster across splits
    naive = hash_split(docs, key="doc_id")
    assert straddles(naive.select("doc_id", "split")) > 0
    # and the split is a pure function of the cluster: every member
    # carries its canonical's assignment
    canon_split = {r["doc_id"]: r["split"]
                   for r in safe.filter(F.col("doc_id") < 40).collect()}
    for r in safe.collect():
        assert r["split"] == canon_split[r["canonical"]]


def test_leakage_safe_split_keeps_singletons_not_in_resolution(spark):
    """A resolution mapping covering only pair-touched ids must not
    drop singleton documents: they inherit their own id as canonical
    and the split stays a total partition of the input."""
    from etl_evm_chain_spark.operators.curation import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, "s", f"text {i}", 10) for i in range(20)],
        "doc_id long, source string, text string, n_chars long")
    # mapping covers only ids 0-4 (a dup cluster); 5-19 are singletons
    resolved = spark.createDataFrame(
        [(i, 0) for i in range(5)], "doc_id long, canonical long")
    out = leakage_safe_split(docs, resolved=resolved)
    rows = out.collect()
    assert len(rows) == 20                      # nothing dropped
    got = {r["doc_id"]: (r["canonical"], r["split"]) for r in rows}
    assert all(got[i][0] == 0 for i in range(5))        # cluster intact
    assert all(got[i][0] == i for i in range(5, 20))    # own id fallback
    assert len({got[i][1] for i in range(5)}) == 1      # one split


def test_neardup_estimate_envelope_is_pinned(spark):
    """The funnel's estimate-only drop rule (k=64/16-band minhash at
    SFUNNEL_EST_MIN) must stay inside its documented envelope against
    exact shingle Jaccard at FUNNEL_JACCARD: on the fixture corpus the
    realized confusion is ZERO in both directions (measured r7 at
    sf0.001/0.01/0.1 — 28/25/256 dup pairs, no false drops, no false
    keeps). A geometry retune that introduces confusion fails here
    loudly instead of silently shipping worse dedup — the q126
    recall-floor discipline applied to the estimate path."""
    from etl_evm_chain_spark.plans.curation_q import q_neardup_envelope

    r = q_neardup_envelope(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_exact_dup"] >= 28   # fixture really exercises the gate
    assert r["n_both"] == r["n_exact_dup"] == r["n_est_dup"]
    assert r["false_drop"] == 0
    assert r["false_keep"] == 0


def test_neardup_envelope_diverging_corpus(spark):
    """On corpora built to sit NEAR the threshold the gate must count
    honestly: pairs whose exact Jaccard straddles FUNNEL_JACCARD while
    the 64-slot estimate flips the other way land in false_drop /
    false_keep, never silently in n_both. Prefix-sharing pairs with
    exact J = (p-2)/(50-p) for p in {24, 19, 17, 6} sweep the 0.5
    threshold (0.846 / 0.548 / 0.455 / 0.09); over the two pinned
    seeds the universal hash family realizes at least one confusion
    in EACH direction (measured r7: seed 2 -> 1 false drop + 1 false
    keep, seed 4 -> same shape), and the counter identities hold per
    corpus."""
    import random

    from etl_evm_chain_spark.operators.dedup import ngram_jaccard_pairs
    from etl_evm_chain_spark.plans.curation_q import (FUNNEL_JACCARD,
                                                      q_neardup_envelope)
    import etl_evm_chain_spark.plans.curation_q as cq

    total_fd = total_fk = 0
    for seed in (2, 4):
        rng = random.Random(seed)
        n = 26
        rows = []
        prefixes = [24, 19, 17, 6, 24, 19, 17, 6]
        rng.shuffle(prefixes)
        for fam, p in enumerate(prefixes):
            base = [f"s{seed}f{fam}w{j}" for j in range(n)]
            rng.shuffle(base)
            rows.append((2 * fam, " ".join(base)))
            variant = base[:p] + [f"s{seed}f{fam}x{j}"
                                  for j in range(n - p)]
            rows.append((2 * fam + 1, " ".join(variant)))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        real_load = cq.load_table
        cq.load_table = lambda sp, d, t: docs
        try:
            r = q_neardup_envelope(spark, "/unused").collect()[0]
        finally:
            cq.load_table = real_load
        exact = ngram_jaccard_pairs(docs, threshold=FUNNEL_JACCARD)
        assert r["n_exact_dup"] == exact.count()
        assert r["n_est_dup"] == r["n_both"] + r["false_drop"]
        assert r["n_exact_dup"] == r["n_both"] + r["false_keep"]
        total_fd += r["false_drop"]
        total_fk += r["false_keep"]
    # the sweep must genuinely exercise BOTH confusion classes
    assert total_fd > 0
    assert total_fk > 0
