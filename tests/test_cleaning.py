"""PII scrub + decontamination operators (operators/cleaning.py)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_evm_chain_spark.operators.cleaning import (
    contamination,
    repetition_stats,
    scrub_pii,
)

SETTINGS = dict(max_examples=10, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


def test_scrub_pii_redacts_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.io or call +1-555-123-4567"),
            (2, "see https://ex.com/a?email=a@b.co for details"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    r1 = rows[1]
    assert r1["n_email"] == 1 and r1["n_phone"] == 1 and r1["n_url"] == 0
    assert "<EMAIL>" in r1["clean_text"] and "<PHONE>" in r1["clean_text"]
    assert "bob.smith" not in r1["clean_text"]
    assert "555" not in r1["clean_text"]
    # URL scrubbed first: the embedded address counts as URL, not email
    r2 = rows[2]
    assert r2["n_url"] == 1 and r2["n_email"] == 0
    assert r2["clean_text"] == "see <URL> for details"
    r3 = rows[3]
    assert (r3["n_email"], r3["n_phone"], r3["n_url"]) == (0, 0, 0)
    assert r3["clean_text"] == r3["text"]


def test_repetition_stats_gopher_gate(spark):
    from etl_evm_chain_spark.operators.cleaning import repetition_stats

    docs = spark.createDataFrame(
        [(1, "a b a b a b"),   # 5 grams, all duplicated, top 'a b' x3
         (2, "u v w x y z"),   # 5 grams, all unique, top 1/5 = 0.2
         (3, "hello")],        # no 2-grams -> excluded
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["dup2_frac"] == 1.0
    assert rows[1]["top2_frac"] == 0.6
    assert rows[1]["keep"] == 0
    assert rows[2]["dup2_frac"] == 0.0
    assert rows[2]["top2_frac"] == 0.2   # boundary: 0.2 <= 0.2 keeps
    assert rows[2]["keep"] == 1


_texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("abc @.+-/:0189xyz")),
        min_size=0, max_size=40,
    ),
    min_size=1, max_size=8,
)


@given(_texts)
@settings(**SETTINGS)
def test_scrub_pii_idempotent(spark, texts):
    # Scrubbing already-scrubbed text finds nothing: replacement
    # tokens must not re-match any pattern, for ANY input.
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    once = scrub_pii(docs).select("doc_id", "clean_text")
    again = scrub_pii(once, text_col="clean_text", out_col="c2").collect()
    for r in again:
        assert (r["n_email"], r["n_phone"], r["n_url"]) == (0, 0, 0)
        assert r["c2"] == r["clean_text"]


@given(_texts)
@settings(**SETTINGS)
def test_repetition_stats_bounds(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    for r in repetition_stats(docs).collect():
        assert r["n_grams"] >= 1
        assert 0.0 <= r["dup2_frac"] <= 1.0
        # the most frequent gram accounts for at least 1/n and at most all
        assert 0.0 < r["top2_frac"] <= 1.0
        assert r["keep"] in (0, 1)


def test_scrub_pii_composes_with_streaming(spark, tmp_path):
    # Stateless row-local op → usable unchanged in Structured
    # Streaming (the scrub-before-land path of an ingest pipeline).
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    spark.createDataFrame(
        [(1, "write to a@b.co now"), (2, "plain")],
        "doc_id long, text string",
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (scrub_pii(stream)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt).trigger(availableNow=True)
         .start())
    q.awaitTermination(60)
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert got[1]["n_email"] == 1
    assert got[1]["clean_text"] == "write to <EMAIL> now"
    assert got[2]["clean_text"] == "plain"


def test_contamination_containment_not_jaccard(spark):
    # train doc 10 embeds eval doc 100 verbatim inside a longer text:
    # low Jaccard, containment 1.0 — must be caught. train doc 11
    # shares nothing.
    evalset = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (10, "x1 x2 x3 alpha beta gamma delta epsilon y1 y2 y3 y4"),
            (11, "p q r s t u v w"),
        ],
        "doc_id long, text string",
    )
    got = contamination(train, evalset, min_containment=0.8).collect()
    assert [(r["train_id"], r["eval_id"], r["containment"]) for r in got] \
        == [(10, 100, 1.0)]


def test_unigram_surprisal_hand_computed(spark):
    import math

    from etl_evm_chain_spark.operators.cleaning import unigram_surprisal

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_surprisal(docs).collect()}
    # total = 5 tokens; counts: a=2, b=2, c=1
    m_ab = math.floor(math.log2(5 / 2) * 1e6)   # 1321928
    m_c = math.floor(math.log2(5 / 1) * 1e6)    # 2321928
    assert got[1]["n_tokens"] == 3
    assert got[1]["surprisal_micro_sum"] == 3 * m_ab
    assert got[1]["avg_surprisal_micro"] == m_ab
    assert got[2]["n_tokens"] == 2
    assert got[2]["surprisal_micro_sum"] == m_ab + m_c
    assert got[2]["avg_surprisal_micro"] == (m_ab + m_c) // 2
    # rare-token doc scores strictly higher than the common-token doc
    assert got[2]["avg_surprisal_micro"] > got[1]["avg_surprisal_micro"]


def test_bloom_candidates_no_false_negatives(spark):
    """Every train doc sharing ≥min_hits exact shingles with the eval
    set must clear the bloom bar (FPs allowed, FNs never)."""
    from etl_evm_chain_spark.operators.cleaning import bloom_candidates

    evalset = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # embeds the full eval text → all its shingles are present
            (1, "prefix words the quick brown fox jumps over the lazy dog today suffix"),
            # disjoint vocabulary → hits should be 0 (no FP at this size)
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    got = {r["train_id"]: r for r in
           bloom_candidates(train, evalset, min_hits=8).collect()}
    assert got[1]["n_bloom_hits"] >= 8 and got[1]["is_candidate"] == 1
    assert got[2]["n_bloom_hits"] == 0 and got[2]["is_candidate"] == 0


def test_redact_contaminated_splices_out_benchmark_spans(spark):
    from etl_evm_chain_spark.operators.cleaning import redact_contaminated

    bench = spark.createDataFrame(
        [(100, "one two three four five")], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "intro one two three four five outro words here"),
         (2, "totally clean document with no overlap at all")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           redact_contaminated(train, bench, k=5).collect()}
    assert out[1]["redacted_text"] == "intro outro words here"
    assert out[1]["n_tokens_removed"] == 5
    assert out[2]["n_tokens_removed"] == 0
    assert out[2]["redacted_text"] == train.collect()[1]["text"] or \
        out[2]["redacted_text"] == "totally clean document with no overlap at all"
