"""Distributed BPE: golden merges (Sennrich reference example),
encode determinism, corpus stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_evm_chain_spark.functions import bpe


def _corpus(spark):
    # the classic BPE paper example word distribution:
    # low*5 lower*2 newest*6 widest*3
    text = " ".join(["low"] * 5 + ["lower"] * 2
                    + ["newest"] * 6 + ["widest"] * 3)
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_golden_merges_match_reference_algorithm(spark):
    m = bpe.train_bpe_merges(_corpus(spark), num_merges=5)
    # hand-derivable (and matching Sennrich et al.'s worked example,
    # modulo the </w> marker convention and count-then-lexical ties):
    # es(9) -> est(9) -> est</w>(9) -> lo(7) -> low(7)
    assert m == [("e", "s"), ("es", "t"), ("est", "</w>"),
                 ("l", "o"), ("lo", "w")]


def test_encode_concatenates_back_to_word(spark):
    docs = _corpus(spark)
    m = bpe.train_bpe_merges(docs, num_merges=8)
    for r in bpe.word_token_map(docs, m).collect():
        assert "".join(r["toks"]) == r["word"] + "</w>"
        assert r["n_toks"] == len(r["toks"])


def test_token_stats_cover_every_word(spark):
    docs = _corpus(spark)
    m = bpe.train_bpe_merges(docs, num_merges=5)
    row = bpe.bpe_token_stats(docs, m).collect()[0]
    assert row["n_words"] == 16
    # more merges -> fewer or equal tokens, never more than chars+1
    n0 = bpe.bpe_token_stats(docs, []).collect()[0]["n_bpe_tokens"]
    assert row["n_bpe_tokens"] < n0


def test_merge_is_left_to_right_single_pass(spark):
    docs = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    m = bpe.train_bpe_merges(docs, num_merges=1)
    assert m == [("a", "a")]
    toks = bpe.word_token_map(docs, m).collect()[0]["toks"]
    assert toks == ["aa", "a", "</w>"]


def test_training_stops_when_pairs_run_dry(spark):
    docs = spark.createDataFrame([(1, "ab ab cd")], "doc_id long, text string")
    m = bpe.train_bpe_merges(docs, num_merges=50, min_pair_count=2)
    # only pairs with count >= 2 ever merge; the tail rounds stop early
    assert len(m) < 50
    assert m[0] in [("a", "b"), ("b", "</w>"), ("ab", "</w>")]


def test_batched_training_matches_exact_on_disjoint_merges(spark):
    docs = _corpus(spark)
    exact = bpe.train_bpe_merges(docs, num_merges=5, batch=1)
    batched = bpe.train_bpe_merges(docs, num_merges=5, batch=3)
    # same merge SET is not guaranteed in general, but every batched
    # tokenization must still round-trip and compress
    for r in bpe.word_token_map(docs, batched).collect():
        assert "".join(r["toks"]) == r["word"] + "</w>"
    n_exact = bpe.bpe_token_stats(docs, exact).collect()[0]["n_bpe_tokens"]
    n_batch = bpe.bpe_token_stats(docs, batched).collect()[0]["n_bpe_tokens"]
    n_none = bpe.bpe_token_stats(docs, []).collect()[0]["n_bpe_tokens"]
    assert n_batch < n_none
    assert abs(n_batch - n_exact) <= 0.3 * n_exact
    # batch=1 path is byte-identical to the pre-batching algorithm
    assert exact == [("e", "s"), ("es", "t"), ("est", "</w>"),
                     ("l", "o"), ("lo", "w")]
