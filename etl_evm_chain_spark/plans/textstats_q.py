"""Corpus-statistics queries: character-entropy quality gating and a
Zipf rank-frequency fit. Both extend the text-analysis plane (P2-text)
with information-theoretic signals a curation pipeline filters on, and
both stay fully declarative (explode → agg → window), so they hold the
same shape on a 100 TB corpus: the only shuffles are by doc_id / token,
and the final fit runs over a constant-size (top-K) relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

ENTROPY_LOW = 3.0   # bits/char below which a doc is gate-flagged
ZIPF_TOPK = 100


# ---------------------------------------------------------------------------
# Q75: per-document Shannon character entropy (bits/char) — the
# standard gibberish/boilerplate gate: natural-language text sits
# ~3.5-4.5 bits/char, repeated-padding spam collapses toward 0.
# Per-doc char histogram in one explode+agg, entropy from the
# histogram via a second agg (no window needed: sum-of-counts is
# computed in the same pass with a grouped total join-free trick:
# -sum(c*log2 c)/n + log2 n).
# ---------------------------------------------------------------------------

def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    chars = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch"),
    ).filter(F.col("ch") != "")
    hist = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("double").alias("c"))
    # H = log2(n) - (1/n) * sum(c * log2(c)): one grouped agg, no
    # per-doc total broadcast/window.
    ent = hist.groupBy("doc_id").agg(
        (F.log2(F.sum("c"))
         - F.sum(F.col("c") * F.log2("c")) / F.sum("c")).alias("h"))
    return ent.select(
        "doc_id",
        F.round("h", 6).alias("char_entropy"),
        (F.col("h") < ENTROPY_LOW).cast("int").alias("low_entropy"),
    )


ORACLE_CHAR_ENTROPY = f"""
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch
  FROM documents WHERE len(text) > 0
),
hist AS (
  SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c
  FROM chars WHERE ch <> '' GROUP BY doc_id, ch
),
ent AS (
  SELECT doc_id, log2(sum(c)) - sum(c * log2(c)) / sum(c) AS h
  FROM hist GROUP BY doc_id
)
SELECT doc_id, round(h, 6) AS char_entropy,
       CAST(h < {ENTROPY_LOW} AS INTEGER) AS low_entropy
FROM ent
"""


# ---------------------------------------------------------------------------
# Q76: Zipf rank-frequency fit — global lowercase token frequencies,
# rank by count, least-squares slope of log(freq) on log(rank) over
# the top-100 (a healthy natural corpus fits ≈ -1). The regression is
# closed-form covar/var over a 100-row relation: the heavy part is one
# explode + one agg by token; ranking the top-K is
# TakeOrderedAndProject-sized, never a global sort of the vocabulary.
# ---------------------------------------------------------------------------

def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    freq = (toks.groupBy(F.lower("tok").alias("token"))
            .agg(F.count(F.lit(1)).alias("freq")))
    # TakeOrderedAndProject fetch + driver enumeration of ZIPF_TOPK
    # rows (the centroid-pick pattern): numbering/aggregating the
    # limited relation with empty-partition windows fired the
    # single-partition WindowExec warning for a ≤100-row input. The
    # regression fit is one plain aggregate over the 100 local rows
    # (covariance merge across the local partitions is deterministic;
    # round(6) absorbs sub-ulp fold-order effects, verified at both
    # fixture scales).
    topk_rows = (freq.orderBy(F.desc("freq"), "token")
                 .limit(ZIPF_TOPK).collect())
    from ..catalog import literal_df
    topk = literal_df(
        spark,
        [(i + 1, r["token"], int(r["freq"]))
         for i, r in enumerate(topk_rows)],
        "rank int, token string, freq long")
    lr = F.log(F.col("rank").cast("double"))
    lf = F.log(F.col("freq").cast("double"))
    fit = topk.agg(
        (F.covar_pop(lr, lf) / F.var_pop(lr)).alias("slope"))
    return (topk.crossJoin(F.broadcast(fit))
            .select("rank", "token", "freq",
                    F.round("slope", 6).alias("zipf_slope")))


ORACLE_ZIPF = f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
freq AS (
  SELECT lower(tok) AS token, count(*) AS freq
  FROM toks WHERE tok <> '' GROUP BY lower(tok)
),
topk AS (
  SELECT token, freq,
         row_number() OVER (ORDER BY freq DESC, token) AS rank
  FROM freq ORDER BY freq DESC, token LIMIT {ZIPF_TOPK}
),
fit AS (
  SELECT covar_pop(ln(CAST(rank AS DOUBLE)), ln(CAST(freq AS DOUBLE)))
           / var_pop(ln(CAST(rank AS DOUBLE))) AS slope
  FROM topk
)
SELECT t.rank, t.token, t.freq, round(f.slope, 6) AS zipf_slope
FROM topk t CROSS JOIN fit f
"""


# ---------------------------------------------------------------------------
# Q103: exact BPE tokenization — merges trained on the corpus's word-
# frequency table (functions/bpe.py), landed once per scale factor,
# then applied via the distinct-word encoder + hash join. Training is
# an iterative driver-coordinated algorithm -> rows-only correctness;
# the merge algebra itself is golden-tested against the Sennrich
# reference example (tests/test_bpe.py).
# ---------------------------------------------------------------------------

BPE_MERGES = 30


def _bpe_merges_landed(spark: SparkSession, sf_dir: str):
    import os

    from ..catalog import landed_parquet
    from ..functions import bpe

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        merges = bpe.train_bpe_merges(docs, num_merges=BPE_MERGES)
        from ..catalog import literal_df
        return literal_df(
            spark, [(i, a, b) for i, (a, b) in enumerate(merges)],
            "rank int, a string, b string")

    return landed_parquet(
        spark, name="bpe_merges",
        src_paths=[os.path.join(sf_dir, "documents.parquet")],
        build=build, params=f"m{BPE_MERGES}")


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import bpe

    merges = [(r["a"], r["b"]) for r in
              _bpe_merges_landed(spark, sf_dir).orderBy("rank").collect()]
    docs = load_table(spark, sf_dir, "documents")
    stats = bpe.bpe_token_stats(docs, merges)
    # left join: zero-token documents produce no stats row but must
    # still count toward n_docs
    return (docs.select("doc_id", "source").join(stats, "doc_id", "left")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.coalesce("n_words", F.lit(0))).alias("n_words"),
                 F.sum(F.coalesce("n_bpe_tokens", F.lit(0)))
                 .alias("n_bpe_tokens"),
                 F.max(F.coalesce("max_word_toks", F.lit(0)))
                 .alias("max_word_toks"))
            .orderBy("source"))


def _oracle_bpe_tokens() -> str:
    # lazy: replays BPE training driver-side (plans/groundtruth.py)
    from .groundtruth import oracle_bpe_tokens

    return oracle_bpe_tokens()


SPECS = [
    QuerySpec("q103_bpe_tokens", q_bpe_tokens,
              _oracle_bpe_tokens,
              "exact BPE tokenization (trained merges, distinct-word "
              "encoder; oracle = independent single-process train+"
              "encode, integer stats pinned as VALUES)", ("P2-text",)),
    QuerySpec("q75_char_entropy", q_char_entropy, ORACLE_CHAR_ENTROPY,
              "Shannon char-entropy quality gate (bits/char)",
              ("P2-text",)),
    QuerySpec("q76_zipf_slope", q_zipf_slope, ORACLE_ZIPF,
              "Zipf rank-frequency fit over top-100 tokens",
              ("P2-text", "F2")),
]
