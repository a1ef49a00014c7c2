"""Distributed BPE: train merges on the corpus, tokenize with them.

The repo's ``subtoken_count`` (functions/text.py) is the fast
regex-shaped ESTIMATE of a BPE token count; this module is the real
thing — learned merges, exact tokenization — for pipelines that need
actual token budgets (packing, pricing, context fitting).

Scale shape (the part that matters at 100 TB):

- **Training never touches the corpus row-by-row.** Classic BPE
  (Sennrich et al. 2016, arXiv:1508.07909) trains on the WORD
  FREQUENCY table. One corpus-wide groupBy(word) produces it; every
  merge round after that is a shuffle over |distinct words| rows
  (10⁶-10⁸ at web scale — trivial next to the corpus), cached and
  pruned to multi-symbol words as rounds converge.
- **Each round is pure DataFrame algebra:** explode adjacent symbol
  pairs weighted by word count → groupBy(pair).sum → take the max
  (count desc, pair asc — deterministic tie-break) → fold the merge
  into the symbol arrays with an ``aggregate`` lambda (left-to-right,
  exactly the reference algorithm's scan order, so "aaa" under merge
  (a,a) gives [aa, a]).
- **Encoding is embarrassingly parallel** and runs on DISTINCT words,
  not tokens: an Arrow-batched pandas UDF applies the broadcast merge
  ranks per distinct word (the hot loop is per unique word — Zipf
  makes this ~100× smaller than the token stream), then a hash join
  maps words → token arrays across the corpus.

No reference analog (the reference has no tokenizer); this is a P2
training-data-pipeline component alongside q30/q66's stats.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .text import tokens

EOW = "</w>"  # end-of-word marker, per the original BPE formulation


def word_counts(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(word, n) over the corpus — the only corpus-wide pass."""
    return (docs.select(F.explode(tokens(F.lower(F.col(text_col))))
                        .alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("n")))


def _initial_symbols(word: F.Column) -> F.Column:
    # per-character split with the end-of-word marker appended
    return F.concat(F.split(word, ""), F.array(F.lit(EOW)))


def _merge_adjacent(syms: F.Column, a: str, b: str) -> F.Column:
    """Left-to-right single-pass merge of adjacent (a, b) → a+b."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe_merges(docs: DataFrame, *, num_merges: int,
                     text_col: str = "text",
                     min_pair_count: int = 2,
                     batch: int = 1) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges; returns them in rank order.

    Driver traffic per round is ``batch`` rows; the symbol table stays
    distributed and cached. Rounds stop early when the best pair drops
    under ``min_pair_count`` (merging singletons only memorizes the
    sample).

    ``batch=1`` (default) is EXACT classic BPE — counts are recomputed
    after every merge. ``batch=k`` applies up to k merges per round,
    greedily filtered so no two share a symbol (pairwise-disjoint
    merges cannot interact within a pass, left-to-right scan aside),
    cutting round count ~k× — the standard scalable approximation when
    vocabularies are large and each round is a full shuffle. Merge
    RANK order (count desc, pair asc within a round) is preserved, so
    the encoder consumes both variants identically.
    """
    wc = word_counts(docs, text_col=text_col)
    table = wc.select("n", _initial_symbols(F.col("word")).alias("syms"))
    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges:
        table = table.persist()
        pair = F.struct(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        top = (
            table.filter(F.size("syms") > 1)
            .select("n", F.explode(F.zip_with(
                F.slice("syms", 1, F.size("syms") - 1),
                F.slice("syms", 2, F.size("syms") - 1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b"))))
                .alias("p"))
            .groupBy(pair.alias("pair"))
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("pair.a"), F.asc("pair.b"))
            .limit(batch * 4).collect()  # 4x oversample for the disjoint filter
        )
        picked: list[tuple[str, str]] = []
        used: set[str] = set()
        for r in top:
            if r["c"] < min_pair_count:
                break
            a, b = r["pair"]["a"], r["pair"]["b"]
            if a in used or b in used or a + b in used:
                continue  # shares a symbol with an earlier pick
            picked.append((a, b))
            used.update((a, b, a + b))
            if len(picked) >= min(batch, num_merges - len(merges)):
                break
        if not picked:
            table.unpersist()
            break
        merges.extend(picked)
        col = F.col("syms")
        for a, b in picked:
            col = _merge_adjacent(col, a, b)
        nxt = table.select("n", col.alias("syms"))
        nxt = nxt.localCheckpoint(eager=True)  # cut the growing lineage
        table.unpersist()
        table = nxt
    table.unpersist()
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def word_token_map(docs: DataFrame, merges: list[tuple[str, str]], *,
                   text_col: str = "text") -> DataFrame:
    """(word, toks, n_toks) for every DISTINCT corpus word — the
    Zipf-compressed unit the per-word encoder runs on."""
    spark = docs.sparkSession
    ranks = {m: i for i, m in enumerate(merges)}
    b_ranks = spark.sparkContext.broadcast(ranks)

    @pandas_udf("array<string>")
    def encode(words: pd.Series) -> pd.Series:
        r = b_ranks.value
        return words.map(lambda w: _encode_word(w, r))

    return (docs.select(F.explode(tokens(F.lower(F.col(text_col))))
                        .alias("word"))
            .distinct()
            .withColumn("toks", encode("word"))
            .withColumn("n_toks", F.size("toks")))


def bpe_token_stats(docs: DataFrame, merges: list[tuple[str, str]], *,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-document exact BPE token count via the word→tokens join
    (corpus-side cost is a hash join on the word column; the encoder
    only ever ran on distinct words)."""
    wm = word_token_map(docs, merges, text_col=text_col)
    exploded = docs.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
    return (exploded.join(wm, "word")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_toks").alias("n_bpe_tokens"),
                 F.max("n_toks").alias("max_word_toks")))
