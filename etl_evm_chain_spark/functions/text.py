"""Text-analysis kit: tokenization, quality stats, language-ID,
fingerprinting, shingling — all as built-in column expressions
(JVM-side; no Python UDFs in the hot path).

These back the LLM-training-data operators (SURVEY §7 P2): at 100 TB
every one of these runs inside whole-stage codegen over a parquet
scan, shuffling nothing until an aggregation asks for it.

Hash convention (cross-engine deterministic): ``hash15(s)`` = first
15 hex chars of md5 → 60-bit non-negative bigint. Used for minhash /
simhash / fingerprints so the DuckDB oracle can reproduce values
exactly (DuckDB: ``CAST('0x' || substr(md5(s),1,15) AS BIGINT)``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = r"\s+"

# Stopword list for quality stats (shared with the SQL oracle).
STOPWORDS = ("the", "a", "and", "of", "to", "in")

# Language marker words, checked in fixed order (first max wins).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "es": ("el", "la", "los", "y"),
    "fr": ("le", "les", "et", "une"),
    "de": ("der", "die", "und", "das"),
    "zh": ("de", "shi", "le", "bu"),
}

PUNCT_CLASS = "[.,!?;:]"


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), TOKEN_RE)


def hash15(c: Column) -> Column:
    """60-bit bigint from the md5 hex prefix (engine-portable hash)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return F.when(F.length(c) > 0, n_punct.cast("double") / F.length(c))


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens(text)
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    return F.when(F.size(toks) > 0, n_stop.cast("double") / F.size(toks))


def avg_token_len(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0).cast("long"),
                        lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks))


def quality_score(text: Column | str) -> Column:
    """Deterministic heuristic quality score in [0,1]: rewards
    mid-length docs, penalizes punctuation soup and stopword deserts.
    (The reference has no analog; this is the P2 quality-scoring op.)
    """
    c = F.col(text) if isinstance(text, str) else text
    len_term = F.least(F.length(c).cast("double") / 500.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(c) * 10.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio(c) * 5.0, F.lit(1.0))
    raw = 0.4 * len_term + 0.3 * punct_term + 0.3 * stop_term
    # floor-truncate to 6 decimals instead of round(): round() algorithms
    # differ across engines near midpoints; floor(x*1e6) is the same
    # IEEE computation everywhere, so results stay hash-comparable.
    return F.floor(raw * 1000000.0) / 1000000.0


def lang_id(text: Column | str) -> Column:
    """Marker-word language ID: count markers per language, first
    maximum (in LANG_MARKERS order) wins; 'und' when no marker hits.
    """
    toks = tokens(text)

    def marker_filter(markers):
        # Factory instead of a default-arg lambda: Spark counts default
        # params toward higher-order-function arity.
        return lambda t: F.lower(t).isin(*markers)

    scores = {
        lang: F.size(F.filter(toks, marker_filter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((scores[lang] == best) & (best > 0), lang).otherwise(expr)
    return expr


def fingerprint(text: Column | str) -> Column:
    """Content fingerprint: 60-bit hash of the normalized text
    (lowercased, whitespace-collapsed) — the exact-dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.regexp_replace(F.lower(F.trim(c)), TOKEN_RE, " ")
    return hash15(normalized)


def subtoken_count(text: Column | str) -> Column:
    """BPE-ish token estimate: word pieces + standalone non-space
    symbols, via regexp_extract_all (portable RE subset)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(F.lower(c),
                                       F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), 0))


def winnow_fingerprints(df, *, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 8,
                        w: int = 4):
    """Winnowing document fingerprints (the rolling-hash scheme of
    Schleimer/Wilkerson/Aiken): hash every k-char gram of the
    normalized text, keep the minimum hash of each w-gram window,
    emit the distinct selected fingerprints per document.

    Winnowing is row-local per document, so the whole computation runs
    shuffle-free in one narrow stage (parallelism unit = the document,
    the grouped-map contract). Round-9: the stage body is an Arrow
    kernel, not a JVM expression tree — per-gram ``md5`` through the
    codegen'd conv/substring chain measured ~4 µs/gram, while
    ``hashlib`` hashes the identical UTF-8 gram bytes at ~1.4 µs
    single-threaded WITH slicing (q50: 5.8 → 1.3 s isolated at sf0.1).
    Value parity is exact, not approximate:

    - normalization (``lower(trim(text))``) stays a JVM column, so
      Spark's (not Python's) Unicode case rules keep feeding the hash;
    - grams are CHARACTER slices (Python str slicing = code points =
      Spark ``substr`` semantics) encoded to UTF-8, exactly the bytes
      Spark's ``md5(substr(...))`` digests — pure-ASCII docs take a
      byte-sliced fast path that is byte-identical by construction;
    - ``hash15`` = first 15 md5 hex chars as a bigint, reproduced by
      ``int(hexdigest()[:15], 16)`` (always < 2^60);
    - per-window minima over longs and the per-doc distinct SET are
      order-free (every consumer aggregates), so ``np.unique``'s
      sorted distinct equals array_distinct's first-seen distinct.
    """
    from pyspark.sql import types as T

    c = F.lower(F.trim(F.col(text_col)))
    src = _spread(df.select(F.col(id_col), c.alias("_norm")))
    out_schema = T.StructType([
        T.StructField(id_col, src.schema[id_col].dataType, True),
        T.StructField("fp", T.LongType(), True),
    ])

    def kernel(batches):
        import hashlib

        import numpy as np
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view

        md5 = hashlib.md5
        for pdf in batches:
            ids_out: list = []
            fp_parts: list = []
            for did, s in zip(pdf[id_col], pdf["_norm"]):
                if s is None:
                    continue
                bs = s.encode("utf-8")
                if len(bs) == len(s):  # ASCII: byte slice == char slice
                    grams = [bs[i:i + k] for i in range(len(bs) - k + 1)]
                else:
                    grams = [s[i:i + k].encode("utf-8")
                             for i in range(len(s) - k + 1)]
                if len(grams) < w:  # fewer grams than one window
                    continue
                h = np.fromiter(
                    (int(md5(g).hexdigest()[:15], 16) for g in grams),
                    dtype=np.int64, count=len(grams))
                fps = np.unique(sliding_window_view(h, w).min(axis=1))
                ids_out.extend([did] * len(fps))
                fp_parts.append(fps)
            if fp_parts:
                yield pd.DataFrame(
                    {id_col: ids_out, "fp": np.concatenate(fp_parts)})

    return src.mapInPandas(kernel, out_schema)


def tfidf_keywords(df, *, id_col: str = "doc_id", text_col: str = "text",
                   k: int = 3):
    """Per-document top-k salient terms by TF-IDF
    (``tf · ln(N / df)``) — the classic keyword-extraction /
    quality-signal op for corpus curation.

    Three shuffles, all on small keys: tf = groupBy(doc, term) with
    map-side combine over the token explode; df = groupBy(term) over
    the already-collapsed tf rows (|vocab| keys, not |tokens|); the
    final per-doc top-k window partitions by document. N arrives as a
    broadcast single-row cross join — no driver collect, so the plan
    stays one lazy DAG at any corpus size.

    Ranking compares ``floor(score · 1e6)`` integers, not raw doubles:
    ``ln`` is not correctly rounded and differs in the last ulp across
    engines (measured: ~12% of inputs vs DuckDB), so an integer
    surrogate is the only ordering an oracle can reproduce exactly.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score_micros",
            F.floor(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("doc_freq"))
                * 1e6
            ).cast("long"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_micros"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "doc_freq", "score_micros", "rank")
    )


def token_grams(text: Column | str, k: int = 3) -> Column:
    """All k-token grams in document order, WITH multiplicity (the
    exact-substring dedup unit). Empty array when the doc has fewer
    than k tokens.

    Built as zip_with over k shifted slices of the token array —
    NOT transform+element_at, which would re-evaluate the split()
    subexpression per element (O(k·n) splits per row instead of O(k);
    a ~10× hot-path difference at corpus scale).
    """
    toks = tokens(text)
    n = F.size(toks)
    length = F.greatest(n - k + 1, F.lit(0))
    parts = [F.slice(toks, j + 1, length) for j in range(k)]
    sh = parts[0]
    for p in parts[1:]:
        sh = F.zip_with(sh, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(n >= k, sh).otherwise(F.array().cast("array<string>"))


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct k-token shingles (the near-dup set unit)."""
    return F.array_distinct(token_grams(text, k))


def _spread(src):
    """Widen a narrow per-document relation to cluster parallelism
    before an Arrow kernel runs over it (guide §2.6 stragglers): the
    fixture corpus is one parquet file = ONE scan partition, so a
    mapInPandas kernel over it runs as a single sequential task while
    31 cores idle. Round-robin repartition of the PROJECTED (id,
    tokens/norm) rows — never the full document row — costs one tiny
    local shuffle; at production scale the scan already has >= cluster
    parallelism partitions and this is a no-op. Output-order freedom
    is part of the kernels' contract (every consumer aggregates or
    keys by (id, pos))."""
    parts = src.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < parts:
        return src.repartition(parts)
    return src


def gram_hash_rows(df, *, id_col: str, text_col: str, k: int,
                   distinct: bool = False, with_pos: bool = False,
                   out_col: str = "gh"):
    """``(id[, pos], hash)`` rows for every k-token gram — the Arrow
    fast path of ``explode(token_grams(...)) → hash15`` (round-9): the
    JVM per-gram path pays k-way concat allocation plus the
    md5/conv/substring expression chain (~4 µs/gram); ``hashlib`` over
    the identical UTF-8 gram bytes runs at ~1.5 µs including the
    join, inside one narrow mapInPandas stage.

    Value parity is exact: tokenization stays the JVM ``tokens()``
    column (Java regex ``\\s+`` semantics, not Python's
    Unicode-wider ``\\s``), the gram string is ``" ".join`` of the
    same tokens (= the zip_with concat), and the hash is
    ``hash15`` = first 15 md5 hex chars as bigint. ``distinct``
    dedups gram STRINGS per doc before hashing (= array_distinct
    before hash15 — a 60-bit collision between two distinct grams
    still yields two rows, exactly like the expression form);
    ``with_pos`` emits the 0-based gram position (= posexplode).
    """
    from pyspark.sql import types as T

    if distinct and with_pos:
        # post-dedup positions would no longer match posexplode
        # semantics; no caller needs the combination (ADVICE r9)
        raise ValueError("gram_hash_rows: distinct=True with "
                         "with_pos=True is ambiguous — positions "
                         "after dedup match no explode form")
    src = _spread(df.select(F.col(id_col), tokens(text_col).alias("_toks")))
    fields = [T.StructField(id_col, src.schema[id_col].dataType, True)]
    if with_pos:
        fields.append(T.StructField("pos", T.IntegerType(), True))
    fields.append(T.StructField(out_col, T.LongType(), True))
    out_schema = T.StructType(fields)

    def kernel(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        md5 = hashlib.md5
        for pdf in batches:
            ids_out: list = []
            pos_out: list = []
            hs_out: list = []
            for did, toks in zip(pdf[id_col], pdf["_toks"]):
                if toks is None or len(toks) < k:
                    continue
                n = len(toks) - k + 1
                grams = [" ".join(toks[i:i + k]) for i in range(n)]
                if distinct:
                    grams = list(dict.fromkeys(grams))
                hs = [int(md5(g.encode("utf-8")).hexdigest()[:15], 16)
                      for g in grams]
                ids_out.extend([did] * len(hs))
                if with_pos:
                    pos_out.extend(range(len(hs)))
                hs_out.extend(hs)
            if ids_out:
                out = {id_col: ids_out}
                if with_pos:
                    out["pos"] = np.asarray(pos_out, dtype=np.int32)
                out[out_col] = np.asarray(hs_out, dtype=np.int64)
                yield pd.DataFrame(out)

    return src.mapInPandas(kernel, out_schema)
