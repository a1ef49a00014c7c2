"""Curation queries (P2): deterministic split / sample / select / pack
over the documents corpus — the operators that turn a deduped corpus
into training shards. All oracle-checked (hash-based determinism means
DuckDB reproduces every assignment bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import quality_score, token_count
from ..operators.curation import (
    budget_mix,
    hash_split,
    pack_sequences,
    stratified_sample,
    temperature_sample,
    topk_per_group,
)
from . import QuerySpec

_SQL_HASH15 = "CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"

CONTEXT = 2048


# ---------------------------------------------------------------------------
# Q56: hash-based train/val/test split with per-split stats.
# ---------------------------------------------------------------------------

def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    split = hash_split(docs, key="doc_id")
    return (
        split.groupBy("split", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").alias("total_chars"),
             F.min("doc_id").alias("min_doc"),
             F.max("doc_id").alias("max_doc"))
    )


_H_SPLIT = _SQL_HASH15.format(expr="'split:' || CAST(doc_id AS VARCHAR)")

ORACLE_HASH_SPLIT = f"""
WITH assigned AS (
  SELECT *, CASE WHEN {_H_SPLIT} % 100 < 80 THEN 'train'
                 WHEN {_H_SPLIT} % 100 < 90 THEN 'val'
                 ELSE 'test' END AS split
  FROM documents
)
SELECT split, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM assigned
GROUP BY split, source
"""


# ---------------------------------------------------------------------------
# Q57: deterministic stratified sample (~15%) with per-source stats.
# ---------------------------------------------------------------------------

def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sampled = stratified_sample(docs, key="doc_id", fraction=0.15)
    return (
        sampled.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"),
             F.sum("n_chars").alias("sampled_chars"),
             F.countDistinct("lang").alias("n_langs"))
        .orderBy("source")
    )


_H_SAMPLE = _SQL_HASH15.format(expr="'sample:' || CAST(doc_id AS VARCHAR)")

ORACLE_STRATIFIED_SAMPLE = f"""
SELECT source, count(*) AS n_sampled,
       CAST(sum(n_chars) AS BIGINT) AS sampled_chars,
       count(DISTINCT lang) AS n_langs
FROM documents
WHERE {_H_SAMPLE} % 1000000 < 150000
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Q58: top-k selection per group — best-quality docs per source.
# ---------------------------------------------------------------------------

def q_topk_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", quality_score("text").alias("quality"))
    return topk_per_group(
        scored, group="source",
        order=[F.desc("quality"), F.asc("doc_id")], k=5,
    ).select("source", "rank", "doc_id", "quality")


_SQL_TOKS = r"str_split_regex(trim(text), '\s+')"
_SQL_QUALITY = r"""
floor((0.4 * least(length(text) / 500.0, 1.0)
     + 0.3 * (1.0 - least(((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE / length(text)) * 10.0, 1.0))
     + 0.3 * least((len(list_filter(str_split_regex(trim(text), '\s+'), x -> lower(x) IN ('the', 'a', 'and', 'of', 'to', 'in')))::DOUBLE / len(str_split_regex(trim(text), '\s+'))) * 5.0, 1.0)) * 1000000.0) / 1000000.0
"""

ORACLE_TOPK_QUALITY = f"""
WITH scored AS (
  SELECT doc_id, source, {_SQL_QUALITY} AS quality FROM documents
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY quality DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT source, rank, doc_id, quality
FROM ranked WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# Q59: context-window packing — cumulative-token shard assignment
# plus per-pack utilization stats.
# ---------------------------------------------------------------------------

def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "source",
                       token_count("text").alias("n_tok"))
    packed = pack_sequences(toks, group="source", order="doc_id",
                            length="n_tok", context=CONTEXT)
    return (
        packed.groupBy("source", "pack_id")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tok").alias("n_tokens"),
             F.min("doc_id").alias("first_doc"),
             F.max("doc_id").alias("last_doc"))
    )


ORACLE_PACK_SEQUENCES = f"""
WITH toks AS (
  SELECT doc_id, source, len({_SQL_TOKS}) AS n_tok FROM documents
), packed AS (
  SELECT *,
         CAST(floor(coalesce(CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
              / {CONTEXT}) AS BIGINT) AS pack_id
  FROM toks
)
SELECT source, pack_id, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM packed
GROUP BY source, pack_id
"""


# ---------------------------------------------------------------------------
# Q67: temperature-flattened category mixing (count^0.5 rebalance of
# the skewed lang distribution; sqrt is IEEE-exact, hence oracle-able).
# ---------------------------------------------------------------------------

def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    kept = temperature_sample(docs, key="lang", id_col="doc_id", alpha=0.5)
    return kept.select("doc_id", "lang", "rate_ppm").orderBy("doc_id")


_H_MIX = _SQL_HASH15.format(expr="'mix:' || CAST(doc_id AS VARCHAR)")

ORACLE_TEMPERATURE_MIX = f"""
WITH counts AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
floorc AS (SELECT min(cnt) AS min_cnt FROM counts),
rated AS (
  SELECT lang,
         CAST(floor(sqrt(CAST(min_cnt AS DOUBLE) / cnt) * 9e15) AS BIGINT)
           AS thr,
         CAST(floor(sqrt(CAST(min_cnt AS DOUBLE) / cnt) * 1e6) AS BIGINT)
           AS rate_ppm
  FROM counts CROSS JOIN floorc
)
SELECT d.doc_id, d.lang, r.rate_ppm
FROM documents d JOIN rated r USING (lang)
WHERE {_H_MIX} % 9000000000000000 < r.thr
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Q80: overlapping character-window chunking (RAG / pretraining window
# prep) — row-local sequence+explode, zero shuffles; output carries
# the chunk hash, not the text, so result size stays bounded.
# ---------------------------------------------------------------------------

CHUNK_SIZE = 256
CHUNK_STRIDE = 192


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, size=CHUNK_SIZE, stride=CHUNK_STRIDE)


ORACLE_CHUNKS = f"""
WITH cnt AS (
  SELECT doc_id, text,
         greatest(CAST(ceil((len(text) - {CHUNK_SIZE}) / {CHUNK_STRIDE}.0)
                       AS INTEGER) + 1, 1) AS k
  FROM documents
),
ch AS (
  SELECT doc_id, text, unnest(range(0, k)) AS chunk_ix FROM cnt
),
cut AS (
  SELECT doc_id, chunk_ix,
         substr(text, CAST(chunk_ix * {CHUNK_STRIDE} + 1 AS INTEGER),
                {CHUNK_SIZE}) AS chunk
  FROM ch
)
SELECT doc_id, chunk_ix, len(chunk) AS chunk_len,
       {_SQL_HASH15.format(expr="chunk")} AS chunk_hash
FROM cut
"""


# ---------------------------------------------------------------------------
# Q81: dataset card — the per-(source, lang) corpus report a release
# ships with: doc/char/token totals, median length, corpus share.
# One grouped agg + one tiny window over the card rows.
# ---------------------------------------------------------------------------

def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    card = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").alias("total_chars"),
             F.median(F.col("n_chars").cast("double")).alias("median_chars"),
             F.sum(token_count("text")).alias("total_tokens"))
    )
    # corpus share via a 1-row broadcast total (scalar-subquery shape)
    # instead of an empty-partition window over the card rows — same
    # values, no single-partition WindowExec
    total = card.agg(F.sum("n_docs").alias("_total"))
    share = F.col("n_docs").cast("double") / F.col("_total")
    return (card.crossJoin(F.broadcast(total))
            .withColumn("share_ppm", F.floor(share * 1e6).cast("long"))
            .drop("_total"))


ORACLE_DATASET_CARD = r"""
WITH card AS (
  SELECT source, lang, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         CAST(median(CAST(n_chars AS DOUBLE)) AS DOUBLE) AS median_chars,
         CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
           AS total_tokens
  FROM documents GROUP BY source, lang
)
SELECT source, lang, n_docs, total_chars, median_chars, total_tokens,
       CAST(floor(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER () * 1e6)
            AS BIGINT) AS share_ppm
FROM card
"""


# ---------------------------------------------------------------------------
# Q102: model-based quality filter — weak labels from metadata (the
# curated-seed-corpus pattern; here "substantial documents", n_chars
# >= 300, stands in for seed membership — the fixture's lang column is
# deliberately text-independent, so it is the one metadata label with
# learnable text signal), surface features from text, distributed
# scaler+logreg, per-document keep probability. Training is not
# SQL-expressible -> rows-only correctness; the feature-separation
# semantics are pytest-proven on a constructed corpus
# (tests/test_llmdata.py::test_quality_filter_separates).
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Q106: deterministic weighted sampling — longer documents
# proportionally likelier; selection reproducible on any engine
# because the keys are pure hash minima (operators/curation.
# weighted_sample).
# ---------------------------------------------------------------------------

WS_K = 20


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    wt = (F.col("n_chars") / 100).cast("int")
    return weighted_sample(
        docs.select("doc_id", "source", "n_chars"),
        key="doc_id", weight=wt, k=WS_K).orderBy("doc_id")


_H_WS = _SQL_HASH15.format(
    expr="'ws:' || CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)")

ORACLE_WEIGHTED_SAMPLE = f"""
WITH w AS (
  SELECT doc_id, source, n_chars,
         greatest(1, least(CAST(n_chars // 100 AS INTEGER), 64)) AS wt
  FROM documents
),
keyed AS (
  SELECT doc_id, source, n_chars,
         list_min(list_transform(range(0, wt), j -> {_H_WS})) AS k
  FROM w
)
SELECT doc_id, source, n_chars
FROM keyed ORDER BY k, doc_id LIMIT {WS_K}
"""


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import mlplane as ml

    docs = load_table(spark, sf_dir, "documents")
    # reg_param=0.01 + tol=1e-12: the weak labels are near-separable
    # from these features, so the UNREGULARIZED likelihood has no
    # finite optimum — every solver's answer is its stopping point and
    # nothing could pin it. The (sklearn-default-style) L2 term makes
    # the objective strongly convex with a unique optimum both Spark's
    # L-BFGS and the oracle's Newton solve converge to; tol=1e-12
    # actually reaches it (see q29's docstring).
    _, scored = ml.train_quality_filter(
        docs, positive=F.col("n_chars") >= 300, tol=1e-12,
        reg_param=0.01)
    return (
        scored.groupBy("y")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("pred").cast("long").alias("n_pred_keep"))
        .orderBy("y")
    )


# ---------------------------------------------------------------------------
# Q108: training-shard manifest — deterministic shard assignment +
# within-shard pseudo-random order + per-shard content checksums, the
# receipt a trainer verifies downloaded shards against. The write path
# (operators/curation.export_shards: one hash shuffle,
# sortWithinPartitions, partitionBy(shard)) is pytest-exercised; the
# registry checks the manifest arithmetic, which is what must be
# engine-portable.
# ---------------------------------------------------------------------------

N_SHARDS = 16


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import shard_assignment, shard_manifest

    docs = load_table(spark, sf_dir, "documents")
    return shard_manifest(
        shard_assignment(docs, key="doc_id", n_shards=N_SHARDS))


_H_SHARD = _SQL_HASH15.format(expr="'shard:' || CAST(doc_id AS VARCHAR)")
_H_ORD = _SQL_HASH15.format(expr="'shard:ord:' || CAST(doc_id AS VARCHAR)")
_H_FP = _SQL_HASH15.format(expr="CAST(doc_id AS VARCHAR) || ':' || text")

ORACLE_SHARD_MANIFEST = f"""
WITH assigned AS (
  SELECT doc_id, text,
         CAST({_H_SHARD} % {N_SHARDS} AS INTEGER) AS shard,
         {_H_ORD} AS ord_key,
         {_H_FP} AS fp
  FROM documents
)
SELECT shard,
       count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       min(ord_key) AS ord_min,
       max(ord_key) AS ord_max,
       CAST(sum(fp) % {1 << 60} AS BIGINT) AS checksum
FROM assigned GROUP BY shard ORDER BY shard
"""


# ---------------------------------------------------------------------------
# Q120: char-budget corpus mixing — per-source budgets (rate in
# tenths x the source's own char total), selection in deterministic
# md5(doc_id) order via the depth-mode prefix-sum kit. The mixing
# step of a training pipeline: boost/flatten sources to a target
# composition without randomness. Reference has no curation plane;
# this extends the bots' pandas-side sampling (SURVEY P2-curation).
# ---------------------------------------------------------------------------

def q_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import scaled_buckets
    docs = load_table(spark, sf_dir, "documents")
    # rate in tenths derived from the source name: src<k> -> 1 + k%3
    # (10/20/30% of each source's chars) — portable to the oracle
    rate = F.substring("source", 4, 10).cast("int") % 3 + 1
    sel = budget_mix(docs, part_col="source", cost_col="n_chars",
                     rate_col=rate, key="doc_id",
                     n_buckets=scaled_buckets(spark))
    return (sel.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("sel_chars"),
                 F.max("_budget").alias("budget"))
            .orderBy("source"))


ORACLE_BUDGET_MIX = """
WITH b AS (
  SELECT source,
         CAST(floor((1 + CAST(substr(source, 4) AS INT) % 3)
                    * sum(n_chars) / 10) AS BIGINT) AS budget
  FROM documents GROUP BY source
), ordered AS (
  SELECT source, doc_id, n_chars,
         sum(n_chars) OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cum
  FROM documents
)
SELECT o.source,
       count(*) AS n_docs,
       CAST(sum(o.n_chars) AS BIGINT) AS sel_chars,
       b.budget AS budget
FROM ordered o JOIN b ON o.source = b.source
WHERE o.cum <= b.budget
GROUP BY o.source, b.budget
ORDER BY o.source
"""


def _oracle_quality_filter() -> str:
    # lazy: margin-checked ground-truth solve (plans/groundtruth.py)
    from .groundtruth import oracle_quality_filter

    return oracle_quality_filter()


SPECS = [
    QuerySpec("q108_shard_manifest", q_shard_manifest,
              ORACLE_SHARD_MANIFEST,
              "training-shard assignment manifest (counts, order-key "
              "bounds, content checksums)", ("P2-curation",)),
    QuerySpec("q106_weighted_sample", q_weighted_sample,
              ORACLE_WEIGHTED_SAMPLE,
              "deterministic weighted top-k sample (integer-replication "
              "min-hash keys, no RNG/transcendentals)",
              ("P2-curation",)),
    QuerySpec("q102_quality_filter", q_quality_filter,
              _oracle_quality_filter,
              "model-based quality filter (weak-label logreg over "
              "surface features; fastText/CCNet analog; oracle = "
              "margin-checked independent Newton solve)",
              ("P2-curation", "E5", "E6")),
    QuerySpec("q56_hash_split", q_hash_split, ORACLE_HASH_SPLIT,
              "deterministic hash train/val/test split", ("P2-curation",)),
    QuerySpec("q57_stratified_sample", q_stratified_sample,
              ORACLE_STRATIFIED_SAMPLE,
              "hash-threshold stratified sampling", ("P2-curation",)),
    QuerySpec("q58_topk_quality", q_topk_quality, ORACLE_TOPK_QUALITY,
              "per-source top-k by quality score", ("P2-curation", "F2")),
    QuerySpec("q59_pack_sequences", q_pack_sequences, ORACLE_PACK_SEQUENCES,
              "context-window packing by running token count",
              ("P2-curation",)),
    QuerySpec("q67_temperature_mix", q_temperature_mix,
              ORACLE_TEMPERATURE_MIX,
              "temperature-flattened (count^0.5) category mixing",
              ("P2-curation",)),
    QuerySpec("q80_chunk_documents", q_chunk_documents, ORACLE_CHUNKS,
              "overlapping char-window chunking (shuffle-free)",
              ("P2-curation",)),
    QuerySpec("q81_dataset_card", q_dataset_card, ORACLE_DATASET_CARD,
              "per-(source, lang) corpus release report",
              ("P2-curation", "D13")),
    QuerySpec("q120_budget_mix", q_budget_mix, ORACLE_BUDGET_MIX,
              "char-budget source mixing: hash-ordered prefix-sum cut "
              "per source (depth-mode two-phase kit, no source-"
              "partitioned corpus window)", ("P2-curation", "P2-ranking")),
]


# ---------------------------------------------------------------------------
# Q123: the curation funnel — quality gate → exact dedup → near-dup
# resolution → benchmark decontamination → char-budget mix, composed
# end-to-end with per-document dispositions (operators/curation.
# curation_funnel), reported as a per-(source, stage) funnel table.
# The oracle recomputes ALL FIVE stages in one DuckDB CTE chain
# (including the recursive-CTE connected components), so a green hash
# proves the stages compose with exactly the narrowing semantics each
# stage's standalone query (q30/q33/q41/q63/q120) already proved in
# isolation. No reference analog; SURVEY §7 P2 capstone.
# ---------------------------------------------------------------------------

FUNNEL_QUALITY_MIN = 0.45
FUNNEL_JACCARD = 0.5
FUNNEL_CONTAINMENT = 0.8


def _funnel_landed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disposition ledger landed once per fixture (silver artifact) —
    the funnel re-derives the survivor chain for six output branches,
    the priciest composite in the suite; q123 reads the landed copy
    (same pattern as q41's dedup_resolve artifact)."""
    import os

    from ..catalog import landed_parquet
    from ..functions.ranking import scaled_buckets
    from ..operators.curation import curation_funnel
    from .llmdata import EVAL_MOD

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        evalset = docs.filter(F.col("doc_id") % EVAL_MOD == 0)
        train = docs.filter(F.col("doc_id") % EVAL_MOD != 0)
        # rate in tenths from the source name (q120's convention)
        rate = F.substring("source", 4, 10).cast("int") % 3 + 1
        return curation_funnel(
            train, eval_docs=evalset, part_col="source", rate_col=rate,
            min_quality=FUNNEL_QUALITY_MIN,
            jaccard_threshold=FUNNEL_JACCARD,
            min_containment=FUNNEL_CONTAINMENT,
            n_buckets=scaled_buckets(spark))

    return landed_parquet(
        spark, name="curation_funnel",
        src_paths=[os.path.join(sf_dir, "documents.parquet")],
        build=build, params="q45j50c80")


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    funnel = _funnel_landed(spark, sf_dir)
    return (funnel.groupBy("source", "stage")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("sum_chars"))
            .orderBy("source", "stage"))


def _oracle_curation_funnel() -> str:
    # the near-dup/LSH fragments, the quality formula, and EVERY
    # threshold are shared with their standalone-query sources — no
    # hand-copied twin can go stale alone
    from .llmdata import (_SQL_NORM, _SQL_SHINGLES, _SQL_TOKS, EVAL_MOD,
                          _sql_band_conds, _sql_hash15,
                          _sql_minhash_mins, _sql_shingle_hash)

    qual = _SQL_QUALITY.strip()
    return f"""
WITH RECURSIVE base AS (
  SELECT doc_id, source, n_chars, text,
         CASE WHEN text IS NULL THEN 0.0
              ELSE coalesce({qual}, 0.0) END AS qual
  FROM documents WHERE doc_id % {EVAL_MOD} != 0
),
s1 AS (SELECT doc_id, source, n_chars, text FROM base
       WHERE qual >= {FUNNEL_QUALITY_MIN}),
d_quality AS (SELECT doc_id, source, n_chars, 'quality' AS stage
              FROM base WHERE qual < {FUNNEL_QUALITY_MIN}),
rnk AS (
  SELECT doc_id, source, n_chars, text,
         row_number() OVER (
           PARTITION BY coalesce({_sql_hash15(_SQL_NORM)}, -1)
           ORDER BY doc_id) AS rn
  FROM s1
),
d_exact AS (SELECT doc_id, source, n_chars, 'exact_dup' AS stage
            FROM rnk WHERE rn > 1),
s2 AS (SELECT doc_id, source, n_chars, text FROM rnk WHERE rn = 1),
toks2 AS (SELECT doc_id, {_SQL_TOKS} AS t FROM s2),
sig2 AS MATERIALIZED (
  SELECT doc_id,
       {_sql_minhash_mins()}
  FROM (SELECT doc_id, {_sql_shingle_hash()} FROM
        (SELECT doc_id, unnest({_SQL_SHINGLES}) AS sh FROM toks2))
  GROUP BY doc_id
),
shl2 AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks2),
ver AS (
  SELECT c.id_a, c.id_b
  FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig2 a JOIN sig2 b
        ON a.doc_id < b.doc_id AND ({_sql_band_conds()})) c
  JOIN shl2 sa ON sa.doc_id = c.id_a
  JOIN shl2 sb ON sb.doc_id = c.id_b
  WHERE len(list_intersect(sa.s, sb.s))::DOUBLE
        / len(list_distinct(list_concat(sa.s, sb.s))) >= {FUNNEL_JACCARD}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM ver
  UNION
  SELECT id_b, id_a FROM ver
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
canon AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS canonical
  FROM s2 d LEFT JOIN reach r ON r.src = d.doc_id
  GROUP BY d.doc_id
),
d_near AS (SELECT s.doc_id, s.source, s.n_chars, 'near_dup' AS stage
           FROM s2 s JOIN canon c ON s.doc_id = c.doc_id
           WHERE s.doc_id != c.canonical),
s3 AS (SELECT s.doc_id, s.source, s.n_chars, s.text
       FROM s2 s JOIN canon c ON s.doc_id = c.doc_id
       WHERE s.doc_id = c.canonical),
evsh AS (
  SELECT doc_id AS eval_id, {_sql_hash15("sh0")} AS sh
  FROM (SELECT doc_id, unnest({_SQL_SHINGLES}) AS sh0
        FROM (SELECT doc_id, {_SQL_TOKS} AS t FROM documents
              WHERE doc_id % {EVAL_MOD} = 0))
),
trsh AS (
  SELECT doc_id AS train_id, {_sql_hash15("sh0")} AS sh
  FROM (SELECT doc_id, unnest({_SQL_SHINGLES}) AS sh0
        FROM (SELECT doc_id, {_SQL_TOKS} AS t FROM s3))
),
sizes AS (SELECT eval_id, count(*) AS n_eval FROM evsh GROUP BY eval_id),
bad AS (
  SELECT DISTINCT train_id
  FROM (SELECT train_id, eval_id, count(*) AS n_common
        FROM trsh JOIN evsh USING (sh) GROUP BY 1, 2) m
  JOIN sizes USING (eval_id)
  WHERE n_common::DOUBLE / n_eval >= {FUNNEL_CONTAINMENT}
),
d_cont AS (SELECT doc_id, source, n_chars, 'contaminated' AS stage
           FROM s3 WHERE doc_id IN (SELECT train_id FROM bad)),
s4 AS (SELECT doc_id, source, n_chars FROM s3
       WHERE doc_id NOT IN (SELECT train_id FROM bad)),
bgt AS (
  SELECT source,
         CAST(floor((1 + CAST(substr(source, 4) AS INT) % 3)
                    * sum(n_chars) / 10) AS BIGINT) AS budget
  FROM s4 GROUP BY source
),
ordered AS (
  SELECT source, doc_id, n_chars,
         sum(n_chars) OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cum
  FROM s4
),
kept AS (SELECT o.doc_id, o.source, o.n_chars, 'kept' AS stage
         FROM ordered o JOIN bgt USING (source) WHERE cum <= budget),
d_budget AS (SELECT o.doc_id, o.source, o.n_chars,
                    'over_budget' AS stage
             FROM ordered o JOIN bgt USING (source) WHERE cum > budget),
funnel AS (
  SELECT * FROM d_quality
  UNION ALL SELECT * FROM d_exact
  UNION ALL SELECT * FROM d_near
  UNION ALL SELECT * FROM d_cont
  UNION ALL SELECT * FROM d_budget
  UNION ALL SELECT * FROM kept
)
SELECT source, stage, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM funnel GROUP BY source, stage
ORDER BY source, stage
"""


SPECS.append(
    QuerySpec("q123_curation_funnel", q_curation_funnel,
              _oracle_curation_funnel,
              "end-to-end curation funnel (quality -> exact dedup -> "
              "near-dup CC -> decontamination -> char budget) with "
              "per-(source, stage) dispositions",
              ("P2-curation", "P2-dedup", "P2-text")))


# ---------------------------------------------------------------------------
# Q124: leakage-safe split — assignment hashes the near-dup cluster's
# canonical id (q41's resolution artifact), so a near-duplicate pair
# can never straddle train/test (the memorization-leak eval bug).
# Reported per (split, source) with a distinct-cluster count; the
# oracle recomputes the connected components (recursive CTE) AND the
# salted md5 bucket rule.
# ---------------------------------------------------------------------------

def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import leakage_safe_split
    from .analytics_ext import _resolved_landed

    docs = load_table(spark, sf_dir, "documents")
    resolved = _resolved_landed(spark, sf_dir)
    out = leakage_safe_split(docs, resolved=resolved)
    return (out.groupBy("split", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("canonical").alias("n_clusters"),
                 F.sum("n_chars").cast("long").alias("total_chars"))
            .orderBy("split", "source"))


def _oracle_leakage_safe_split() -> str:
    from .analytics_ext import _oracle_dedup_resolve

    h = _SQL_HASH15.format(expr="'split:' || CAST(canonical AS VARCHAR)")
    return f"""
WITH resolved AS ({_oracle_dedup_resolve()}),
assigned AS (
  SELECT d.doc_id, d.source, d.n_chars, r.canonical,
         CASE WHEN {h} % 100 < 80 THEN 'train'
              WHEN {h} % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents d JOIN resolved r ON d.doc_id = r.doc_id
)
SELECT split, source, count(*) AS n_docs,
       count(DISTINCT canonical) AS n_clusters,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM assigned GROUP BY split, source
ORDER BY split, source
"""


SPECS.append(
    QuerySpec("q124_leakage_safe_split", q_leakage_safe_split,
              _oracle_leakage_safe_split,
              "near-dup-cluster-aware train/val/test split (no cluster "
              "straddles splits; oracle recomputes CC + salted bucket)",
              ("P2-curation", "P2-dedup", "E4")))


# ---------------------------------------------------------------------------
# Q127: the STREAMING funnel's per-doc disposition lake, driven through
# the driver's hash gate (round-5 verdict ask #1). Three epochs
# (doc_id % 3) run through curation_funnel_epoch — the byte-identical
# body of stream_curation_funnel's foreachBatch — against pid-scoped
# scratch ledgers, landing one graded audit row per dropped doc:
# (epoch, doc_id, stage, evidence exact|estimate, est_jaccard). The
# oracle is a one-shot DuckDB twin of the whole epoch protocol:
# first-epoch-wins exact dedup, k=64/16-band history estimates,
# within-epoch exact-verified connected components with transitivity
# through history-losers, and eval-set containment.
# ---------------------------------------------------------------------------

# the streaming funnel's drop geometry (k=64/16 bands — NOT the
# analytics default k=8; see stream_curation_funnel's false-drop note)
SFUNNEL_K = 64
SFUNNEL_BANDS = 16
SFUNNEL_FP_BANDS = 16  # q122's tiny-file lesson: 16 dirs, not 256
SFUNNEL_EST_MIN = 0.5
_SFUNNEL_EPOCHS = 3


def q_stream_dispositions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..operators.dedup import MINHASH_FAMILY
    from ..operators.index_ledger import _fs, _jp
    from ..streaming.pipeline import curation_funnel_epoch
    from .ledger_q import _index_root
    from .llmdata import EVAL_MOD

    docs = load_table(spark, sf_dir, "documents")
    evalset = docs.filter(F.col("doc_id") % EVAL_MOD == 0)
    train = docs.filter(F.col("doc_id") % EVAL_MOD != 0)
    # every geometry/threshold constant is DERIVED into the root name
    # (_index_root's contract): a retuned threshold can never inherit
    # a ledger built under the old geometry
    root = _index_root(
        sf_dir,
        f"sfunl{MINHASH_FAMILY}_q{int(FUNNEL_QUALITY_MIN * 100)}"
        f"j{int(FUNNEL_JACCARD * 100)}"
        f"e{int(SFUNNEL_EST_MIN * 100)}k{SFUNNEL_K}b{SFUNNEL_BANDS}"
        f"fp{SFUNNEL_FP_BANDS}c{int(FUNNEL_CONTAINMENT * 100)}"
        f"m{_SFUNNEL_EPOCHS}")
    dispo_root = os.path.join(root, "dispo")
    fs, _ = _fs(spark, root)
    for e in range(_SFUNNEL_EPOCHS):
        # resume/fast-forward: an epoch whose disposition dir is
        # committed has fully landed (dispositions are written AFTER
        # its index increments), and re-running it after LATER epochs
        # landed would see the future as history — so skip committed
        # epochs and only ever (re)run the suffix. A torn epoch
        # replays safely: its own index rows self-exclude, and
        # sequential ordering means no later epoch can have run.
        if fs.exists(_jp(spark, dispo_root, f"batch_id={e}",
                         "_SUCCESS")):
            continue
        curation_funnel_epoch(
            train.filter(
                F.pmod(F.col("doc_id"), F.lit(_SFUNNEL_EPOCHS)) == e),
            str(e), eval_docs=evalset,
            fp_dir=os.path.join(root, f"fpidx{SFUNNEL_FP_BANDS}"),
            nd_dir=os.path.join(root,
                                f"ndidx{SFUNNEL_K}x{SFUNNEL_BANDS}"),
            out_dir=os.path.join(root, "out"),
            report_dir=os.path.join(root, "report"),
            disposition_dir=dispo_root,
            min_quality=FUNNEL_QUALITY_MIN,
            jaccard_min=FUNNEL_JACCARD,
            est_jaccard_min=SFUNNEL_EST_MIN,
            minhash_k=SFUNNEL_K, lsh_bands=SFUNNEL_BANDS,
            min_containment=FUNNEL_CONTAINMENT,
            n_fp_bands=SFUNNEL_FP_BANDS)
    # an EMPTY epoch slice writes nothing (curation_funnel_epoch's
    # n_in==0 early return), so read only the dirs that exist — an
    # all-empty corpus legitimately yields zero dispositions
    dirs = [os.path.join(dispo_root, f"batch_id={e}")
            for e in range(_SFUNNEL_EPOCHS)]
    dirs = [d for d in dirs if fs.exists(_jp(spark, d))]
    if not dirs:
        from ..catalog import literal_df
        return literal_df(
            spark, [],
            "epoch int, doc_id long, stage string, evidence string, "
            "est_jaccard double")
    dispo = spark.read.option("basePath", dispo_root).parquet(*dirs)
    # pin: a later invocation overwrites nothing (epochs are skipped
    # once committed), but keep the lifecycle-query discipline of
    # never returning a lazy plan over a mutable scratch ledger
    return (dispo.select(F.col("batch_id").cast("int").alias("epoch"),
                         "doc_id", "stage", "evidence", "est_jaccard")
            .orderBy("epoch", "doc_id").localCheckpoint())


def _oracle_stream_dispositions() -> str:
    from .llmdata import (_SQL_NORM, _SQL_SHINGLES, _SQL_TOKS, EVAL_MOD,
                          _sql_band_conds, _sql_hash15,
                          _sql_minhash_mins, _sql_shingle_hash)

    qual = _SQL_QUALITY.strip()
    mins = _sql_minhash_mins(SFUNNEL_K)
    band_conds = _sql_band_conds("a", "b", k=SFUNNEL_K,
                                 bands=SFUNNEL_BANDS)
    matches = " + ".join(
        f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)"
        for i in range(SFUNNEL_K))
    return f"""
WITH RECURSIVE base AS (
  SELECT doc_id, text, doc_id % {_SFUNNEL_EPOCHS} AS e,
         CASE WHEN text IS NULL THEN 0.0
              ELSE coalesce({qual}, 0.0) END AS qual
  FROM documents WHERE doc_id % {EVAL_MOD} != 0
),
s1 AS (SELECT doc_id, e, text FROM base
       WHERE qual >= {FUNNEL_QUALITY_MIN}),
d_quality AS (
  SELECT e, doc_id, 'quality' AS stage, 'exact' AS evidence,
         CAST(NULL AS DOUBLE) AS est_jaccard
  FROM base WHERE qual < {FUNNEL_QUALITY_MIN}),
-- first-epoch-wins + within-epoch min-id == one global rank over
-- (epoch, doc_id) per fingerprint group: every s1 doc lands its
-- fingerprint in the index, survivor or not
rnk AS (
  SELECT doc_id, e, text,
         row_number() OVER (
           PARTITION BY coalesce({_sql_hash15(_SQL_NORM)}, -1)
           ORDER BY e, doc_id) AS rn
  FROM s1
),
s2 AS (SELECT doc_id, e, text FROM rnk WHERE rn = 1),
d_exact AS (
  SELECT e, doc_id, 'exact_dup' AS stage, 'exact' AS evidence,
         CAST(NULL AS DOUBLE) AS est_jaccard
  FROM rnk WHERE rn > 1),
toks2 AS (SELECT doc_id, e, {_SQL_TOKS} AS t FROM s2),
sig AS MATERIALIZED (
  SELECT doc_id,
       {mins}
  FROM (SELECT doc_id, {_sql_shingle_hash()} FROM
        (SELECT doc_id, unnest({_SQL_SHINGLES}) AS sh FROM toks2))
  GROUP BY doc_id
),
-- every band-bucket candidate pair touching any epoch, carrying both
-- epochs: at the later doc's ingest the earlier doc's signature is
-- index-resident, so the pair is generated exactly once there
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, ea.e AS e_a, eb.e AS e_b,
         ({matches})::DOUBLE / {SFUNNEL_K} AS est
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({band_conds})
  JOIN s2 ea ON ea.doc_id = a.doc_id
  JOIN s2 eb ON eb.doc_id = b.doc_id
),
hist_lose AS (
  SELECT CASE WHEN e_a < e_b THEN id_b ELSE id_a END AS doc_id, est
  FROM cand WHERE e_a != e_b AND est >= {SFUNNEL_EST_MIN}
),
direct AS (SELECT doc_id, max(est) AS max_est
           FROM hist_lose GROUP BY doc_id),
shl AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks2),
-- within-epoch candidates (ANY estimate) are exact-verified with the
-- texts at hand, then resolved by min-id connected components
ver AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN shl sa ON sa.doc_id = c.id_a
  JOIN shl sb ON sb.doc_id = c.id_b
  WHERE c.e_a = c.e_b
    AND len(list_intersect(sa.s, sb.s))::DOUBLE
        / len(list_distinct(list_concat(sa.s, sb.s))) >= {FUNNEL_JACCARD}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM ver
  UNION
  SELECT id_b, id_a FROM ver
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
canon AS (
  SELECT d.doc_id, d.e,
         least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS canonical
  FROM s2 d LEFT JOIN reach r ON r.src = d.doc_id
  GROUP BY d.doc_id, d.e
),
-- a component touching a history-loser dies wholly
dead AS (SELECT DISTINCT c.canonical
         FROM canon c JOIN direct dr ON dr.doc_id = c.doc_id),
losers AS (
  SELECT doc_id FROM canon WHERE doc_id != canonical
  UNION
  SELECT doc_id FROM canon
  WHERE canonical IN (SELECT canonical FROM dead)
),
d_near AS (
  SELECT c.e, c.doc_id, 'near_dup' AS stage,
         CASE WHEN c.doc_id != c.canonical
              THEN 'exact' ELSE 'estimate' END AS evidence,
         CASE WHEN c.doc_id = c.canonical
              THEN dr.max_est END AS est_jaccard
  FROM canon c LEFT JOIN direct dr ON dr.doc_id = c.doc_id
  WHERE c.doc_id IN (SELECT doc_id FROM losers)
),
s3 AS (SELECT doc_id, e, text FROM s2
       WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
evsh AS (
  SELECT doc_id AS eval_id, {_sql_hash15("sh0")} AS sh
  FROM (SELECT doc_id, unnest({_SQL_SHINGLES}) AS sh0
        FROM (SELECT doc_id, {_SQL_TOKS} AS t FROM documents
              WHERE doc_id % {EVAL_MOD} = 0))
),
trsh AS (
  SELECT doc_id AS train_id, {_sql_hash15("sh0")} AS sh
  FROM (SELECT doc_id, unnest({_SQL_SHINGLES}) AS sh0
        FROM (SELECT doc_id, {_SQL_TOKS} AS t FROM s3))
),
sizes AS (SELECT eval_id, count(*) AS n_eval FROM evsh GROUP BY eval_id),
bad AS (
  SELECT DISTINCT train_id
  FROM (SELECT train_id, eval_id, count(*) AS n_common
        FROM trsh JOIN evsh USING (sh) GROUP BY 1, 2) m
  JOIN sizes USING (eval_id)
  WHERE n_common::DOUBLE / n_eval >= {FUNNEL_CONTAINMENT}
),
d_cont AS (
  SELECT e, doc_id, 'contaminated' AS stage, 'exact' AS evidence,
         CAST(NULL AS DOUBLE) AS est_jaccard
  FROM s3 WHERE doc_id IN (SELECT train_id FROM bad)),
dispo AS (
  SELECT * FROM d_quality
  UNION ALL SELECT * FROM d_exact
  UNION ALL SELECT * FROM d_near
  UNION ALL SELECT * FROM d_cont
)
SELECT CAST(e AS INT) AS epoch, doc_id, stage, evidence, est_jaccard
FROM dispo ORDER BY epoch, doc_id
"""


SPECS.append(
    QuerySpec("q127_stream_dispositions", q_stream_dispositions,
              _oracle_stream_dispositions,
              "streaming-funnel per-doc disposition lake over 3 ingest "
              "epochs (evidence-graded drops: exact vs index-estimate "
              "with est_jaccard), oracle = one-shot DuckDB twin of the "
              "whole epoch protocol",
              ("P2-curation", "P2-dedup", "H6")))


# ---------------------------------------------------------------------------
# Q131: near-dup ESTIMATE-ENVELOPE gate (VERDICT r6 ask #6). The
# streaming funnel's vs-history drops are estimate-only by design
# (k=64/16-band minhash, SFUNNEL_EST_MIN); this pins the REALIZED
# confusion of that rule against exact shingle Jaccard at
# FUNNEL_JACCARD over the whole corpus — false drops (estimate says
# dup, exact disagrees) and false keeps (exact dup the estimate
# misses) become driver-hashed integers, the q126 recall-gate
# discipline applied to the dedup estimate path. A geometry retune
# that degrades the envelope now fails loudly (floor assertions in
# tests/test_curation.py) instead of silently shipping worse dedup.
# ---------------------------------------------------------------------------

def q_neardup_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    # ONE tokenize+shingle+md5 pass feeds both sides of the confusion
    # matrix (pinned: the estimate side references it through the
    # banded self-join twice, the exact side three times)
    base = dd.shingle_hashes(docs).localCheckpoint()
    sig = dd.minhash_signatures(docs, k=SFUNNEL_K, base=base)
    est = (dd.lsh_candidate_pairs(sig, k=SFUNNEL_K, bands=SFUNNEL_BANDS)
           .filter(F.col("est_jaccard") >= SFUNNEL_EST_MIN)
           .select("id_a", "id_b", F.lit(1).alias("_e")))
    exact = (dd.ngram_jaccard_pairs(docs, threshold=FUNNEL_JACCARD,
                                    base=base)
             .select("id_a", "id_b", F.lit(1).alias("_x")))
    j = est.join(exact, ["id_a", "id_b"], "full_outer")
    e, x = F.col("_e").isNotNull(), F.col("_x").isNotNull()

    def c(cond, name):
        # count(when) not sum(cast): an empty corpus must yield 0s,
        # not NULLs (sum over zero rows is NULL)
        return F.count(F.when(cond, F.lit(1))).alias(name)

    return j.agg(c(e, "n_est_dup"), c(x, "n_exact_dup"),
                 c(e & x, "n_both"), c(e & ~x, "false_drop"),
                 c(x & ~e, "false_keep"))


def _oracle_neardup_envelope() -> str:
    from .llmdata import (_SQL_SHINGLES, _SQL_TOKS, _sql_band_conds,
                          _sql_hash15, _sql_minhash_mins,
                          _sql_shingle_hash)

    mins = _sql_minhash_mins(SFUNNEL_K)
    band_conds = _sql_band_conds("a", "b", k=SFUNNEL_K,
                                 bands=SFUNNEL_BANDS)
    matches = " + ".join(
        f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)"
        for i in range(SFUNNEL_K))
    return f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
shs AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS sh FROM toks),
sig AS MATERIALIZED (
  SELECT doc_id,
       {mins}
  FROM (SELECT doc_id, {_sql_shingle_hash()} FROM shs) GROUP BY doc_id
),
est AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({band_conds})
  WHERE ({matches})::DOUBLE / {SFUNNEL_K} >= {SFUNNEL_EST_MIN}
),
shx AS (SELECT doc_id, {_sql_hash15("sh")} AS h FROM shs),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shx GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM shx a JOIN shx b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
ex AS (
  SELECT id_a, id_b
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common)
        >= {FUNNEL_JACCARD}
),
u AS (
  SELECT e.id_a IS NOT NULL AS is_e, x.id_a IS NOT NULL AS is_x
  FROM est e FULL OUTER JOIN ex x
    ON e.id_a = x.id_a AND e.id_b = x.id_b
)
SELECT count(CASE WHEN is_e THEN 1 END)::BIGINT AS n_est_dup,
       count(CASE WHEN is_x THEN 1 END)::BIGINT AS n_exact_dup,
       count(CASE WHEN is_e AND is_x THEN 1 END)::BIGINT AS n_both,
       count(CASE WHEN is_e AND NOT is_x THEN 1 END)::BIGINT AS false_drop,
       count(CASE WHEN is_x AND NOT is_e THEN 1 END)::BIGINT AS false_keep
FROM u
"""


SPECS.append(
    QuerySpec("q131_neardup_envelope", q_neardup_envelope,
              _oracle_neardup_envelope,
              "estimate-envelope gate for the funnel's k=64/16-band "
              "minhash drop rule: confusion counts (false drops / "
              "false keeps) vs exact shingle Jaccard, driver-hashed",
              ("P2-dedup", "B11")))
