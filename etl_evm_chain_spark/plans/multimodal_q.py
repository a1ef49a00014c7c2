"""Multimodal-column queries (SURVEY §7 P2-multimodal).

Media travels as an opaque ``binary`` column + typed metadata; decode
runs as Arrow-batched ``mapInPandas`` (operators/multimodal.py). Real
codecs are absent in this container, so the query uses the
deterministic ``fake_decoder`` (shape/features from an md5 of the
payload) — which makes the WHOLE pipeline, mapInPandas included,
reproducible in the DuckDB oracle: DuckDB's ``md5(text)`` hashes the
same UTF-8 bytes Python's ``hashlib.md5`` sees.

Scale notes: the binary payload dominates partition size — the decode
stage is a single narrow mapInPandas pass (no shuffle); everything
after it is metadata-only (ints per media row), so the groupBy/join
shuffles move no pixel data. At 100 TB the one structural decision is
to persist the decoded metadata once instead of re-decoding per
consumer branch — mirrored here with an explicit ``persist``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.multimodal import (
    decode_media,
    fake_decoder,
    frame_sample,
    resize_plan,
)
from . import QuerySpec

MAX_SIDE = 224
FRAME_EVERY = 2


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media view of `documents`: payload = UTF-8 bytes
    of the text, mime round-robins image/audio/video by doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    mime = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("bytes"),
        mime.alias("mime"),
        F.create_map(F.lit("src"), F.lit("documents")).alias("meta"),
    )


def _avg6(num_col: str) -> F.Column:
    avg = F.sum(num_col).cast("double") / F.count(F.lit(1))
    return (F.floor(avg * 1e6) / 1e6).alias(f"avg_{num_col}")


def q_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    decoded = decode_media(media, decoder=fake_decoder)
    sized = resize_plan(decoded, max_side=MAX_SIDE).persist()
    per_mime = sized.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        _avg6("width"),
        _avg6("height"),
        _avg6("target_w"),
        _avg6("target_h"),
        F.sum("n_frames").alias("total_frames"),
    )
    frames = (
        frame_sample(sized, every_n=FRAME_EVERY)
        .join(sized.select("media_id", "mime"), "media_id")
        .groupBy("mime")
        .agg(F.count(F.lit(1)).alias("n_sampled_frames"))
    )
    return (
        per_mime.join(frames, "mime", "left")
        .withColumn("n_sampled_frames",
                    F.coalesce("n_sampled_frames", F.lit(0)))
        .orderBy("mime")
    )


# fake_decoder: h = md5(bytes); width = 16+h[0], height = 16+h[1],
# n_frames = 1 + h[2] % 8 for video else 1. Hex chars (1,2)/(3,4)/(5,6)
# are exactly those digest bytes.
_ORACLE_MEDIA_STATS = f"""
WITH m AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
              WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
         md5(text) AS h,
         octet_length(encode(text)) AS n_bytes
  FROM documents
),
d AS (
  SELECT media_id, mime, n_bytes,
         16 + CAST('0x' || substr(h, 1, 2) AS INT) AS width,
         16 + CAST('0x' || substr(h, 3, 2) AS INT) AS height,
         CASE WHEN mime = 'video/mp4'
              THEN 1 + (CAST('0x' || substr(h, 5, 2) AS INT) % 8)
              ELSE 1 END AS n_frames
  FROM m
),
s AS (
  SELECT *,
         CAST(ceil(width * least(1.0, {MAX_SIDE}.0
              / CAST(greatest(width, height) AS DOUBLE))) AS INT) AS target_w,
         CAST(ceil(height * least(1.0, {MAX_SIDE}.0
              / CAST(greatest(width, height) AS DOUBLE))) AS INT) AS target_h
  FROM d
)
SELECT mime,
       count(*) AS n_items,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       floor(CAST(sum(width) AS DOUBLE) / count(*) * 1000000.0) / 1000000.0 AS avg_width,
       floor(CAST(sum(height) AS DOUBLE) / count(*) * 1000000.0) / 1000000.0 AS avg_height,
       floor(CAST(sum(target_w) AS DOUBLE) / count(*) * 1000000.0) / 1000000.0 AS avg_target_w,
       floor(CAST(sum(target_h) AS DOUBLE) / count(*) * 1000000.0) / 1000000.0 AS avg_target_h,
       CAST(sum(n_frames) AS BIGINT) AS total_frames,
       CAST(sum(CASE WHEN n_frames > 1
                     THEN len(range(0, n_frames, {FRAME_EVERY}))
                     ELSE 0 END) AS BIGINT) AS n_sampled_frames
FROM s
GROUP BY mime
ORDER BY mime
"""


SPECS = [
    QuerySpec("q61_media_stats", q_media_stats, _ORACLE_MEDIA_STATS,
              "binary media decode (mapInPandas) + resize/frame-sample stats",
              ("P2-multimodal",)),
]


# ---------------------------------------------------------------------------
# Q99: content-addressed chunking of binary payloads — the blob
# sharding primitive (fixed 64-byte chunks, per-chunk md5). Both
# engines chunk the hex image of the payload, so the check covers the
# byte-exact boundaries and hashes.
# ---------------------------------------------------------------------------

CHUNK_BYTES = 64


def q_media_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import chunk_bytes

    media = media_table(spark, sf_dir)
    return chunk_bytes(media, chunk_size=CHUNK_BYTES)


_ORACLE_MEDIA_CHUNKS = f"""
WITH m AS (SELECT doc_id AS media_id, lower(hex(encode(text))) AS hx
           FROM documents),
e AS (SELECT media_id,
             unnest(list_transform(
                 range(0, CAST(ceil(length(hx)/{2 * CHUNK_BYTES}.0) AS BIGINT)),
                 i -> struct_pack(idx := i,
                                  ch := substring(hx, i*{2 * CHUNK_BYTES}+1,
                                                  {2 * CHUNK_BYTES})))) AS u
      FROM m)
SELECT media_id, CAST(u.idx AS INT) AS chunk_idx,
       CAST(length(u.ch)/2 AS INT) AS chunk_len, md5(u.ch) AS chunk_md5
FROM e
"""

SPECS.append(
    QuerySpec("q99_media_chunks", q_media_chunks, _ORACLE_MEDIA_CHUNKS,
              "fixed-size binary chunking with per-chunk md5 (blob "
              "sharding primitive)", ("P2-multimodal",)))
