"""Multimodal column plumbing (SURVEY §7 P2).

Media (image/audio/video) travels as an opaque ``binary`` column plus
a typed metadata struct; all processing runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row objects.
The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode kernel is pluggable: the default raises
NotImplementedError, and ``fake_decoder`` provides a deterministic
stand-in so the Spark-side plumbing — schema, batching, partitioning,
UDF signatures — is real and tested end-to-end.

Scale notes: binary payloads dominate partition size — repartition by
a size-aware key before heavy kernels (``target_partition_mb``), and
never groupBy the binary column itself (metadata carries the join
keys). Feature outputs are fixed-width float arrays → columnar,
shuffle-friendly.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("mime", T.StringType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

# A decoder takes raw bytes + mime and returns a dict of extracted
# fields: {"width": int, "height": int, "n_frames": int, "features": list[float]}
Decoder = Callable[[bytes, str], dict]


def default_decoder(data: bytes, mime: str) -> dict:
    raise NotImplementedError(
        "no media codec available in this environment; inject a decoder "
        "(e.g. PIL for image/*, av for video/*) or use fake_decoder"
    )


def fake_decoder(data: bytes, mime: str) -> dict:
    """Deterministic stand-in decoder: derives shape/features from a
    hash of the payload. Exercises the full plumbing without codecs."""
    h = hashlib.md5(data).digest()
    return {
        "width": 16 + h[0],
        "height": 16 + h[1],
        "n_frames": 1 + (h[2] % 8) if mime.startswith("video/") else 1,
        "features": [b / 255.0 for b in h[:8]],
    }


DECODED_SCHEMA = (
    "media_id long, mime string, n_bytes long, width int, height int, "
    "n_frames int, features array<double>"
)


def decode_media(df: DataFrame, *, decoder: Decoder = default_decoder,
                 batch_limit: int = 256) -> DataFrame:
    """Decode/feature-extract media via mapInPandas.

    One Arrow batch in, one out; payload bytes stay inside the batch.
    ``batch_limit`` caps rows per emitted frame so huge media don't
    blow the Arrow buffer (at scale also set
    spark.sql.execution.arrow.maxRecordsPerBatch accordingly).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for off in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[off:off + batch_limit]
                rows = []
                for mid, data, mime in zip(chunk["media_id"], chunk["bytes"],
                                           chunk["mime"]):
                    d = decoder(bytes(data), mime or "")
                    rows.append((int(mid), mime, len(data), d["width"],
                                 d["height"], d["n_frames"], d["features"]))
                yield pd.DataFrame(rows, columns=[
                    "media_id", "mime", "n_bytes", "width", "height",
                    "n_frames", "features"])

    return df.select("media_id", "bytes", "mime").mapInPandas(run, DECODED_SCHEMA)


def frame_sample(df: DataFrame, *, every_n: int = 2) -> DataFrame:
    """Frame-sampling plan for video rows: explode frame indexes
    0, every_n, 2·every_n … < n_frames (decode of the actual frame is
    the decoder's job; this is the distributed index plan)."""
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return (
        df.filter(F.col("n_frames") > 1)
        .withColumn("frame_idx", F.explode(idx))
        .select("media_id", "frame_idx", "width", "height")
    )


def resize_plan(df: DataFrame, *, max_side: int = 224) -> DataFrame:
    """Resize metadata computation (aspect-preserving target dims) —
    pure expressions; the pixel work happens in the decoder kernel."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest("width", "height").cast("double"),
    )
    return df.withColumn("target_w", F.ceil(F.col("width") * scale).cast("int")) \
             .withColumn("target_h", F.ceil(F.col("height") * scale).cast("int"))


def chunk_bytes(df: DataFrame, *, bytes_col: str = "bytes",
                id_col: str = "media_id", chunk_size: int = 64) -> DataFrame:
    """Shard a binary payload into fixed-size chunks with per-chunk
    md5 — the blob transfer/dedup primitive (content-addressed chunk
    store; CDC would vary the boundaries, the plumbing is identical).

    Runs on the hex image of the payload so every step is a native
    string expression (split every 2·chunk_size hex chars, posexplode
    with the chunk index) — engine-portable and shuffle-free: chunks
    of a payload stay in their row's partition; only if a downstream
    groupBy(chunk_md5) dedups across payloads does a shuffle (of
    hashes, not bytes) appear.

    Returns (id, chunk_idx int, chunk_len int bytes, chunk_md5).
    """
    hx = F.lower(F.hex(F.col(bytes_col)))
    chunks = F.split(hx, r"(?<=\G.{%d})" % (2 * chunk_size))
    out = (
        df.select(F.col(id_col),
                  F.posexplode(chunks).alias("chunk_idx", "_ch"))
        .filter(F.length("_ch") > 0)       # drop the trailing empty split
    )
    return out.select(
        id_col, "chunk_idx",
        (F.length("_ch") / 2).cast("int").alias("chunk_len"),
        F.md5(F.col("_ch")).alias("chunk_md5"),
    )
