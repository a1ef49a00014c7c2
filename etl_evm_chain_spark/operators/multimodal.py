"""Multimodal column plumbing (SURVEY §7 P2).

Media (image/audio/video) travels as an opaque ``binary`` column plus
a typed metadata struct; all processing runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row objects.
The decode kernel is pluggable. ``stdlib_decoder`` is a REAL codec
path with no third-party dependency: a full PNG decode (IHDR parse,
zlib inflate, all five scanline unfilters, per-channel pixel means)
and WAV PCM decode (stdlib ``wave``; channels/rate/frames + RMS).
Video and non-PNG images need an injected codec (PIL/ffmpeg absent in
this container): the default raises NotImplementedError, and
``fake_decoder`` remains the deterministic stand-in the oracle-checked
query uses (md5-derived → expressible in DuckDB).

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


# ---------------------------------------------------------------------------
# Real stdlib codecs: the environment has no PIL/ffmpeg, but PNG is
# struct+zlib and WAV is the stdlib `wave` module — so image and audio
# get a GENUINE decode path (header parse + full pixel/PCM decode),
# not just the fake stand-in. Video stays decoder-injected.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}   # gray, RGB, gray+A, RGBA


def _png_unfilter(raw: bytes, width: int, height: int,
                  channels: int) -> bytes:
    """Reverse PNG scanline filtering (types 0-4, 8-bit samples)."""
    stride = width * channels
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ft = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if ft == 1:                                   # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ft == 2:                                 # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:                                 # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:                                 # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter {ft}")
        out += line
        prev = line
    return bytes(out)


def _decode_png(data: bytes) -> dict:
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width = 8, 0
    height = depth = ctype = 0
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        ctag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln                                # skip CRC
        if ctag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body[:13])
            if interlace:
                raise ValueError("Adam7-interlaced PNG not supported")
        elif ctag == b"IDAT":
            idat += body
        elif ctag == b"IEND":
            break
    if depth != 8 or ctype not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG (depth={depth} color={ctype})")
    ch = _PNG_CHANNELS[ctype]
    pix = _png_unfilter(zlib.decompress(idat), width, height, ch)
    n = width * height
    means = [sum(pix[c::ch]) / (255.0 * n) for c in range(ch)]
    return {"width": width, "height": height, "n_frames": 1,
            "features": means}


def _decode_wav(data: bytes) -> dict:
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(data)) as w:
        n_ch, sw, rate, n_frames = (w.getnchannels(), w.getsampwidth(),
                                    w.getframerate(), w.getnframes())
        pcm = w.readframes(n_frames)
    if sw != 2:
        # mirroring the PNG path: reject rather than report a fake
        # silent clip (8/24-bit or float PCM needs an injected codec)
        raise ValueError(f"unsupported WAV sample width {sw} (16-bit only)")
    vals = struct.unpack(f"<{len(pcm) // 2}h", pcm)
    rms = ((sum(v * v for v in vals) / max(1, len(vals))) ** 0.5) / 32768.0
    return {"width": 0, "height": 0, "n_frames": n_frames,
            "features": [float(n_ch), float(rate), float(rms)]}


def stdlib_decoder(data: bytes, mime: str) -> dict:
    """Real decode for image/png (struct+zlib: IHDR parse, full
    scanline unfilter, per-channel pixel means) and audio/wav (stdlib
    `wave`: channels/rate/frames + PCM RMS). Other mimes need an
    injected codec — same contract as ``default_decoder``."""
    if mime == "image/png":
        return _decode_png(data)
    if mime in ("audio/wav", "audio/x-wav"):
        return _decode_wav(data)
    return default_decoder(data, mime)


def encode_png(pixels: list[list[tuple]], *, color_type: int = 2,
               filter_type: int = 0) -> bytes:
    """Minimal PNG encoder for tests/fixtures; ``filter_type`` applies
    that scanline filter to every row so each decoder unfilter branch
    can be exercised with a roundtrip."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    h, w = len(pixels), len(pixels[0])
    ch = len(pixels[0][0])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    stride = w * ch
    raw = bytearray()
    prev = bytearray(stride)
    for row in pixels:
        line = bytearray(v for px in row for v in px)
        enc = bytearray(stride)
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) >> 1
            else:                                     # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([filter_type]) + enc
        prev = line
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def encode_wav(samples: list[int], *, rate: int = 8000,
               n_channels: int = 1) -> bytes:
    """Minimal 16-bit PCM WAV encoder for tests/fixtures."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()
