"""Tests: multimodal plumbing (with the deterministic fake decoder)
and the job-registry control plane."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from etl_evm_chain_spark.jobs import CANCELLED, FINISHED, JobRegistry
from etl_evm_chain_spark.operators import multimodal as mm


def _media(spark):
    rows = [
        (1, b"\x89PNGfakepayload-1", "image/png", {"src": "a"}),
        (2, b"RIFFfakewav-22", "audio/wav", {"src": "b"}),
        (3, b"\x00\x00ftypmp4-payload-3", "video/mp4", {"src": "c"}),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_decode_media_plumbing(spark):
    out = mm.decode_media(_media(spark), decoder=mm.fake_decoder)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    r = rows[1]
    assert r["n_bytes"] == len(b"\x89PNGfakepayload-1")
    assert 16 <= r["width"] <= 271 and len(r["features"]) == 8
    assert rows[3]["n_frames"] >= 1
    # determinism: same payload → same features
    again = {x["media_id"]: x for x in
             mm.decode_media(_media(spark), decoder=mm.fake_decoder).collect()}
    assert again[1]["features"] == r["features"]


def test_default_decoder_is_gated(spark):
    with pytest.raises(Exception) as ei:
        mm.decode_media(_media(spark)).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_frame_sample_and_resize_plan(spark):
    decoded = mm.decode_media(_media(spark), decoder=mm.fake_decoder)
    frames = mm.frame_sample(decoded, every_n=2).collect()
    assert all(f["frame_idx"] % 2 == 0 for f in frames)
    sized = mm.resize_plan(decoded, max_side=32).collect()
    for r in sized:
        assert max(r["target_w"], r["target_h"]) <= 32
        assert r["target_w"] > 0 and r["target_h"] > 0


def test_job_registry_lifecycle(spark):
    reg = JobRegistry(spark)

    def work(s):
        s.range(100000).selectExpr("sum(id)").collect()

    jid = reg.submit(work)
    st = reg.wait(jid, timeout=60)
    assert st.status == FINISHED and st.error is None
    assert st.finished_at >= st.started_at

    def slow(s):
        for _ in range(50):
            s.range(2_000_000).selectExpr("count(distinct id)").collect()

    jid2 = reg.submit(slow)
    time.sleep(0.3)
    st2 = reg.cancel(jid2)
    assert st2.status == CANCELLED

    with pytest.raises(KeyError):
        reg.get("nope")


def test_chunk_bytes_boundaries_and_hashes(spark):
    import hashlib

    from etl_evm_chain_spark.operators.multimodal import chunk_bytes

    rows = [
        (1, b"a" * 64),            # exactly one chunk
        (2, b"b" * 65),            # chunk + 1-byte tail
        (3, b""),                  # empty payload → no chunks
        (4, b"xy"),                # single short chunk
    ]
    df = spark.createDataFrame(rows, "media_id long, bytes binary")
    got = {}
    for r in chunk_bytes(df, chunk_size=64).collect():
        got.setdefault(r["media_id"], []).append(
            (r["chunk_idx"], r["chunk_len"], r["chunk_md5"]))
    def h(b):  # the operator hashes the lowercase hex image
        return hashlib.md5(b.hex().encode()).hexdigest()
    assert got[1] == [(0, 64, h(b"a" * 64))]
    assert got[2] == [(0, 64, h(b"b" * 64)), (1, 1, h(b"b"))]
    assert 3 not in got
    assert got[4] == [(0, 2, h(b"xy"))]


def test_png_roundtrip_all_filter_types():
    import random

    from etl_evm_chain_spark.operators.multimodal import (encode_png,
                                                          stdlib_decoder)

    rng = random.Random(7)
    pixels = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
               for _ in range(9)] for _ in range(7)]
    n = 9 * 7
    exp = [sum(px[c] for row in pixels for px in row) / (255.0 * n)
           for c in range(3)]
    for ft in range(5):          # every PNG scanline filter type
        d = stdlib_decoder(encode_png(pixels, filter_type=ft), "image/png")
        assert (d["width"], d["height"]) == (9, 7)
        for got, want in zip(d["features"], exp):
            assert abs(got - want) < 1e-12, (ft, got, want)


def test_stdlib_codecs_through_spark_decode(spark):
    import math

    from etl_evm_chain_spark.operators.multimodal import (decode_media,
                                                          encode_png,
                                                          encode_wav,
                                                          stdlib_decoder)

    png = encode_png([[(255, 0, 0), (0, 255, 0)],
                      [(0, 0, 255), (255, 255, 255)]], filter_type=4)
    wav = encode_wav([int(10000 * math.sin(i / 10)) for i in range(4000)],
                     rate=8000)
    df = spark.createDataFrame(
        [(1, png, "image/png", {}), (2, wav, "audio/wav", {})],
        "media_id long, bytes binary, mime string, meta map<string,string>")
    got = {r["media_id"]: r
           for r in decode_media(df, decoder=stdlib_decoder).collect()}
    assert got[1]["width"] == 2 and got[1]["height"] == 2
    assert abs(got[1]["features"][0] - 0.5) < 1e-12     # red channel mean
    assert got[2]["n_frames"] == 4000
    assert got[2]["features"][1] == 8000.0               # sample rate
    assert 0.2 < got[2]["features"][2] < 0.23            # sine RMS/32768
