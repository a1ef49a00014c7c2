"""JSONL / ORC / text-line ingest plane (sources/files.py +
plans/ingest_q.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_evm_chain_spark.sources.files import (
    read_jsonl, read_orc, read_text_lines, write_jsonl, write_orc)

from conftest import SF_SMALL

_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("score", T.DoubleType()),
])


def test_jsonl_roundtrip_lossless(spark, tmp_path):
    # unicode, embedded newline/quote/control chars, NULLs — the
    # round-trip must reproduce every value exactly
    rows = [
        (1, 'plain ascii', 1.5),
        (2, 'uni é中文 \U0001f600', -0.25),
        (3, 'line\nbreak\tand "quotes" and \\ backslash', 0.0),
        (4, None, None),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    path = str(tmp_path / "jl")
    write_jsonl(df, path, n_files=2)
    back = read_jsonl(spark, path, _SCHEMA)
    assert back.filter(F.col("_corrupt").isNotNull()).count() == 0
    got = sorted(back.drop("_corrupt").collect())
    assert [tuple(r) for r in got] == rows


def test_jsonl_corrupt_capture(spark, tmp_path):
    path = tmp_path / "bad"
    path.mkdir()
    (path / "part-0.json").write_text(
        '{"id": 1, "text": "ok", "score": 2.0}\n'
        'this is not json\n'
        '{"id": 2, "text": "also ok", "score": null}\n')
    back = read_jsonl(spark, str(path), _SCHEMA)
    bad = back.filter(F.col("_corrupt").isNotNull())
    assert bad.count() == 1
    assert bad.first()["_corrupt"] == "this is not json"
    assert back.filter(F.col("_corrupt").isNull()).count() == 2


def test_jsonl_failfast_mode(spark, tmp_path):
    import pytest
    from py4j.protocol import Py4JJavaError

    path = tmp_path / "ff"
    path.mkdir()
    (path / "p.json").write_text('{"id": 1}\nnope\n')
    with pytest.raises(Exception) as exc:
        read_jsonl(spark, str(path), _SCHEMA, mode="FAILFAST").collect()
    assert isinstance(exc.value, Py4JJavaError) or "Malformed" in str(exc.value)


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, float(i) / 4, f"s{i % 3}") for i in range(100)],
        "id long, v double, tag string")
    path = str(tmp_path / "orc")
    write_orc(df, path, n_files=3)
    back = read_orc(spark, path)
    assert back.schema == df.schema
    assert sorted(back.collect()) == sorted(df.collect())
    # predicate reaches the ORC scan
    plan = back.filter(F.col("id") > 90)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PushedFilters: [" in plan and "id" in plan.split(
        "PushedFilters")[1][:80]


def test_text_lines_with_file(spark, tmp_path):
    (tmp_path / "a.txt").write_text("l1\nl2\n")
    (tmp_path / "b.txt").write_text("l3\n")
    df = read_text_lines(spark, str(tmp_path), with_file=True)
    rows = df.collect()
    assert sorted(r.value for r in rows) == ["l1", "l2", "l3"]
    assert all(r.src_file.endswith((".txt",)) for r in rows)


def test_ingest_queries_match_duckdb(spark, duck):
    """Local mini-oracle for q111/q112 at sf0.001 (the driver runs the
    real gate at sf0.01)."""
    from etl_evm_chain_spark.plans.ingest_q import (
        ORACLE_JSONL_ROUNDTRIP, ORACLE_ORC_ROUNDTRIP,
        q_jsonl_roundtrip, q_orc_roundtrip)

    for fn, sql in ((q_jsonl_roundtrip, ORACLE_JSONL_ROUNDTRIP),
                    (q_orc_roundtrip, ORACLE_ORC_ROUNDTRIP)):
        got = fn(spark, SF_SMALL).toPandas()
        exp = duck.sql(sql).df()
        assert list(got.columns) == list(exp.columns)
        assert len(got) == len(exp)
        for c in got.columns:
            a, b = got[c].tolist(), exp[c].tolist()
            assert a == b, (fn.__name__, c, a[:3], b[:3])


def test_jsonl_blank_and_nonobject_lines(spark, tmp_path):
    """Blank lines are separators (skipped); a literal `null` or bare
    scalar line is NOT a record and must quarantine, never surface as
    a phantom all-NULL clean row (round-4 review fix)."""
    path = tmp_path / "edge"
    path.mkdir()
    (path / "p.json").write_text(
        '{"id": 1, "text": "ok", "score": 2.0}\n'
        '   \n'
        '\n'
        'null\n'
        '42\n'
        '{"id": 2, "text": null, "score": null}\n')
    back = read_jsonl(spark, str(path), _SCHEMA)
    clean = back.filter(F.col("_corrupt").isNull())
    assert clean.count() == 2
    bad = sorted(r["_corrupt"] for r in
                 back.filter(F.col("_corrupt").isNotNull()).collect())
    assert bad == ["42", "null"]
