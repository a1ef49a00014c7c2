"""Unit tests for operators/graph.py (PageRank semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_evm_chain_spark.operators.graph import pagerank, weighted_edges


def _ranks(spark, rows):
    df = spark.createDataFrame(rows, "s string, d string")
    edges = weighted_edges(df, src="s", dst="d")
    out = pagerank(edges, iters=20, damping=0.85)
    return {r["node"]: r["rank"] for r in out.collect()}


def test_pagerank_star_sink_dominates(spark):
    # a→c, b→c: the sink c accumulates the most rank.
    r = _ranks(spark, [("a", "c"), ("b", "c")])
    assert r["c"] > r["a"] == r["b"]
    # no dangling redistribution: total mass ≤ 1 (c's mass leaks).
    assert 0.0 < sum(r.values()) <= 1.0 + 1e-9


def test_pagerank_cycle_is_uniform(spark):
    # symmetric 3-cycle: all nodes equal at 1/3 (mass conserved).
    r = _ranks(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    vals = list(r.values())
    assert all(abs(v - 1.0 / 3) < 1e-9 for v in vals)


def test_pagerank_edge_weights_shift_mass(spark):
    # a sends 3 edges to b and 1 to c → b gets 3× c's share of a's mass.
    rows = [("a", "b"), ("a", "b"), ("a", "b"), ("a", "c")]
    r = _ranks(spark, rows)
    assert r["b"] > r["c"]
