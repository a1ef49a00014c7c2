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


# --------------------------- triangle_counts ---------------------------

def _tris(spark, pairs):
    from etl_evm_chain_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(pairs, "a long, b long")
    return {r["node"]: r["n_triangles"]
            for r in triangle_counts(df).collect()}


def test_triangles_k4_every_node_in_three(spark):
    # K4: 4 triangles total; every node sits in exactly C(3,2) = 3.
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    t = _tris(spark, k4)
    assert t == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangles_single_and_pendant(spark):
    # one triangle {1,2,3} plus a pendant edge 3-4: node 4 absent.
    t = _tris(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    assert t == {1: 1, 2: 1, 3: 1}


def test_triangles_none_in_a_path(spark):
    assert _tris(spark, [(1, 2), (2, 3), (3, 4)]) == {}


def test_triangles_two_sharing_an_edge(spark):
    # {1,2,3} and {1,2,4} share edge 1-2: nodes 1,2 in two each.
    t = _tris(spark, [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)])
    assert t == {1: 2, 2: 2, 3: 1, 4: 1}


def test_label_propagation_two_communities(spark):
    """Two dense cliques joined by nothing: every node converges to
    its clique's min id; the synchronous neighbor-majority vote with
    min-label ties is deterministic across partitionings."""
    from etl_evm_chain_spark.operators.graph import label_propagation

    clique1 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    clique2 = [(a, b) for a in (10, 11, 12) for b in (10, 11, 12) if a < b]
    # self-loops are dropped by the operator (a self-vote would bias
    # toward self-retention) — (2,2) must not change anything
    edges = spark.createDataFrame(clique1 + clique2 + [(2, 2)],
                                  "a long, b long")
    out = {r["node"]: r["community"]
           for r in label_propagation(edges, n_iter=3).collect()}
    assert {out[n] for n in (1, 2, 3, 4)} == {1}
    assert {out[n] for n in (10, 11, 12)} == {10}
    # partition-independence (integer votes, no order sensitivity)
    out2 = {r["node"]: r["community"]
            for r in label_propagation(edges.repartition(7),
                                       n_iter=3).collect()}
    assert out == out2


def test_label_propagation_self_loop_only_node_is_singleton(spark):
    """A node whose ONLY edges are self-loops has no neighbors after
    the self-loop drop; it must still appear in the output as its own
    singleton community (round-6 advice: it silently vanished)."""
    from etl_evm_chain_spark.operators.graph import label_propagation

    edges = spark.createDataFrame([(1, 2), (2, 3), (7, 7)],
                                  "a long, b long")
    out = {r["node"]: r["community"]
           for r in label_propagation(edges, n_iter=3).collect()}
    assert out[7] == 7                      # singleton, own label
    assert set(out) == {1, 2, 3, 7}         # nobody dropped
