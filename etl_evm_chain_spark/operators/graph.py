"""Iterative graph analytics over edge DataFrames.

The reference's data plane stops at per-log decode + per-pool scans;
an analytics engine over the same decoded-transfer output is naturally
asked graph questions (flow centrality of addresses). PageRank here is
the standard Pregel-by-join formulation: the edge relation is hashed
by source once and reused every superstep, so each iteration costs one
shuffle of the (small) rank relation plus one aggregation by
destination — the plan a 1000-executor run wants, with no driver-side
adjacency structures.

Scale notes:
- ``edges`` is weighted, pre-aggregated (one row per (src, dst)) and
  ``localCheckpoint``-ed so the 5 supersteps re-scan a materialized
  relation instead of re-running the upstream decode 5×, and so plan
  lineage stays O(1) instead of O(iters).
- rank updates use no driver loop state beyond the iteration counter;
  the only driver scalar is |V| (same class as the reference's
  latest-height probe, `internal/rpc/client.go:153-177`).
- dangling-node mass is not redistributed (documented simplification,
  mirrored exactly by the SQL oracle in plans/graph_q.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_edges(df: DataFrame, *, src: str, dst: str) -> DataFrame:
    """Collapse raw (src, dst) rows into weighted distinct edges."""
    return (
        df.groupBy(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )


def triangle_counts(edges: DataFrame, *, a_col: str = "a",
                    b_col: str = "b") -> DataFrame:
    """Exact per-node triangle counts over an undirected graph.

    ``edges`` must be the canonical distinct undirected edge relation:
    one row per edge, ``a < b``, no self-loops (callers dedup/orient
    first — ``q114``'s co-purchase builder shows the shape).

    Plan: the standard degree-oriented wedge join. Each edge is
    directed from its lower-(degree, id) endpoint to the higher one, a
    self-join on the oriented source enumerates wedges (u→v, u→w with
    (deg_v, v) < (deg_w, w)), and a final equi-join back onto the edge
    relation closes them. Orientation is what makes this survive a
    100 TB edge list: oriented out-degree is bounded by O(sqrt(E))
    [every node of degree d > sqrt(2E) has most neighbors of equal or
    higher rank], so the wedge fan-out per node is O(E) total instead
    of sum(deg^2), and every step is a shuffle-parallel equi-join — no
    windows, no driver-side adjacency. Skewed hubs are exactly the
    nodes orientation demotes to wedge *targets*, not sources.

    Returns (node, n_triangles), one row per node that participates in
    at least one triangle.
    """
    # Three consumers (degree count, orientation join, closing join):
    # materialize once or each re-runs the caller's edge derivation —
    # same rule as the dedup tier's multi-consumed relations.
    e = (edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
         .localCheckpoint())
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        e.join(deg.select(F.col("node").alias("a"),
                          F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"),
                         F.col("deg").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    orient = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint()  # consumed twice (both wedge sides); the
    # lineage above re-runs the two degree joins per consumer otherwise
    e1 = orient.select("u", F.col("v").alias("v1"), F.col("dv").alias("d1"))
    e2 = orient.select("u", F.col("v").alias("v2"), F.col("dv").alias("d2"))
    wedges = (
        e1.join(e2, "u")
        .filter((F.col("d1") < F.col("d2")) |
                ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2"))))
        .select("u", "v1", "v2")
    )
    tri = wedges.join(
        e.select(F.col("a").alias("ea"), F.col("b").alias("eb")),
        (F.col("ea") == F.least("v1", "v2")) &
        (F.col("eb") == F.greatest("v1", "v2")),
        "inner",
    ).select("u", "v1", "v2")
    # single-pass credit: one explode, NOT a 3-way self-union (each
    # union branch would re-run the wedge close join)
    members = tri.select(
        F.explode(F.array("u", "v1", "v2")).alias("node"))
    return members.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles"))


BROADCAST_RANK_MAX = 5_000_000  # |V| under which the rank relation broadcasts


def pagerank(edges: DataFrame, *, iters: int = 5,
             damping: float = 0.85) -> DataFrame:
    """PageRank over a weighted edge relation (``src``, ``dst``, ``w``).

    Returns (node, rank). Contribution of a node to each out-neighbor
    is rank * w / total_out_weight; nodes with no in-edges keep the
    teleport term (1-d)/N.

    Superstep plan shape: the edge-share relation is hash-partitioned
    by ``dst`` ONCE; when |V| is broadcast-sized the per-iteration join
    against ranks is then broadcast (no edge shuffle) and the groupBy
    on ``dst`` reuses the existing partitioning (no exchange) — each
    superstep is map-side work plus a small broadcast. Above
    BROADCAST_RANK_MAX nodes the hint is dropped and the join falls
    back to shuffle hash/sort-merge, which is the correct plan for a
    billion-node graph anyway.
    """
    # lazy: the nodes.count() below is the forcing action for BOTH
    # pins (one materialization job instead of three)
    edges = edges.localCheckpoint(eager=False)
    sc = edges.sparkSession.sparkContext
    # |V| rows spread across spark.sql.shuffle.partitions inflate
    # every superstep by (iters × partitions) task overheads; at
    # cluster scale AQE coalesces this automatically, but the
    # localCheckpoint pins whatever partitioning exists here. The
    # partition count is derived, not hardcoded: capped by cluster
    # parallelism, floored at 8, and sized so each task holds a
    # bounded node slice (~500k) — a billion-vertex graph gets the
    # full cluster width, a toy graph doesn't pay 200 empty tasks.
    cap = max(8, sc.defaultParallelism)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .coalesce(cap)
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    rank_parts = max(8, min(cap, 1 + n // 500_000))
    small = n <= BROADCAST_RANK_MAX
    hint = F.broadcast if small else (lambda df: df)
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # Normalize each edge once (share = w / total out-weight of src),
    # partitioned by the aggregation key so the 5 supersteps reuse one
    # materialized, correctly-distributed relation.
    shares = (
        edges.join(hint(outw), "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("share"))
        .repartition("dst")
        .localCheckpoint()
    )
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(iters):
        mass = (
            shares.join(hint(ranks.withColumnRenamed("node", "src")), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("share")).alias("mass"))
        )
        ranks = (
            nodes.join(hint(mass), "node", "left")
            .select(
                "node",
                (F.lit(teleport)
                 + F.lit(damping) * F.coalesce("mass", F.lit(0.0)))
                .alias("rank"),
            )
            .coalesce(rank_parts)  # |V|-sized; see nodes note
        )
        # Each rank relation is consumed exactly once (the next
        # superstep's join), so the supersteps CHAIN lazily into one
        # DAG — no recompute, one action instead of one eager
        # materialization job per iteration (round-9: 32 jobs → 9 at
        # iters=5; driver-confirmed q74 7.0 → 5.8 s, re-A/B'd r10:
        # eager-per-round ties within noise, lazy kept). Checkpoint on
        # a cadence only, to bound plan lineage when a caller asks for
        # many iterations (the resolve_duplicates loop discipline).
        # NOTE for multi-action consumers (ADVICE r9): below the
        # cadence the returned relation is a lazy chain — a caller
        # consuming it in several actions should pin it once itself.
        if (it + 1) % 8 == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint()
    return ranks


def label_propagation(edges: DataFrame, *, a_col: str = "a",
                      b_col: str = "b", n_iter: int = 3) -> DataFrame:
    """Synchronous label propagation (community detection) over an
    undirected edge relation — deterministic by construction, so the
    whole algorithm sits under the oracle hash gate as pure integer
    arithmetic (no float, no randomness, no partition sensitivity):

    - labels start as the node's own id;
    - each round, EVERY node simultaneously adopts the most frequent
      label among its NEIGHBORS' current labels (its own label does
      not vote — the classic synchronous variant), ties broken to the
      smallest label;
    - ``n_iter`` fixed rounds (no convergence test: a fixed round
      count is what makes the result a pinnable value rather than an
      oscillation-dependent one — synchronous LPA can 2-cycle on
      bipartite structures, and a fixed horizon pins WHICH phase).

    Self-loop edges are dropped here (a self-loop would let the node
    vote for itself every round, silently biasing toward
    self-retention) — callers need no precondition, unlike
    triangle_counts' documented a < b contract. A node whose ONLY
    edges are self-loops still appears in the output, as a singleton
    community labeled with its own id (it has no neighbors, so it
    participates in no propagation round) — it is never silently
    dropped.

    Per-round cost: one |E|-scale shuffle (symmetrized edges join the
    label relation on the source, votes aggregate by (destination,
    label) with map-side partial counts) plus one re-exchange of the
    much smaller (node, label, count) vote relation for the argmax —
    which is a ``max(struct(cnt, -label))`` groupBy, never a window
    over the full node set. The label relation is localCheckpoint-ed
    per round so plan lineage stays O(1) in rounds (the
    resolve_duplicates loop discipline). |V|-sized state only ever
    lives distributed.

    Reference parity: no analog (the reference has no graph plane);
    this extends the q74/q114/q41 graph tier with the standard
    community primitive.
    """
    ends = (edges.select(F.col(a_col).alias("src"),
                         F.col(b_col).alias("dst"))
            .union(edges.select(F.col(b_col).alias("src"),
                                F.col(a_col).alias("dst"))))
    sym = (ends.filter(F.col("src") != F.col("dst"))
           .dropDuplicates().localCheckpoint())
    labels = (sym.select(F.col("src").alias("node"))
              .dropDuplicates()
              .select("node", F.col("node").alias("lbl"))
              .localCheckpoint())
    # self-loop-only nodes: in the edge relation but not in sym after
    # the self-loop drop — they take no part in any round and emit as
    # singleton communities at the end (one extra |E|-distinct, paid
    # once, no per-round cost)
    singletons = (ends.select(F.col("src").alias("node")).dropDuplicates()
                  .join(labels.select("node"), "node", "left_anti")
                  .select("node", F.col("node").alias("lbl"))
                  .localCheckpoint())
    for it in range(n_iter):
        votes = (sym.join(labels, sym["src"] == labels["node"])
                 .groupBy(F.col("dst").alias("vnode"), "lbl")
                 .agg(F.count(F.lit(1)).alias("c")))
        best = (votes.groupBy("vnode")
                .agg(F.max(F.struct(F.col("c"), (-F.col("lbl"))
                                    .alias("neg"))).alias("_b"))
                .select(F.col("vnode").alias("node"),
                        (-F.col("_b.neg")).alias("lbl")))
        labels = best
        # eager localCheckpoint per round, keeping lineage O(1) in
        # rounds. Round-9 chained the rounds lazily (isolated-warm
        # q129 5.3 → 3.8 s) but the driver's cold in-suite bench
        # REGRESSED 6.9 → 8.5 s; the r10 reproduce-or-revert A/B
        # (fresh JVMs, reps) confirms eager-per-round is faster here
        # (4.5-5.6 s vs 5.4-5.7 s warm) — the deep 3-round join tree
        # costs more in AQE/codegen than the per-round jobs save.
        if it + 1 < n_iter:
            labels = labels.localCheckpoint()
    return (labels.unionByName(singletons)
            .select("node", F.col("lbl").alias("community")))
