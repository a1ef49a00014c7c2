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


def pagerank(edges: DataFrame, *, iters: int = 5,
             damping: float = 0.85) -> DataFrame:
    """PageRank over a weighted edge relation (``src``, ``dst``, ``w``).

    Returns (node, rank). Contribution of a node to each out-neighbor
    is rank * w / total_out_weight; nodes with no in-edges keep the
    teleport term (1-d)/N.
    """
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # Normalize each edge once: share = w / total out-weight of src.
    # The 5 supersteps then reuse this one materialized relation.
    shares = (
        edges.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("share"))
        .localCheckpoint()
    )
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        mass = (
            shares.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("share")).alias("mass"))
        )
        ranks = (
            nodes.join(mass, "node", "left")
            .select(
                "node",
                (F.lit(teleport)
                 + F.lit(damping) * F.coalesce("mass", F.lit(0.0)))
                .alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
