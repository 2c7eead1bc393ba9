"""Iterative graph algorithms on DataFrames: damped PageRank.

Complements the bounded min-label propagation in operators/dedupe.py
(connected components for dup-cluster keeper selection): PageRank ranks
nodes WITHIN the graph — e.g. picking the canonical document inside a
duplicate cluster by link mass, or scoring providers in a
provider-to-work bipartite graph.

Execution shape per iteration: one shuffle (contributions grouped by
dst) + one join against the static edge/degree tables. The edge and
degree frames are computed once and cached; each round's rank frame is
localCheckpoint'ed so the lineage (and thus the plan) stays O(1) deep
instead of O(iterations) — at cluster scale use reliable
``checkpoint()`` to HDFS instead. Ranks are plain doubles; the gate
query rounds to 8 decimals so cross-engine summation-order ulps
collapse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 8,
    damping: float = 0.85,
) -> DataFrame:
    """Damped PageRank over an edge list (src, dst). Returns (node, rank).

    Every node must have at least one out-edge (feed undirected graphs
    as both directions — then the condition holds by construction);
    dangling-mass redistribution is deliberately out of scope.
    """
    edges = edges.select("src", "dst")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # fold the out-degree into the edge list ONCE: each round is then a
    # single join + grouped sum instead of a three-way join. Kept as the
    # raw degree (rank/deg, not rank*(1/deg)) so the arithmetic is
    # bit-identical to the reference formulation.
    wedges = (
        edges.join(deg, edges["src"] == deg["node"])
        .select("src", "dst", "deg")
        .cache()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    rank = nodes.select("node", (F.lit(1.0) / F.lit(float(n))).alias("rank"))
    base = (1.0 - damping) / float(n)
    for _ in range(n_iter):
        contrib = (
            rank.join(wedges, rank["node"] == wedges["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("mass"))
        )
        rank = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
            ).alias("rank"),
        )
        rank = rank.localCheckpoint(eager=False)
    return rank
