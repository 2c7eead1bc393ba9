"""PageRank gate query with a fully-unrolled SQL oracle.

Iterative algorithms are usually exempted from value gates ("not
SQL-expressible"); here the fixed iteration count lets the oracle unroll
all rounds as chained CTEs, so even the iterative operator is
hash-checked. The graph is the undirected part<->supplier bipartite
graph from lineitem (both directions materialized, so every node has
out-degree >= 1 — the operator's contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openverse_catalog_spark.operators.graph import pagerank
from openverse_catalog_spark.plans.analytics import _t, register

_ITER = 6
_D = "CAST(0.85 AS DOUBLE)"


def _oracle() -> str:
    steps = []
    for k in range(_ITER):
        steps.append(
            f"""r{k + 1} AS (
      SELECT n.node,
             (CAST(1 AS DOUBLE) - {_D}) / (SELECT cnt FROM nn)
             + {_D} * coalesce(m.mass, CAST(0 AS DOUBLE)) AS rank
      FROM nodes n
      LEFT JOIN (
        SELECT e.dst AS node, sum(r.rank / d.deg) AS mass
        FROM edges e
        JOIN r{k} r ON r.node = e.src
        JOIN deg d ON d.node = e.src
        GROUP BY e.dst
      ) m ON m.node = n.node
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT 'p' || l_partkey AS p, 's' || l_suppkey AS s
      FROM lineitem
    ),
    edges AS (
      SELECT p AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, p AS dst FROM pairs
    ),
    nodes AS (
      SELECT DISTINCT src AS node FROM edges
      UNION
      SELECT DISTINCT dst AS node FROM edges
    ),
    nn AS (SELECT count(*) AS cnt FROM nodes),
    deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
    r0 AS (
      SELECT node, CAST(1 AS DOUBLE) / (SELECT cnt FROM nn) AS rank
      FROM nodes
    ),
    {chain}
    SELECT node, round(rank, 8) AS rank FROM r{_ITER}
    """


@register("graph_pagerank_partsupp", _oracle())
def graph_pagerank_partsupp(spark, sf_dir):
    """Six damped PageRank rounds over the part<->supplier graph. Each
    round is one shuffle (contributions by dst) against cached static
    edge/degree frames, with per-round localCheckpoint keeping the plan
    depth constant. The oracle unrolls the same six rounds as chained
    CTEs — a value-exact gate for an iterative algorithm. Ranks rounded
    to 8 decimals to absorb cross-engine float-summation order."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    pairs = li.select(
        F.concat(F.lit("p"), F.col("l_partkey")).alias("p"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
    ).distinct()
    edges = pairs.select(
        F.col("p").alias("src"), F.col("s").alias("dst")
    ).unionByName(pairs.select(F.col("s").alias("src"), F.col("p").alias("dst")))
    ranks = pagerank(edges, n_iter=_ITER, damping=0.85)
    return ranks.select("node", F.round("rank", 8).alias("rank"))
