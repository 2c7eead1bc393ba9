"""PageRank invariants: probability-mass conservation, hub dominance,
and partition independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openverse_catalog_spark.operators.graph import pagerank


def _star_edges(spark):
    # hub 0 <-> spokes 1..6, both directions (operator contract)
    pairs = [(0, i) for i in range(1, 7)]
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src long, dst long")


def test_mass_conserved_and_hub_dominates(spark):
    ranks = {r.node: r.rank for r in pagerank(_star_edges(spark), 10).collect()}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    assert all(v > 0 for v in ranks.values())
    assert ranks[0] > 3 * max(ranks[i] for i in range(1, 7))
    # spokes are symmetric -> identical ranks
    spoke = {round(ranks[i], 12) for i in range(1, 7)}
    assert len(spoke) == 1


def test_uniform_cycle_stays_uniform(spark):
    n = 5
    rows = [(i, (i + 1) % n) for i in range(n)] + [((i + 1) % n, i) for i in range(n)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    ranks = [r.rank for r in pagerank(edges, 5).collect()]
    assert all(r == pytest.approx(1 / n, abs=1e-12) for r in ranks)


def test_partition_independent(spark):
    e = _star_edges(spark)
    a = {r.node: round(r.rank, 12) for r in pagerank(e, 4).collect()}
    b = {r.node: round(r.rank, 12) for r in pagerank(e.repartition(7), 4).collect()}
    assert a == b
