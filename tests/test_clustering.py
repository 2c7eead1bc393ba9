"""k-means + fuzzy (Levenshtein) pair operator invariants."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from openverse_catalog_spark.operators.clustering import assign_clusters, kmeans
from openverse_catalog_spark.operators.dedupe import fuzzy_pairs


@pytest.fixture(scope="module")
def clustered(spark):
    # three well-separated 4-d blobs, 20 points each, ids interleaved so
    # the k lowest ids span all three blobs (seeds are not degenerate)
    rows = []
    centers = [(0.0, 0.0, 0.0, 0.0), (10.0, 10.0, 0.0, 0.0), (0.0, 10.0, 10.0, 5.0)]
    for i in range(60):
        c = centers[i % 3]
        jitter = ((i * 37) % 10) / 20.0  # deterministic, max 0.45
        rows.append((i, [v + jitter for v in c]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_recovers_separated_blobs(clustered):
    got = kmeans(clustered, "embedding", "vec_id", k=3, n_iter=4, dim=4)
    out = {r["vec_id"]: r["cid"] for r in got.collect()}
    assert len(out) == 60
    # every point in the same blob lands in the same cluster
    for blob in range(3):
        cids = {out[i] for i in range(60) if i % 3 == blob}
        assert len(cids) == 1, f"blob {blob} split across {cids}"
    # and the three blobs land in three distinct clusters
    assert len({out[0], out[1], out[2]}) == 3


def test_kmeans_partition_layout_independent(clustered):
    a = kmeans(clustered, "embedding", "vec_id", k=3, n_iter=3, dim=4)
    b = kmeans(
        clustered.repartition(7, "vec_id"), "embedding", "vec_id", k=3, n_iter=3, dim=4
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_assign_clusters_tie_breaks_lowest_index(spark):
    df = spark.createDataFrame([([1.0, 1.0],)], "v array<double>")
    # two identical centroids: first (lowest cid) must win
    cid = df.select(
        assign_clusters(F.col("v"), [[0.0, 0.0], [0.0, 0.0], [1.0, 1.0]]).alias("c")
    ).first()["c"]
    assert cid == 2  # exact match beats ties elsewhere
    cid = df.select(
        assign_clusters(F.col("v"), [[0.0, 0.0], [0.0, 0.0]]).alias("c")
    ).first()["c"]
    assert cid == 0


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # k=3 over two tight blobs: one seed centroid ends up empty after
    # the first assignment; the loop must not crash and must still
    # assign every point
    rows = [(i, [0.0 + i * 0.01, 0.0]) for i in range(5)]
    rows += [(10 + i, [100.0 + i * 0.01, 0.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = kmeans(df, "embedding", "vec_id", k=3, n_iter=3, dim=2)
    assert got.count() == 10
    assert got.select("cid").distinct().count() <= 3


def _brute_pairs(rows, max_dist):
    import itertools

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
        return d[n]

    out = set()
    for (ia, ba, ta), (ib, bb, tb) in itertools.combinations(rows, 2):
        if ba == bb and lev(ta, tb) <= max_dist:
            out.add((min(ia, ib), max(ia, ib), lev(ta, tb)))
    return out


def test_fuzzy_pairs_matches_bruteforce(spark):
    rows = [
        (1, "x", "kitten in the yard"),
        (2, "x", "sitten in the yard"),  # dist 1 to id 1
        (3, "x", "mitten on the yard"),  # dist 2 to id 1
        (4, "y", "kitten in the yard"),  # other block: never paired with 1
        (5, "x", "completely different"),
        (6, "x", "kitten in the yards"),  # dist 1 to id 1
    ]
    df = spark.createDataFrame(rows, "id long, blk string, t string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs(df, "id", "t", [F.col("blk")], 2).collect()
    }
    assert got == _brute_pairs(rows, 2)
    assert all(a < b for a, b, _ in got)


def test_fuzzy_pairs_threshold_excludes(spark):
    df = spark.createDataFrame(
        [(1, "b", "aaaa"), (2, "b", "zzzz")], "id long, blk string, t string"
    )
    assert fuzzy_pairs(df, "id", "t", [F.col("blk")], 3).count() == 0


def test_pca_power_matches_numpy(spark):
    """On data with a DOMINANT direction, a few power-iteration rounds
    align with numpy's exact top eigenvector (up to sign) and the
    eigenvalue estimate lands on the true one. (The corpus embeddings
    are near-isotropic — eigengap ~0.93 — so the oracle query checks
    round-for-round math there instead of convergence.)"""
    import numpy as np

    from openverse_catalog_spark.operators.clustering import (
        pca_power_top_component,
    )

    rng = np.random.RandomState(3)
    u = rng.randn(16)
    u /= np.linalg.norm(u)
    X = np.outer(rng.randn(400) * 5.0, u) + rng.randn(400, 16)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    v, lam = pca_power_top_component(df, "vec_id", "embedding", 16, rounds=5)
    v = np.array(v)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    Xc = X - X.mean(axis=0)
    vals, vecs = np.linalg.eigh(Xc.T @ Xc / len(X))
    assert abs(abs(float(v @ vecs[:, -1])) - 1.0) < 1e-4
    assert abs(lam - vals[-1]) / vals[-1] < 1e-3


# --- logistic regression trainer -------------------------------------------


def test_logreg_learns_separable_labels(spark):
    """On a linearly separable 1-D problem, GD must cut log-loss each
    round and the fitted model must classify every point correctly."""
    import math

    from openverse_catalog_spark.operators.classifier import (
        logreg_score,
        logreg_train,
    )

    rows = [(float(i), 1.0 if i >= 0 else 0.0)
            for i in range(-20, 21) if i != 0]
    df = spark.createDataFrame(rows, "x double, y double")

    def loss(w):
        tot = 0.0
        for x, y in rows:
            p = 1.0 / (1.0 + math.exp(-(x * w[0] + w[1])))
            p = min(max(p, 1e-12), 1.0 - 1e-12)
            tot -= y * math.log(p) + (1 - y) * math.log(1 - p)
        return tot / len(rows)

    w1 = logreg_train(df, ["x"], "y", rounds=1, lr=0.5)
    w5 = logreg_train(df, ["x"], "y", rounds=5, lr=0.5)
    assert loss(w5) < loss(w1) < loss([0.0, 0.0])

    scored = logreg_score(df, ["x"], w5).collect()
    assert all((r["prob"] >= 0.5) == (r["x"] >= 0) for r in scored)


def test_logreg_validation_errors(spark):
    from openverse_catalog_spark.operators.classifier import (
        logreg_score,
        logreg_train,
    )

    df = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
    with pytest.raises(ValueError, match="no rows"):
        logreg_train(df.filter("x > 9"), ["x"], "y")
    with pytest.raises(ValueError, match="weights"):
        logreg_score(df, ["x"], [0.1, 0.2, 0.3]).collect()
