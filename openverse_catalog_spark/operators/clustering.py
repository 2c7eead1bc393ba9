"""Distributed k-means clustering over embedding columns.

A training-data-pipeline operator beyond the reference's surface (the
reference has no vector operations at all — its nearest analog is the
per-provider percentile bucketing in
``catalog/dags/common/popularity/sql.py:214-229``): semantic bucketing
of a corpus by embedding, used for curation, diversity-aware sampling,
and domain discovery.

Spark-first design (Lloyd's algorithm):

- Centroids live on the DRIVER as plain Python lists (k x dim doubles —
  kilobytes) and enter the plan as array literals, so the assignment
  step is a pure whole-stage-codegen expression: no join, no UDF, no
  shuffle. This is the classic broadcast-parameter iteration pattern.
- The update step computes per-cluster per-dimension sums with ONE
  ``groupBy(cid)`` carrying ``dim`` column-sum aggregates: partial
  aggregation reduces every partition to at most k rows map-side, so
  the shuffle moves k x n_partitions tiny rows regardless of input
  size. No posexplode (which would shuffle rows x dim element rows).
- The projected (id, vector) frame is lazily ``localCheckpoint``-ed so
  the n_iter passes rescan executor-resident blocks instead of
  re-reading the source. At true 100 TB scale swap this for
  ``persist(StorageLevel.MEMORY_AND_DISK)`` on the projected frame —
  same plan shape, spillable storage.

Determinism contract (what the DuckDB oracle pins): initial centroids
are the k vectors with the lowest ids; distance is squared L2 folded in
index order; ties on distance pick the lowest centroid index; empty
clusters keep their previous centroid. Floating-point summation order
inside the per-cluster means differs across engines at ~1e-15 relative
error — assignments only flip if two centroids are equidistant to that
precision, which the value gate would surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def assign_clusters(vec: Column, centroids: list[list[float]]) -> Column:
    """0-based index of the nearest centroid (squared L2, index-order
    fold; first minimum — lowest centroid id — wins ties). Pure JVM
    expression over an array-of-arrays literal."""
    # ONE ArrayType(ArrayType(double)) literal node, not k*dim Literal
    # nodes — cuts Catalyst analysis/codegen from seconds to millis per
    # iteration (the fixed driver cost of the Lloyd loop).
    cents = F.lit([[float(v) for v in c] for c in centroids])
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 3,
    dim: int | None = None,
) -> DataFrame:
    """Lloyd's k-means: returns (id_col, cid) for every input row.

    Seeds = the k lowest-id vectors (deterministic, partition-layout
    independent). Each iteration is one assignment pass (expression
    only) + one k-row aggregate; the centroid table round-trips through
    the driver, which is the right topology — it is k x dim doubles.
    """
    if dim is None:
        head = df.select(F.col(vec_col)).first()
        if head is None:
            raise ValueError("kmeans: input has no rows (cannot infer dim)")
        dim = len(head[0])
    base = df.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    ).localCheckpoint(eager=False)

    seed_rows = base.orderBy(id_col).limit(k).collect()
    centroids = [list(r["__v"]) for r in seed_rows]
    # fewer rows than k: every row is its own (valid) cluster seed
    k = min(k, len(centroids))

    for _ in range(n_iter):
        assigned = base.withColumn("__cid", assign_clusters(F.col("__v"), centroids))
        stats = assigned.groupBy("__cid").agg(
            F.count("*").alias("__n"),
            *[
                F.sum(F.element_at("__v", i + 1)).alias(f"__s{i}")
                for i in range(dim)
            ],
        )
        new: dict[int, list[float]] = {}
        for r in stats.collect():
            new[r["__cid"]] = [r[f"__s{i}"] / r["__n"] for i in range(dim)]
        centroids = [new.get(c, centroids[c]) for c in range(k)]

    return base.select(
        id_col, assign_clusters(F.col("__v"), centroids).alias("cid")
    )
