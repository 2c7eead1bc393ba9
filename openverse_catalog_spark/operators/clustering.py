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


def lloyd_rounds(
    base: DataFrame,
    centroids: list[list[float]],
    n_iter: int,
    dim: int,
) -> list[list[float]]:
    """``n_iter`` Lloyd rounds over a frame carrying the vector as
    ``__v`` (array<double>), seeded from the given centroid list —
    returns the final centroids. Each round is one assignment pass
    (pure expression: :func:`assign_clusters`) + one groupBy whose
    map-side partials reduce every partition to <= k rows before the
    shuffle; the k x dim centroid state round-trips through the driver
    (kilobytes). Empty clusters keep their previous centroid — the
    determinism contract the DuckDB oracle CTE chain replays exactly."""
    k = len(centroids)
    for _ in range(n_iter):
        assigned = base.withColumn(
            "__cid", assign_clusters(F.col("__v"), centroids)
        )
        # means ROUND to 9 decimals (Spark HALF_UP == the oracle's
        # round-half-away) before feeding the next round: float sums
        # accumulate in partition order, so unrounded means differ in
        # the last ulps between partitionings AND between engines —
        # enough to flip a near-equidistant point's argmin and break
        # the oracle replay. 1e-9 is far above the ~1e-15 accumulation
        # noise and far below any meaningful centroid distinction.
        stats = assigned.groupBy("__cid").agg(
            F.count("*").alias("__n"),
            *[
                F.sum(F.element_at("__v", i + 1)).alias(f"__s{i}")
                for i in range(dim)
            ],
        ).select(
            "__cid",
            *[
                F.round(F.col(f"__s{i}") / F.col("__n"), 9)
                .alias(f"__m{i}")
                for i in range(dim)
            ],
        )
        new: dict[int, list[float]] = {}
        for r in stats.collect():
            new[r["__cid"]] = [r[f"__m{i}"] for i in range(dim)]
        centroids = [new.get(c, centroids[c]) for c in range(k)]
    return centroids


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

    centroids = lloyd_rounds(base, centroids, n_iter, dim)

    return base.select(
        id_col, assign_clusters(F.col("__v"), centroids).alias("cid")
    )


def pca_power_top_component(
    df,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    rounds: int = 3,
):
    """Top principal component of the (mean-centered) embedding matrix
    via POWER ITERATION — distributed PCA without ever materializing
    the covariance matrix: each round is

        s_i = (x_i - mu) . v          (one narrow select: an array
                                       zip_with/aggregate fold against
                                       the v literal — no UDF)
        w   = sum_i (x_i - mu) * s_i  (ONE aggregation with dim+1
                                       map-side partial sums)
        v   = w / ||w||               (driver: dim doubles)

    so the corpus is scanned once per round and only dim-sized state
    ever moves — the same driver-literal iteration discipline as
    k-means (centroids) and BPE (merge table). Centering never
    materializes x - mu: s uses dot(x, v) - dot(mu, v), w uses
    sum(x*s) - mu*sum(s), both driver-side rearrangements.

    Deterministic: v0 = uniform unit vector, every step is a pure
    function of the data. Returns (component, eigenvalue_estimate)
    where component is a list of dim loadings."""
    import math

    from pyspark.sql import functions as F

    base = df.select(
        F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    mu_row = base.agg(
        *[
            F.avg(F.element_at(F.col(vec_col), j + 1)).alias(f"m{j}")
            for j in range(dim)
        ]
    ).head()
    mu = [float(mu_row[f"m{j}"]) for j in range(dim)]
    v = [1.0 / math.sqrt(dim)] * dim
    nrm = 0.0
    n_rows = None
    for _ in range(rounds):
        c0 = sum(m * b for m, b in zip(mu, v))
        v_lit = "array({})".format(
            ", ".join(f"{b!r}D" for b in v)
        )
        s_expr = F.expr(
            f"aggregate(zip_with({vec_col}, {v_lit}, (a, b) -> a * b), "
            "0D, (acc, x) -> acc + x)"
        ) - F.lit(c0)
        tmp = base.select(F.col(vec_col), s_expr.alias("__s"))
        aggs = [
            F.sum("__s").alias("s_sum"),
            F.count(F.lit(1)).alias("n"),
        ] + [
            F.sum(
                F.element_at(F.col(vec_col), j + 1) * F.col("__s")
            ).alias(f"w{j}")
            for j in range(dim)
        ]
        row = tmp.agg(*aggs).head()
        s_sum, n_rows = float(row["s_sum"]), int(row["n"])
        w = [float(row[f"w{j}"]) - mu[j] * s_sum for j in range(dim)]
        nrm = math.sqrt(sum(x * x for x in w))
        v = [x / nrm for x in w]
    # after convergence, ||w|| = lambda * ||v_prev|| with unit v_prev:
    # the dominant eigenvalue of the scatter matrix; /n for covariance
    eigenvalue = nrm / n_rows if n_rows else 0.0
    return v, eigenvalue
