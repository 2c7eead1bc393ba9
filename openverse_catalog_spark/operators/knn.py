"""Similarity search over embedding columns (array<float>).

Two paths:
  * ``cosine_topk``    — exact brute-force top-k neighbors. JVM-side
    higher-order functions (zip_with + aggregate) compute the dot
    product; no Python crosses the boundary. Quadratic — the baseline
    and the oracle-checkable path.
  * ``lsh_bucket_topk`` — the scale path: random-hyperplane LSH buckets
    (signs of dot products against deterministic md5-derived planes)
    restrict the pair space to same-bucket candidates; exact cosine is
    then computed within buckets only. Sub-quadratic; recall < 1 by
    construction (probe multiple hash tables to raise it).

At cluster scale the brute-force path should only ever run broadcast-side
(queries broadcast against a partitioned corpus); ``cosine_topk`` does
exactly that when ``queries`` is small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """JVM-side dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query against the corpus.

    Plan: broadcast the (small) query side → BroadcastNestedLoopJoin over
    the partitioned corpus → per-query rank window. The corpus is never
    shuffled; the only shuffle is the final per-query top-k (tiny).
    Returns (query_id, neighbor_id, cosine, rank).
    """
    corpus = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    q = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    if broadcast_queries:
        q = F.broadcast(q)
    pairs = corpus.crossJoin(q).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_expr(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def random_planes(dim: int, n_planes: int, seed: str = "plane") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — reproducible
    across engines and runs (no RNG state)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        vec = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()
            # map 8 hex digits to [-1, 1)
            vec.append(int(h[:8], 16) / 2**31 - 1.0)
        planes.append(vec)
    return planes


def lsh_bucket_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Approximate all-pairs top-k: L independent hash tables of m
    hyperplane-sign bits; candidates = pairs sharing any table's bucket;
    exact cosine on the (deduped) candidate set only.

    Single-table sign-LSH recall is (1 - theta/pi)^m per neighbor, which
    is poor for the moderate-angle nearest neighbors of real embedding
    corpora — multiple tables union their candidates: recall
    1-(1-r)^L. Cost stays sub-quadratic: one explode (L rows per vector)
    + one equi-join shuffle on (table, bucket)."""
    corpus = _as_double(corpus, vec_col)
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    table_sigs = []
    for t in range(n_tables):
        planes = random_planes(dim, n_planes, seed=f"plane{t}")
        sig = None
        for p, plane in enumerate(planes):
            d = dot_expr(F.col(vec_col), F.array(*[F.lit(x) for x in plane]))
            bit = F.when(d >= 0, F.lit(2**p)).otherwise(F.lit(0))
            sig = bit if sig is None else sig + bit
        table_sigs.append(
            F.struct(F.lit(t).alias("tbl"), sig.cast("long").alias("bucket"))
        )
    exploded = corpus.select(
        F.col(id_col), F.col(vec_col), F.explode(F.array(*table_sigs)).alias("tb")
    ).select(id_col, vec_col, F.col("tb.tbl").alias("__tbl"), F.col("tb.bucket").alias("__bucket"))
    a = exploded.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"), "__tbl", "__bucket"
    )
    b = exploded.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "__tbl", "__bucket"
    )
    cand = (
        a.join(b, ["__tbl", "__bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qv", "__cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", cosine_expr(F.col("__qv"), F.col("__cv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_near_dup_pairs_exact(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (cosine >= threshold,
    id_a < id_b). O(n^2) by construction — the correctness baseline the
    approximate paths (``embedding_near_dup_pairs``, ``lsh_bucket_topk``)
    are measured against.

    Plan shape: norms are precomputed once per side (no repeated
    aggregate under the filter); the pair space is a range-partitioned
    self cross-join, all JVM-side (zip_with/aggregate), so each of the
    n^2/2 candidate dots stays inside whole-stage codegen. At cluster
    scale run this only within LSH/IVF buckets — standalone it exists to
    pin semantics and measure recall.
    """
    base = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        norm_expr(F.col(vec_col)).alias("__n"),
    )
    a = base.select(
        F.col("__id").alias("id_a"), F.col("__v").alias("__va"), F.col("__n").alias("__na")
    )
    b = base.select(
        F.col("__id").alias("id_b"), F.col("__v").alias("__vb"), F.col("__n").alias("__nb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (dot_expr(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))).alias(
                "cosine"
            ),
        )
        .filter(F.round(F.col("cosine"), 6) >= threshold)
    )


def ivf_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    centroid_mod: int = 40,
    query_mod: int = 20,
    nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN: a deterministic centroid subset
    (``id % centroid_mod = 0``) partitions the corpus into inverted
    lists (each vector assigned to its nearest centroid by cosine);
    each query probes its ``nprobe`` nearest centroids and ranks exact
    cosine only within those lists.

    Every step is deterministic (ties broken by centroid id / neighbor
    id), so unlike random-projection LSH this ANN path is fully
    oracle-checkable. Cost: n*C assignment dots (centroids broadcast —
    the corpus never shuffles for assignment) + |q|*C probe dots +
    candidate dots ~ n*nprobe/C per query. At cluster scale the
    assignment is the partitioning: lists co-locate, and the candidate
    join is an equi-join on centroid_id instead of a cross join.
    """
    base = _as_double(corpus, vec_col)
    cents = F.broadcast(
        base.filter(F.col(id_col) % centroid_mod == 0).select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("__cv")
        )
    )
    # inverted lists: nearest centroid per corpus vector
    ac = (
        base.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv"))
        .join(cents, how="cross")
        .select(
            "neighbor_id",
            "centroid_id",
            "__nv",
            cosine_expr(F.col("__nv"), F.col("__cv")).alias("__c"),
        )
    )
    w_assign = Window.partitionBy("neighbor_id").orderBy(
        F.col("__c").desc(), F.col("centroid_id")
    )
    assign = (
        ac.withColumn("__r", F.row_number().over(w_assign))
        .filter(F.col("__r") == 1)
        .select("neighbor_id", "centroid_id", "__nv")
    )
    # probe lists: nprobe nearest centroids per query
    pc = (
        base.filter(F.col(id_col) % query_mod == 0)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
        .join(cents, how="cross")
        .select(
            "query_id",
            "centroid_id",
            "__qv",
            cosine_expr(F.col("__qv"), F.col("__cv")).alias("__c"),
        )
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.col("__c").desc(), F.col("centroid_id"))
    probe = (
        pc.withColumn("__r", F.row_number().over(w_probe))
        .filter(F.col("__r") <= nprobe)
        .select("query_id", "centroid_id", "__qv")
    )
    # exact rank within probed lists only (equi-join on centroid_id —
    # each neighbor lives in exactly one list, so no pair dedup needed)
    cand = probe.join(assign, "centroid_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.select(
        "query_id", "neighbor_id", cosine_expr(F.col("__qv"), F.col("__nv")).alias("cosine")
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(wk)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 4,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold, bucketed by
    LSH signature so near-identical vectors (which agree on all plane
    signs with overwhelming probability) meet in a bucket."""
    topk = lsh_bucket_topk(corpus, id_col, vec_col, k=50, n_planes=n_planes)  # noqa: E501
    return (
        topk.filter((F.col("cosine") >= threshold) & (F.col("query_id") < F.col("neighbor_id")))
        .select(
            F.col("query_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            "cosine",
        )
    )
