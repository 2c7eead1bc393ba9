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
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


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


#: Hard ceiling on the query rows ``cosine_topk`` will collect to the
#: driver for broadcast. 64 KiB rows x 64 dims x 8 B = 32 MiB matrix —
#: comfortably broadcastable; anything bigger must use the partitioned
#: exact path (``cosine_near_dup_pairs_blocked`` shape) or IVF/LSH.
MAX_BROADCAST_QUERIES = 65536


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    broadcast_queries: bool = True,
    max_queries: int = MAX_BROADCAST_QUERIES,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query against the corpus.

    Plan: the (small) query side is broadcast as a normalized float64
    matrix; each Arrow batch of the partitioned corpus is scored with one
    numpy GEMM and reduced to a per-batch partial top-k inside
    ``mapInPandas``. The corpus never shuffles — the only shuffle is the
    final per-query rank over batches*k candidate rows.
    Returns (query_id, neighbor_id, cosine, rank). ``broadcast_queries``
    is kept for API compatibility (the query side is always broadcast).

    The driver-side collect of the query matrix is BOUNDED: more than
    ``max_queries`` rows raises instead of silently materializing an
    unbounded matrix on the driver (the 100 TB failure mode). Large
    query sets belong on the IVF path (``ivf_topk``) or a block-pair
    exact pass (``cosine_near_dup_pairs_blocked`` shape).
    """
    spark = corpus.sparkSession
    base = _as_double(corpus, vec_col)
    q_pdf = (
        _as_double(queries, vec_col)
        .select(id_col, vec_col)
        .limit(max_queries + 1)
        .toPandas()
    )
    if len(q_pdf) > max_queries:
        raise ValueError(
            f"cosine_topk query side exceeds max_queries={max_queries}; "
            "use ivf_topk / lsh_bucket_topk or a partitioned exact pass"
        )
    q_ids, q_mat = _stack_normalized(q_pdf, id_col, vec_col)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def gen(batches):
        import numpy as np
        import pandas as pd

        bq_ids, bq_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids, c_mat = _stack_normalized(pdf, id_col, vec_col)
            scores = bq_mat @ c_mat.T  # (n_queries, batch)
            # partial top-(k+1) per query within this batch (+1 covers a
            # possible self-pair, dropped below) — the rank shuffle then
            # carries batches*k rows per query instead of the whole corpus
            kk = min(k + 1, scores.shape[1])
            top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            qi = np.repeat(np.arange(len(bq_ids)), kk)
            cj = top.reshape(-1)
            keep = bq_ids[qi] != c_ids[cj]
            yield pd.DataFrame(
                {
                    "query_id": bq_ids[qi][keep],
                    "neighbor_id": c_ids[cj][keep],
                    "cosine": scores[qi, cj][keep],
                }
            )

    scored = base.select(id_col, vec_col).mapInPandas(
        gen, "query_id long, neighbor_id long, cosine double"
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


def _sign_bucket_stage(
    base: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int,
    n_tables: int,
    dim: int,
) -> DataFrame:
    """(id, vec) -> (id, vec, __tbl, __bucket), one row per hash table.

    All n_tables*n_planes hyperplanes form one matrix, so the signatures
    for every table come from a single (batch x dim) @ (dim x T*P) GEMM
    per Arrow batch instead of T*P interpreted per-row dot expressions.
    """
    import numpy as np

    plane_mat = np.concatenate(
        [random_planes(dim, n_planes, seed=f"plane{t}") for t in range(n_tables)]
    )  # (n_tables*n_planes, dim)
    pow2 = np.array([2**p for p in range(n_planes)], dtype="int64")

    def sign_buckets(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            bits = (mat @ plane_mat.T >= 0).reshape(len(pdf), n_tables, n_planes)
            buckets = (bits * pow2[None, None, :]).sum(axis=2)  # (n, n_tables)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype="int64").repeat(n_tables),
                    vec_col: pdf[vec_col].to_numpy().repeat(n_tables),
                    "__tbl": np.tile(np.arange(n_tables, dtype="int64"), len(pdf)),
                    "__bucket": buckets.reshape(-1),
                }
            )

    return base.select(id_col, vec_col).mapInPandas(
        sign_buckets,
        f"{id_col} long, {vec_col} array<double>, __tbl long, __bucket long",
    )


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
    exact cosine within buckets only, via one local numpy GEMM per bucket
    (``applyInPandas``).

    Single-table sign-LSH recall is (1 - theta/pi)^m per neighbor, which
    is poor for the moderate-angle nearest neighbors of real embedding
    corpora — multiple tables union their candidates: recall
    1-(1-r)^L. Cost stays sub-quadratic: the only shuffles are the
    (table, bucket) grouping, the cross-table pair distinct, and the
    final per-query top-k."""
    base = _as_double(corpus, vec_col)
    if dim is None:
        head = base.select(vec_col).first()
        if head is None:
            raise ValueError("empty corpus: cannot infer embedding dim")
        dim = len(head[0])
    exploded = _sign_bucket_stage(base, id_col, vec_col, n_planes, n_tables, dim)

    def per_bucket(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame(
                {
                    "query_id": np.array([], dtype="int64"),
                    "neighbor_id": np.array([], dtype="int64"),
                    "cosine": np.array([], dtype="float64"),
                }
            )
        ids, mat = _stack_normalized(pdf, id_col, vec_col)
        scores = mat @ mat.T
        i, j = np.nonzero(ids[:, None] != ids[None, :])
        return pd.DataFrame(
            {"query_id": ids[i], "neighbor_id": ids[j], "cosine": scores[i, j]}
        )

    scored = (
        exploded.groupBy("__tbl", "__bucket")
        .applyInPandas(per_bucket, "query_id long, neighbor_id long, cosine double")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _stack_normalized(pdf, id_col: str, vec_col: str):
    import numpy as np

    ids = pdf[id_col].to_numpy(dtype="int64")
    mat = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0] = 1.0
    return ids, mat / norms[:, None]


def quantize_int8(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/transfer
    scale path for embedding columns (a 4x shrink before ANN probing;
    the full-precision vector is only re-read for final re-ranking).

    Per vector: ``scale = max(|x|)``, ``q_i = floor(x_i/scale*127 + 0.5)``
    (explicit half-up so every engine agrees bit-for-bit; banker's
    rounding would diverge between numpy and SQL engines). Emits the
    quantized checksum and reconstruction RMSE so the quality loss is
    observable per row.

    Embarrassingly parallel — no shuffle, one Arrow-batched numpy pass."""
    base = _as_double(corpus, vec_col)

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype="int64")
            mat = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            scale = np.abs(mat).max(axis=1)
            safe = np.where(scale == 0, 1.0, scale)
            q = np.floor(mat / safe[:, None] * 127.0 + 0.5)
            q[scale == 0] = 0.0
            recon = q * safe[:, None] / 127.0
            recon[scale == 0] = 0.0
            rmse = np.sqrt(((mat - recon) ** 2).mean(axis=1))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "scale": scale,
                    "q_sum": q.sum(axis=1).astype("int64"),
                    "rmse": rmse,
                }
            )

    return base.select(id_col, vec_col).mapInPandas(
        gen, f"{id_col} long, scale double, q_sum long, rmse double"
    )


def cosine_near_dup_pairs_exact(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_rows: int = MAX_BROADCAST_QUERIES,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (cosine >= threshold,
    id_a < id_b). O(n^2) by construction — the small-input correctness
    baseline the approximate paths (``embedding_near_dup_pairs``,
    ``lsh_bucket_topk``) are measured against, and the per-bucket kernel
    those paths run. For a full corpus use
    ``cosine_near_dup_pairs_blocked`` (same results, no broadcast).

    Dense pairwise scoring is linear algebra, not per-row expression
    work: interpreted zip_with/aggregate dots cost ~10us/pair, while a
    BLAS GEMM does the same in ~1ns/pair. So one side is broadcast as a
    normalized float64 matrix and each Arrow batch of the other side is
    scored with a single ``Q @ M.T`` inside ``mapInPandas`` — the corpus
    side streams through executors in parallel and never shuffles. The
    broadcast bounds corpus size; at cluster scale run this within
    LSH/IVF buckets (``embedding_near_dup_pairs``) where each block
    fits.
    """
    spark = corpus.sparkSession
    base = _as_double(corpus, vec_col)
    # BOUNDED driver collect, same contract as cosine_topk: the whole
    # corpus is broadcast here, so refuse anything past max_rows instead
    # of silently materializing an unbounded matrix on the driver.
    pdf = base.select(id_col, vec_col).limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"cosine_near_dup_pairs_exact corpus exceeds max_rows={max_rows}; "
            "use cosine_near_dup_pairs_blocked (same results, no broadcast) "
            "or the LSH/IVF approximate paths"
        )
    ids, mat = _stack_normalized(pdf, id_col, vec_col)
    bc = spark.sparkContext.broadcast((ids, mat))

    def gen(batches):
        import numpy as np
        import pandas as pd

        b_ids, b_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_ids, q_mat = _stack_normalized(pdf, id_col, vec_col)
            scores = q_mat @ b_mat.T
            qi, cj = np.nonzero(
                (np.round(scores, 6) >= threshold) & (q_ids[:, None] < b_ids[None, :])
            )
            yield pd.DataFrame(
                {"id_a": q_ids[qi], "id_b": b_ids[cj], "cosine": scores[qi, cj]}
            )

    return base.select(id_col, vec_col).mapInPandas(
        gen, "id_a long, id_b long, cosine double"
    )


def cosine_near_dup_pairs_blocked(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_blocks: int = 8,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (cosine >= threshold,
    id_a < id_b) WITHOUT a driver collect or full-corpus broadcast — the
    distributed form of ``cosine_near_dup_pairs_exact``, same results.

    With ``group_cols``, pairs form only WITHIN each group (the group
    keys join the triangle-block grouping keys and prefix the output):
    the semantic-blocking form — e.g. k-means cluster ids — where each
    group's pair space is quadratic in the GROUP, not the corpus, and
    the triangle blocks bound per-task memory inside large groups.

    Triangle blocking: hash every vector into one of ``n_blocks`` blocks,
    replicate it into each of the ``n_blocks`` unordered block pairs that
    contain its block (explode — n_blocks rows per vector), and score
    each block-pair group with one local GEMM in ``applyInPandas``
    (self-block groups take the upper triangle; cross-block groups score
    A x B once). Every pair of vectors lands in exactly one group, so the
    union of group outputs is the exact pair set with no dedup pass.

    The O(n²) FLOPs are inherent to exact all-pairs, but memory per task
    is 2n/n_blocks vectors and the work spreads over n_blocks*(n_blocks+1)/2
    independent groups — pick n_blocks ~ sqrt(cluster cores) so each
    group's matrix fits executor memory. Replication factor is n_blocks
    (rows shuffled = n * n_blocks), the standard all-pairs tradeoff.
    """
    base = _as_double(corpus, vec_col)
    groups = list(group_cols or [])
    pair_arr = F.array(
        *[
            F.struct(
                F.least(F.col("__b"), F.lit(j)).alias("i"),
                F.greatest(F.col("__b"), F.lit(j)).alias("j"),
            )
            for j in range(n_blocks)
        ]
    )
    exploded = (
        base.select(
            *groups,
            F.col(id_col),
            F.col(vec_col),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("__b"),
        )
        .select(*groups, id_col, vec_col, "__b", F.explode(pair_arr).alias("__p"))
        .select(
            *groups,
            id_col,
            vec_col,
            "__b",
            F.col("__p.i").alias("__pi"),
            F.col("__p.j").alias("__pj"),
        )
    )

    def per_pair(pdf):
        import numpy as np
        import pandas as pd

        def out(id_a, id_b, cosine):
            res = pd.DataFrame({"id_a": id_a, "id_b": id_b, "cosine": cosine})
            for g in reversed(groups):
                res.insert(0, g, pdf[g].iloc[0] if len(pdf) else None)
            return res

        empty = out(
            np.array([], dtype="int64"),
            np.array([], dtype="int64"),
            np.array([], dtype="float64"),
        )
        if len(pdf) < 2:
            return empty
        pi, pj = int(pdf["__pi"].iloc[0]), int(pdf["__pj"].iloc[0])
        if pi == pj:
            ids, mat = _stack_normalized(pdf, id_col, vec_col)
            scores = mat @ mat.T
            i, j = np.nonzero(
                (np.round(scores, 6) >= threshold) & (ids[:, None] < ids[None, :])
            )
            return out(ids[i], ids[j], scores[i, j])
        left = pdf[pdf["__b"] == pi]
        right = pdf[pdf["__b"] == pj]
        if len(left) == 0 or len(right) == 0:
            return empty
        l_ids, l_mat = _stack_normalized(left, id_col, vec_col)
        r_ids, r_mat = _stack_normalized(right, id_col, vec_col)
        scores = l_mat @ r_mat.T
        i, j = np.nonzero(np.round(scores, 6) >= threshold)
        a, b = l_ids[i], r_ids[j]
        return out(np.minimum(a, b), np.maximum(a, b), scores[i, j])

    out_schema = StructType(
        [exploded.schema[g] for g in groups]
        + [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )
    return exploded.groupBy(*groups, "__pi", "__pj").applyInPandas(
        per_pair, out_schema
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
    spark = corpus.sparkSession
    base = _as_double(corpus, vec_col)
    # centroids sorted by id so numpy first-max/stable-sort tie-breaks
    # reproduce the oracle's ORDER BY cosine DESC, centroid_id
    cent_pdf = (
        base.filter(F.col(id_col) % centroid_mod == 0)
        .select(id_col, vec_col)
        .limit(MAX_BROADCAST_QUERIES + 1)
        .toPandas()
        .sort_values(id_col)
    )
    if len(cent_pdf) > MAX_BROADCAST_QUERIES:
        raise ValueError(
            f"ivf_topk centroid count exceeds {MAX_BROADCAST_QUERIES}; "
            "raise centroid_mod (C should grow ~sqrt(n), not n)"
        )
    c_ids, c_mat = _stack_normalized(cent_pdf, id_col, vec_col)
    bc = spark.sparkContext.broadcast((c_ids, c_mat))

    # inverted lists: nearest centroid per corpus vector — one GEMM per
    # Arrow batch against the broadcast centroid matrix, no shuffle
    def assign_gen(batches):
        import numpy as np
        import pandas as pd

        b_ids, b_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, mat = _stack_normalized(pdf, id_col, vec_col)
            best = (mat @ b_mat.T).argmax(axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": ids,
                    "centroid_id": b_ids[best],
                    "__nv": pdf[vec_col].to_numpy(),
                }
            )

    assign = base.select(id_col, vec_col).mapInPandas(
        assign_gen, "neighbor_id long, centroid_id long, __nv array<double>"
    )

    # probe lists: nprobe nearest centroids per query — same GEMM shape
    def probe_gen(batches):
        import numpy as np
        import pandas as pd

        b_ids, b_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, mat = _stack_normalized(pdf, id_col, vec_col)
            order = np.argsort(-(mat @ b_mat.T), axis=1, kind="stable")[:, :nprobe]
            reps = order.shape[1]
            yield pd.DataFrame(
                {
                    "query_id": ids.repeat(reps),
                    "centroid_id": b_ids[order.reshape(-1)],
                    "__qv": pdf[vec_col].to_numpy().repeat(reps),
                }
            )

    probe = (
        base.filter(F.col(id_col) % query_mod == 0)
        .select(id_col, vec_col)
        .mapInPandas(probe_gen, "query_id long, centroid_id long, __qv array<double>")
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
    n_tables: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold — the scale
    path. Sign-LSH bucketing (near-identical vectors agree on all plane
    signs with overwhelming probability) shrinks the pair space to
    same-bucket candidates; each bucket is then scored with one local
    numpy GEMM via ``applyInPandas``, so the quadratic work is per-bucket
    (bounded) and the only shuffles are the bucket grouping and the final
    pair distinct. Recall is pinned against
    ``cosine_near_dup_pairs_exact`` in tests.
    """
    base = _as_double(corpus, vec_col)
    if dim is None:
        head = base.select(vec_col).first()
        if head is None:
            raise ValueError("empty corpus: cannot infer embedding dim")
        dim = len(head[0])
    exploded = _sign_bucket_stage(base, id_col, vec_col, n_planes, n_tables, dim)

    def per_bucket(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame(
                {
                    "id_a": np.array([], dtype="int64"),
                    "id_b": np.array([], dtype="int64"),
                    "cosine": np.array([], dtype="float64"),
                }
            )
        ids, mat = _stack_normalized(pdf, id_col, vec_col)
        scores = mat @ mat.T
        i, j = np.nonzero(
            (np.round(scores, 6) >= threshold) & (ids[:, None] < ids[None, :])
        )
        return pd.DataFrame({"id_a": ids[i], "id_b": ids[j], "cosine": scores[i, j]})

    pairs = exploded.groupBy("__tbl", "__bucket").applyInPandas(
        per_bucket, "id_a long, id_b long, cosine double"
    )
    return pairs.dropDuplicates(["id_a", "id_b"])


def mmr_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    vec_col: str = "embedding",
    rel_col: str = "cosine",
    lam: float = 0.7,
    k: int = 3,
) -> DataFrame:
    """Maximal-Marginal-Relevance re-ranking of retrieval candidates:
    greedily pick k items maximizing ``lam*relevance - (1-lam)*max
    similarity to already-picked`` — the standard diversity pass between
    ANN retrieval and downstream use (dedupe-at-retrieval-time).

    The candidate set per query is tiny (top-N from ``cosine_topk``), so
    the greedy loop runs inside ``applyInPandas`` per query group: state
    is an N x N sim matrix per group, never the corpus. The only shuffle
    is the groupBy on query_id over candidate rows (queries x N rows
    total). Ties break on ascending id, making the greedy argmax — and
    therefore the whole operator — deterministic and oracle-checkable
    despite being iterative."""
    import numpy as np

    cand = candidates.join(
        corpus.select(F.col(id_col), F.col(vec_col)), id_col
    ).select(query_col, id_col, rel_col, vec_col)

    def pick(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        vecs = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
        nrm = np.linalg.norm(vecs, axis=1)
        nrm[nrm == 0] = 1.0
        vecs = vecs / nrm[:, None]
        sims = vecs @ vecs.T
        rel = pdf[rel_col].to_numpy(dtype="float64")
        n = len(pdf)
        chosen: list[int] = []
        scores: list[float] = []
        avail = np.ones(n, dtype=bool)
        for _ in range(min(k, n)):
            if chosen:
                penalty = sims[:, chosen].max(axis=1)
            else:
                penalty = np.zeros(n)
            mmr = lam * rel - (1 - lam) * penalty
            mmr_masked = np.where(avail, mmr, -np.inf)
            best = int(np.argmax(mmr_masked))  # ties -> lowest index = lowest id
            chosen.append(best)
            scores.append(float(mmr[best]))
            avail[best] = False
        return pd.DataFrame(
            {
                query_col: pdf[query_col].iloc[chosen].to_numpy(),
                id_col: pdf[id_col].iloc[chosen].to_numpy(),
                "mmr_rank": np.arange(1, len(chosen) + 1, dtype="int32"),
                "score": np.array(scores),
            }
        )

    schema = f"{query_col} long, {id_col} long, mmr_rank int, score double"
    return cand.groupBy(query_col).applyInPandas(pick, schema)


def random_project(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 8,
    seed: str = "rp",
) -> DataFrame:
    """Johnson-Lindenstrauss-style random projection to ``out_dim``
    dims: one (batch x dim) @ (dim x out_dim) GEMM per Arrow batch
    against an md5-derived matrix (deterministic across engines/runs —
    no RNG state, same derivation as the sign-LSH planes). The cheap
    front half of ANN/clustering at scale: an 8x-64x narrower vector
    preserves pairwise geometry within the JL bound, and every
    downstream operator (kmeans, LSH, GEMM top-k) runs on the narrow
    column at a fraction of the FLOPs/shuffle bytes. Output columns
    y0..y{out_dim-1}; no shuffle at any corpus size."""
    import numpy as np

    head = corpus.select(vec_col).first()
    if head is None:
        dim = 1
    else:
        dim = len(head[0])
    mat = np.array(random_planes(dim, out_dim, seed=seed)).T  # (dim, out_dim)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            y = x @ mat
            data = {id_col: pdf[id_col].to_numpy(dtype="int64")}
            for p in range(out_dim):
                data[f"y{p}"] = y[:, p]
            yield pd.DataFrame(data)

    fields = ", ".join(f"y{p} double" for p in range(out_dim))
    return corpus.select(id_col, vec_col).mapInPandas(
        gen, f"{id_col} long, {fields}"
    )


def cosine_radius(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_queries: int = MAX_BROADCAST_QUERIES,
) -> DataFrame:
    """Radius search: ALL corpus neighbors with cosine >= threshold for
    each query — the fixed-similarity companion to ``cosine_topk``'s
    fixed-count contract (dedup-style 'everything this similar', not
    'the k best'). Same plan shape as top-k minus its one shuffle: the
    bounded query matrix broadcasts, each corpus Arrow batch scores with
    one GEMM and emits its over-threshold pairs directly — no per-query
    rank window, so the whole search is a shuffle-free streaming pass
    at any corpus size."""
    spark = corpus.sparkSession
    base = _as_double(corpus, vec_col)
    q_pdf = (
        _as_double(queries, vec_col)
        .select(id_col, vec_col)
        .limit(max_queries + 1)
        .toPandas()
    )
    if len(q_pdf) > max_queries:
        raise ValueError(
            f"cosine_radius query side exceeds max_queries={max_queries}; "
            "use ivf_topk / lsh buckets or a partitioned exact pass"
        )
    q_ids, q_mat = _stack_normalized(q_pdf, id_col, vec_col)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def gen(batches):
        import numpy as np
        import pandas as pd

        bq_ids, bq_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids, c_mat = _stack_normalized(pdf, id_col, vec_col)
            scores = bq_mat @ c_mat.T
            qi, cj = np.nonzero(
                (np.round(scores, 6) >= threshold)
                & (bq_ids[:, None] != c_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "query_id": bq_ids[qi],
                    "neighbor_id": c_ids[cj],
                    "cosine": scores[qi, cj],
                }
            )

    return base.select(id_col, vec_col).mapInPandas(
        gen, "query_id long, neighbor_id long, cosine double"
    )


def ivf_build_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mod: int = 40,
    index_files: int = 8,
) -> dict:
    """Build and PERSIST an IVF index: inverted lists (neighbor_id,
    centroid_id, vector) written range-clustered + sorted on
    centroid_id, plus the centroid table. The production ANN shape:
    the n*C assignment GEMM runs ONCE ever; every later batch of
    queries probes the stored lists (``ivf_probe_index``) at
    |q|*C + n*nprobe/C cost — no daily re-assignment of a 100 TB
    corpus. Clustering on centroid_id means a probe's centroid filter
    prunes row groups at the parquet scan. Deterministic centroids
    (id % centroid_mod), same math as ivf_topk."""
    spark = corpus.sparkSession
    base = _as_double(corpus, vec_col)
    cent_pdf = (
        base.filter(F.col(id_col) % centroid_mod == 0)
        .select(id_col, vec_col)
        .limit(MAX_BROADCAST_QUERIES + 1)
        .toPandas()
        .sort_values(id_col)
    )
    if len(cent_pdf) > MAX_BROADCAST_QUERIES:
        raise ValueError(
            f"ivf_build_index centroid count exceeds {MAX_BROADCAST_QUERIES}; "
            "raise centroid_mod (C should grow ~sqrt(n), not n)"
        )
    c_ids, c_mat = _stack_normalized(cent_pdf, id_col, vec_col)
    bc = spark.sparkContext.broadcast((c_ids, c_mat))

    def assign_gen(batches):
        import numpy as np
        import pandas as pd

        b_ids, b_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, mat = _stack_normalized(pdf, id_col, vec_col)
            best = (mat @ b_mat.T).argmax(axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": ids,
                    "centroid_id": b_ids[best],
                    "vector": pdf[vec_col].to_numpy(),
                }
            )

    assign = base.select(id_col, vec_col).mapInPandas(
        assign_gen, "neighbor_id long, centroid_id long, vector array<double>"
    )
    (
        assign.repartitionByRange(index_files, F.col("centroid_id"))
        .sortWithinPartitions("centroid_id")
        .write.mode("overwrite")
        .parquet(f"{path}/lists")
    )
    base.filter(F.col(id_col) % centroid_mod == 0).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("vector")
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    return {"path": path, "centroids": int(len(c_ids))}


def ivf_probe_index(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    nprobe: int = 2,
    rank_quantize: int | None = None,
) -> DataFrame:
    """Probe a persisted IVF index (``ivf_build_index``): nprobe nearest
    centroids per query (one GEMM per Arrow batch against the broadcast
    centroid matrix), then exact cosine ranking WITHIN the probed
    inverted lists only. The probed-centroid set (bounded by the
    centroid count) is applied as an ``isin`` filter on the lists scan,
    so the pushed-down predicate + the index's centroid clustering
    prune row groups before anything is read — the batch-probe cost
    never rescans the whole index."""
    cent_pdf = (
        spark.read.parquet(f"{path}/centroids").toPandas()
        .sort_values("centroid_id")
    )
    c_ids, c_mat = _stack_normalized(cent_pdf, "centroid_id", "vector")
    bc = spark.sparkContext.broadcast((c_ids, c_mat))
    base = _as_double(queries, vec_col)

    def probe_gen(batches):
        import numpy as np
        import pandas as pd

        b_ids, b_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, mat = _stack_normalized(pdf, id_col, vec_col)
            order = np.argsort(-(mat @ b_mat.T), axis=1, kind="stable")[:, :nprobe]
            reps = order.shape[1]
            yield pd.DataFrame(
                {
                    "query_id": ids.repeat(reps),
                    "centroid_id": b_ids[order.reshape(-1)],
                    "__qv": pdf[vec_col].to_numpy().repeat(reps),
                }
            )

    probe = base.select(id_col, vec_col).mapInPandas(
        probe_gen, "query_id long, centroid_id long, __qv array<double>"
    ).localCheckpoint(eager=False)
    probed = sorted(
        r[0] for r in probe.select("centroid_id").distinct().collect()
    )
    lists = spark.read.parquet(f"{path}/lists").filter(
        F.col("centroid_id").isin(probed)
    )
    cand = probe.join(lists, "centroid_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_expr(F.col("__qv"), F.col("vector")).alias("cosine"),
    )
    # rank_quantize: round the cosine before ranking so exact-duplicate
    # neighbors (identical vectors under different ids) tie EXACTLY and
    # the id tie-break decides — float summation order otherwise
    # produces ULP-level differences that rank twins nondeterministically
    rank_key = (
        F.round(F.col("cosine"), rank_quantize)
        if rank_quantize is not None
        else F.col("cosine")
    )
    wk = Window.partitionBy("query_id").orderBy(
        rank_key.desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(wk)).filter(
        F.col("rank") <= k
    )


def ivf_index_upsert(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_files: int = 4,
) -> dict:
    """Incrementally ADD a batch to a persisted IVF index
    (``ivf_build_index``): assign the new vectors to the EXISTING
    centroids (one GEMM per Arrow batch against the broadcast centroid
    matrix — cost ∝ batch, the corpus is never touched) and append the
    assignments as new range-clustered files in the lists dataset.
    Probes (``ivf_probe_index``) see the union immediately; the pushed
    isin(centroid_id) filter prunes old and new files alike because
    appended files are clustered on centroid_id too.

    The index-maintenance half of production ANN: a daily embedding
    batch lands with batch-sized work, and the (amortized-once)
    assignment GEMM of the full build never re-runs. Centroids drift as
    the corpus grows — rebuild when recall degrades (the multiprobe
    knob buys time); this mirrors IVF practice (FAISS add-with-ids).
    Returns {added, centroids}."""
    import pandas as pd  # noqa: F401 (worker-side)

    cent_pdf = (
        spark.read.parquet(f"{path}/centroids").toPandas()
        .sort_values("centroid_id")
    )
    c_ids, c_mat = _stack_normalized(cent_pdf, "centroid_id", "vector")
    bc = spark.sparkContext.broadcast((c_ids, c_mat))
    base = _as_double(new_vectors, vec_col)

    def assign_gen(batches):
        import pandas as pd

        b_ids, b_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, mat = _stack_normalized(pdf, id_col, vec_col)
            best = (mat @ b_mat.T).argmax(axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": ids,
                    "centroid_id": b_ids[best],
                    "vector": pdf[vec_col].to_numpy(),
                }
            )

    assign = base.select(id_col, vec_col).mapInPandas(
        assign_gen, "neighbor_id long, centroid_id long, vector array<double>"
    )
    (
        assign.repartitionByRange(index_files, F.col("centroid_id"))
        .sortWithinPartitions("centroid_id")
        .write.mode("append")
        .parquet(f"{path}/lists")
    )
    return {"added": base.count(), "centroids": int(len(c_ids))}


# -- IVF-PQ: product-quantized inverted lists --------------------------------


def _pq_codebooks(
    base, id_col: str, vec_col: str, m: int, codebook_mod: int,
    c_mat=None,
):
    """Deterministic sampled PQ codebooks: the NORMALIZED sub-vectors of
    every ``id % codebook_mod == 0`` corpus vector, one codebook per
    subspace, codewords ordered by source id (ordinal code = id rank).
    This is the k-means++-style init alone — production would Lloyd-
    refine each codebook with operators/clustering.kmeans_assign, but a
    sampled codebook keeps every later step exactly replayable by the
    SQL oracle, which is how this engine pins ANN correctness.

    With ``c_mat`` (the normalized IVF centroid matrix) the codebooks
    train on RESIDUALS ``x - c(x)`` instead of raw vectors — FAISS's
    IVFPQ encoding: within one inverted list all vectors share a
    centroid, so the residual distribution is tighter than the raw one
    and the same code budget quantizes it with less error."""
    import numpy as np

    pdf = (
        base.filter(F.col(id_col) % codebook_mod == 0)
        .select(id_col, vec_col)
        .limit(MAX_BROADCAST_QUERIES + 1)
        .toPandas()
        .sort_values(id_col)
    )
    if len(pdf) > MAX_BROADCAST_QUERIES:
        raise ValueError(
            "PQ codebook exceeds the broadcast cap; raise codebook_mod"
        )
    ids, mat = _stack_normalized(pdf, id_col, vec_col)
    if c_mat is not None:
        best = (mat @ c_mat.T).argmax(axis=1)
        mat = mat - c_mat[best]
    n_k, dim = mat.shape
    if dim % m:
        raise ValueError(f"vector dim {dim} not divisible by pq_m={m}")
    return ids, mat.reshape(n_k, m, dim // m)


def _pq_encode(mat, cb):
    """(B, D) normalized vectors -> (B, m) ordinal codes: per subspace,
    the L2-nearest codeword. d2 uses the ||x||^2 - 2 x.c + ||c||^2
    expansion (one BLAS matmul per subspace) instead of materializing
    the (B, K, m, dsub) elementwise difference — at 2.4k codewords and
    10k-row Arrow batches the naive broadcast temporary is ~12 GB per
    batch; the expansion is O(B*K) memory. Distances round to 9
    decimals before the argmin, the same guard the SQL oracle's
    ``ORDER BY round(d2, 9), codeword`` applies — it absorbs both
    summation-order ULP noise (the oracle already sums in arbitrary
    order) and the expansion-vs-elementwise difference."""
    import numpy as np

    n_b = mat.shape[0]
    n_k, m, dsub = cb.shape
    sub = mat.reshape(n_b, m, dsub)
    codes = np.empty((n_b, m), dtype="int32")
    for s in range(m):
        x = sub[:, s, :]
        c = cb[:, s, :]
        d2 = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        codes[:, s] = np.round(d2, 9).argmin(axis=1)
    return codes


def _write_codebooks(spark, path: str, cb_ids, cb, pq_m: int) -> None:
    """Persist PQ codebooks as (subspace, code ordinal, source id,
    normalized subvector) rows — shared by the standalone IVF-PQ build
    and the CoW-backed VectorIndex so the on-disk layout (and any
    future dtype/rounding change) exists once. Local rows go through a
    PANDAS frame (Arrow -> LocalTableScan, one write task): a plain
    createDataFrame parallelizes across all cores and coalesce(1) then
    replays every tiny Python partition SERIALLY through the worker
    round-trip — seconds of overhead for 1-row data."""
    import pandas as _pd

    rows = [
        (s_, int(k_), int(cb_ids[k_]), [float(x) for x in cb[k_, s_]])
        for s_ in range(pq_m)
        for k_ in range(cb.shape[0])
    ]
    spark.createDataFrame(
        _pd.DataFrame(
            rows, columns=["subspace", "code", "source_id", "subvector"]
        ),
        "subspace int, code int, source_id long, subvector array<double>",
    ).write.mode("overwrite").parquet(f"{path}/codebooks")


def _load_codebook_tensor(spark, path: str):
    """(n_k, m, dsub) codebook tensor from the persisted layout —
    the read twin of _write_codebooks."""
    import numpy as np

    pdf = spark.read.parquet(f"{path}/codebooks").toPandas()
    m = int(pdf["subspace"].max()) + 1
    n_k = int(pdf["code"].max()) + 1
    dsub = len(pdf["subvector"].iloc[0])
    cb = np.zeros((n_k, m, dsub))
    for r in pdf.itertuples():
        cb[r.code, r.subspace] = np.asarray(r.subvector)
    return cb


def _adc_generator(bc, residual: bool):
    """mapInPandas generator scoring (query_id, neighbor_id,
    centroid_id, codes, __qv) batches by ADC — the sum over subspaces
    of dot(query subvector, codeword). ``bc.value`` must be
    (centroid_ids, normalized centroid matrix, codebook tensor);
    ``residual`` adds the query-centroid dot back per probed list
    (FAISS IVFPQ residual encoding). One definition serves the
    standalone probe and the CoW-backed VectorIndex."""

    def adc_gen(batches):
        import numpy as np
        import pandas as pd

        b_c_ids, b_c_mat, b_cb = bc.value
        m = b_cb.shape[1]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qmat = np.stack(pdf["__qv"].to_numpy()).astype("float64")
            qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
            qsub = qmat.reshape(len(pdf), m, -1)
            codes = np.stack(pdf["codes"].to_numpy()).astype("int64")
            cw = b_cb[codes, np.arange(m)[None, :]]  # (B, m, dsub)
            adc = np.einsum("bmd,bmd->b", qsub, cw)
            if residual:
                # codes quantize x - c(x): add back the query-centroid
                # dot so adc approximates dot(q, x) = dot(q, c) +
                # dot(q, residual)
                pos = np.searchsorted(
                    b_c_ids, pdf["centroid_id"].to_numpy()
                )
                adc = adc + np.einsum(
                    "bd,bd->b", qmat, b_c_mat[pos]
                )
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "adc": adc,
                }
            )

    return adc_gen


def ivf_pq_build_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mod: int = 40,
    pq_m: int = 8,
    codebook_mod: int = 25,
    index_files: int = 8,
    residual: bool = False,
) -> dict:
    """IVF-PQ index build (FAISS's IVFPQ, the 100 TB ANN shape): the
    inverted lists store each vector as ``pq_m`` ONE-BYTE-SCALE codes
    instead of the raw floats — a 64-dim float64 vector (512 B) becomes
    8 codes (~8 B), so the probe-side scan reads ~64x fewer bytes and a
    billion-vector list set fits where raw vectors cannot. Assignment
    = one broadcast-centroid GEMM per Arrow batch (as ivf_build_index)
    plus the per-subspace code encode; lists are written range-
    clustered + sorted on centroid_id so a probe's pushed-down
    isin(centroid_id) prunes row groups. Codebooks and centroids
    persist beside the lists. Scoring is ADC + exact re-rank
    (``ivf_pq_probe_index``)."""
    spark = corpus.sparkSession
    base = _as_double(corpus, vec_col)
    cent_pdf = (
        base.filter(F.col(id_col) % centroid_mod == 0)
        .select(id_col, vec_col)
        .limit(MAX_BROADCAST_QUERIES + 1)
        .toPandas()
        .sort_values(id_col)
    )
    if len(cent_pdf) > MAX_BROADCAST_QUERIES:
        raise ValueError(
            "ivf_pq_build_index centroid count exceeds the broadcast cap; "
            "raise centroid_mod"
        )
    c_ids, c_mat = _stack_normalized(cent_pdf, id_col, vec_col)
    cb_ids, cb = _pq_codebooks(
        base, id_col, vec_col, pq_m, codebook_mod,
        c_mat=c_mat if residual else None,
    )
    bc = spark.sparkContext.broadcast((c_ids, c_mat, cb))

    def assign_gen(batches):
        import pandas as pd

        b_c_ids, b_c_mat, b_cb = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, mat = _stack_normalized(pdf, id_col, vec_col)
            best = (mat @ b_c_mat.T).argmax(axis=1)
            enc = mat - b_c_mat[best] if residual else mat
            codes = _pq_encode(enc, b_cb)
            yield pd.DataFrame(
                {
                    "neighbor_id": ids,
                    "centroid_id": b_c_ids[best],
                    "codes": list(codes),
                }
            )

    assign = base.select(id_col, vec_col).mapInPandas(
        assign_gen, "neighbor_id long, centroid_id long, codes array<int>"
    )
    # repartitionByRange SAMPLES its child to pick range bounds, which
    # would run the whole GEMM+encode pass twice — cut lineage so the
    # encode runs once and the range write resorts cached rows
    assign = assign.localCheckpoint(eager=False)
    (
        assign.repartitionByRange(index_files, F.col("centroid_id"))
        .sortWithinPartitions("centroid_id")
        .write.mode("overwrite")
        .parquet(f"{path}/lists")
    )
    base.filter(F.col(id_col) % centroid_mod == 0).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("vector")
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    _write_codebooks(spark, path, cb_ids, cb, pq_m)
    import pandas as _pd

    spark.createDataFrame(
        _pd.DataFrame(
            [(bool(residual), pq_m)], columns=["residual", "pq_m"]
        ),
        "residual boolean, pq_m int",
    ).write.mode("overwrite").parquet(f"{path}/meta")
    return {
        "path": path,
        "centroids": int(len(c_ids)),
        "codewords": int(cb.shape[0]),
        "pq_m": pq_m,
        "residual": bool(residual),
    }


def ivf_pq_probe_index(
    spark,
    path: str,
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    nprobe: int = 2,
    shortlist: int = 10,
) -> DataFrame:
    """Probe an IVF-PQ index: nprobe nearest centroids per query (one
    broadcast GEMM per Arrow batch), ADC scoring inside the probed
    lists — each candidate's approximate dot is the sum over subspaces
    of ``dot(query_subvector, codeword[codes[s]])``, a table lookup,
    never a raw-vector read — then an EXACT cosine re-rank of only the
    top-``shortlist`` candidates per query against the corpus's raw
    vectors. The asymmetric-distance + re-rank split is what makes PQ
    usable: the cheap approximate pass touches codes only (~64x fewer
    bytes than raw), and the expensive exact pass touches
    |q| * shortlist rows instead of |q| * list size. ADC rank keys are
    rounded to 9 decimals (both here and in the oracle) so summation-
    order ULP noise cannot flip a shortlist boundary."""
    import numpy as np

    cent_pdf = (
        spark.read.parquet(f"{path}/centroids").toPandas()
        .sort_values("centroid_id")
    )
    c_ids, c_mat = _stack_normalized(cent_pdf, "centroid_id", "vector")
    import os as _os

    residual = False
    if _os.path.isdir(f"{path}/meta"):
        residual = bool(
            spark.read.parquet(f"{path}/meta").head()["residual"]
        )
    cb = _load_codebook_tensor(spark, path)
    bc = spark.sparkContext.broadcast((c_ids, c_mat, cb))
    base = _as_double(queries, vec_col)

    def probe_gen(batches):
        import numpy as np
        import pandas as pd

        b_c_ids, b_c_mat, _ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, mat = _stack_normalized(pdf, id_col, vec_col)
            order = np.argsort(
                -(mat @ b_c_mat.T), axis=1, kind="stable"
            )[:, :nprobe]
            reps = order.shape[1]
            yield pd.DataFrame(
                {
                    "query_id": ids.repeat(reps),
                    "centroid_id": b_c_ids[order.reshape(-1)],
                    "__qv": pdf[vec_col].to_numpy().repeat(reps),
                }
            )

    probe = base.select(id_col, vec_col).mapInPandas(
        probe_gen, "query_id long, centroid_id long, __qv array<double>"
    ).localCheckpoint(eager=False)
    probed = sorted(
        r[0] for r in probe.select("centroid_id").distinct().collect()
    )
    lists = spark.read.parquet(f"{path}/lists").filter(
        F.col("centroid_id").isin(probed)
    )
    cand = probe.join(lists, "centroid_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )

    adc_gen = _adc_generator(bc, residual)

    scored = cand.select(
        "query_id", "neighbor_id", "centroid_id", "codes", "__qv"
    ).mapInPandas(
        adc_gen, "query_id long, neighbor_id long, adc double"
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.round(F.col("adc"), 9).desc(), F.col("neighbor_id")
    )
    short = (
        scored.withColumn("__r", F.row_number().over(ws))
        .filter(F.col("__r") <= shortlist)
        .drop("__r")
    )
    # exact re-rank: fetch raw vectors for the shortlist only
    qv = base.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    nv = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv")
    )
    exact = (
        F.broadcast(short.select("query_id", "neighbor_id"))
        .join(qv, "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("__qv"), F.col("__nv")).alias("cosine"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 9).desc(), F.col("neighbor_id")
    )
    return exact.withColumn("rank", F.row_number().over(wk)).filter(
        F.col("rank") <= k
    )


def mine_bitext_margin(
    src: DataFrame,
    tgt: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    threshold: float = 1.05,
    max_queries: int = MAX_BROADCAST_QUERIES,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Margin-based parallel-pair (bitext) mining — the ratio-margin
    criterion of Artetxe & Schwenk 2019 ("Margin-based Parallel Corpus
    Mining with Multilingual Sentence Embeddings"), the standard recipe
    for mining translation pairs out of two monolingual embedding
    sets (CCMatrix/WikiMatrix-style):

        margin(x, y) = cos(x, y) /
            (0.5 * (avg_k cos(x, NN_k(x; tgt))
                    + avg_k cos(y, NN_k(y; src))))

    Each src row's BEST tgt neighbor is scored; pairs whose rounded
    margin reaches ``threshold`` are mined. Dividing by the two
    neighborhood averages corrects HUBNESS — a y globally close to
    everything carries a high backward average, deflating every margin
    it appears in — which raw cosine thresholds cannot.

    Plan: two :func:`cosine_topk` passes (each one broadcast-GEMM over
    the other side's partitions, no corpus shuffle; the query side is
    bounded by ``max_queries``), two neighborhood-average aggregates
    over k-row groups, and a pair-sized margin join. At 100 TB the
    query side batches through the bound and the corpus side rides the
    IVF index (:class:`~.vectorindex.VectorIndex.probe`) instead of
    the exact GEMM — the margin arithmetic is identical.

    Note the output column ``cosine`` is rounded for presentation
    while the margin divides the RAW cosine (both expressions evaluate
    against the input frame), matching the from-scratch definition.

    ``queries`` mines for a BATCH of src rows (the incremental shape —
    newly arrived sentences mined against the standing corpus) while
    BOTH neighborhood terms keep their full-language definition: the
    backward average always runs over all of ``src``, never just the
    batch, or the margin would inflate as the batch shrank.

    The backward pass is BOUNDED TO THE FORWARD WINNERS: only tgt ids
    that appear as some query's rank-1 forward neighbor ever reach the
    margin join, so ``tgt`` is semi-joined down to that id set
    (<= the query count) before the backward GEMM. Each surviving y
    still scores against ALL of ``src`` — the neighborhood definition
    (and every margin value) is unchanged — but the backward cost is
    O(|winners| x |src|) instead of O(|tgt| x |src|), and the
    ``max_queries`` driver bound now applies to the mined batch, not
    the whole target corpus: batch mining stays flat as tgt grows."""
    fwd = cosine_topk(
        tgt, queries if queries is not None else src,
        id_col, vec_col, k=k, max_queries=max_queries,
    ).localCheckpoint(eager=False)  # reused by the semi-join AND the
    # margin join below — without the pin the forward GEMM would run
    # twice
    bwd_queries = tgt.join(
        fwd.filter(F.col("rank") == 1).select(
            F.col("neighbor_id").alias(id_col)
        ),
        id_col, "semi",
    )
    bwd = cosine_topk(
        src, bwd_queries, id_col, vec_col, k=k, max_queries=max_queries
    )
    favg = fwd.groupBy("query_id").agg(F.avg("cosine").alias("__favg"))
    bavg = bwd.groupBy("query_id").agg(F.avg("cosine").alias("__bavg"))
    best = fwd.filter(F.col("rank") == 1).select(
        F.col("query_id").alias("src_id"),
        F.col("neighbor_id").alias("tgt_id"),
        "cosine",
    )
    out = (
        best.join(
            favg.withColumnRenamed("query_id", "src_id"), "src_id"
        )
        .join(bavg.withColumnRenamed("query_id", "tgt_id"), "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            F.round("cosine", 6).alias("cosine"),
            F.round(
                F.col("cosine")
                / (0.5 * (F.col("__favg") + F.col("__bavg"))),
                6,
            ).alias("margin"),
        )
    )
    return out.filter(F.col("margin") >= threshold)
