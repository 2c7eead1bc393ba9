"""Clustering + edit-distance dedup gate queries.

``corpus_kmeans_clusters`` follows the graph_queries.py precedent: a
fixed iteration count lets the DuckDB oracle unroll every Lloyd round
as chained CTEs, so even the iterative operator is value-gated — the
output is pure integers (vec_id, cid), no float rounding in the
compared values at all.

``dedup_fuzzy_titles`` value-gates the blocked Levenshtein join against
DuckDB's native ``levenshtein``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openverse_catalog_spark.operators import knn
from openverse_catalog_spark.operators.clustering import kmeans
from openverse_catalog_spark.operators.dedupe import fuzzy_pairs
from openverse_catalog_spark.plans.analytics import _t, register

_K = 8
_ITER = 3
_DIM = 64


def _dist(e: str, c: str) -> str:
    # index-order fold, matching the Spark aggregate() expression
    return " + ".join(
        f"({e}.v[{i + 1}] - {c}.v[{i + 1}]) * ({e}.v[{i + 1}] - {c}.v[{i + 1}])"
        for i in range(_DIM)
    )


def _kmeans_chain() -> str:
    """Lloyd-round CTE chain (c0 seeds -> a/u/c per round) over a CTE
    named ``e(vec_id, v)`` the caller supplies — shared by every oracle
    that needs the final centroid table c{_ITER}."""
    steps = []
    for it in range(_ITER):
        # round-9 means: the engine rounds each round's means before
        # feeding the next (partition-order float noise), so the
        # oracle must too
        mean_list = ", ".join(
            f"round(avg(e.v[{i + 1}]), 9)" for i in range(_DIM)
        )
        steps.append(
            f"""a{it} AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_dist('e', 'c')} ASC, c.cid ASC
               ) AS rn
        FROM e CROSS JOIN c{it} c
      ) WHERE rn = 1
    ),
    u{it} AS (
      SELECT a.cid, list_value({mean_list}) AS v
      FROM a{it} a JOIN e ON e.vec_id = a.vec_id
      GROUP BY a.cid
    ),
    c{it + 1} AS (
      SELECT c.cid, coalesce(u.v, c.v) AS v
      FROM c{it} c LEFT JOIN u{it} u ON u.cid = c.cid
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
      FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {_K})
    ),
    {chain}"""


def _final_assign() -> str:
    """Subquery: every e row's nearest final-round centroid."""
    return f"""SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_dist('e', 'c')} ASC, c.cid ASC
               ) AS rn
        FROM e CROSS JOIN c{_ITER} c
      ) WHERE rn = 1"""


def _kmeans_oracle() -> str:
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    {_kmeans_chain()}
    SELECT e.vec_id, a.cid
    FROM e JOIN ({_final_assign()}) a ON a.vec_id = e.vec_id
    """


@register("corpus_kmeans_clusters", _kmeans_oracle())
def corpus_kmeans_clusters(spark, sf_dir):
    """Three Lloyd rounds, k=8, over the embeddings table; returns the
    final (vec_id, cid) assignment. Centroids are driver-held array
    literals (assignment = whole-stage-codegen expression, no
    join/UDF); the update is one groupBy(cid) with 64 column sums —
    map-side partials reduce each partition to <=k rows, so the per-
    round shuffle is k x n_partitions rows at any corpus size."""
    emb = _t(spark, sf_dir, "embeddings")["embeddings"]
    return kmeans(emb, "embedding", "vec_id", k=_K, n_iter=_ITER, dim=_DIM)


_SEM_COS = 0.9

_SEM_E_SQL = """e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.5)
      FROM embeddings WHERE vec_id % 7 = 0
      UNION ALL
      SELECT vec_id + 2000000,
             list_prepend(0.0, list_transform(embedding, x -> CAST(x AS DOUBLE))[2:])
      FROM embeddings WHERE vec_id % 10 = 0
    )"""


@register(
    "dedup_semantic_clustered",
    f"""
    WITH {_SEM_E_SQL},
    {_kmeans_chain()},
    fa AS MATERIALIZED ({_final_assign()}),
    sx AS MATERIALIZED (
      SELECT vec_id, i, v[i] AS x
      FROM e, generate_series(1, {_DIM}) AS t(i)
    ),
    norms AS MATERIALIZED (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM sx GROUP BY vec_id),
    dots AS MATERIALIZED (
      SELECT a1.cid, ea.vec_id AS id_a, eb.vec_id AS id_b, sum(ea.x * eb.x) AS dot
      FROM sx ea
      JOIN fa a1 ON a1.vec_id = ea.vec_id
      JOIN fa a2 ON a2.cid = a1.cid AND a2.vec_id > ea.vec_id
      JOIN sx eb ON eb.vec_id = a2.vec_id AND eb.i = ea.i
      GROUP BY 1, 2, 3
    )
    SELECT cid, id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots JOIN norms na ON na.vec_id = id_a
              JOIN norms nb ON nb.vec_id = id_b
    WHERE round(dot / (na.nrm * nb.nrm), 6) >= {_SEM_COS}
    """,
)
def dedup_semantic_clustered(spark, sf_dir):
    """Semantic dedup: k-means partitions the salted embedding corpus
    into semantic blocks, and exact cosine pairs (>= 0.9) form only
    WITHIN a cluster — the two-level scale layering (semantic blocking
    x triangle blocks) where each task's pair space is quadratic in
    cluster/n_blocks, never the corpus. Candidate recall relative to the
    unblocked exact path is the semantic-blocking tradeoff (a pair
    straddling a centroid boundary is missed); the oracle replays the
    identical Lloyd rounds + in-cluster join, so the gate is value-exact
    end to end — even though the pipeline is iterative AND approximate."""
    from openverse_catalog_spark.plans.corpus_queries import _embed_corpus

    emb = _embed_corpus(spark, sf_dir)
    assign = kmeans(emb, "embedding", "vec_id", k=_K, n_iter=_ITER, dim=_DIM)
    with_cid = emb.join(assign, "vec_id")
    pairs = knn.cosine_near_dup_pairs_blocked(
        with_cid, "vec_id", "embedding",
        threshold=_SEM_COS, n_blocks=4, group_cols=["cid"],
    )
    return pairs.select(
        "cid", "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )


_TITLE_LEN = 40
_FUZZY_DIST = 12


@register(
    "dedup_fuzzy_titles",
    f"""
    WITH p AS (
      SELECT doc_id,
             substr(text, 1, {_TITLE_LEN}) AS title,
             lang,
             string_split(text, ' ')[1] AS w1
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           levenshtein(a.title, b.title) AS dist
    FROM p a JOIN p b
      ON a.lang = b.lang AND a.w1 = b.w1 AND a.doc_id < b.doc_id
    WHERE levenshtein(a.title, b.title) <= {_FUZZY_DIST}
    """,
)
def dedup_fuzzy_titles(spark, sf_dir):
    """Character-level near-dup pairs on the 40-char document "title"
    prefix, blocked on (lang, first token) so the self-join is an
    equi-join whose cost is sum-of-block m^2/2, never corpus^2. The
    threshold form of JVM levenshtein early-exits the DP at
    O(len * max_dist) per comparison."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    titled = docs.select(
        "doc_id",
        "lang",
        "text",
        F.substring("text", 1, _TITLE_LEN).alias("title"),
    )
    return fuzzy_pairs(
        titled,
        "doc_id",
        "title",
        [F.col("lang"), F.split("text", " ")[0]],
        _FUZZY_DIST,
    )
