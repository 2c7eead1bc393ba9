"""Training-data pipeline operators over the documents/embeddings tables:
exact + near deduplication (MinHash-LSH, SimHash, n-gram Jaccard),
similarity search, and text analysis. All md5-hash-based so the DuckDB
oracle computes bit-identical results (functions/hashing.py).

The dedup queries run on a corpus deliberately salted with duplicates:
    base documents
  + exact copies   (doc_id % 7 = 0  -> id + 1_000_000)
  + near copies    (doc_id % 10 = 0 -> id + 2_000_000, first 15 chars cut)
constructed identically on both engines, so the detectors have real work
to do and the checks are strong.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openverse_catalog_spark.session import literal_df

from openverse_catalog_spark.functions import text as tx
from openverse_catalog_spark.functions.hashing import hash60_sql
from openverse_catalog_spark.operators import dedupe as dd
from openverse_catalog_spark.operators import knn
from openverse_catalog_spark.plans.analytics import _t, register

# --- the salted corpus (identical construction both engines) ---------------

_CORPUS_SQL = """
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, source FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 2000000, substr(text, 16), source FROM documents WHERE doc_id % 10 = 0
"""


def _corpus(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].select("doc_id", "text", "source")
    exact = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "source"
    )
    near = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.expr("substr(text, 16)").alias("text"),
        "source",
    )
    return d.unionAll(exact).unionAll(near)


# --- exact dedup -----------------------------------------------------------


_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register(
    "dedup_exact_text",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    hashed AS (
      SELECT doc_id,
             {hash60_sql(_NORM_SQL)} AS text_hash
      FROM corpus
    )
    SELECT text_hash, count(*) AS n_dups, min(doc_id) AS keeper_id
    FROM hashed GROUP BY text_hash HAVING count(*) > 1
    """,
)
def dedup_exact_text(spark, sf_dir):
    """Exact dedup by normalized-text hash: one groupBy, map-side partial
    agg; the canonical J6 shape at corpus scale."""
    return dd.exact_text_dup_groups(_corpus(spark, sf_dir), "doc_id", "text")


# --- MinHash + LSH ---------------------------------------------------------

_N_SEEDS, _N_BANDS, _K = 16, 4, 5


def _minhash_band_ctes(src: str = "corpus") -> str:
    """The shared CTE chain ending in ``bands(doc_id, band, key)`` —
    the MinHash signature + band-key derivation every LSH oracle reads.
    ``src`` is the (doc_id, text) CTE the chain reads; when it is not
    the default corpus, the caller supplies the source CTEs and the
    leading corpus CTE is still emitted first (sources derive from it)."""
    from openverse_catalog_spark.functions.hashing import (
        MERSENNE_P,
        perm_params,
        perm_sql,
    )

    base = f"({hash60_sql('sh')} % {MERSENNE_P})"
    mins = ",\n             ".join(
        f"min({perm_sql('h', a, b)}) AS mh_{s}"
        for s, (a, b) in enumerate(perm_params(_N_SEEDS))
    )
    rows = _N_SEEDS // _N_BANDS
    band_selects = []
    for b in range(_N_BANDS):
        concat = " || ',' || ".join(
            f"CAST(mh_{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, {hash60_sql('(' + concat + ')')} AS key FROM mh"
        )
    bands = "\n      UNION ALL ".join(band_selects)
    lead = f"corpus AS ({_CORPUS_SQL}),\n    " if src == "corpus" else ""
    return f"""
    {lead}t AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM {src}),
    sh AS (SELECT DISTINCT doc_id, substr(t, i, {_K}) AS sh FROM (
             SELECT doc_id, t,
                    unnest(range(1, greatest(length(t) - {_K - 1}, 1) + 1)) AS i
             FROM t)),
    hs AS (SELECT doc_id, {base} AS h FROM sh),
    mh AS (SELECT doc_id, {mins} FROM hs GROUP BY doc_id),
    bands AS ({bands})"""


def _minhash_pair_ctes(src: str = "corpus") -> str:
    """Band CTEs + all-pairs ``cand_pairs(id_a, id_b)`` — for queries
    whose PRODUCT is the pair set (dedup_minhash_lsh, incremental)."""
    return f"""{_minhash_band_ctes(src)},
    cand_pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
    """


def _minhash_star_ctes(src: str = "corpus") -> str:
    """Band CTEs + STAR edges ``cand_pairs(id_a=hub, id_b=member)`` —
    for connectivity consumers (components, funnel): linear in bucket
    size where all-pairs is quadratic, same connected components (see
    minhash_lsh_star_edges)."""
    return f"""{_minhash_band_ctes(src)},
    hubs AS (SELECT band, key, min(doc_id) AS hub, count(*) AS c
             FROM bands GROUP BY band, key),
    cand_pairs AS (
      SELECT DISTINCT h.hub AS id_a, b.doc_id AS id_b
      FROM bands b JOIN hubs h ON b.band = h.band AND b.key = h.key
      WHERE h.c > 1 AND b.doc_id <> h.hub)
    """


def _minhash_oracle() -> str:
    return f"""
    WITH {_minhash_pair_ctes()}
    SELECT id_a, id_b FROM cand_pairs
    """


@register("dedup_minhash_lsh", _minhash_oracle())
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash (16 perms) + banded LSH (4x4) candidate pairs — the scale
    path for near-dup detection: explode shingles -> one groupBy for all
    16 mins -> band-key equi-join. Never materializes the pair space."""
    corpus = _corpus(spark, sf_dir)
    sigs = dd.minhash_signatures(corpus, "doc_id", "text", _N_SEEDS, _K)
    return dd.minhash_lsh_pairs(sigs, "doc_id", _N_SEEDS, _N_BANDS)


# --- SimHash ---------------------------------------------------------------


def _simhash_oracle() -> str:
    h = hash60_sql("tok")
    bit_sums = ",\n             ".join(
        f"sum(CASE WHEN (({h}) >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(16)
    )
    recombine = " + ".join(f"CASE WHEN b{b} > 0 THEN {2**b} ELSE 0 END" for b in range(16))
    return f"""
    WITH corpus AS ({_CORPUS_SQL}),
    tok AS (SELECT DISTINCT doc_id, tok FROM (
              SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
              FROM corpus) WHERE tok <> ''),
    sums AS (SELECT doc_id, {bit_sums} FROM tok GROUP BY doc_id)
    SELECT doc_id, CAST({recombine} AS BIGINT) AS simhash FROM sums
    """


@register("dedup_simhash", _simhash_oracle())
def dedup_simhash(spark, sf_dir):
    """16-bit SimHash per document (token-hash bit voting)."""
    return dd.simhash16(_corpus(spark, sf_dir), "doc_id", "text")


def _simhash_pairs_oracle() -> str:
    h = hash60_sql("tok")
    bit_sums = ",\n             ".join(
        f"sum(CASE WHEN (({h}) >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(16)
    )
    recombine = " + ".join(f"CASE WHEN b{b} > 0 THEN {2**b} ELSE 0 END" for b in range(16))
    return f"""
    WITH corpus AS ({_CORPUS_SQL}),
    tok AS (SELECT DISTINCT doc_id, tok FROM (
              SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
              FROM corpus) WHERE tok <> ''),
    sums AS (SELECT doc_id, {bit_sums} FROM tok GROUP BY doc_id),
    sims AS (SELECT doc_id, CAST({recombine} AS BIGINT) AS simhash FROM sums)
    SELECT bit_count(xor(a.simhash, b.simhash)) AS hamming,
           count(*) AS n_pairs
    FROM sims a JOIN sims b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    GROUP BY 1
    """


@register("dedup_simhash_pairs", _simhash_pairs_oracle())
def dedup_simhash_pairs(spark, sf_dir):
    """GLOBAL near-dup pair census at Hamming<=3 on the 16-bit sketch,
    computed in VALUE space: a 16-bit sketch has <= 65,536 distinct
    values, so the docs collapse to one (simhash, count) row each, the
    pigeonhole band join (4 bands x 4 bits — any pair with <= 3
    differing bits shares an identical band) runs over distinct VALUES,
    and doc-pair counts come back as products of value counts (plus
    C(n,2) within each value for hamming 0). The oracle brute-forces
    all doc pairs to prove the banding misses nothing.

    This shape exists because pair ENUMERATION on a 16-bit sketch is
    intrinsically quadratic — on a near-dup-heavy corpus most docs sit
    within 3 bits of most others (sf0.1: 11.1M qualifying pairs from
    6.2k docs), so any engine must materialize O(n^2) rows; no plan
    fixes an output-size problem. The census answers the question the
    sketch can actually support at 100 TB (how much near-duplication,
    at what radius) with doc-level cost = one groupBy on the sketch;
    enumeration belongs to the discriminative 60-bit path
    (``dedup_simhash60_banded``)."""
    corpus = _corpus(spark, sf_dir)
    sims = dd.simhash16(corpus, "doc_id", "text")
    return dd.simhash_pair_census(sims, max_hamming=3, n_bands=4, bits=16)


# --- n-gram Jaccard --------------------------------------------------------


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    toks AS (SELECT doc_id, source,
                    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tk
             FROM corpus),
    allgrams AS (SELECT DISTINCT doc_id, source,
                     array_to_string(tk[i:i+2], ' ') AS g
              FROM (SELECT doc_id, source, tk,
                           unnest(range(1, greatest(len(tk) - 2, 1) + 1)) AS i
                    FROM toks)),
    dfc AS (SELECT g, source, count(*) AS df FROM allgrams GROUP BY 1, 2),
    grams AS (SELECT allgrams.* FROM allgrams
              JOIN dfc USING (g, source) WHERE df <= 64),
    sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM grams a JOIN grams b ON a.g = b.g AND a.source = b.source AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.3
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard >= 0.3 within source blocks over the
    df-capped gram universe (grams shared by > 64 docs in a block are
    stop-grams and dropped before the self-join, bounding pair output
    at |grams| x 64 instead of Σ df(g)²). Shuffle is on n-grams
    (linear), never on the pair space."""
    out = dd.ngram_jaccard_pairs(
        _corpus(spark, sf_dir), "doc_id", "text", n=3, block_col="source",
        min_jaccard=0.3, max_df=64,
    )
    return out.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


# --- similarity search -----------------------------------------------------


@register(
    "knn_cosine_topk",
    """
    WITH ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
                FROM embeddings, generate_series(1, 64) AS t(i)),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY vec_id),
    dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, sum(a.x * b.x) AS dot
             FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id <> b.vec_id
             WHERE a.vec_id % 20 = 0
             GROUP BY 1, 2),
    scored AS (SELECT query_id, neighbor_id, dot / (na.nrm * nb.nrm) AS cosine
               FROM dots JOIN norms na ON na.vec_id = query_id
                         JOIN norms nb ON nb.vec_id = neighbor_id),
    ranked AS (SELECT query_id, neighbor_id, cosine,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id) AS rank
               FROM scored)
    SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
    FROM ranked WHERE rank <= 3
    """,
)
def knn_cosine_topk(spark, sf_dir):
    """Exact brute-force top-3 cosine neighbors for the query subset
    (vec_id % 20 = 0). JVM-side zip_with/aggregate dot products; query
    side broadcast so the corpus never shuffles."""
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    queries = e.filter(F.col("vec_id") % 20 == 0)
    out = knn.cosine_topk(e, queries, "vec_id", "embedding", k=3)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


@register("knn_lsh_bucketed", """
    WITH ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
                FROM embeddings, generate_series(1, 64) AS t(i)),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY vec_id),
    pl AS (SELECT ts.t, ps.p, ds.d,
                  CAST(('0x' || substr(md5('plane' || CAST(ts.t AS VARCHAR) || '|' ||
                        CAST(ps.p AS VARCHAR) || '|' || CAST(ds.d AS VARCHAR)), 1, 8))
                       AS BIGINT) / 2147483648.0 - 1.0 AS w
           FROM generate_series(0, 7) AS ts(t),
                generate_series(0, 3) AS ps(p),
                generate_series(0, 63) AS ds(d)),
    proj AS (SELECT e.vec_id, pl.t, pl.p, sum(e.x * pl.w) AS s
             FROM ex e JOIN pl ON pl.d = e.i - 1
             GROUP BY 1, 2, 3),
    buck AS (SELECT vec_id, t,
                    sum(CASE WHEN s >= 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END) AS bucket
             FROM proj GROUP BY vec_id, t),
    cand AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
             FROM buck a JOIN buck b
               ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id <> b.vec_id),
    dots AS (SELECT c.query_id, c.neighbor_id, sum(ea.x * eb.x) AS dot
             FROM cand c
             JOIN ex ea ON ea.vec_id = c.query_id
             JOIN ex eb ON eb.vec_id = c.neighbor_id AND ea.i = eb.i
             GROUP BY 1, 2),
    scored AS (SELECT query_id, neighbor_id, dot / (na.nrm * nb.nrm) AS cosine
               FROM dots JOIN norms na ON na.vec_id = query_id
                         JOIN norms nb ON nb.vec_id = neighbor_id),
    ranked AS (SELECT query_id, neighbor_id, cosine,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id) AS rank
               FROM scored)
    SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
    FROM ranked WHERE rank <= 3
    """)
def knn_lsh_bucketed(spark, sf_dir):
    """ANN scale path: random-hyperplane LSH buckets, exact cosine within
    buckets only. APPROXIMATE relative to exact knn (recall pinned in
    tests) yet fully DETERMINISTIC: the hyperplanes are md5-derived, so
    the oracle recomputes the identical planes, buckets, candidates and
    in-bucket cosines in SQL — the whole LSH path is value-gated."""
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    out = knn.lsh_bucket_topk(e, "vec_id", "embedding", k=3, n_planes=4, n_tables=8, dim=64)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


def _label_prop_sql(rounds: int = 3) -> tuple[str, str]:
    """CTE fragment for bounded min-label propagation over ``cand_pairs``;
    returns (fragment, final_cte_name)."""
    prev = "l0"
    steps = []
    for r in range(1, rounds + 1):
        steps.append(
            f"""l{r} AS (SELECT node, min(label) AS label FROM (
          SELECT node, label FROM {prev}
          UNION ALL
          SELECT e.src AS node, l.label FROM edges e JOIN {prev} l ON l.node = e.dst
        ) GROUP BY node)"""
        )
        prev = f"l{r}"
    chain = ",\n    ".join(steps)
    frag = f"""edges AS (SELECT id_a AS src, id_b AS dst FROM cand_pairs
              UNION ALL
              SELECT id_b AS src, id_a AS dst FROM cand_pairs),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
    {chain}"""
    return frag, prev


def _components_oracle(rounds: int = 4) -> str:
    frag, last = _label_prop_sql(rounds)
    return f"""
    WITH {_minhash_star_ctes()},
    {frag}
    SELECT node AS doc_id, label AS canonical_id FROM {last}
    """


@register("dedup_components", _components_oracle())
def dedup_components(spark, sf_dir):
    """Keeper selection: MinHash-LSH STAR edges (bucket member -> bucket
    min; linear in bucket size, so a dup-heavy corpus where every doc
    has hundreds of copies cannot OOM the pair materialization — the
    100x probe's finding) -> bounded min-label propagation (4 rounds of
    join + min-aggregate; one extra round covers the hub hop) ->
    (doc_id, canonical_id). The last step of a real dedup pipeline —
    which physical doc survives each near-dup cluster."""
    corpus = _corpus(spark, sf_dir)
    sigs = dd.minhash_signatures(corpus, "doc_id", "text", _N_SEEDS, _K)
    edges = dd.minhash_lsh_star_edges(sigs, "doc_id", _N_SEEDS, _N_BANDS)
    return dd.dup_components_bounded(edges, rounds=4)


# --- embedding-cosine near-dup + IVF ANN -----------------------------------
#
# The embeddings table has no natural near-dups (max off-diagonal cosine
# ~0.51 at sf0.01), so the dedup queries salt it the same way the text
# corpus is salted: exact copies (scaled x1.5 — cosine exactly 1) and near
# copies (first coordinate zeroed — cosine ~0.93-0.999). Threshold 0.9
# cleanly separates salted pairs from the natural background.

_EMBED_SX_SQL = """
    ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, generate_series(1, 64) AS t(i)),
    sx AS (SELECT vec_id, i, x FROM ex
           UNION ALL
           SELECT vec_id + 1000000, i, x * 1.5 FROM ex WHERE vec_id % 7 = 0
           UNION ALL
           SELECT vec_id + 2000000, i, CASE WHEN i = 1 THEN 0.0 ELSE x END
           FROM ex WHERE vec_id % 10 = 0)
"""


def _embed_corpus(spark, sf_dir):
    e = (
        _t(spark, sf_dir, "embeddings")["embeddings"]
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    exact = e.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.5)).alias("embedding"),
    )
    near = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"),
        F.concat(F.array(F.lit(0.0)), F.slice("embedding", 2, 63)).alias("embedding"),
    )
    return e.unionAll(exact).unionAll(near)


@register(
    "dedup_embedding_cosine",
    f"""
    WITH {_EMBED_SX_SQL},
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM sx GROUP BY vec_id),
    dots AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x * b.x) AS dot
             FROM sx a JOIN sx b ON a.i = b.i AND a.vec_id < b.vec_id
             GROUP BY 1, 2)
    SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots JOIN norms na ON na.vec_id = id_a
              JOIN norms nb ON nb.vec_id = id_b
    WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.9
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    """Exact embedding-cosine near-dup pairs (cosine >= 0.9) over the
    salted corpus, computed DISTRIBUTED via triangle block-pairs
    (``cosine_near_dup_pairs_blocked``): no driver collect, no
    full-corpus broadcast — the per-group GEMM is the same kernel the
    old broadcast baseline used, but memory per task is 2n/B vectors.
    Results identical to the brute-force oracle (the blocking is a
    partition of the pair space, not an approximation)."""
    out = knn.cosine_near_dup_pairs_blocked(
        _embed_corpus(spark, sf_dir), "vec_id", "embedding", threshold=0.9,
        n_blocks=8,
    )
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


@register("dedup_embedding_lsh", """
    WITH base AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, generate_series(1, 64) AS t(i)
      UNION ALL
      SELECT vec_id + 1000000, i, CAST(embedding[i] AS DOUBLE) * 1.5
      FROM embeddings, generate_series(1, 64) AS t(i) WHERE vec_id % 7 = 0
      UNION ALL
      SELECT vec_id + 2000000, i,
             CASE WHEN i = 1 THEN 0.0 ELSE CAST(embedding[i] AS DOUBLE) END
      FROM embeddings, generate_series(1, 64) AS t(i) WHERE vec_id % 10 = 0
    ),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM base GROUP BY vec_id),
    pl AS (SELECT ts.t, ps.p, ds.d,
                  CAST(('0x' || substr(md5('plane' || CAST(ts.t AS VARCHAR) || '|' ||
                        CAST(ps.p AS VARCHAR) || '|' || CAST(ds.d AS VARCHAR)), 1, 8))
                       AS BIGINT) / 2147483648.0 - 1.0 AS w
           FROM generate_series(0, 7) AS ts(t),
                generate_series(0, 5) AS ps(p),
                generate_series(0, 63) AS ds(d)),
    proj AS (SELECT b.vec_id, pl.t, pl.p, sum(b.x * pl.w) AS s
             FROM base b JOIN pl ON pl.d = b.i - 1
             GROUP BY 1, 2, 3),
    buck AS (SELECT vec_id, t,
                    sum(CASE WHEN s >= 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END) AS bucket
             FROM proj GROUP BY vec_id, t),
    cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
             FROM buck a JOIN buck b
               ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
    dots AS (SELECT c.id_a, c.id_b, sum(ea.x * eb.x) AS dot
             FROM cand c
             JOIN base ea ON ea.vec_id = c.id_a
             JOIN base eb ON eb.vec_id = c.id_b AND ea.i = eb.i
             GROUP BY 1, 2),
    scored AS (SELECT id_a, id_b, dot / (na.nrm * nb.nrm) AS cosine
               FROM dots JOIN norms na ON na.vec_id = id_a
                         JOIN norms nb ON nb.vec_id = id_b)
    SELECT id_a, id_b, round(cosine, 6) AS cosine
    FROM scored WHERE round(cosine, 6) >= 0.9
    """)
def dedup_embedding_lsh(spark, sf_dir):
    """Scale path for embedding near-dup: sign-LSH buckets restrict the
    pair space, exact cosine verified within buckets only. Approximate
    RELATIVE TO the exact path (recall pinned in tests), but
    deterministic end to end — md5-derived planes let the oracle rebuild
    the same buckets/candidates/pairs in SQL, so even the LSH dedup is
    value-gated."""
    out = knn.embedding_near_dup_pairs(
        _embed_corpus(spark, sf_dir), "vec_id", "embedding", threshold=0.9,
        n_planes=6, n_tables=8,
    )
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def _ivf_oracle(
    nprobe: int = 2,
    corpus_sql: str = "SELECT vec_id, embedding FROM embeddings",
    centroid_filter: str = "vec_id % 40 = 0",
    query_filter: str = "vec_id % 20 = 0",
    rank_quantize: int | None = None,
    match_filter: str | None = None,
) -> str:
    rank_key = (
        f"round(cosine, {rank_quantize})"
        if rank_quantize is not None
        else "cosine"
    )
    # filtered ANN: the predicate restricts NEIGHBORS (written against
    # alias a.neighbor_id), mirroring the engine's pre-filter semi-join
    extra = f" AND ({match_filter})" if match_filter else ""
    return f"""
    WITH corpus AS ({corpus_sql}),
    ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
                FROM corpus, generate_series(1, 64) AS t(i)),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY vec_id),
    cex AS (SELECT vec_id AS centroid_id, i, x FROM ex WHERE {centroid_filter}),
    adot AS (SELECT e.vec_id, c.centroid_id, sum(e.x * c.x) AS dot
             FROM ex e JOIN cex c ON e.i = c.i GROUP BY 1, 2),
    acos AS (SELECT adot.vec_id, adot.centroid_id, dot / (n1.nrm * n2.nrm) AS c
             FROM adot JOIN norms n1 ON n1.vec_id = adot.vec_id
                       JOIN norms n2 ON n2.vec_id = adot.centroid_id),
    assign AS (SELECT vec_id AS neighbor_id, centroid_id FROM (
                 SELECT vec_id, centroid_id,
                        row_number() OVER (PARTITION BY vec_id
                                           ORDER BY c DESC, centroid_id) AS r
                 FROM acos) WHERE r = 1),
    probe AS (SELECT vec_id AS query_id, centroid_id FROM (
                SELECT vec_id, centroid_id,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY c DESC, centroid_id) AS r
                FROM acos WHERE {query_filter}) WHERE r <= {nprobe}),
    cand AS (SELECT p.query_id, a.neighbor_id
             FROM probe p JOIN assign a USING (centroid_id)
             WHERE p.query_id <> a.neighbor_id{extra}),
    cdot AS (SELECT query_id, neighbor_id, sum(qa.x * nb.x) AS dot
             FROM cand JOIN ex qa ON qa.vec_id = cand.query_id
                       JOIN ex nb ON nb.vec_id = cand.neighbor_id AND nb.i = qa.i
             GROUP BY 1, 2),
    scored AS (SELECT query_id, neighbor_id, dot / (na.nrm * nb.nrm) AS cosine
               FROM cdot JOIN norms na ON na.vec_id = cdot.query_id
                         JOIN norms nb ON nb.vec_id = cdot.neighbor_id),
    ranked AS (SELECT query_id, neighbor_id, cosine,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY {rank_key} DESC, neighbor_id) AS rank
               FROM scored)
    SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
    FROM ranked WHERE rank <= 3
    """


@register("knn_ivf", _ivf_oracle())
def knn_ivf(spark, sf_dir):
    """IVF ANN: deterministic centroids (vec_id % 40 = 0), nearest-centroid
    inverted lists, nprobe=2 probing, exact top-3 within probed lists.
    Fully deterministic, so — unlike random-projection LSH — this ANN
    path is hash-match oracle-checkable end to end."""
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    out = knn.ivf_topk(
        e, "vec_id", "embedding", k=3, centroid_mod=40, query_mod=20, nprobe=2
    )
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


@register("knn_ivf_persisted", _ivf_oracle())
def knn_ivf_persisted(spark, sf_dir):
    """The PERSISTED-index form of knn_ivf — the production ANN shape:
    ivf_build_index assigns every vector to its centroid ONCE and writes
    the inverted lists range-clustered + sorted on centroid_id; each
    query batch then probes the stored index (broadcast centroid GEMM ->
    pushed-down isin(centroid_id) filter on the clustered lists -> exact
    cosine within probed lists). Same deterministic math and oracle as
    knn_ivf, but the n*C assignment never re-runs per batch — at 100 TB
    the index build amortizes across every future probe. The pushdown
    is plan-pinned in tests/test_plan_shapes.py."""
    import os
    import shutil
    import tempfile

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    path = os.path.join(tempfile.gettempdir(), "spark_graft_ivf_idx")
    shutil.rmtree(path, ignore_errors=True)
    knn.ivf_build_index(e, path, "vec_id", "embedding", centroid_mod=40)
    queries = e.filter(F.col("vec_id") % 20 == 0)
    out = knn.ivf_probe_index(spark, path, queries, "vec_id", "embedding",
                              k=3, nprobe=2)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


# --- text analysis ---------------------------------------------------------


@register(
    "text_token_count",
    """
    SELECT doc_id,
           len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS n_tokens,
           length(text) AS n_chars
    FROM documents
    """,
)
def text_token_count(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    return d.select(
        "doc_id",
        tx.token_count(F.col("text")).alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


def _lang_oracle() -> str:
    hits = []
    for lang, words in sorted(tx.LANG_MARKERS.items()):
        lst = ", ".join(f"'{w}'" for w in words)
        hits.append(
            f"len(list_filter(tk, t -> list_contains([{lst}], t))) AS h_{lang}"
        )
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tk
      FROM documents
    ),
    hits AS (SELECT doc_id, {', '.join(hits)} FROM toks)
    SELECT doc_id,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                WHEN h_es >= h_fr THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM hits
    """


@register("text_lang_id", _lang_oracle())
def text_lang_id(spark, sf_dir):
    """Stopword-marker language ID (ties -> lexicographically first)."""
    d = _t(spark, sf_dir, "documents")["documents"]
    return d.select("doc_id", tx.lang_id(F.col("text")).alias("lang_pred"))


@register(
    "text_quality_score",
    f"""
    WITH base AS (
      SELECT doc_id, length(text) AS n,
             length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tk
      FROM documents
    ),
    feats AS (
      SELECT doc_id, n, alpha, len(tk) AS ntok,
             len(list_filter(tk, t -> list_contains([{", ".join(repr(w) for w in tx.EN_STOPWORDS)}], t))) AS stop
      FROM base
    )
    SELECT doc_id,
           round((least(n / 200.0, 1.0)
                  + CASE WHEN n > 0 THEN CAST(alpha AS DOUBLE) / n ELSE 0.0 END
                  + least(CASE WHEN ntok > 0 THEN CAST(stop AS DOUBLE) / ntok ELSE 0.0 END * 4.0, 1.0)
                 ) / 3.0, 4) AS quality
    FROM feats
    """,
)
def text_quality_score(spark, sf_dir):
    """Length / alpha-ratio / stopword-ratio composite quality heuristic."""
    d = _t(spark, sf_dir, "documents")["documents"]
    return d.select(
        "doc_id", F.round(tx.quality_score(F.col("text")), 4).alias("quality")
    )


@register(
    "text_fingerprint",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_sort(list_transform(
               list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')),
               t -> {hash60_sql('t')})) AS hs
      FROM documents
    )
    SELECT doc_id,
           {hash60_sql("array_to_string(list_transform(hs[1:8], h -> CAST(h AS VARCHAR)), ',')")} AS fingerprint
    FROM toks
    """,
)
def text_fingerprint(spark, sf_dir):
    """Min-k token-hash sketch fingerprint (order-insensitive)."""
    d = _t(spark, sf_dir, "documents")["documents"]
    return d.select("doc_id", tx.fingerprint(F.col("text"), 8).alias("fingerprint"))


# --- 60-bit banded SimHash (exact sub-quadratic near-dup) ------------------


def _simhash60_pairs_oracle() -> str:
    h = hash60_sql("tok")
    bit_sums = ",\n             ".join(
        f"sum(CASE WHEN (({h}) >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(60)
    )
    recombine = " + ".join(
        f"CASE WHEN b{b} > 0 THEN {2**b} ELSE 0 END" for b in range(60)
    )
    return f"""
    WITH corpus AS ({_CORPUS_SQL}),
    tok AS (SELECT DISTINCT doc_id, tok FROM (
              SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
              FROM corpus) WHERE tok <> ''),
    sums AS (SELECT doc_id, {bit_sums} FROM tok GROUP BY doc_id),
    sims AS (SELECT doc_id, CAST({recombine} AS BIGINT) AS simhash FROM sums)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sims a JOIN sims b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


@register("dedup_simhash60_banded", _simhash60_pairs_oracle())
def dedup_simhash60_banded(spark, sf_dir):
    """Global (no blocking column) Hamming<=3 near-dup pairs on a 60-bit
    SimHash via band blocking — EXACT by pigeonhole (4 bands > 3 diffs)
    and sub-quadratic; the oracle brute-forces all pairs to prove no
    candidate is missed."""
    corpus = _corpus(spark, sf_dir)
    sims = dd.simhash60(corpus, "doc_id", "text")
    return dd.simhash_banded_pairs(sims, "doc_id", max_hamming=3, n_bands=4, bits=60)



def _quality_filtered_oracle() -> str:
    # documents.doc_id aligns with embeddings.vec_id; corpus restricted to
    # docs whose quality heuristic clears 0.5 before the exact top-k
    quality = """
    WITH base AS (
      SELECT doc_id, length(text) AS n,
             length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tk
      FROM documents
    ),
    feats AS (
      SELECT doc_id, n, alpha, len(tk) AS ntok,
             len(list_filter(tk, t -> list_contains([{stop}], t))) AS stop
      FROM base
    ),
    q AS (
      SELECT doc_id,
             (least(n / 200.0, 1.0)
              + CASE WHEN n > 0 THEN CAST(alpha AS DOUBLE) / n ELSE 0.0 END
              + least(CASE WHEN ntok > 0 THEN CAST(stop AS DOUBLE) / ntok ELSE 0.0 END * 4.0, 1.0)
             ) / 3.0 AS quality
      FROM feats
    )""".format(stop=", ".join(repr(w) for w in tx.EN_STOPWORDS))
    return f"""
    {quality},
    keep AS (SELECT doc_id FROM q WHERE quality >= 0.5),
    ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings JOIN keep ON keep.doc_id = embeddings.vec_id,
                generate_series(1, 64) AS t(i)),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY vec_id),
    dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, sum(a.x * b.x) AS dot
             FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id <> b.vec_id
             WHERE a.vec_id % 20 = 0
             GROUP BY 1, 2),
    scored AS (SELECT query_id, neighbor_id, dot / (na.nrm * nb.nrm) AS cosine
               FROM dots JOIN norms na ON na.vec_id = query_id
                         JOIN norms nb ON nb.vec_id = neighbor_id),
    ranked AS (SELECT query_id, neighbor_id, cosine,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id) AS rank
               FROM scored)
    SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
    FROM ranked WHERE rank <= 3
    """


@register("knn_quality_filtered", _quality_filtered_oracle())
def knn_quality_filtered(spark, sf_dir):
    """Cross-table composition: restrict the ANN corpus to documents
    whose text-quality heuristic clears 0.5 (embeddings.vec_id joined to
    documents.doc_id — at scale a broadcast of the keep-list or a
    pre-filtered corpus write), then exact GEMM top-3 — the
    filtered-retrieval shape RAG/data-curation pipelines run."""
    t = _t(spark, sf_dir, "documents", "embeddings")
    keep = (
        t["documents"]
        .select("doc_id", tx.quality_score(F.col("text")).alias("q"))
        .filter(F.col("q") >= 0.5)
        .select(F.col("doc_id").alias("vec_id"))
    )
    corpus = t["embeddings"].join(keep, "vec_id").select("vec_id", "embedding")
    queries = corpus.filter(F.col("vec_id") % 20 == 0)
    out = knn.cosine_topk(corpus, queries, "vec_id", "embedding", k=3)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


# --- corpus token-length distribution (per-language percentiles) -----------


@register(
    "text_token_histogram",
    """
    WITH tc AS (
      SELECT lang,
             len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '')) AS nt
      FROM documents
    )
    SELECT lang,
           quantile_disc(nt, 0.25) AS p25,
           quantile_disc(nt, 0.50) AS p50,
           quantile_disc(nt, 0.75) AS p75,
           quantile_disc(nt, 0.95) AS p95,
           count(*) AS n_docs
    FROM tc GROUP BY lang
    """,
)
def text_token_histogram(spark, sf_dir):
    """Corpus-profile staple: the token-count distribution per language
    bucket (quality cutoffs are usually set from these quantiles). All
    four discrete percentiles AND the group count come from ONE ranked
    pass — one shuffle total, never a scan per percentile."""
    from openverse_catalog_spark.operators.popularity import percentile_disc_multi

    d = _t(spark, sf_dir, "documents")["documents"]
    tc = d.select("lang", tx.token_count(F.col("text")).alias("nt"))
    return percentile_disc_multi(
        tc, ["lang"], "nt",
        {"p25": 0.25, "p50": 0.50, "p75": 0.75, "p95": 0.95},
        count_col="n_docs",
    )


# --- int8 embedding quantization ------------------------------------------


@register(
    "embed_quantize_int8",
    """
    WITH ex AS (SELECT vec_id, CAST(x AS DOUBLE) AS x
                FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)),
    s AS (SELECT vec_id, max(abs(x)) AS scale FROM ex GROUP BY vec_id),
    q AS (SELECT e.vec_id, e.x, s.scale,
                 CASE WHEN s.scale = 0 THEN 0.0
                      ELSE floor(e.x / s.scale * 127 + 0.5) END AS q
          FROM ex e JOIN s USING (vec_id))
    SELECT vec_id,
           round(any_value(scale), 6) AS scale,
           CAST(sum(q) AS BIGINT) AS q_sum,
           round(sqrt(avg(pow(x - CASE WHEN scale = 0 THEN 0.0
                                       ELSE q * scale / 127 END, 2))), 6) AS rmse
    FROM q GROUP BY vec_id
    """,
)
def embed_quantize_int8(spark, sf_dir):
    """Symmetric int8 quantization of the embedding column (4x storage
    shrink for the ANN scale path) with per-vector reconstruction RMSE.
    Half-up rounding is explicit (floor(x+0.5)) so numpy and the SQL
    oracle agree bit-for-bit. No shuffle — one Arrow-batched numpy pass."""
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    out = knn.quantize_int8(e, "vec_id", "embedding")
    return out.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        "q_sum",
        F.round("rmse", 6).alias("rmse"),
    )


# --- deterministic train/val/test split assignment -------------------------


@register(
    "corpus_split_assign",
    f"""
    SELECT doc_id,
           {hash60_sql("CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
           CASE WHEN {hash60_sql("CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'train'
                WHEN {hash60_sql("CAST(doc_id AS VARCHAR)")} % 100 < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def corpus_split_assign(spark, sf_dir):
    """Deterministic hash-based train/val/test assignment (90/5/5): the
    split is a pure function of the stable doc id, so it is reproducible
    across runs, engines and re-partitions — never sample() for splits
    (sampling is partitioning-dependent). Zero shuffles."""
    from openverse_catalog_spark.functions.hashing import hash60

    d = _t(spark, sf_dir, "documents")["documents"]
    bucket = hash60(F.col("doc_id").cast("string")) % 100
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 90, "train").when(bucket < 95, "val")
        .otherwise("test").alias("split"),
    )


# --- repetition profile (Gopher-style quality signal) ----------------------


@register(
    "text_repetition",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS tok
      FROM documents
    ),
    tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
    agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                   count(*) AS n_distinct, max(c) AS max_count
            FROM tc GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_distinct,
           round(1 - CAST(n_distinct AS DOUBLE) / n_tokens, 4) AS dup_frac,
           round(CAST(max_count AS DOUBLE) / n_tokens, 4) AS top_frac
    FROM agg
    """,
)
def text_repetition(spark, sf_dir):
    """Token-repetition quality signals: duplicate-token fraction and
    top-token dominance per doc — one Arrow pass with a Counter per row
    (no explode/shuffle; the oracle's two grouped aggregations are the
    shape we deliberately avoid at scale)."""
    d = _t(spark, sf_dir, "documents")["documents"]
    prof = tx.repetition_profile(d)
    return prof.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(1 - F.col("n_distinct") / F.col("n_tokens"), 4).alias("dup_frac"),
        F.round(F.col("max_count") / F.col("n_tokens"), 4).alias("top_frac"),
    )


# --- benchmark decontamination check ---------------------------------------


def _contamination_oracle() -> str:
    gram = hash60_sql("array_to_string(tk[i:i+4], ' ')")
    tok_cte = (
        "SELECT {id} AS id, list_filter(string_split_regex(lower(text), "
        "'[^a-z0-9]+'), t -> t <> '') AS tk FROM {src}"
    )
    grams = (
        "SELECT DISTINCT id, " + gram + " AS g FROM ("
        "SELECT id, tk, unnest(range(1, greatest(len(tk) - 4, 1) + 1)) AS i "
        "FROM {toks})"
    )
    return f"""
    WITH dtok AS ({tok_cte.format(id='doc_id', src='documents')}),
    btok AS ({tok_cte.format(id='doc_id + 9000000', src='(SELECT * FROM documents WHERE doc_id % 50 = 0)')}),
    dg AS ({grams.format(toks='dtok')}),
    bg AS ({grams.format(toks='btok')}),
    bsz AS (SELECT id AS bench_id, count(*) AS bsz FROM bg GROUP BY 1),
    sh AS (SELECT dg.id AS doc_id, bg.id AS bench_id, count(*) AS n_shared
           FROM dg JOIN bg ON dg.g = bg.g
           GROUP BY 1, 2 HAVING count(*) >= 2)
    SELECT doc_id, bench_id, n_shared,
           round(CAST(n_shared AS DOUBLE) / bsz, 4) AS bench_overlap
    FROM sh JOIN bsz USING (bench_id)
    """


@register("text_contamination", _contamination_oracle())
def text_contamination(spark, sf_dir):
    """Benchmark decontamination: which corpus docs share >= 2 distinct
    word-5-grams with a benchmark set (here: every 50th doc, re-keyed).
    Gram-key equi-join — shuffle scales with gram sets, not doc pairs."""
    d = _t(spark, sf_dir, "documents")["documents"]
    bench = d.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 9_000_000).alias("bench_id"), "text"
    )
    out = dd.contamination_check(d, bench, min_shared=2)
    return out.select(
        "doc_id", "bench_id", "n_shared",
        F.round("bench_overlap", 4).alias("bench_overlap"),
    )


# --- PII pattern flags -----------------------------------------------------

_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PHONE_RE = "\\d{3}[-.]\\d{3}[-.]\\d{4}"


@register(
    "text_pii_flags",
    f"""
    WITH salted AS (
      SELECT doc_id,
             text ||
             CASE WHEN doc_id % 7 = 0
                  THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com now'
                  ELSE '' END ||
             CASE WHEN doc_id % 11 = 0
                  THEN ' call 555-867-5309 or 212.555.0000' ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones,
           (len(regexp_extract_all(t, '{_EMAIL_RE}'))
            + len(regexp_extract_all(t, '{_PHONE_RE}'))) > 0 AS has_pii
    FROM salted
    """,
)
def text_pii_flags(spark, sf_dir):
    """PII pre-filter signals: email/phone pattern counts per doc (the
    redaction pipeline's routing bits). Pure JVM regexp at scan speed —
    the corpus is salted with synthetic matches so both engines exercise
    hit and miss paths."""
    d = _t(spark, sf_dir, "documents")["documents"]
    k = F.col("doc_id")
    t = F.concat(
        F.col("text"),
        F.when(
            k % 7 == 0,
            F.concat(F.lit(" contact user"), k.cast("string"),
                     F.lit("@mail.example.com now")),
        ).otherwise(""),
        F.when(k % 11 == 0, F.lit(" call 555-867-5309 or 212.555.0000"))
        .otherwise(""),
    )
    n_em = F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), 0))
    n_ph = F.size(F.regexp_extract_all(t, F.lit(_PHONE_RE), 0))
    return d.select(
        "doc_id",
        n_em.alias("n_emails"),
        n_ph.alias("n_phones"),
        ((n_em + n_ph) > 0).alias("has_pii"),
    )


# --- dedup funnel: per-stage survivor accounting ---------------------------


def _funnel_oracle() -> str:
    frag, last = _label_prop_sql(4)
    return f"""
    WITH corpus AS ({_CORPUS_SQL}),
    hashed AS (SELECT doc_id, {hash60_sql(_NORM_SQL)} AS h FROM corpus),
    s1k AS (SELECT min(doc_id) AS doc_id FROM hashed GROUP BY h),
    surv1 AS (SELECT c.doc_id, c.text FROM corpus c JOIN s1k USING (doc_id)),
    {_minhash_star_ctes(src="surv1")},
    {frag},
    drops AS (SELECT node FROM {last} WHERE label <> node),
    n0 AS (SELECT count(*) AS c FROM corpus),
    n1 AS (SELECT count(*) AS c FROM surv1),
    n2 AS (SELECT (SELECT c FROM n1) - count(*) AS c FROM drops)
    SELECT '00_ingested' AS stage, c AS n_docs FROM n0
    UNION ALL SELECT '10_exact_dedup' AS stage, c AS n_docs FROM n1
    UNION ALL SELECT '20_near_dedup' AS stage, c AS n_docs FROM n2
    """


@register("dedup_funnel", _funnel_oracle())
def dedup_funnel(spark, sf_dir):
    """The full dedup pipeline as one job with per-stage survivor counts
    (the report a corpus-curation run actually ships): ingested -> exact
    keeper per normalized-text hash -> MinHash-LSH near-dup components,
    non-canonical members dropped. Composes the same operators the
    individual queries pin, so the funnel is oracle-checked end to end."""
    from openverse_catalog_spark.functions.hashing import hash60
    from openverse_catalog_spark.operators.dedupe import normalize_text

    corpus = _corpus(spark, sf_dir)
    # stage 1: exact dedup — keep the smallest doc_id per text hash
    keepers = (
        corpus.select("doc_id", hash60(normalize_text(F.col("text"))).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # materialize once: surv1 feeds three consumers (its own count, the
    # MinHash signature pass, and the anti-join's left side) — without
    # this the scan + hash + groupBy + join lineage runs 3x
    surv1 = corpus.join(keepers, "doc_id").localCheckpoint()
    # stage 2: near-dup components on the exact survivors — star edges
    # (linear per bucket) since only connectivity is consumed
    sigs = dd.minhash_signatures(surv1, "doc_id", "text", _N_SEEDS, _K)
    edges = dd.minhash_lsh_star_edges(sigs, "doc_id", _N_SEEDS, _N_BANDS)
    comps = dd.dup_components_bounded(edges, rounds=4)
    drops = comps.filter(F.col("canonical_id") != F.col("doc_id")).select("doc_id")
    surv2 = surv1.join(drops, "doc_id", "left_anti")

    def _n(df, stage):
        return df.agg(F.count("*").alias("n_docs")).select(
            F.lit(stage).alias("stage"), "n_docs"
        )

    return (
        _n(corpus, "00_ingested")
        .unionAll(_n(surv1, "10_exact_dedup"))
        .unionAll(_n(surv2, "20_near_dedup"))
    )


@register(
    "text_pii_redact",
    f"""
    WITH salted AS (
      SELECT doc_id,
             text ||
             CASE WHEN doc_id % 7 = 0
                  THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com now'
                  ELSE '' END ||
             CASE WHEN doc_id % 11 = 0
                  THEN ' call 555-867-5309 or 212.555.0000' ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           {hash60_sql("regexp_replace(regexp_replace(t, '" + _EMAIL_RE + "', '[EMAIL]', 'g'), '" + _PHONE_RE + "', '[PHONE]', 'g')")} AS redacted_hash,
           length(t) - length(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '[EMAIL]', 'g'), '{_PHONE_RE}', '[PHONE]', 'g')) AS chars_removed
    FROM salted
    """,
)
def text_pii_redact(spark, sf_dir):
    """PII redaction: replace every email/phone match with a placeholder
    token — the write path of the PII pipeline (flags route, this
    rewrites). Pure JVM regexp_replace at scan speed; the oracle compares
    a hash of the redacted text plus the removed-character delta."""
    from openverse_catalog_spark.functions.hashing import hash60

    d = _t(spark, sf_dir, "documents")["documents"]
    k = F.col("doc_id")
    t = F.concat(
        F.col("text"),
        F.when(
            k % 7 == 0,
            F.concat(F.lit(" contact user"), k.cast("string"),
                     F.lit("@mail.example.com now")),
        ).otherwise(""),
        F.when(k % 11 == 0, F.lit(" call 555-867-5309 or 212.555.0000"))
        .otherwise(""),
    )
    red = F.regexp_replace(
        F.regexp_replace(t, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return d.select(
        "doc_id",
        hash60(red).alias("redacted_hash"),
        (F.length(t) - F.length(red)).cast("bigint").alias("chars_removed"),
    )


# --- vocabulary construction / coverage ------------------------------------

_UNNEST_TOKS = (
    "SELECT lang, unnest(list_filter(string_split_regex(lower(text),"
    " '[^a-z0-9]+'), x -> x <> '')) AS tok FROM documents"
)


@register(
    "corpus_vocab_topk",
    f"""
    SELECT tok AS token, count(*) AS cnt
    FROM ({_UNNEST_TOKS})
    GROUP BY tok
    ORDER BY cnt DESC, token
    LIMIT 50
    """,
)
def corpus_vocab_topk(spark, sf_dir):
    """Vocabulary construction: global token counts, top 50 with a
    deterministic (count desc, token) tie-break. The explode multiplies
    rows but stays narrow; the groupBy partially aggregates map-side so
    the shuffle carries one row per distinct token per task — the only
    scalable shape for a 100 TB vocab count."""
    d = _t(spark, sf_dir, "documents")["documents"]
    toks = d.select(F.explode(tx.tokens(F.col("text"))).alias("token"))
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(50)
    )


@register(
    "corpus_oov_rate",
    f"""
    WITH toks AS ({_UNNEST_TOKS}),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
        ORDER BY cnt DESC, tok LIMIT 30
      )
    )
    SELECT t.lang,
           count(*) AS n_tokens,
           round(CAST(count(*) FILTER (WHERE v.tok IS NULL) AS DOUBLE)
                 / count(*), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
    GROUP BY t.lang
    """,
)
def corpus_oov_rate(spark, sf_dir):
    """Vocabulary coverage: per-language fraction of token occurrences
    outside the global top-30 vocab — the OOV metric that decides vocab
    size. The vocab is tiny by construction, so coverage scoring is a
    broadcast join against the exploded token stream; no token shuffle
    beyond the vocab count itself."""
    d = _t(spark, sf_dir, "documents")["documents"]
    toks = d.select("lang", F.explode(tx.tokens(F.col("text"))).alias("tok"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "tok")
        .limit(30)
        .select("tok", F.lit(1).alias("_v"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(F.when(F.col("_v").isNull(), 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("oov_rate"),
        )
    )


# --- incremental dedup: new batch probed against a signature index ---------

_BATCH_COND_SQL = "(doc_id % 5 = 0 OR doc_id >= 3000000)"
_INC_SRC_SQL = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 3000000, substr(text, 16) FROM documents
      WHERE doc_id % 15 = 1
"""


def _incremental_oracle() -> str:
    return f"""
    WITH src AS ({_INC_SRC_SQL}),
    {_minhash_pair_ctes(src="src")},
    batch AS (SELECT doc_id FROM src WHERE {_BATCH_COND_SQL}),
    crossed AS (
      SELECT DISTINCT
             CASE WHEN {_BATCH_COND_SQL.replace("doc_id", "id_a")}
                  THEN id_a ELSE id_b END AS doc_id
      FROM cand_pairs
      WHERE {_BATCH_COND_SQL.replace("doc_id", "id_a")}
            <> {_BATCH_COND_SQL.replace("doc_id", "id_b")}
    )
    SELECT b.doc_id, c.doc_id IS NOT NULL AS is_dup
    FROM batch b LEFT JOIN crossed c ON c.doc_id = b.doc_id
    """


@register("dedup_incremental_batch", _incremental_oracle())
def dedup_incremental_batch(spark, sf_dir):
    """Incremental dedup — the production shape at 100 TB: the corpus
    keeps a persisted minhash-signature index (one signature per doc,
    computed once EVER); each incoming batch is signed and band-probed
    against it. Cost scales with |batch|, never |corpus|^2 and never a
    daily full-corpus re-LSH. Batch = every 5th doc plus near-copies of
    indexed docs, so cross-matches are guaranteed; output flags each
    batch doc as dup-against-index or novel."""
    d = _t(spark, sf_dir, "documents")["documents"]
    near = d.filter(F.col("doc_id") % 15 == 1).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.expr("substr(text, 16)").alias("text"),
    )
    allsrc = d.select("doc_id", "text").unionByName(near)
    is_batch = (F.col("doc_id") % 5 == 0) | (F.col("doc_id") >= 3_000_000)
    index = allsrc.filter(~is_batch)
    batch = allsrc.filter(is_batch)
    index_sigs = dd.minhash_signatures(index, "doc_id", "text", _N_SEEDS, _K)
    batch_sigs = dd.minhash_signatures(batch, "doc_id", "text", _N_SEEDS, _K)
    matches = dd.minhash_lsh_match_index(
        batch_sigs, index_sigs, "doc_id", _N_SEEDS, _N_BANDS
    )
    hit = matches.select(F.col("probe_id").alias("doc_id")).distinct()
    return batch.select("doc_id").join(
        hit.withColumn("_m", F.lit(1)), "doc_id", "left"
    ).select("doc_id", F.col("_m").isNotNull().alias("is_dup"))


# --- end-to-end corpus build: quality -> dedup -> mix -> pack --------------


def _build_funnel_oracle() -> str:
    from openverse_catalog_spark.operators.sampling import (
        keyhash_sql,
        threshold_sql,
    )

    stopwords = ", ".join(repr(w) for w in tx.EN_STOPWORDS)
    tok_sql = (
        "len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
        " t -> t <> ''))"
    )
    return f"""
    WITH corpus AS ({_CORPUS_SQL}),
    qb AS (
      SELECT doc_id, text, source, length(text) AS n,
             length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tk
      FROM corpus
    ),
    qf AS (
      SELECT doc_id, text, source, n, alpha, len(tk) AS ntok,
             len(list_filter(tk, t -> list_contains([{stopwords}], t))) AS stop
      FROM qb
    ),
    q AS (
      SELECT doc_id, text, source FROM qf
      WHERE round((least(n / 200.0, 1.0)
                   + CASE WHEN n > 0 THEN CAST(alpha AS DOUBLE) / n ELSE 0.0 END
                   + least(CASE WHEN ntok > 0 THEN CAST(stop AS DOUBLE) / ntok ELSE 0.0 END * 4.0, 1.0)
                  ) / 3.0, 4) >= 0.5
    ),
    hashed AS (SELECT doc_id, {hash60_sql(_NORM_SQL)} AS h FROM q),
    s2k AS (SELECT min(doc_id) AS doc_id FROM hashed GROUP BY h),
    s2 AS (SELECT q.* FROM q JOIN s2k USING (doc_id)),
    counts AS (SELECT source, count(*) AS nr FROM s2 GROUP BY source),
    need AS (SELECT source, CAST(0.05 AS DOUBLE) / nr AS need FROM counts),
    rates AS (SELECT source, need / (SELECT max(need) FROM need) AS rate FROM need),
    s3 AS (
      SELECT s2.* FROM s2 JOIN rates r ON r.source = s2.source
      WHERE {keyhash_sql("s2.doc_id", "fmix")} < {threshold_sql("r.rate")}
    ),
    toks AS (SELECT source, doc_id, {tok_sql} AS n_tok FROM s3),
    off AS (
      SELECT source, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - n_tok AS start
      FROM toks
    ),
    bins AS (
      SELECT source, CAST(floor(start / 512) AS BIGINT) AS bin,
             sum(n_tok) AS btok
      FROM off GROUP BY source, bin
    )
    SELECT '00_ingested' AS stage, count(*) AS n FROM corpus
    UNION ALL SELECT '10_quality', count(*) FROM q
    UNION ALL SELECT '20_exact_dedup', count(*) FROM s2
    UNION ALL SELECT '30_domain_mix', count(*) FROM s3
    UNION ALL SELECT '40_packed_bins', count(*) FROM bins
    UNION ALL SELECT '41_packed_tokens', CAST(coalesce(sum(btok), 0) AS BIGINT) FROM bins
    """


@register("corpus_build_funnel", _build_funnel_oracle())
def corpus_build_funnel(spark, sf_dir):
    """The whole training-corpus build as ONE oracle-gated job: salted
    ingest -> quality floor -> exact-dedup keepers -> uniform domain mix
    (hash-threshold, broadcast rates) -> per-shard sequence packing,
    reporting per-stage survivor counts plus packed-bin/token totals.
    Composes the individually-pinned operators end to end; every stage
    keeps its scale shape (narrow filters, one keyed shuffle for dedup,
    broadcast mix rates, shard-parallel packing)."""
    from openverse_catalog_spark.functions.hashing import hash60
    from openverse_catalog_spark.operators import packing as pk
    from openverse_catalog_spark.operators import sampling as smp
    from openverse_catalog_spark.operators.dedupe import normalize_text

    corpus = _corpus(spark, sf_dir)
    q = corpus.filter(
        F.round(tx.quality_score(F.col("text")), 4) >= 0.5
    ).localCheckpoint()
    keepers = (
        q.select("doc_id", hash60(normalize_text(F.col("text"))).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s2 = q.join(keepers, "doc_id").localCheckpoint()
    weights = {f"src{i}": 0.05 for i in range(20)}
    s3 = smp.domain_mix(s2, "doc_id", "source", weights, "fmix").localCheckpoint()
    toks = s3.select(
        "source", "doc_id", tx.token_count(F.col("text")).alias("n_tok")
    )
    bins = (
        pk.pack_offsets(toks, "source", "doc_id", "n_tok", 512)
        .groupBy("source", "_bin")
        .agg(F.sum("n_tok").alias("btok"))
        .localCheckpoint()
    )

    def _n(df, stage):
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(stage).alias("stage"), "n"
        )

    toktotal = bins.agg(
        F.coalesce(F.sum("btok"), F.lit(0)).cast("bigint").alias("n")
    ).select(F.lit("41_packed_tokens").alias("stage"), "n")
    return (
        _n(corpus, "00_ingested")
        .unionAll(_n(q, "10_quality"))
        .unionAll(_n(s2, "20_exact_dedup"))
        .unionAll(_n(s3, "30_domain_mix"))
        .unionAll(_n(bins, "40_packed_bins"))
        .unionAll(toktotal)
    )


# --- corpus unigram language-model scoring (perplexity-style quality) ------


@register(
    "text_unigram_nll",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS token
      FROM documents
    ), vocab AS (
      SELECT token, count(*) AS n FROM tok GROUP BY token
    ), tot AS (SELECT sum(n) AS nn FROM vocab)
    SELECT doc_id, count(*) AS n_tokens,
           round(avg(-log2(vocab.n / tot.nn)), 4) AS avg_nll
    FROM tok JOIN vocab ON tok.token = vocab.token CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def text_unigram_nll(spark, sf_dir):
    """Unigram-LM corpus scoring: each doc's mean negative log2
    probability of its tokens under the corpus's own unigram
    distribution — the cheap perplexity proxy data-curation pipelines
    use to rank docs as 'typical' vs 'weird' (gibberish and boilerplate
    both land in the tails). Two aggregations over ONE exploded token
    relation: (a) vocab = groupBy(token).count (map-side partial agg),
    (b) docs re-join the vocab and aggregate per doc_id. The corpus
    total folds in as a 1-row broadcast cross join; the token->vocab
    join is a plain equi-join AQE turns into a broadcast when the vocab
    fits (it does here) and a shuffle join when a 100 TB corpus's
    vocabulary doesn't — nothing in the plan assumes either."""
    d = _t(spark, sf_dir, "documents")["documents"]
    tok = d.select("doc_id", F.explode(tx.tokens(F.col("text"))).alias("token"))
    vocab = tok.groupBy("token").agg(F.count("*").alias("n"))
    total = vocab.agg(F.sum("n").alias("nn"))
    scored = (
        tok.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(-F.log2(F.col("n") / F.col("nn"))), 4).alias("avg_nll"),
        )
    )
    return scored


# --- MMR-diversified retrieval --------------------------------------------


@register(
    "knn_mmr_rerank",
    """
    WITH ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
                FROM embeddings, generate_series(1, 64) AS t(i)),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY vec_id),
    dots AS (SELECT a.vec_id AS query_id, b.vec_id AS cid, sum(a.x * b.x) AS dot
             FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id <> b.vec_id
             WHERE a.vec_id % 25 = 0
             GROUP BY 1, 2),
    scored AS (SELECT query_id, cid, dot / (na.nrm * nb.nrm) AS rel
               FROM dots JOIN norms na ON na.vec_id = query_id
                         JOIN norms nb ON nb.vec_id = cid),
    cand AS (SELECT query_id, cid, rel FROM (
               SELECT query_id, cid, rel,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY rel DESC, cid) AS rn
               FROM scored) WHERE rn <= 6),
    psim AS (SELECT c1.query_id, c1.cid AS a, c2.cid AS b,
                    sum(ea.x * eb.x) / (na.nrm * nb.nrm) AS s
             FROM cand c1
             JOIN cand c2 ON c1.query_id = c2.query_id AND c1.cid <> c2.cid
             JOIN ex ea ON ea.vec_id = c1.cid
             JOIN ex eb ON eb.vec_id = c2.cid AND ea.i = eb.i
             JOIN norms na ON na.vec_id = c1.cid
             JOIN norms nb ON nb.vec_id = c2.cid
             GROUP BY c1.query_id, c1.cid, c2.cid, na.nrm, nb.nrm),
    p1 AS (SELECT query_id, cid, 0.7 * rel AS score FROM (
             SELECT query_id, cid, rel,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY 0.7 * rel DESC, cid) AS rn
             FROM cand) WHERE rn = 1),
    m2 AS (SELECT c.query_id, c.cid,
                  0.7 * c.rel - 0.3 * ps.s AS score
           FROM cand c
           JOIN p1 ON p1.query_id = c.query_id AND c.cid <> p1.cid
           JOIN psim ps ON ps.query_id = c.query_id
                        AND ps.a = c.cid AND ps.b = p1.cid),
    p2 AS (SELECT query_id, cid, score FROM (
             SELECT query_id, cid, score,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, cid) AS rn
             FROM m2) WHERE rn = 1),
    m3 AS (SELECT c.query_id, c.cid,
                  0.7 * c.rel - 0.3 * greatest(s1.s, s2.s) AS score
           FROM cand c
           JOIN p1 ON p1.query_id = c.query_id AND c.cid <> p1.cid
           JOIN p2 ON p2.query_id = c.query_id AND c.cid <> p2.cid
           JOIN psim s1 ON s1.query_id = c.query_id
                        AND s1.a = c.cid AND s1.b = p1.cid
           JOIN psim s2 ON s2.query_id = c.query_id
                        AND s2.a = c.cid AND s2.b = p2.cid),
    p3 AS (SELECT query_id, cid, score FROM (
             SELECT query_id, cid, score,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, cid) AS rn
             FROM m3) WHERE rn = 1)
    SELECT query_id, cid AS neighbor_id, 1 AS mmr_rank, round(score, 6) AS score FROM p1
    UNION ALL
    SELECT query_id, cid, 2, round(score, 6) FROM p2
    UNION ALL
    SELECT query_id, cid, 3, round(score, 6) FROM p3
    """,
)
def knn_mmr_rerank(spark, sf_dir):
    """Diversified retrieval: exact top-6 cosine candidates per query,
    then Maximal-Marginal-Relevance greedy re-rank to 3 (lambda=0.7) —
    the retrieve-then-diversify pattern RAG and curation pipelines run
    so near-duplicate neighbors don't crowd the result list. The greedy
    loop is iterative, but candidates-per-query is bounded (6), so it
    runs in applyInPandas per query group with an N x N sim matrix as
    the only state; the oracle UNROLLS all three greedy selections as
    chained CTEs — value-exact despite the iteration (same pinning
    strategy as the PageRank oracle)."""
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    queries = e.filter(F.col("vec_id") % 25 == 0)
    cand = knn.cosine_topk(e, queries, "vec_id", "embedding", k=6)
    out = knn.mmr_rerank(cand, e.withColumnRenamed("vec_id", "neighbor_id"),
                         lam=0.7, k=3)
    return out.select(
        "query_id", "neighbor_id", "mmr_rank", F.round("score", 6).alias("score")
    )


# --- per-source embedding centroids (corpus drift analytics) ---------------


@register(
    "embed_source_centroids",
    """
    WITH ex AS (
      SELECT e.vec_id, d.source, t.i, CAST(e.embedding[t.i] AS DOUBLE) AS x
      FROM embeddings e
      JOIN documents d ON d.doc_id = e.vec_id,
      generate_series(1, 64) AS t(i)
    ),
    cent AS (SELECT source, i, avg(x) AS c,
                    count(DISTINCT vec_id) AS n_vecs
             FROM ex GROUP BY source, i),
    gc AS (SELECT i, avg(x) AS g FROM ex GROUP BY i)
    SELECT cent.source,
           CAST(max(cent.n_vecs) AS BIGINT) AS n_vecs,
           round(sqrt(sum(cent.c * cent.c)), 6) AS centroid_norm,
           round(sum(cent.c * gc.g)
                 / (sqrt(sum(cent.c * cent.c)) * sqrt(sum(gc.g * gc.g))),
                 6) AS cos_to_global
    FROM cent JOIN gc ON cent.i = gc.i
    GROUP BY cent.source
    """,
)
def embed_source_centroids(spark, sf_dir):
    """Embedding-drift profile: each source's mean embedding (centroid),
    its norm, and its cosine to the global centroid — the monitoring
    query that catches a provider whose embeddings shift (model change,
    content drift) before it pollutes dedup/ANN thresholds. Per-dim
    means via posexplode + groupBy: the shuffle carries (source, dim)
    partial sums — 64 x sources rows, regardless of corpus size."""
    t = _t(spark, sf_dir, "documents", "embeddings")
    ex = (
        t["embeddings"]
        .join(t["documents"].select(F.col("doc_id").alias("vec_id"), "source"), "vec_id")
        .select(
            "vec_id", "source",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("i0", "x"),
        )
        .select("vec_id", "source", (F.col("i0") + 1).alias("i"), "x")
    )
    cent = ex.groupBy("source", "i").agg(
        F.avg("x").alias("c"), F.countDistinct("vec_id").alias("n_vecs")
    )
    glob = ex.groupBy("i").agg(F.avg("x").alias("g"))
    return (
        cent.join(F.broadcast(glob), "i")
        .groupBy("source")
        .agg(
            F.max("n_vecs").cast("bigint").alias("n_vecs"),
            F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias("centroid_norm"),
            F.round(
                F.sum(F.col("c") * F.col("g"))
                / (
                    F.sqrt(F.sum(F.col("c") * F.col("c")))
                    * F.sqrt(F.sum(F.col("g") * F.col("g")))
                ),
                6,
            ).alias("cos_to_global"),
        )
    )


# --- exact-substring (verbatim span) dedup ---------------------------------

_ES_TAIL = " entirely novel appended tail material"
_ES_MAXDF = 10


@register(
    "dedup_exact_substring",
    f"""
    WITH d AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             substr(text, 1, 200) || '{_ES_TAIL}'
      FROM documents WHERE doc_id % 10 = 0
    ),
    w AS (
      SELECT DISTINCT d.doc_id,
             substr(d.text, CAST(j * 32 + 1 AS BIGINT), 64) AS win
      FROM d,
           unnest(range(0, CAST(floor((length(d.text) - 64) / 32) AS BIGINT)
                           + 1)) AS t(j)
      WHERE length(d.text) >= 64
    ),
    keep AS (SELECT win FROM w GROUP BY win HAVING count(*) <= {_ES_MAXDF}),
    wk AS (SELECT w.doc_id, w.win FROM w JOIN keep USING (win))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
    FROM wk a JOIN wk b ON a.win = b.win AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
)
def dedup_exact_substring(spark, sf_dir):
    """Verbatim-span dedup (the exact-substring method): every 10th doc
    reappears under a new id with its first 200 chars copied and a novel
    tail, and the operator finds each (original, derivative) pair by
    their shared 64-char windows at 32-char strides — the copied span
    yields ~5 aligned shared windows, far over the 2-window floor.
    Window generation is one sequence/transform expression (no Python);
    pairs form on an 8-byte window-hash equi-join with a df<=10
    boilerplate cap applied BEFORE the self-join, so the shuffle is
    linear in windows and the pair aggregate is df-bounded — the
    token-level Jaccard operators dilute long copied passages, this one
    is built for them."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    corpus = docs.select("doc_id", "text").unionAll(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.substring("text", 1, 200), F.lit(_ES_TAIL)).alias("text"),
        )
    )
    return dd.exact_substring_pairs(
        corpus, "doc_id", "text", width=64, stride=32,
        max_df=_ES_MAXDF, min_shared=2,
    )


# --- model-based quality filtering (classifier inference as expression) ----

_CLF_W = tx.QUALITY_CLF_WEIGHTS
_CLF_B = tx.QUALITY_CLF_BIAS


@register(
    "text_quality_classifier",
    f"""
    WITH base AS (
      SELECT doc_id, length(text) AS n,
             length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha,
             length(regexp_replace(text, '[^.,;:!?''\\-]', '', 'g')) AS punct,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tk
      FROM documents
    ),
    feats AS (
      SELECT doc_id,
             least(n / 200.0, 1.0) AS ls,
             CASE WHEN n > 0 THEN CAST(alpha AS DOUBLE) / n ELSE 0.0 END AS ar,
             least(CASE WHEN len(tk) > 0
                        THEN CAST(len(list_filter(tk, t -> list_contains([{", ".join(repr(w) for w in tx.EN_STOPWORDS)}], t))) AS DOUBLE) / len(tk)
                        ELSE 0.0 END * 4.0, 1.0) AS ss,
             CASE WHEN n > 0 THEN CAST(punct AS DOUBLE) / n ELSE 0.0 END AS pr
      FROM base
    ),
    scored AS (
      SELECT doc_id,
             round(1.0 / (1.0 + exp(-({_CLF_B} + {_CLF_W[0]} * ls
                                      + {_CLF_W[1]} * ar + {_CLF_W[2]} * ss
                                      + {_CLF_W[3]} * pr))), 6) AS clf_score
      FROM feats
    )
    SELECT doc_id, clf_score FROM scored WHERE clf_score >= 0.75
    """,
)
def text_quality_classifier(spark, sf_dir):
    """Classifier-based quality filtering (the CCNet/fastText stage of a
    corpus build) reduced to inference: a logistic model over the
    quality feature vector, with the weights as driver-held literals
    folded into one codegen'd projection — scoring is a narrow
    expression pass at any corpus size, no UDF, no shuffle, and a model
    refresh is a literal swap. Keeps docs the model scores >= 0.75; the
    oracle recomputes features, logits and the sigmoid exactly."""
    d = _t(spark, sf_dir, "documents")["documents"]
    scored = d.select(
        "doc_id",
        F.round(tx.classifier_score(F.col("text")), 6).alias("clf_score"),
    )
    return scored.filter(F.col("clf_score") >= 0.75)


# --- random-projection dimensionality reduction ----------------------------

_RP_DIM = 8


def _rp_oracle() -> str:
    ys = ",\n           ".join(
        f"round(max(CASE WHEN p = {p} THEN y END), 6) AS y{p}"
        for p in range(_RP_DIM)
    )
    return f"""
    WITH ex AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, generate_series(1, 64) AS t(i)
    ),
    pl AS (
      SELECT ps.p, ds.d,
             CAST(('0x' || substr(md5('rp|' || CAST(ps.p AS VARCHAR) || '|'
                   || CAST(ds.d AS VARCHAR)), 1, 8)) AS BIGINT)
               / 2147483648.0 - 1.0 AS w
      FROM generate_series(0, {_RP_DIM - 1}) AS ps(p),
           generate_series(0, 63) AS ds(d)
    ),
    proj AS (
      SELECT e.vec_id, pl.p, sum(e.x * pl.w) AS y
      FROM ex e JOIN pl ON pl.d = e.i - 1
      GROUP BY 1, 2
    )
    SELECT vec_id,
           {ys}
    FROM proj GROUP BY vec_id
    """


@register("embed_project_rp", _rp_oracle())
def embed_project_rp(spark, sf_dir):
    """Random-projection dimensionality reduction (64 -> 8 dims): one
    GEMM per Arrow batch against an md5-derived JL matrix — the cheap
    front half of ANN/clustering at 100 TB, where every downstream
    operator then runs on an 8x narrower vector. Deterministic planes
    (same derivation as the sign-LSH oracle) let DuckDB rebuild the
    exact projection, so even the dimensionality reducer is value-gated.
    No shuffle: a streaming Arrow pass at any corpus size."""
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    out = knn.random_project(e, "vec_id", "embedding", out_dim=_RP_DIM)
    return out.select(
        "vec_id", *[F.round(f"y{p}", 6).alias(f"y{p}") for p in range(_RP_DIM)]
    )


# --- n-gram containment (subset / quote detection) -------------------------


@register(
    "dedup_ngram_containment",
    """
    WITH d AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 3000000, substr(text, 1, 150)
      FROM documents WHERE doc_id % 8 = 0
    ),
    toks AS (SELECT doc_id,
                    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tk
             FROM d),
    allgrams AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS g
                 FROM (SELECT doc_id, tk,
                              unnest(range(1, greatest(len(tk) - 2, 1) + 1)) AS i
                       FROM toks)),
    dfc AS (SELECT g, count(*) AS df FROM allgrams GROUP BY 1),
    grams AS (SELECT allgrams.* FROM allgrams JOIN dfc USING (g) WHERE df <= 64),
    sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(CAST(i AS DOUBLE) / least(sa.sz, sb.sz), 4) AS containment
    FROM inter JOIN sizes sa ON sa.doc_id = id_a
               JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(i AS DOUBLE) / least(sa.sz, sb.sz) >= 0.9
    """,
)
def dedup_ngram_containment(spark, sf_dir):
    """Asymmetric containment |A∩B| / min(|A|,|B|) over word-3-grams:
    every 8th doc reappears truncated to its first 150 chars — a pure
    SUBSET whose Jaccard against its parent is small (the union is the
    parent) but whose containment is ~1, so resemblance dedup never
    fires and this does. The quote/excerpt detector of the dedup
    family; same scale shape as the Jaccard operator (compact gram
    keys, df-capped stop-grams dropped before the self-join)."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    corpus = docs.select("doc_id", "text").unionAll(
        docs.filter(F.col("doc_id") % 8 == 0).select(
            (F.col("doc_id") + 3_000_000).alias("doc_id"),
            F.substring("text", 1, 150).alias("text"),
        )
    )
    out = dd.ngram_containment_pairs(
        corpus, "doc_id", "text", n=3, max_df=64, min_containment=0.9
    )
    return out.select(
        "id_a", "id_b", F.round("containment", 4).alias("containment")
    )


@register(
    "text_token_entropy",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS tok
      FROM documents
    ),
    tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
    n AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n FROM tc GROUP BY 1)
    SELECT tc.doc_id,
           round(-sum((c / n.n) * ln(c / n.n)), 4) AS entropy
    FROM tc JOIN n ON n.doc_id = tc.doc_id
    GROUP BY tc.doc_id
    """,
)
def text_token_entropy(spark, sf_dir):
    """Shannon entropy of each document's token distribution — the
    whole-distribution diversity signal that catches keyword stuffing
    and template text repetition ratios miss. One row-local Arrow pass,
    no shuffle at any corpus size."""
    d = _t(spark, sf_dir, "documents")["documents"]
    out = tx.token_entropy(d, "doc_id", "text")
    return out.select("doc_id", F.round("entropy", 4).alias("entropy"))


@register(
    "knn_cosine_radius",
    """
    WITH ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
                FROM embeddings, generate_series(1, 64) AS t(i)),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY vec_id),
    dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                    sum(a.x * b.x) AS dot
             FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id <> b.vec_id
             WHERE a.vec_id % 20 = 0
             GROUP BY 1, 2)
    SELECT query_id, neighbor_id,
           round(dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots JOIN norms na ON na.vec_id = query_id
              JOIN norms nb ON nb.vec_id = neighbor_id
    WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.35
    """,
)
def knn_cosine_radius(spark, sf_dir):
    """Radius search (all neighbors at cosine >= 0.35 for every 20th
    vector as the query set): the fixed-similarity companion to the
    top-k query, and the cheaper plan — no per-query rank window means
    ZERO shuffles, one broadcast-GEMM Arrow pass over the corpus."""
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    q = e.filter(F.col("vec_id") % 20 == 0)
    out = knn.cosine_radius(e, q, threshold=0.35)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine")
    )


@register(
    "text_readability",
    """
    WITH f AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '')) AS words,
             greatest(len(list_filter(string_split_regex(text, '[.!?]+'),
                                      s -> trim(s) <> '')), 1) AS sentences,
             len(list_filter(string_split_regex(lower(text), '[^aeiouy]+'),
                             s -> s <> '')) AS syll
      FROM documents
    )
    SELECT doc_id,
           round(206.835 - 1.015 * (CAST(words AS DOUBLE) / sentences)
                         - 84.6 * (CAST(syll AS DOUBLE) / words), 2)
             AS flesch
    FROM f WHERE words > 0
    """,
)
def text_readability(spark, sf_dir):
    """Flesch reading-ease per document (vowel-group syllable heuristic,
    [.!?]-segment sentences) — the classic prose-complexity signal next
    to the quality heuristics; used to floor/band corpora by reading
    level. One narrow codegen'd projection, no UDF, no shuffle."""
    d = _t(spark, sf_dir, "documents")["documents"]
    out = d.select(
        "doc_id", F.round(tx.readability_flesch(F.col("text")), 2).alias("flesch")
    )
    return out.filter(F.col("flesch").isNotNull())


# --- bigram-LM corpus scoring (interpolated perplexity proxy) --------------


@register(
    "text_bigram_nll",
    """
    WITH tl AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    tok AS (
      SELECT doc_id, i, t[i] AS token
      FROM tl, unnest(range(1, len(t) + 1)) AS u(i)
    ),
    uni AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
    tot AS (SELECT sum(n) AS nn FROM uni),
    bigrams AS (
      SELECT a.doc_id, a.token AS prev, b.token AS cur
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
    ),
    big AS (SELECT prev, cur, count(*) AS npc FROM bigrams GROUP BY prev, cur),
    ctx AS (SELECT prev, sum(npc) AS np FROM big GROUP BY prev)
    SELECT g.doc_id, count(*) AS n_bigrams,
           round(avg(-log2(0.75 * (big.npc / ctx.np)
                           + 0.25 * (u.n / tot.nn))), 4) AS avg_nll
    FROM bigrams g
    JOIN big ON big.prev = g.prev AND big.cur = g.cur
    JOIN ctx ON ctx.prev = g.prev
    JOIN uni u ON u.token = g.cur
    CROSS JOIN tot
    GROUP BY g.doc_id
    """,
)
def text_bigram_nll(spark, sf_dir):
    """Interpolated bigram-LM scoring — the KenLM-shaped quality filter
    one rung above text_unigram_nll: each doc's mean -log2 of
    P(w_i | w_{i-1}) = 0.75 * c(prev,cur)/c(prev,.) + 0.25 * c(cur)/N
    under the corpus's own counts. Docs whose word ORDER is unusual
    (shuffled text, keyword soup) score high even when their unigrams
    are ordinary — exactly what the unigram proxy cannot see. Plan:
    tokens posexplode once; bigram positions come from ONE lag window
    (one doc_id shuffle — the oracle's equivalent self-join would
    shuffle the token relation twice); count tables aggregate with
    map-side partials; the scoring joins are plain equi-joins AQE
    broadcasts when the vocab fits and shuffles when a 100 TB corpus's
    doesn't. Docs with < 2 tokens have no bigrams and are absent, as
    in any n-gram LM."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")["documents"]
    tok = d.select(
        "doc_id", F.posexplode(tx.tokens(F.col("text"))).alias("pos", "token")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big_rel = (
        tok.select(
            "doc_id",
            F.lag("token").over(w).alias("prev"),
            F.col("token").alias("cur"),
        )
        .filter(F.col("prev").isNotNull())
        .localCheckpoint(eager=False)  # feeds counts AND scoring
    )
    uni = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    tot = uni.agg(F.sum("n").alias("nn"))
    big = big_rel.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("npc"))
    ctx = big.groupBy("prev").agg(F.sum("npc").alias("np"))
    p = 0.75 * (F.col("npc") / F.col("np")) + 0.25 * (F.col("n") / F.col("nn"))
    return (
        big_rel.join(big, ["prev", "cur"])
        .join(ctx, ["prev"])
        .join(uni.withColumnRenamed("token", "cur"), ["cur"])
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log2(p)), 4).alias("avg_nll"),
        )
    )


# --- per-group fixed-size doc cap -------------------------------------------


def _group_caps_oracle() -> str:
    from openverse_catalog_spark.operators.sampling import keyhash_sql

    return f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {keyhash_sql("doc_id", "gcap")}, doc_id
             ) AS rn
      FROM documents) WHERE rn <= 120
    """


@register("sample_group_caps", _group_caps_oracle())
def sample_group_caps(spark, sf_dir):
    """Per-language fixed-size doc cap (at most K docs per group, drawn
    uniformly in deterministic hash order) — the doc-count sibling of
    corpus_token_budget_cap and the usual spec for balanced corpora.
    One keyed window shuffle; reproducible on any partitioning."""
    from openverse_catalog_spark.operators.sampling import group_capped_sample

    d = _t(spark, sf_dir, "documents")["documents"]
    return group_capped_sample(d, "lang", 120, "doc_id").select("doc_id", "lang")


@register(
    "text_self_repeat_trim",
    f"""
    WITH tl AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id, i,
             {hash60_sql("array_to_string(list_slice(t, i, i + 4), ' ')")} AS g
      FROM tl, unnest(range(1, greatest(len(t) - 4, 0) + 1)) AS u(i)
    ),
    c AS (
      SELECT doc_id, min(CASE WHEN i > mi THEN i END) AS cut
      FROM (SELECT doc_id, i, g,
                   min(i) OVER (PARTITION BY doc_id, g) AS mi FROM g)
      GROUP BY doc_id
    )
    SELECT tl.doc_id,
           len(t) AS n_tokens,
           coalesce(c.cut - 1, len(t)) AS kept_tokens,
           array_to_string(list_slice(t, 1, coalesce(c.cut - 1, len(t))), ' ')
             AS kept_text
    FROM tl LEFT JOIN c USING (doc_id)
    """,
)
def text_self_repeat_trim(spark, sf_dir):
    """Intra-document repetition trimming: each doc is truncated at the
    first word 5-gram that repeats an earlier 5-gram of the SAME doc —
    the self-repeat member of the dedup family (generated/boilerplate
    loops), complementing the cross-doc operators. Narrow gram explode
    (token arrays never ride the shuffle), (doc, gram) first-occurrence
    window, per-doc earliest-repeat aggregate, one join back to slice.
    The oracle replays the identical construction and value-checks the
    kept text itself."""
    d = _t(spark, sf_dir, "documents")["documents"]
    return dd.self_repeat_trim(d, "doc_id", "text", n=5)


def _minhash_estimate_oracle() -> str:
    agree = " + ".join(
        f"(CASE WHEN a.mh_{s} = b.mh_{s} THEN 1 ELSE 0 END)"
        for s in range(_N_SEEDS)
    )
    return f"""
    WITH {_minhash_pair_ctes()},
    sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT p.id_a, p.id_b, count(*) AS i
      FROM cand_pairs p
      JOIN sh s1 ON s1.doc_id = p.id_a
      JOIN sh s2 ON s2.doc_id = p.id_b AND s2.sh = s1.sh
      GROUP BY p.id_a, p.id_b
    )
    SELECT p.id_a, p.id_b,
           round(({agree}) / {float(_N_SEEDS)!r}, 4) AS est_jaccard,
           round(coalesce(i.i, 0)
                 / (za.nsh + zb.nsh - coalesce(i.i, 0)), 6) AS exact_jaccard
    FROM cand_pairs p
    JOIN mh a ON a.doc_id = p.id_a
    JOIN mh b ON b.doc_id = p.id_b
    LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
    JOIN sizes za ON za.doc_id = p.id_a
    JOIN sizes zb ON zb.doc_id = p.id_b
    """


@register("dedup_minhash_estimate", _minhash_estimate_oracle())
def dedup_minhash_estimate(spark, sf_dir):
    """MinHash estimator calibration: for every LSH candidate pair, the
    signature-agreement Jaccard ESTIMATE (agreeing minhashes / 16 — the
    number the sketch promises) next to the EXACT shingle-set Jaccard —
    the audit that tells you whether the sketch's bands/rows are tuned
    for the corpus before trusting it at 100 TB. Signatures compute
    once (lazy checkpoint feeds both the pair join and the agreement
    join); the exact side is a shingle equi-join restricted to
    candidate pairs, never the full pair space."""
    from openverse_catalog_spark.operators.dedupe import shingles_expr

    corpus = _corpus(spark, sf_dir)
    sigs = dd.minhash_signatures(
        corpus, "doc_id", "text", _N_SEEDS, _K
    ).localCheckpoint(eager=False)
    pairs = dd.minhash_lsh_pairs(sigs, "doc_id", _N_SEEDS, _N_BANDS)
    a = sigs.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh_{s}").alias(f"a{s}") for s in range(_N_SEEDS)],
    )
    b = sigs.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh_{s}").alias(f"b{s}") for s in range(_N_SEEDS)],
    )
    agree = sum(
        (F.col(f"a{s}") == F.col(f"b{s}")).cast("int") for s in range(_N_SEEDS)
    )
    est = pairs.join(a, "id_a").join(b, "id_b").select(
        "id_a", "id_b", F.round(agree / _N_SEEDS, 4).alias("est_jaccard")
    )
    sh = corpus.select(
        "doc_id",
        F.explode(F.array_distinct(shingles_expr(F.col("text"), _K))).alias("sh"),
    ).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nsh"))
    inter = (
        pairs.join(sh.withColumnRenamed("doc_id", "id_a"), "id_a")
        .join(
            sh.select(F.col("doc_id").alias("id_b"), F.col("sh")),
            ["id_b", "sh"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        est.join(inter, ["id_a", "id_b"], "left")
        .join(sizes.withColumnRenamed("doc_id", "id_a")
              .withColumnRenamed("nsh", "na"), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"),
                           F.col("nsh").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            "est_jaccard",
            F.round(
                F.coalesce(F.col("i"), F.lit(0))
                / (F.col("na") + F.col("nb") - F.coalesce(F.col("i"), F.lit(0))),
                6,
            ).alias("exact_jaccard"),
        )
    )


def _embed_funnel_oracle() -> str:
    frag, last = _label_prop_sql(3)
    return f"""
    WITH {_EMBED_SX_SQL},
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM sx GROUP BY vec_id),
    dots AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x * b.x) AS dot
             FROM sx a JOIN sx b ON a.i = b.i AND a.vec_id < b.vec_id
             GROUP BY 1, 2),
    cand_pairs AS (
      SELECT id_a, id_b
      FROM dots JOIN norms na ON na.vec_id = id_a
                JOIN norms nb ON nb.vec_id = id_b
      WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.9
    ),
    {frag}
    SELECT node AS vec_id, label AS canonical_id FROM {last}
    """


@register("dedup_embedding_funnel", _embed_funnel_oracle())
def dedup_embedding_funnel(spark, sf_dir):
    """Embedding dedup END TO END — the multimodal sibling of the text
    keeper pipeline: exact cosine>=0.9 pairs via distributed triangle
    block-pairs (no broadcast, no driver collect), then bounded
    min-label propagation assigns every near-dup embedding its
    canonical survivor. Pair graphs from exact thresholds are cliques
    per cluster, so 3 rounds converge. The keeper set is what an image/
    embedding dedup job actually ships."""
    pairs = knn.cosine_near_dup_pairs_blocked(
        _embed_corpus(spark, sf_dir), "vec_id", "embedding", threshold=0.9,
        n_blocks=8,
    )
    comps = dd.dup_components_bounded(pairs.select("id_a", "id_b"), rounds=3)
    return comps.select(
        F.col("doc_id").alias("vec_id"), "canonical_id"
    )


_GOPHER_STOPS = ("the", "and", "of", "to", "a", "in", "is", "that")
_GOPHER_STOPS_SQL = ", ".join(f"'{w}'" for w in _GOPHER_STOPS)


@register(
    "text_gopher_rules",
    f"""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             CASE WHEN len(toks) > 0
                  THEN round(CAST(len(array_to_string(toks, '')) AS DOUBLE)
                             / len(toks), 4) ELSE 0.0 END AS mean_word_len,
             CASE WHEN len(toks) > 0
                  THEN round((CAST(length(text)
                               - length(replace(text, '#', '')) AS DOUBLE)
                              + (length(text)
                                 - length(replace(text, '...', ''))) / 3)
                             / len(toks), 6) ELSE 0.0 END AS symbol_ratio,
             len(list_distinct(list_filter(
                 toks, x -> x IN ({_GOPHER_STOPS_SQL})))) AS n_stop_distinct
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, n_stop_distinct,
           (n_words BETWEEN 50 AND 100000)
           AND (mean_word_len BETWEEN 3 AND 10)
           AND symbol_ratio <= 0.1
           AND n_stop_distinct >= 2 AS admitted
    FROM m
    """,
)
def text_gopher_rules(spark, sf_dir):
    """The Gopher document-admission ruleset (Rae et al.) as one
    expression-only report: word-count bounds [50, 100k], mean word
    length [3, 10], symbol-to-word ratio (# and ellipsis) <= 0.1, and
    at least 2 distinct stopwords — per-rule inputs surfaced so a
    curation run can see WHY a doc was rejected, not just that it was.
    (The line-shape rules — bullet starts, ellipsis line ends — need
    newline structure this corpus lacks; they are the same expression
    pattern over split(text, '\\n').) No UDFs, no shuffle: a narrow
    projection Catalyst pushes straight onto the scan."""
    d = _t(spark, sf_dir, "documents")["documents"]
    toks = tx.tokens(F.col("text"))
    n = F.size(toks)
    mean_wl = F.when(
        n > 0,
        F.round(
            F.aggregate(
                toks, F.lit(0.0), lambda acc, x: acc + F.length(x)
            ) / n,
            4,
        ),
    ).otherwise(F.lit(0.0))
    hashes = F.length("text") - F.length(F.regexp_replace("text", r"#", ""))
    dots = (
        F.length("text") - F.length(F.regexp_replace("text", r"\.\.\.", ""))
    ) / 3
    symbol_ratio = F.when(
        n > 0, F.round((hashes + dots) / n.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    stops = F.size(
        F.array_distinct(F.filter(toks, lambda x: x.isin(*_GOPHER_STOPS)))
    )
    out = d.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        stops.cast("long").alias("n_stop_distinct"),
    )
    return out.withColumn(
        "admitted",
        F.col("n_words").between(50, 100000)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("n_stop_distinct") >= 2),
    )


# --- BPE vocabulary induction + encode -------------------------------------

_BPE_MERGES = 10

_BPE_WORDS_SQL = """
    words AS (
      SELECT word, count(*) AS cnt FROM (
        SELECT unnest(string_split_regex(
                 trim(regexp_replace(lower(text), '[^a-z ]', ' ', 'g')),
                 '\\s+')) AS word
        FROM documents
      ) WHERE word <> '' GROUP BY word
    ),
    r0 AS (
      SELECT word, cnt,
             array_to_string(
               list_transform(range(1, len(word) + 1), i -> word[i]),
               ' ') || ' _' AS toks
      FROM words
    )
"""


def _bpe_round_sql(r: int) -> str:
    """One BPE round as CTEs: pair counts over round r-1, the single
    best pair (count desc, pair asc — the tie-break the Spark side
    uses), and the greedy left-to-right re-tokenization via
    list_reduce (same fold the Spark aggregate() runs)."""
    return f"""
    p{r} AS (
      SELECT pair, sum(cnt) AS n FROM (
        SELECT unnest(list_transform(range(1, len(t)),
                      i -> t[i] || ' ' || t[i + 1])) AS pair, cnt
        FROM (SELECT string_split(toks, ' ') AS t, cnt FROM r{r - 1})
      ) GROUP BY pair
    ),
    b{r} AS (
      SELECT pair, n,
             string_split(pair, ' ')[1] AS a,
             string_split(pair, ' ')[2] AS b
      FROM p{r} ORDER BY n DESC, pair LIMIT 1
    ),
    r{r} AS (
      SELECT w.word, w.cnt,
             list_reduce(string_split(w.toks, ' '), (acc, x) ->
               CASE WHEN (acc = bb.a OR ends_with(acc, ' ' || bb.a))
                         AND x = bb.b
                    THEN left(acc, len(acc) - len(bb.a)) || bb.a || bb.b
                    ELSE acc || ' ' || x END) AS toks
      FROM r{r - 1} w CROSS JOIN b{r} bb
    )
"""


def _bpe_vocab_oracle(num_merges: int = _BPE_MERGES) -> str:
    rounds = "".join(
        "," + _bpe_round_sql(r) for r in range(1, num_merges + 1)
    )
    emits = "\n    UNION ALL\n".join(
        f"""    SELECT CAST({r} AS BIGINT) AS step, a, b,
               a || b AS merged, CAST(n AS BIGINT) AS n FROM b{r}"""
        for r in range(1, num_merges + 1)
    )
    return f"WITH {_BPE_WORDS_SQL} {rounds}\n{emits}"


def _bpe_encode_oracle(num_merges: int = _BPE_MERGES) -> str:
    rounds = "".join(
        "," + _bpe_round_sql(r) for r in range(1, num_merges + 1)
    )
    return f"""
    WITH {_BPE_WORDS_SQL} {rounds},
    dw AS (
      SELECT doc_id, i, ws[i] AS word FROM (
        SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM (
          SELECT doc_id,
                 string_split_regex(
                   trim(regexp_replace(lower(text), '[^a-z ]', ' ', 'g')),
                   '\\s+') AS ws
          FROM documents)
      ) WHERE ws[i] <> ''
    ),
    enc AS (
      SELECT dw.doc_id, dw.i, r.toks
      FROM dw JOIN r{num_merges} r ON dw.word = r.word
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(len(string_split(toks, ' '))) AS BIGINT) AS n_tokens,
           md5(string_agg(toks, ' ' ORDER BY i)) AS toks_md5
    FROM enc GROUP BY doc_id
"""


@register("corpus_bpe_vocab", _bpe_vocab_oracle())
def corpus_bpe_vocab(spark, sf_dir):
    """BPE vocabulary induction over the documents corpus: 10 merge
    rounds, each = ONE vocab-scale pair-count aggregation (map-side
    combine, one keyed shuffle over the DISTINCT-WORD table, never the
    corpus) + a 1-row collect of the best pair + one codegen'd
    aggregate() fold re-tokenizing the words. Deterministic tie-break
    (count desc, pair asc). The oracle replays every round in SQL
    (list_reduce folds) and must land on the identical merge table —
    operator operators/bpe.py."""
    from openverse_catalog_spark.operators.bpe import (
        bpe_learn,
        word_frequencies,
    )

    d = _t(spark, sf_dir, "documents")["documents"]
    merges, _ = bpe_learn(word_frequencies(d), num_merges=_BPE_MERGES)
    return literal_df(spark, 
        [
            (m["step"], m["a"], m["b"], m["merged"], int(m["n"]))
            for m in merges
        ],
        "step long, a string, b string, merged string, n long",
    )


@register("corpus_bpe_encode", _bpe_encode_oracle())
def corpus_bpe_encode(spark, sf_dir):
    """Encode the corpus with the learned BPE vocabulary: the trained
    word->tokens dictionary (vocab-sized) broadcast-joins onto the
    exploded corpus — no per-document folding, no shuffle of the text
    — and per-document token counts + the md5 of the full token string
    come from one grouped aggregation. The oracle re-learns the same
    merges and encodes via the same join."""
    from openverse_catalog_spark.operators.bpe import (
        bpe_encode,
        bpe_learn,
        word_frequencies,
    )

    d = _t(spark, sf_dir, "documents")["documents"]
    merges, tokenized = bpe_learn(
        word_frequencies(d), num_merges=_BPE_MERGES
    )
    enc = bpe_encode(d, "text", tokenized, merges=merges)
    return enc.select(
        "doc_id",
        "n_words",
        "n_tokens",
        F.md5(F.col("toks")).alias("toks_md5"),
    )


def _ivf_pq_oracle(
    nprobe: int = 2,
    centroid_mod: int = 40,
    codebook_mod: int = 25,
    pq_m: int = 8,
    query_filter: str = "vec_id % 20 = 0",
    shortlist: int = 10,
    k: int = 3,
    residual: bool = False,
    corpus_sql: str = "SELECT vec_id, embedding FROM embeddings",
) -> str:
    """DuckDB replay of the FULL IVF-PQ pipeline: normalized expansion,
    IVF assignment + probing (as _ivf_oracle), per-subspace codeword
    assignment (L2, d2 rounded to 9 before the argmin tiebreak —
    matching _pq_encode), ADC scoring as the sum of per-subspace
    query-codeword dots, shortlist by round(adc, 9), exact re-rank.
    ``residual=True`` replays the FAISS-style residual encoding: the
    codebook sample and every corpus vector quantize ``x - c(x)`` (the
    assigned normalized centroid subtracted), and ADC adds the
    query-centroid dot back per probed list."""
    dsub = 64 // pq_m
    if residual:
        enc_src = """
    ncx AS (SELECT vec_id AS centroid_id, i, x FROM nx
            WHERE vec_id % {centroid_mod} = 0),
    rx AS (SELECT v.vec_id, v.i, v.x - cn.x AS x
           FROM nx v JOIN assign a ON a.neighbor_id = v.vec_id
                     JOIN ncx cn ON cn.centroid_id = a.centroid_id
                                AND cn.i = v.i),""".format(
            centroid_mod=centroid_mod
        )
        enc_tbl = "rx"
        cand_cols = "p.query_id, p.centroid_id, a.neighbor_id"
        adc_final = f"""
    adc0 AS (SELECT cand.query_id, cand.neighbor_id, cand.centroid_id,
                    sum(q.x * c.x) AS cdot
            FROM cand
            JOIN codes kk ON kk.vec_id = cand.neighbor_id
            JOIN cw c ON c.cw_id = kk.cw_id
                     AND ((c.i - 1) // {dsub}) = kk.s
            JOIN nx q ON q.vec_id = cand.query_id AND q.i = c.i
            GROUP BY 1, 2, 3),
    adc AS (SELECT a0.query_id, a0.neighbor_id, a0.cdot + x.c AS adc
            FROM adc0 a0 JOIN acos x ON x.vec_id = a0.query_id
                                    AND x.centroid_id = a0.centroid_id),"""
    else:
        enc_src = ""
        enc_tbl = "nx"
        cand_cols = "p.query_id, a.neighbor_id"
        adc_final = f"""
    adc AS (SELECT cand.query_id, cand.neighbor_id, sum(q.x * c.x) AS adc
            FROM cand
            JOIN codes kk ON kk.vec_id = cand.neighbor_id
            JOIN cw c ON c.cw_id = kk.cw_id
                     AND ((c.i - 1) // {dsub}) = kk.s
            JOIN nx q ON q.vec_id = cand.query_id AND q.i = c.i
            GROUP BY 1, 2),"""
    return f"""
    WITH corpus AS ({corpus_sql}),
    ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
                FROM corpus, generate_series(1, 64) AS t(i)),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY vec_id),
    nx AS (SELECT e.vec_id, e.i, e.x / n.nrm AS x
           FROM ex e JOIN norms n USING (vec_id)),
    cex AS (SELECT vec_id AS centroid_id, i, x FROM ex
            WHERE vec_id % {centroid_mod} = 0),
    adot AS (SELECT e.vec_id, c.centroid_id, sum(e.x * c.x) AS dot
             FROM ex e JOIN cex c ON e.i = c.i GROUP BY 1, 2),
    acos AS (SELECT adot.vec_id, adot.centroid_id,
                    dot / (n1.nrm * n2.nrm) AS c
             FROM adot JOIN norms n1 ON n1.vec_id = adot.vec_id
                       JOIN norms n2 ON n2.vec_id = adot.centroid_id),
    assign AS (SELECT vec_id AS neighbor_id, centroid_id FROM (
                 SELECT vec_id, centroid_id,
                        row_number() OVER (PARTITION BY vec_id
                                           ORDER BY c DESC, centroid_id) AS r
                 FROM acos) WHERE r = 1),
    probe AS (SELECT vec_id AS query_id, centroid_id FROM (
                SELECT vec_id, centroid_id,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY c DESC, centroid_id) AS r
                FROM acos WHERE {query_filter}) WHERE r <= {nprobe}),
    cand AS (SELECT {cand_cols}
             FROM probe p JOIN assign a USING (centroid_id)
             WHERE p.query_id <> a.neighbor_id),{enc_src}
    cw AS (SELECT vec_id AS cw_id, i, x FROM {enc_tbl}
           WHERE vec_id % {codebook_mod} = 0),
    pqd AS (SELECT v.vec_id, c.cw_id,
                   ((v.i - 1) // {dsub}) AS s,
                   sum((v.x - c.x) * (v.x - c.x)) AS d2
            FROM {enc_tbl} v JOIN cw c ON v.i = c.i
            GROUP BY 1, 2, 3),
    codes AS (SELECT vec_id, s, cw_id FROM (
                SELECT vec_id, s, cw_id,
                       row_number() OVER (PARTITION BY vec_id, s
                                          ORDER BY round(d2, 9), cw_id) AS r
                FROM pqd) WHERE r = 1),{adc_final}
    short AS (SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY round(adc, 9) DESC,
                                                   neighbor_id) AS r
                FROM adc) WHERE r <= {shortlist}),
    cdot AS (SELECT s.query_id, s.neighbor_id, sum(qa.x * nb.x) AS dot
             FROM short s JOIN ex qa ON qa.vec_id = s.query_id
                          JOIN ex nb ON nb.vec_id = s.neighbor_id
                                    AND nb.i = qa.i
             GROUP BY 1, 2),
    scored AS (SELECT query_id, neighbor_id,
                      dot / (na.nrm * nb.nrm) AS cosine
               FROM cdot JOIN norms na ON na.vec_id = cdot.query_id
                         JOIN norms nb ON nb.vec_id = cdot.neighbor_id),
    ranked AS (SELECT query_id, neighbor_id, cosine,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY round(cosine, 9) DESC,
                                                  neighbor_id) AS rank
               FROM scored)
    SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
    FROM ranked WHERE rank <= {k}
    """


@register("knn_ivf_pq", _ivf_pq_oracle())
def knn_ivf_pq(spark, sf_dir):
    """IVF-PQ — product-quantized inverted lists, the index layout a
    100 TB vector corpus actually needs (FAISS IVFPQ): the persisted
    lists hold pq_m=8 codes per vector instead of 64 raw doubles
    (~64x fewer probe-scan bytes), queries score candidates by ADC
    (per-subspace query-codeword dot lookups), and only the
    top-shortlist candidates per query get the exact cosine re-rank
    against raw vectors. Codebooks are deterministic id-sampled
    normalized sub-vectors (the kmeans-init analog) so the oracle
    replays EVERY stage — codeword assignment, ADC sums, shortlist,
    re-rank — value-exactly; rank keys quantize to 9 decimals on both
    sides so summation-order ULP noise can't flip a boundary."""
    import os
    import shutil
    import tempfile

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    path = os.path.join(tempfile.gettempdir(), "spark_graft_ivfpq_idx")
    shutil.rmtree(path, ignore_errors=True)
    info = knn.ivf_pq_build_index(
        e, path, "vec_id", "embedding", centroid_mod=40, pq_m=8,
        codebook_mod=25,
    )
    assert info["pq_m"] == 8 and info["codewords"] >= 2
    queries = e.filter(F.col("vec_id") % 20 == 0)
    out = knn.ivf_pq_probe_index(
        spark, path, queries, e, "vec_id", "embedding",
        k=3, nprobe=2, shortlist=10,
    )
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


@register("knn_ivf_multiprobe", _ivf_oracle(nprobe=4))
def knn_ivf_multiprobe(spark, sf_dir):
    """MULTI-PROBE on the persisted IVF index: nprobe=4 nearest lists
    per query instead of the default 2 — the recall/cost knob of IVF
    search. Cost grows linearly in nprobe (candidates ~ n*nprobe/C per
    query; the pushed-down isin(centroid_id) filter just carries more
    ids), recall grows toward exact: tests/test_operators.py pins
    recall@k(nprobe=4) >= recall@k(nprobe=1) against the brute-force
    ground truth. Same deterministic math, oracle replays with
    r <= 4."""
    import os
    import shutil
    import tempfile

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    path = os.path.join(tempfile.gettempdir(), "spark_graft_ivf_mp_idx")
    shutil.rmtree(path, ignore_errors=True)
    knn.ivf_build_index(e, path, "vec_id", "embedding", centroid_mod=40)
    queries = e.filter(F.col("vec_id") % 20 == 0)
    out = knn.ivf_probe_index(spark, path, queries, "vec_id", "embedding",
                              k=3, nprobe=4)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


@register(
    "knn_ivf_index_upsert",
    _ivf_oracle(
        nprobe=2,
        corpus_sql=(
            "SELECT vec_id, embedding FROM embeddings "
            "UNION ALL "
            "SELECT vec_id + 1000001 AS vec_id, "
            "list_reverse(embedding) AS embedding FROM embeddings "
            "WHERE vec_id % 5 = 2"
        ),
        centroid_filter="vec_id % 40 = 0 AND vec_id < 1000000",
        query_filter="vec_id % 20 = 0 AND vec_id < 1000000",
        rank_quantize=9,
    ),
)
def knn_ivf_index_upsert(spark, sf_dir):
    """INCREMENTAL index maintenance: build the persisted IVF index
    once, then ivf_index_upsert a new batch (salted id-offset copies)
    — assignment GEMM runs over the BATCH only against the existing
    centroids, appended range-clustered so probe pushdown prunes old
    and new files alike. The probe then sees base + batch as one
    index; the oracle assigns the union corpus to the base centroids
    and must match exactly (per-row assignment is independent, so
    incremental == rebuilt-from-scratch for fixed centroids)."""
    import os
    import shutil
    import tempfile

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    path = os.path.join(tempfile.gettempdir(), "spark_graft_ivf_up_idx")
    shutil.rmtree(path, ignore_errors=True)
    knn.ivf_build_index(e, path, "vec_id", "embedding", centroid_mod=40)
    # reversed vectors: genuinely NEW points (no exact twins), so no
    # cosine ties anywhere — assignment and ranking are ULP-robust
    batch = e.filter(F.col("vec_id") % 5 == 2).select(
        (F.col("vec_id") + 1000001).alias("vec_id"),
        F.reverse(F.col("embedding")).alias("embedding"),
    )
    rep = knn.ivf_index_upsert(spark, path, batch, "vec_id", "embedding")
    assert rep["added"] > 0
    queries = e.filter(F.col("vec_id") % 20 == 0)
    out = knn.ivf_probe_index(spark, path, queries, "vec_id", "embedding",
                              k=3, nprobe=2, rank_quantize=9)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )




# --- incrementally-maintained vector index (operators/vectorindex.py) ------
#
# The churn is chosen so it never touches a centroid id (vec_id % 40 = 0)
# or a query id (vec_id % 20 = 0): the frozen centroid set and the query
# set stay byte-identical across the churn, so the oracle replays the
# IVF math over the POST-churn corpus with the CREATE-time centroids.

_VIDX_CORPUS_SQL = """
  SELECT vec_id,
         CASE WHEN vec_id % 10 = 7 THEN list_reverse(embedding)
              ELSE embedding END AS embedding
  FROM embeddings WHERE vec_id % 10 <> 3
  UNION ALL
  SELECT vec_id + 1000001 AS vec_id, list_reverse(embedding) AS embedding
  FROM embeddings WHERE vec_id % 5 = 1
"""


def _vidx_churn(base, e):
    """The standard vector-index churn (Spark side of _VIDX_CORPUS_SQL):
    DELETE vec_id%10=3, UPDATE vec_id%10=7 to the reversed vector, and
    INSERT reversed copies of vec_id%5=1 under salted ids (genuinely
    new points — no exact twins, so ranking is ULP-robust)."""
    base.delete(F.col("vec_id") % 10 == 3)
    base.update(
        F.col("vec_id") % 10 == 7,
        {"embedding": F.reverse(F.col("embedding"))},
    )
    batch = e.filter(F.col("vec_id") % 5 == 1).select(
        (F.col("vec_id") + 1000001).alias("vec_id"),
        F.reverse(F.col("embedding")).alias("embedding"),
    )
    base.merge_when(batch, insert=True)


def _vidx_fixture(spark, sf_dir, slug):
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.vectorindex import VectorIndex

    e = _t(spark, sf_dir, "embeddings")["embeddings"].select(
        "vec_id", "embedding"
    )
    root = os.path.join(tempfile.gettempdir(), slug)
    shutil.rmtree(root, ignore_errors=True)
    base = CowTable.create(
        spark, os.path.join(root, "vecs"), e,
        keys=("vec_id",), target_files=4,
    )
    idx = VectorIndex.create(
        spark, os.path.join(root, "idx"), base, centroid_mod=40,
    )
    # bench fixture/statement split: base + index now exist; what
    # follows (churn, refresh/drain, probe) is the measured statement
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    return e, base, idx


@register(
    "vector_index_refresh",
    _ivf_oracle(nprobe=2, corpus_sql=_VIDX_CORPUS_SQL, rank_quantize=9),
)
def vector_index_refresh(spark, sf_dir):
    """ANN served from an INCREMENTALLY-MAINTAINED IVF index
    (operators/vectorindex.py) — the vector twin of search_index_bm25:
    build the index from an embeddings snapshot, churn the base
    (DELETE / UPDATE-to-reversed / INSERT salted reversed copies),
    refresh FROM THE CHANGE FEED (cost O(changed vectors): old list
    entries re-derive from feed pre-images against the frozen
    centroids — the index is never scanned to find what to remove; ONE
    file-skipped merge_when reconciles the lists), then probe. The
    oracle assigns the POST-churn corpus to the create-time centroids
    from scratch: fixed centroids make incremental == rebuilt, so the
    feed-maintained index must match exactly."""
    e, base, idx = _vidx_fixture(spark, sf_dir, "spark_graft_vecidx")
    _vidx_churn(base, e)
    r = idx.refresh()
    assert r["refreshed"] and not r.get("resync"), r
    queries = base.read().filter(F.col("vec_id") % 20 == 0)
    out = idx.probe(queries, k=3, nprobe=2, rank_quantize=9)
    return out.select(
        "query_id", "neighbor_id", "rank",
        F.round("cosine", 6).alias("cosine"),
    )


@register(
    "stream_vector_index_maintenance",
    _ivf_oracle(nprobe=2, corpus_sql=_VIDX_CORPUS_SQL, rank_quantize=9),
)
def stream_vector_index_maintenance(spark, sf_dir):
    """SCHEDULER-LESS vector-index maintenance: the base table's own
    commit log, followed as a file stream, triggers each incremental
    refresh (streaming/incremental.stream_vector_maintenance). The
    standard churn lands in TWO waves with a drain after each, sharing
    one checkpoint (the second drain's refreshed count proves the new
    commit was consumed incrementally), then the same probe answers
    from the streamed index state; the oracle is identical to
    vector_index_refresh, so the streamed path must land the byte-same
    lists as the synchronous one."""
    import os
    import tempfile

    from openverse_catalog_spark.streaming.incremental import (
        stream_vector_maintenance,
    )

    e, base, idx = _vidx_fixture(
        spark, sf_dir, "spark_graft_stream_vecidx"
    )
    ckpt = os.path.join(
        tempfile.gettempdir(), "spark_graft_stream_vecidx", "ckpt"
    )
    # wave 1: delete + update, then drain the commit log
    base.delete(F.col("vec_id") % 10 == 3)
    base.update(
        F.col("vec_id") % 10 == 7,
        {"embedding": F.reverse(F.col("embedding"))},
    )
    r1 = stream_vector_maintenance(idx, ckpt)
    assert r1["refreshes"] >= 1 and r1["applied"] == base.version, r1
    # wave 2: the insert lands, the SAME checkpoint drains only the
    # new commit (exactly-once ticks across drains)
    batch = e.filter(F.col("vec_id") % 5 == 1).select(
        (F.col("vec_id") + 1000001).alias("vec_id"),
        F.reverse(F.col("embedding")).alias("embedding"),
    )
    base.merge_when(batch, insert=True)
    r2 = stream_vector_maintenance(idx, ckpt)
    assert r2["applied"] == base.version and r2["refreshes"] == 1, r2
    queries = base.read().filter(F.col("vec_id") % 20 == 0)
    out = idx.probe(queries, k=3, nprobe=2, rank_quantize=9)
    return out.select(
        "query_id", "neighbor_id", "rank",
        F.round("cosine", 6).alias("cosine"),
    )


@register("dedup_semantic_indexed", """
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
               AS embedding
      FROM embeddings
      UNION ALL
      SELECT 3000000 + vec_id * 40 + 1,
             list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.5)
      FROM embeddings WHERE vec_id % 7 = 0
      UNION ALL
      SELECT 4000000 + vec_id * 40 + 2,
             list_transform(embedding,
                            (x, i) -> CASE WHEN i = 1 THEN 0.0
                                           ELSE CAST(x AS DOUBLE) END)
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    ex AS (SELECT vec_id, i, embedding[i] AS x
           FROM corpus, generate_series(1, 64) AS t(i)),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY vec_id),
    cex AS (SELECT vec_id AS centroid_id, i, x FROM ex
            WHERE vec_id % 40 = 0 AND vec_id < 3000000),
    adot AS (SELECT e.vec_id, c.centroid_id, sum(e.x * c.x) AS dot
             FROM ex e JOIN cex c ON e.i = c.i GROUP BY 1, 2),
    acos AS (SELECT adot.vec_id, adot.centroid_id,
                    dot / (n1.nrm * n2.nrm) AS c
             FROM adot JOIN norms n1 ON n1.vec_id = adot.vec_id
                       JOIN norms n2 ON n2.vec_id = adot.centroid_id),
    assign AS (SELECT vec_id AS neighbor_id, centroid_id FROM (
                 SELECT vec_id, centroid_id,
                        row_number() OVER (PARTITION BY vec_id
                                           ORDER BY c DESC, centroid_id) AS r
                 FROM acos) WHERE r = 1),
    pairs AS (SELECT a.neighbor_id AS id_a, b.neighbor_id AS id_b
              FROM assign a JOIN assign b
                ON a.centroid_id = b.centroid_id
               AND a.neighbor_id < b.neighbor_id),
    dots AS (SELECT p.id_a, p.id_b, sum(ea.x * eb.x) AS dot
             FROM pairs p
             JOIN ex ea ON ea.vec_id = p.id_a
             JOIN ex eb ON eb.vec_id = p.id_b AND ea.i = eb.i
             GROUP BY 1, 2),
    scored AS (SELECT id_a, id_b, dot / (na.nrm * nb.nrm) AS cosine
               FROM dots JOIN norms na ON na.vec_id = id_a
                         JOIN norms nb ON nb.vec_id = id_b)
    SELECT id_a, id_b, round(cosine, 6) AS cosine
    FROM scored WHERE round(cosine, 6) >= 0.9
    """)
def dedup_semantic_indexed(spark, sf_dir):
    """Embedding near-dup pairs BLOCKED BY THE PERSISTED IVF INDEX: the
    inverted lists that already serve ANN double as the dedup blocker —
    candidate pairs are same-list rows (a self-join keyed on
    centroid_id, partition-local under the lists table's key
    clustering), exact cosine verifies within blocks only. Versus
    dedup_embedding_lsh this re-uses an index the pipeline already
    maintains (no per-run plane projections or bucket recompute), and
    versus the clustering-based blocker it needs no k-means pass —
    at 100 TB the blocker is O(index read), pairs are
    O(sum list_size^2) with list size held ~constant by growing C.
    The corpus is salted with exact-scaled copies (cosine 1.0) and
    dim-zeroed near copies under ids ≡ 1, 2 (mod 40) so no salted row
    can become a centroid and create normalized-twin assignment ties;
    the oracle replays assignment, blocking, and verification exactly."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.vectorindex import VectorIndex

    e = _t(spark, sf_dir, "embeddings")["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    scaled = e.filter(F.col("vec_id") % 7 == 0).select(
        (F.lit(3_000_000) + F.col("vec_id") * 40 + 1).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * 1.5)
        .alias("embedding"),
    )
    near = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.lit(4_000_000) + F.col("vec_id") * 40 + 2).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 0, F.lit(0.0)).otherwise(x),
        ).alias("embedding"),
    )
    corpus = e.unionByName(scaled).unionByName(near)
    root = os.path.join(tempfile.gettempdir(), "spark_graft_semidx")
    shutil.rmtree(root, ignore_errors=True)
    base = CowTable.create(
        spark, os.path.join(root, "vecs"), corpus,
        keys=("vec_id",), target_files=4,
    )
    idx = VectorIndex.create(
        spark, os.path.join(root, "idx"), base, centroid_mod=40,
    )
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    lists = idx.lists.read().select(
        "centroid_id",
        F.col("neighbor_id").alias("id_a"),
        F.col("vector").alias("va"),
    )
    other = idx.lists.read().select(
        "centroid_id",
        F.col("neighbor_id").alias("id_b"),
        F.col("vector").alias("vb"),
    )
    pairs = (
        lists.join(other, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(knn.cosine_expr(F.col("va"), F.col("vb")), 6)
            .alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.9)
    )
    return pairs


@register(
    "vector_index_pq_refresh",
    _ivf_pq_oracle(nprobe=2, corpus_sql=_VIDX_CORPUS_SQL),
)
def vector_index_pq_refresh(spark, sf_dir):
    """The PQ-MODE incremental vector index — the billion-vector
    layout with the full lakehouse lifecycle: list entries are pq_m=8
    ordinal codes (~64x fewer probe-scan bytes than raw float64),
    maintained from the CHANGE FEED exactly like the raw-mode index
    (old codes re-derive from feed pre-images against the frozen
    centroids + codebooks; ONE txn-fenced merge_when reconciles), and
    probed by ADC over the pruned code lists + an exact cosine re-rank
    of the top-shortlist against the BASE table at the applied
    version. Standard churn (delete/update-to-reversed/insert salted
    copies — ids never hit the centroid %40 or codebook %25 samples),
    then probe; the oracle replays assignment, codeword encode, ADC,
    shortlist, and re-rank over the post-churn corpus from scratch."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.vectorindex import VectorIndex

    e = _t(spark, sf_dir, "embeddings")["embeddings"].select(
        "vec_id", "embedding"
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_vecidx_pq")
    shutil.rmtree(root, ignore_errors=True)
    base = CowTable.create(
        spark, os.path.join(root, "vecs"), e,
        keys=("vec_id",), target_files=4,
    )
    idx = VectorIndex.create(
        spark, os.path.join(root, "idx"), base,
        centroid_mod=40, pq_m=8, codebook_mod=25,
    )
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    _vidx_churn(base, e)
    r = idx.refresh()
    assert r["refreshed"] and not r.get("resync"), r
    queries = base.read().filter(F.col("vec_id") % 20 == 0)
    out = idx.probe(queries, k=3, nprobe=2, shortlist=10)
    return out.select(
        "query_id", "neighbor_id", "rank",
        F.round("cosine", 6).alias("cosine"),
    )


@register(
    "vector_index_pq_residual",
    _ivf_pq_oracle(
        nprobe=2, residual=True, corpus_sql=_VIDX_CORPUS_SQL
    ),
)
def vector_index_pq_residual(spark, sf_dir):
    """RESIDUAL-encoded PQ incremental index — the full FAISS IVFPQ:
    codebooks train on (and codes quantize) ``x - c(x)``, the tighter
    within-list distribution, and ADC adds the query-centroid dot back
    per probed list. Same lifecycle as vector_index_pq_refresh
    (standard churn, CDF refresh — pre-image re-encode reproduces the
    stored residual codes because centroids AND codebooks are frozen —
    probe with exact shortlist re-rank); the oracle replays residual
    codebook training, encoding, two-term ADC, shortlist, and re-rank
    over the post-churn corpus."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.vectorindex import VectorIndex

    e = _t(spark, sf_dir, "embeddings")["embeddings"].select(
        "vec_id", "embedding"
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_vecidx_pqr")
    shutil.rmtree(root, ignore_errors=True)
    base = CowTable.create(
        spark, os.path.join(root, "vecs"), e,
        keys=("vec_id",), target_files=4,
    )
    idx = VectorIndex.create(
        spark, os.path.join(root, "idx"), base,
        centroid_mod=40, pq_m=8, codebook_mod=25, pq_residual=True,
    )
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    _vidx_churn(base, e)
    r = idx.refresh()
    assert r["refreshed"] and not r.get("resync"), r
    queries = base.read().filter(F.col("vec_id") % 20 == 0)
    out = idx.probe(queries, k=3, nprobe=2, shortlist=10)
    return out.select(
        "query_id", "neighbor_id", "rank",
        F.round("cosine", 6).alias("cosine"),
    )


def _ivf_learned_oracle(
    nprobe: int = 2,
    corpus_sql: str = _VIDX_CORPUS_SQL,
    seed_filter: str = "vec_id % 40 = 0",
    query_filter: str = "vec_id % 20 = 0",
    rounds: int = 2,
    dim: int = 64,
) -> str:
    """Oracle for the LEARNED-centroid recluster: unit-normalize the
    post-churn corpus, seed centroids from the ``seed_filter`` sample
    in vec_id order (cid 0..C-1), replay ``rounds`` Lloyd rounds of
    k-means on the unit sphere (squared-L2 assignment, lowest-cid tie
    break, empty cluster keeps its previous centroid — the
    clustering.py determinism contract), then run the IVF probe math
    against the LEARNED centroids: cosine assignment with the engine's
    round-at-9 argmax guard, nprobe probing, exact in-list ranking."""
    def dot(e: str, c: str) -> str:
        return " + ".join(
            f"{e}.v[{i + 1}] * {c}.v[{i + 1}]" for i in range(dim)
        )

    # round-9 means each round, and assignment = round-9 COSINE argmax
    # against the round's NORMALIZED centroids (lowest-cid tie) — the
    # engine's spherical rounds ride the index's broadcast-GEMM
    # assignment discipline, and on unit vectors cosine argmax is L2
    # argmin, so this replays Lloyd's update on the unit sphere
    means = ", ".join(
        f"round(avg(e.v[{i + 1}]), 9)" for i in range(dim)
    )
    steps = []
    for it in range(rounds):
        steps.append(
            f"""n{it} AS (
      SELECT cid, list_transform(v, x -> x / nrm) AS v
      FROM (SELECT cid, v,
                   sqrt(list_sum(list_transform(v, y -> y * y))) AS nrm
            FROM c{it})
    ),
    a{it} AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, n.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round({dot('e', 'n')}, 9) DESC, n.cid ASC
               ) AS rn
        FROM e CROSS JOIN n{it} n
      ) WHERE rn = 1
    ),
    u{it} AS (
      SELECT a.cid, list_value({means}) AS v
      FROM a{it} a JOIN e ON e.vec_id = a.vec_id
      GROUP BY a.cid
    ),
    c{it + 1} AS (
      SELECT c.cid, coalesce(u.v, c.v) AS v
      FROM c{it} c LEFT JOIN u{it} u ON u.cid = c.cid
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH corpus AS ({corpus_sql}),
    ev AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS raw
           FROM corpus),
    e AS (SELECT vec_id, list_transform(raw, x -> x / nrm) AS v
          FROM (SELECT vec_id, raw,
                       sqrt(list_sum(list_transform(raw, y -> y * y)))
                         AS nrm
                FROM ev)),
    c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
           FROM e WHERE {seed_filter}),
    {chain},
    cex AS (SELECT cid AS centroid_id, i, v[i] AS x
            FROM c{rounds}, generate_series(1, {dim}) AS t(i)),
    cnorm AS (SELECT centroid_id, sqrt(sum(x * x)) AS nrm
              FROM cex GROUP BY centroid_id),
    ex AS (SELECT vec_id, i, raw[i] AS x
           FROM ev, generate_series(1, {dim}) AS t(i)),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm
              FROM ex GROUP BY vec_id),
    adot AS (SELECT e2.vec_id, c.centroid_id, sum(e2.x * c.x) AS dot
             FROM ex e2 JOIN cex c ON e2.i = c.i GROUP BY 1, 2),
    acos AS (SELECT adot.vec_id, adot.centroid_id,
                    dot / (n1.nrm * n2.nrm) AS c
             FROM adot JOIN norms n1 ON n1.vec_id = adot.vec_id
                       JOIN cnorm n2
                         ON n2.centroid_id = adot.centroid_id),
    assign AS (SELECT vec_id AS neighbor_id, centroid_id FROM (
                 SELECT vec_id, centroid_id,
                        row_number() OVER (PARTITION BY vec_id
                                           ORDER BY round(c, 9) DESC,
                                                    centroid_id) AS r
                 FROM acos) WHERE r = 1),
    probe AS (SELECT vec_id AS query_id, centroid_id FROM (
                SELECT vec_id, centroid_id,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY c DESC,
                                                   centroid_id) AS r
                FROM acos WHERE {query_filter}) WHERE r <= {nprobe}),
    cand AS (SELECT p.query_id, a.neighbor_id
             FROM probe p JOIN assign a USING (centroid_id)
             WHERE p.query_id <> a.neighbor_id),
    cdot AS (SELECT query_id, neighbor_id, sum(qa.x * nb.x) AS dot
             FROM cand JOIN ex qa ON qa.vec_id = cand.query_id
                       JOIN ex nb ON nb.vec_id = cand.neighbor_id
                                 AND nb.i = qa.i
             GROUP BY 1, 2),
    scored AS (SELECT query_id, neighbor_id,
                      dot / (na.nrm * nb.nrm) AS cosine
               FROM cdot JOIN norms na ON na.vec_id = cdot.query_id
                         JOIN norms nb ON nb.vec_id = cdot.neighbor_id),
    ranked AS (SELECT query_id, neighbor_id, cosine,
                      row_number() OVER (
                        PARTITION BY query_id
                        ORDER BY round(cosine, 9) DESC, neighbor_id
                      ) AS rank
               FROM scored)
    SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
    FROM ranked WHERE rank <= 3
    """


@register("vector_index_recluster_learned", _ivf_learned_oracle())
def vector_index_recluster_learned(spark, sf_dir):
    """LEARNED-centroid recluster lifecycle (operators/vectorindex.py
    ``recluster(learned=2)`` / ``REINDEX VECTOR INDEX i LEARNED 2``):
    build the index, run the standard churn + CDF refresh, then heal
    with centroids REFINED by two Lloyd rounds of k-means on the
    unit-normalized corpus (seeded from the ``id % 40`` sample in id
    order) instead of raw re-sampling — sampled centroids only ever
    sit ON corpus points, so a hot region keeps as many centroids as
    it had sample hits; the learned update moves them toward the
    region's mass. The swap is the same atomic epoch re-point, and the
    probe answers from the learned epoch. The oracle replays the whole
    chain — normalization, seeded Lloyd rounds (the clustering.py
    determinism contract: expression-only assignment, lowest-cid tie
    break, empty cluster keeps its centroid), cosine assignment with
    the engine's round-at-9 argmax guard, probing, exact ranking —
    from scratch in SQL, so even the iterative heal is value-gated."""
    e, base, idx = _vidx_fixture(
        spark, sf_dir, "spark_graft_vecidx_learned"
    )
    _vidx_churn(base, e)
    r = idx.refresh()
    assert r["refreshed"] and not r.get("resync"), r
    heal = idx.recluster(learned=2)
    assert heal["epoch"] == 1 and heal["learned_rounds"] == 2, heal
    queries = base.read().filter(F.col("vec_id") % 20 == 0)
    out = idx.probe(queries, k=3, nprobe=2, rank_quantize=9)
    return out.select(
        "query_id", "neighbor_id", "rank",
        F.round("cosine", 6).alias("cosine"),
    )


@register(
    "vector_index_create_learned",
    _ivf_learned_oracle(
        corpus_sql="SELECT vec_id, embedding FROM embeddings",
    ),
)
def vector_index_create_learned(spark, sf_dir):
    """CREATE-time learned centroids (the symmetric twin of
    ``vector_index_recluster_learned``): ``CREATE VECTOR INDEX ...
    CENTROID MOD 40 LEARNED 2`` refines the id-sampled seeds with two
    Lloyd rounds of spherical k-means BEFORE the first lists build —
    for corpora whose clustering is known up front, the index is born
    balanced instead of healed later. Exercises the facade CREATE arm
    (operators/vectorindex.py ``create(learned=)``,
    sql_facade.py ``LEARNED [n]`` clause) and the batch probe against
    ordinal learned centroids. The oracle replays seeding, the Lloyd
    rounds, cosine assignment with the round-at-9 argmax guard, and
    the probe ranking from scratch in SQL."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.sql_facade import SqlFacade

    f = SqlFacade(spark)
    f.register_df(
        "embeddings",
        _t(spark, sf_dir, "embeddings")["embeddings"].select(
            "vec_id", "embedding"
        ),
    )
    base = os.path.join(
        tempfile.gettempdir(), "spark_graft_vidx_clearned"
    )
    shutil.rmtree(base, ignore_errors=True)
    f.sql(
        "CREATE TABLE vecs PRIMARY KEY (vec_id) "
        f"LOCATION '{base}/vecs' AS "
        "SELECT vec_id, embedding FROM embeddings"
    )
    f.sql(
        "CREATE VECTOR INDEX vlidx ON vecs (embedding) "
        f"CENTROID MOD 40 LEARNED 2 LOCATION '{base}/idx'"
    )
    idx = f._vidx["vlidx"]
    queries = idx.base.read().filter(F.col("vec_id") % 20 == 0)
    out = idx.probe(queries, k=3, nprobe=2, rank_quantize=9)
    return out.select(
        "query_id", "neighbor_id", "rank",
        F.round("cosine", 6).alias("cosine"),
    )


#: static 64-dim query literal for the SQL-surface vector search (pi
#: digits): identical text on both engines, so the oracle replays the
#: single-vector probe exactly.
_VQ = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4,
       6, 2, 6, 4, 3, 3, 8, 3, 2, 7, 9, 5, 0, 2, 8, 8, 4, 1, 9, 7,
       1, 6, 9, 3, 9, 9, 3, 7, 5, 1, 0, 5, 8, 2, 0, 9, 7, 4, 9, 4,
       4, 5, 9, 2]

_VQ_TEXT = " ".join(str(v) for v in _VQ)

_SQL_VIDX_ORACLE = f"""
    WITH corpus AS ({_VIDX_CORPUS_SQL}),
    ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
                FROM corpus, generate_series(1, 64) AS t(i)),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY vec_id),
    q AS (SELECT i, qv[i] AS x
          FROM (SELECT CAST([{", ".join(str(v) for v in _VQ)}]
                            AS DOUBLE[]) AS qv),
               generate_series(1, 64) AS t(i)),
    qn AS (SELECT sqrt(sum(x * x)) AS nrm FROM q),
    cex AS (SELECT vec_id AS centroid_id, i, x FROM ex
            WHERE vec_id % 40 = 0),
    ccos AS (SELECT c.centroid_id,
                    sum(c.x * q.x) / (n.nrm * qn.nrm) AS c
             FROM cex c JOIN q USING (i)
                  JOIN norms n ON n.vec_id = c.centroid_id, qn
             GROUP BY c.centroid_id, n.nrm, qn.nrm),
    probe AS (SELECT centroid_id FROM (
                SELECT centroid_id,
                       row_number() OVER (ORDER BY c DESC, centroid_id)
                         AS r
                FROM ccos) WHERE r <= 2),
    adot AS (SELECT e.vec_id, c.centroid_id, sum(e.x * c.x) AS dot
             FROM ex e JOIN cex c ON e.i = c.i GROUP BY 1, 2),
    acos AS (SELECT adot.vec_id, adot.centroid_id,
                    dot / (n1.nrm * n2.nrm) AS c
             FROM adot JOIN norms n1 ON n1.vec_id = adot.vec_id
                       JOIN norms n2 ON n2.vec_id = adot.centroid_id),
    assign AS (SELECT vec_id AS neighbor_id, centroid_id FROM (
                 SELECT vec_id, centroid_id,
                        row_number() OVER (PARTITION BY vec_id
                                           ORDER BY c DESC, centroid_id)
                          AS r
                 FROM acos) WHERE r = 1),
    cand AS (SELECT a.neighbor_id
             FROM assign a JOIN probe p USING (centroid_id)),
    qdot AS (SELECT e.vec_id AS neighbor_id, sum(e.x * q.x) AS dot
             FROM ex e JOIN q ON q.i = e.i
             WHERE e.vec_id IN (SELECT neighbor_id FROM cand)
             GROUP BY e.vec_id),
    scored AS (SELECT qdot.neighbor_id,
                      dot / (n.nrm * qn.nrm) AS cosine
               FROM qdot JOIN norms n ON n.vec_id = qdot.neighbor_id, qn)
    SELECT neighbor_id, round(cosine, 6) AS cosine
    FROM scored ORDER BY round(cosine, 9) DESC, neighbor_id LIMIT 10
    """


@register("sql_vector_index", _SQL_VIDX_ORACLE)
def sql_vector_index(spark, sf_dir):
    """The vector-index lifecycle as pure facade text: ``CREATE VECTOR
    INDEX`` over a CTAS'd embeddings table, the SAME churn as
    vector_index_refresh applied via DELETE / UPDATE / INSERT
    statements, ``REFRESH VECTOR INDEX`` (O(changed vectors), result
    row carries the resync flag), and the inline
    ``VECTOR_SEARCH('idx', '<floats>', k, nprobe)`` relation — every
    persisted artifact in the engine is SQL-addressable, the text
    index's r8 treatment extended to ANN. The oracle replays the
    single-vector IVF probe (frozen centroids, nprobe=2) against the
    post-churn corpus with the same static query literal."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.sql_facade import SqlFacade

    f = SqlFacade(spark)
    f.register_df(
        "embeddings",
        _t(spark, sf_dir, "embeddings")["embeddings"].select(
            "vec_id", "embedding"
        ),
    )
    base = os.path.join(tempfile.gettempdir(), "spark_graft_sql_vidx")
    shutil.rmtree(base, ignore_errors=True)
    f.sql(
        "CREATE TABLE vecs PRIMARY KEY (vec_id) "
        f"LOCATION '{base}/vecs' AS "
        "SELECT vec_id, embedding FROM embeddings"
    )
    f.sql(
        "CREATE VECTOR INDEX vidx ON vecs (embedding) "
        f"CENTROID MOD 40 LOCATION '{base}/idx'"
    )
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    f.sql("DELETE FROM vecs WHERE vec_id % 10 = 3")
    f.sql(
        "UPDATE vecs SET embedding = reverse(embedding) "
        "WHERE vec_id % 10 = 7"
    )
    f.sql(
        "INSERT INTO vecs "
        "SELECT vec_id + 1000001 AS vec_id, "
        "reverse(embedding) AS embedding "
        "FROM vecs WHERE vec_id % 5 = 1"
    )
    r = f.sql("REFRESH VECTOR INDEX vidx").head()
    assert r["refreshed"] and not r["resync"], r
    return f.sql(
        "SELECT neighbor_id, cosine "
        f"FROM VECTOR_SEARCH('vidx', '{_VQ_TEXT}', 10, 2)"
    )


@register(
    "vector_index_filtered",
    _ivf_oracle(
        nprobe=2, rank_quantize=9,
        match_filter="a.neighbor_id % 3 = 0",
    ),
)
def vector_index_filtered(spark, sf_dir):
    """FILTERED batch ANN from the persisted IVF index — the query
    shape real vector workloads run almost always (the reference's
    search handoff feeds an ES index whose consumers filter by
    license/provider on every request,
    reference catalog/dags/data_refresh/data_refresh_task_factory.py:183-240):
    the predicate PRE-FILTERS against the base table at the index's
    applied version (pushed-down, column-pruned scan of predicate+id
    cols only) and probed candidates semi-join the match set BEFORE
    scoring, so ranking never touches a non-matching vector and every
    neighbor satisfies the predicate — not over-fetch-and-post-filter.
    The oracle replays assignment + probe with the same neighbor
    restriction."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.vectorindex import VectorIndex

    e = _t(spark, sf_dir, "embeddings")["embeddings"].select(
        "vec_id", "embedding",
        F.expr(
            "CASE WHEN vec_id % 3 = 0 THEN 'en' "
            "WHEN vec_id % 3 = 1 THEN 'de' ELSE 'fr' END"
        ).alias("lang"),
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_vecidx_flt")
    shutil.rmtree(root, ignore_errors=True)
    base = CowTable.create(
        spark, os.path.join(root, "vecs"), e,
        keys=("vec_id",), target_files=4,
    )
    idx = VectorIndex.create(
        spark, os.path.join(root, "idx"), base, centroid_mod=40,
    )
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    queries = base.read().filter(F.col("vec_id") % 20 == 0)
    out = idx.probe(
        queries, k=3, nprobe=2, rank_quantize=9, where="lang = 'en'"
    )
    return out.select(
        "query_id", "neighbor_id", "rank",
        F.round("cosine", 6).alias("cosine"),
    )


#: oracle for the ESCALATING filtered single-vector search: the engine
#: doubles nprobe (n, 2n, 4n, ... capped at the centroid count) until
#: the probed lists hold >= min(k, total matches) matching vectors;
#: the closed form of that loop is "the smallest doubling level whose
#: CUMULATIVE match count (centroids in query-similarity rank order)
#: reaches the need" — expressible directly in SQL, so even the
#: adaptive path is hash-gated.
_SQL_VIDX_FILTERED_ORACLE = f"""
    WITH corpus AS (
      SELECT vec_id, embedding,
             CASE WHEN vec_id % 97 = 0 THEN 'gd'
                  WHEN vec_id % 3 = 0 THEN 'en' ELSE 'de' END AS lang
      FROM embeddings),
    ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM corpus, generate_series(1, 64) AS t(i)),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY vec_id),
    q AS (SELECT i, qv[i] AS x
          FROM (SELECT CAST([{", ".join(str(v) for v in _VQ)}]
                            AS DOUBLE[]) AS qv),
               generate_series(1, 64) AS t(i)),
    qn AS (SELECT sqrt(sum(x * x)) AS nrm FROM q),
    cex AS (SELECT vec_id AS centroid_id, i, x FROM ex
            WHERE vec_id % 40 = 0),
    ccos AS (SELECT c.centroid_id,
                    sum(c.x * q.x) / (n.nrm * qn.nrm) AS c
             FROM cex c JOIN q USING (i)
                  JOIN norms n ON n.vec_id = c.centroid_id, qn
             GROUP BY c.centroid_id, n.nrm, qn.nrm),
    crank AS (SELECT centroid_id,
                     row_number() OVER (ORDER BY c DESC, centroid_id) AS r
              FROM ccos),
    nc AS (SELECT count(*) AS n_cents FROM crank),
    adot AS (SELECT e.vec_id, c.centroid_id, sum(e.x * c.x) AS dot
             FROM ex e JOIN cex c ON e.i = c.i GROUP BY 1, 2),
    acos AS (SELECT adot.vec_id, adot.centroid_id,
                    dot / (n1.nrm * n2.nrm) AS c
             FROM adot JOIN norms n1 ON n1.vec_id = adot.vec_id
                       JOIN norms n2 ON n2.vec_id = adot.centroid_id),
    assign AS (SELECT vec_id AS neighbor_id, centroid_id FROM (
                 SELECT vec_id, centroid_id,
                        row_number() OVER (PARTITION BY vec_id
                                           ORDER BY c DESC, centroid_id)
                          AS r
                 FROM acos) WHERE r = 1),
    mset AS (SELECT vec_id AS neighbor_id FROM corpus WHERE lang = 'gd'),
    need AS (SELECT least(10, count(*)) AS need FROM mset),
    cmatch AS (SELECT a.centroid_id, count(*) AS cnt
               FROM assign a JOIN mset m USING (neighbor_id)
               GROUP BY 1),
    cum AS (SELECT cr.r,
                   sum(coalesce(cm.cnt, 0)) OVER (ORDER BY cr.r) AS cum
            FROM crank cr LEFT JOIN cmatch cm USING (centroid_id)),
    levels AS (SELECT DISTINCT
                 least(CAST(2 * power(2, j) AS BIGINT), nc.n_cents) AS n
               FROM (SELECT unnest(range(0, 24)) AS j), nc),
    chosen AS (SELECT min(lv.n) AS n
               FROM levels lv JOIN cum ON cum.r = lv.n, need, nc
               WHERE cum.cum >= need.need OR lv.n = nc.n_cents),
    probe AS (SELECT centroid_id FROM crank, chosen
              WHERE crank.r <= chosen.n),
    cand AS (SELECT a.neighbor_id
             FROM assign a JOIN probe USING (centroid_id)
                           JOIN mset m USING (neighbor_id)),
    qdot AS (SELECT e.vec_id AS neighbor_id, sum(e.x * q.x) AS dot
             FROM ex e JOIN q ON q.i = e.i
             WHERE e.vec_id IN (SELECT neighbor_id FROM cand)
             GROUP BY e.vec_id),
    scored AS (SELECT qdot.neighbor_id,
                      dot / (n.nrm * qn.nrm) AS cosine
               FROM qdot JOIN norms n ON n.vec_id = qdot.neighbor_id, qn)
    SELECT neighbor_id, round(cosine, 6) AS cosine
    FROM scored ORDER BY round(cosine, 9) DESC, neighbor_id LIMIT 10
    """


@register("sql_vector_search_filtered", _SQL_VIDX_FILTERED_ORACLE)
def sql_vector_search_filtered(spark, sf_dir):
    """Filtered ANN as pure facade text with the RECALL FLOOR:
    ``VECTOR_SEARCH('vidx', '<floats>', k, nprobe, WHERE "pred")``
    pre-filters the base, then DOUBLES nprobe until the probed lists
    hold min(k, matches) matching vectors — a rare predicate ('gd' is
    ~1%% of the corpus) escalates toward the exact filtered scan
    instead of under-filling k, which is precisely what
    over-fetch-and-post-filter cannot guarantee. The oracle computes
    the escalation's closed form (smallest doubling level whose
    cumulative match count reaches the need) and replays the probe at
    that level."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.sql_facade import SqlFacade

    f = SqlFacade(spark)
    f.register_df(
        "embeddings",
        _t(spark, sf_dir, "embeddings")["embeddings"].select(
            "vec_id", "embedding"
        ),
    )
    base = os.path.join(tempfile.gettempdir(), "spark_graft_sql_vflt")
    shutil.rmtree(base, ignore_errors=True)
    f.sql(
        "CREATE TABLE vecs PRIMARY KEY (vec_id) "
        f"LOCATION '{base}/vecs' AS "
        "SELECT vec_id, embedding, "
        "CASE WHEN vec_id % 97 = 0 THEN 'gd' "
        "WHEN vec_id % 3 = 0 THEN 'en' ELSE 'de' END AS lang "
        "FROM embeddings"
    )
    f.sql(
        "CREATE VECTOR INDEX vidx ON vecs (embedding) "
        f"CENTROID MOD 40 LOCATION '{base}/idx'"
    )
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    return f.sql(
        "SELECT neighbor_id, cosine "
        f"FROM VECTOR_SEARCH('vidx', '{_VQ_TEXT}', 10, 2, "
        "WHERE \"lang = 'gd'\")"
    )


def _pca_oracle(rounds: int = 3) -> str:
    """Power iteration unrolled round by round in SQL — value-exact for
    an iterative numeric algorithm (same discipline as the k-means and
    PageRank oracles)."""
    parts = ["""
    WITH ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
                FROM embeddings, generate_series(1, 64) AS t(i)),
    mu AS (SELECT i, avg(x) AS m FROM ex GROUP BY i),
    cx AS (SELECT e.vec_id, e.i, e.x - mu.m AS x FROM ex e JOIN mu USING (i)),
    v0 AS (SELECT i, 1.0 / sqrt(64) AS v
           FROM generate_series(1, 64) AS t(i))"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
    s{r} AS (SELECT cx.vec_id, sum(cx.x * v{r - 1}.v) AS s
             FROM cx JOIN v{r - 1} USING (i) GROUP BY cx.vec_id),
    w{r} AS (SELECT cx.i, sum(cx.x * s{r}.s) AS w
             FROM cx JOIN s{r} USING (vec_id) GROUP BY cx.i),
    n{r} AS (SELECT sqrt(sum(w * w)) AS nrm FROM w{r}),
    v{r} AS (SELECT i, w / nrm AS v FROM w{r}, n{r})""")
    parts.append(f"""
    SELECT CAST(i AS BIGINT) AS dim, round(v, 6) AS loading
    FROM v{rounds}""")
    return "".join(parts)


@register("embed_pca_power", _pca_oracle())
def embed_pca_power(spark, sf_dir):
    """Distributed PCA top component by power iteration: one corpus
    scan per round (array-fold dot against the v literal + ONE
    aggregation of dim+1 map-side partial sums), only dim-sized state
    moves, covariance never materialized. Deterministic from the
    uniform start vector; the oracle replays all three rounds in SQL
    including the mean-centering and normalizations — loadings match
    to 6 decimals."""
    from openverse_catalog_spark.operators.clustering import (
        pca_power_top_component,
    )

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    v, _ = pca_power_top_component(e, "vec_id", "embedding", dim=64, rounds=3)
    return literal_df(spark, 
        [(i + 1, round(x, 6)) for i, x in enumerate(v)],
        "dim long, loading double",
    )


# --- C4-style cross-corpus segment dedup -----------------------------------


@register(
    "dedup_segments_c4",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      WHERE text IS NOT NULL AND len(text) > 0
    ),
    segs AS (
      SELECT doc_id, i AS pos,
             array_to_string(w[(i*10+1):(i*10+10)], ' ') AS seg
      FROM words, unnest(range((len(w) + 9) // 10)) AS t(i)
    ),
    ranked AS (
      SELECT doc_id, pos, seg,
             row_number() OVER (
               PARTITION BY md5(seg) ORDER BY doc_id, pos) AS rn
      FROM segs
    )
    SELECT doc_id,
           count(*) AS n_segments,
           count(*) FILTER (WHERE rn = 1) AS n_kept,
           coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
                               ORDER BY pos), '') AS cleaned_text
    FROM ranked GROUP BY doc_id
    """,
)
def dedup_segments_c4(spark, sf_dir):
    """C4's cleaning rule over the cloned corpus: any 10-word segment
    occurring more than once corpus-wide survives only at its first
    (doc, position); each doc reassembles from its surviving segments.
    The exact clones (+1M ids) lose every segment to their originals;
    the near clones (+2M, offset by 15 chars) keep only segments whose
    word alignment shifted. One window shuffle on the 128-bit segment
    hash + one reassembly groupBy — no self-join, so a segment
    duplicated k times costs k rows, not k² pairs."""
    return dd.segment_dedup(
        _corpus(spark, sf_dir), "doc_id", "text", seg_words=10
    )


# --- learned quality/language classifier (logistic regression) -------------

_LOGREG_FEATURES = [
    ("len_norm", "length(text) / 500.0"),
    ("words_norm", "len(string_split(text, ' ')) / 100.0"),
    ("e_norm", "(length(text) - length(replace(text, 'e', ''))) / 50.0"),
    (
        "spark_norm",
        "(length(text) - length(replace(text, 'spark', ''))) / 50.0",
    ),
    ("bias", "1.0"),
]
_LOGREG_LR = 0.5
_LOGREG_ROUNDS = 3


def _logreg_oracle(score: bool = False) -> str:
    """Full-batch GD unrolled round by round in SQL (the PCA/k-means
    oracle discipline): the margin folds features in index order and
    the update is w - (lr * g) / n, both matching the Spark trainer's
    float-op order exactly."""
    d = len(_LOGREG_FEATURES)
    feat_cols = ",\n           ".join(
        f"{sql} AS x{j}" for j, (_, sql) in enumerate(_LOGREG_FEATURES)
    )
    parts = [f"""
    WITH feat AS (
      SELECT doc_id,
           {feat_cols},
           CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM documents WHERE text IS NOT NULL AND length(text) > 0
    ),
    w0 AS (SELECT {', '.join(f'0.0 AS w{j}' for j in range(d))})"""]
    for r in range(1, _LOGREG_ROUNDS + 1):
        m = " + ".join(f"x{j} * w{j}" for j in range(d))
        gs = ",\n             ".join(
            f"sum(x{j} * (1.0 / (1.0 + exp(-(0.0 + {m}))) - y)) AS g{j}"
            for j in range(d)
        )
        ws = ", ".join(
            f"w{r - 1}.w{j} - {_LOGREG_LR} * g{r}.g{j} / g{r}.n AS w{j}"
            for j in range(d)
        )
        parts.append(f""",
    g{r} AS (SELECT count(*) AS n,
             {gs}
             FROM feat, w{r - 1}),
    w{r} AS (SELECT {ws} FROM w{r - 1}, g{r})""")
    R = _LOGREG_ROUNDS
    if score:
        m = " + ".join(f"x{j} * w{j}" for j in range(d))
        parts.append(f""",
    scored AS (SELECT doc_id, 1.0 / (1.0 + exp(-(0.0 + {m}))) AS p
               FROM feat, w{R} WHERE doc_id % 17 = 0)
    SELECT doc_id, round(p, 6) AS prob,
           CAST(CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS pred
    FROM scored""")
    else:
        sel = "\n    UNION ALL ".join(
            f"SELECT {j} AS feat_idx, '{name}' AS feature, "
            f"round(w{j}, 6) AS weight FROM w{R}"
            for j, (name, _) in enumerate(_LOGREG_FEATURES)
        )
        parts.append(f"""
    {sel}""")
    return "".join(parts)


def _logreg_features_df(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    t = F.col("text")
    n = F.length(t)
    return docs.select(
        "doc_id",
        (n / F.lit(500.0)).alias("x0"),
        (F.size(F.split(t, " ")) / F.lit(100.0)).alias("x1"),
        ((n - F.length(F.regexp_replace(t, "e", ""))) / F.lit(50.0)).alias(
            "x2"
        ),
        (
            (n - F.length(F.regexp_replace(t, "spark", ""))) / F.lit(50.0)
        ).alias("x3"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )


@register("classifier_logreg_train", _logreg_oracle())
def classifier_logreg_train(spark, sf_dir):
    """Train the CCNet/GPT-3-style corpus classifier tier as a
    DISTRIBUTED logistic regression (operators/classifier.py): full-
    batch GD where each round is ONE expression-only corpus scan + ONE
    aggregation carrying dim+1 map-side partial sums; weights are
    driver literals (the k-means/PCA/BPE iteration discipline). Here it
    learns language-ID from integer-derived text ratios; the DuckDB
    oracle replays every GD round in SQL with matching float-op order,
    so the learned weights must agree to 6 decimals — a one-wrong-sign
    gate on the whole gradient path. SCALE: rounds x one scan, driver
    state = dim+1 doubles, no shuffle beyond the dim+1-column partial
    aggregate."""
    from openverse_catalog_spark.operators.classifier import logreg_train

    feats = _logreg_features_df(spark, sf_dir)
    w = logreg_train(
        feats, ["x0", "x1", "x2", "x3"], "y",
        rounds=_LOGREG_ROUNDS, lr=_LOGREG_LR,
    )
    names = [name for name, _ in _LOGREG_FEATURES]
    return literal_df(spark, 
        [(j, names[j], round(w[j], 6)) for j in range(len(w))],
        "feat_idx int, feature string, weight double",
    )


@register("classifier_logreg_score", _logreg_oracle(score=True))
def classifier_logreg_score(spark, sf_dir):
    """Train-then-score: the fitted model scores every document as a
    PURE SELECT against the weight literals (zero shuffles — the
    filter-by-probability a curation pipeline runs at 100 TB pushes
    down with the scan). Oracle replays training AND scoring; per-doc
    probabilities match to 6 decimals."""
    from openverse_catalog_spark.operators.classifier import (
        logreg_score,
        logreg_train,
    )

    feats = _logreg_features_df(spark, sf_dir)
    xs = ["x0", "x1", "x2", "x3"]
    w = logreg_train(feats, xs, "y", rounds=_LOGREG_ROUNDS, lr=_LOGREG_LR)
    scored = logreg_score(feats.filter(F.col("doc_id") % 17 == 0), xs, w)
    return scored.select(
        "doc_id",
        F.round("prob", 6).alias("prob"),
        F.when(F.col("prob") >= 0.5, 1).otherwise(0).cast("long").alias(
            "pred"
        ),
    )


@register("knn_ivf_pq_residual", _ivf_pq_oracle(residual=True))
def knn_ivf_pq_residual(spark, sf_dir):
    """RESIDUAL-encoded IVF-PQ (the full FAISS IVFPQ): codes quantize
    ``x - c(x)`` — within one inverted list every vector shares its
    centroid, so the residual distribution is tighter than the raw one
    and the same 8-code budget quantizes it with less error — and ADC
    adds the query-centroid dot back per probed list. The oracle
    replays centroid subtraction, residual codebook assignment, the
    two-term ADC, shortlist, and exact re-rank; recall-vs-raw is
    pinned in tests/test_operators.py."""
    import os
    import shutil
    import tempfile

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    path = os.path.join(tempfile.gettempdir(), "spark_graft_ivfpqr_idx")
    shutil.rmtree(path, ignore_errors=True)
    info = knn.ivf_pq_build_index(
        e, path, "vec_id", "embedding", centroid_mod=40, pq_m=8,
        codebook_mod=25, residual=True,
    )
    assert info["residual"] is True
    queries = e.filter(F.col("vec_id") % 20 == 0)
    out = knn.ivf_pq_probe_index(
        spark, path, queries, e, "vec_id", "embedding",
        k=3, nprobe=2, shortlist=10,
    )
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


# -- unigram LM tokenizer (SentencePiece-style Viterbi-EM) -------------------

_UNI_WORDS_SQL = r"""
words AS (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split_regex(
             trim(regexp_replace(lower(text), '[^a-z ]', ' ', 'g')),
             '\s+')) AS w
    FROM documents
  ) WHERE w <> '' AND len(w) <= 12 GROUP BY w
),
seeds AS (
  SELECT piece, sum(cnt) AS usage FROM (
    SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece, cnt
    FROM words, unnest(range(1, len(word) + 1)) AS t1(i),
                unnest(range(1, 5)) AS t2(l)
    WHERE CAST(i AS INT) + CAST(l AS INT) - 1 <= len(word)
  ) GROUP BY piece
),
usage0 AS (
  SELECT piece, usage FROM seeds WHERE len(piece) = 1 OR usage >= 2
),
score0 AS (
  SELECT piece, CAST(floor((ln(usage)
           - ln((SELECT sum(usage) FROM usage0))) * 1000000 + 0.5)
         AS BIGINT) AS lp
  FROM usage0
)"""


def _uni_round_sql(r: int) -> str:
    """One Viterbi-EM round as CTEs: enumerate every segmentation of
    every word under score{r-1} (recursive CTE — words are capped at
    12 chars so the path set stays small), pick the best per word by
    the exact integer-score ordering (score desc, piece-length digit
    string desc — the same total order the Spark DP maximizes), then
    hard-count piece usage and re-estimate micro-log scores."""
    return f""",
paths{r} AS (
  SELECT word, cnt, 0 AS pos, CAST('' AS VARCHAR) AS lens,
         CAST(0 AS BIGINT) AS score, CAST('' AS VARCHAR) AS toks
  FROM words
  UNION ALL
  SELECT p.word, p.cnt, p.pos + len(v.piece),
         p.lens || CAST(len(v.piece) AS VARCHAR), p.score + v.lp,
         CASE WHEN p.toks = '' THEN v.piece
              ELSE p.toks || ' ' || v.piece END
  FROM paths{r} p JOIN score{r - 1} v
    ON substr(p.word, p.pos + 1, len(v.piece)) = v.piece
  WHERE p.pos < len(p.word)
),
best{r} AS (
  SELECT word, cnt, toks, score FROM (
    SELECT *, row_number() OVER (PARTITION BY word
                                 ORDER BY score DESC, lens DESC) AS rn
    FROM paths{r} WHERE pos = len(word)) WHERE rn = 1
),
usage{r} AS (
  SELECT piece, sum(cnt) AS usage FROM (
    SELECT unnest(string_split(toks, ' ')) AS piece, cnt FROM best{r}
  ) GROUP BY piece
),
score{r} AS (
  SELECT piece, CAST(floor((ln(usage)
           - ln((SELECT sum(usage) FROM usage{r}))) * 1000000 + 0.5)
         AS BIGINT) AS lp
  FROM usage{r}
)"""


_UNI_ROUNDS = 2


def _uni_vocab_oracle(rounds: int = _UNI_ROUNDS) -> str:
    body = "".join(_uni_round_sql(r) for r in range(1, rounds + 1))
    return f"""
    WITH RECURSIVE {_UNI_WORDS_SQL} {body}
    SELECT u.piece, CAST(u.usage AS BIGINT) AS usage, s.lp
    FROM usage{rounds} u JOIN score{rounds} s ON u.piece = s.piece
    """


def _uni_encode_oracle(rounds: int = _UNI_ROUNDS) -> str:
    body = "".join(_uni_round_sql(r) for r in range(1, rounds + 2))
    return rf"""
    WITH RECURSIVE {_UNI_WORDS_SQL} {body},
    dw AS (
      SELECT doc_id, i, ws[i] AS word FROM (
        SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM (
          SELECT doc_id,
                 string_split_regex(
                   trim(regexp_replace(lower(text), '[^a-z ]', ' ', 'g')),
                   '\s+') AS ws
          FROM documents)
      ) WHERE ws[i] <> '' AND len(ws[i]) <= 12
    ),
    enc AS (
      SELECT dw.doc_id, dw.i, b.toks
      FROM dw JOIN best{rounds + 1} b ON dw.word = b.word
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(len(string_split(toks, ' '))) AS BIGINT) AS n_tokens,
           md5(string_agg(toks, ' ' ORDER BY i)) AS toks_md5
    FROM enc GROUP BY doc_id
    """


@register("corpus_unigram_vocab", _uni_vocab_oracle())
def corpus_unigram_vocab(spark, sf_dir):
    """Unigram-LM tokenizer TRAINING (SentencePiece's other half next
    to BPE): seed pieces = substrings <= 4 chars at usage >= 2 plus all
    single chars, then 2 Viterbi-EM rounds — each round re-segments the
    DISTINCT-WORD table by maximum likelihood (Arrow-batched DP,
    integer micro-log scores so path sums are exact and
    order-independent) and re-estimates scores from hard usage counts.
    The oracle replays every round: it ENUMERATES all segmentations per
    word with a recursive CTE and picks the best under the identical
    (score desc, length-digits desc) order, so one wrong DP transition
    or tie-break anywhere breaks the hash. operators/unigram.py."""
    from openverse_catalog_spark.operators.unigram import (
        unigram_learn,
        unigram_word_frequencies,
    )

    d = _t(spark, sf_dir, "documents")["documents"]
    words = unigram_word_frequencies(d)
    _, usage_df, _ = unigram_learn(words, rounds=_UNI_ROUNDS)
    return usage_df.select("piece", "usage", "lp")


@register("corpus_unigram_encode", _uni_encode_oracle())
def corpus_unigram_encode(spark, sf_dir):
    """Unigram-LM ENCODE under the trained scores: the corpus explodes
    to length-capped words, broadcast-joins the word->pieces dictionary
    (training re-segmented under the final scores), and aggregates per
    document — token count and an order-sensitive md5 of the full piece
    stream, both value-pinned by the oracle's replayed Viterbi."""
    from openverse_catalog_spark.operators.unigram import (
        unigram_encode,
        unigram_learn,
        unigram_word_frequencies,
    )

    d = _t(spark, sf_dir, "documents")["documents"]
    words = unigram_word_frequencies(d)
    scores, _, tok = unigram_learn(words, rounds=_UNI_ROUNDS)
    out = unigram_encode(d, "text", tok, scores)
    return out.select(
        "doc_id", "n_words", "n_tokens",
        F.md5(F.col("toks")).alias("toks_md5"),
    )


@register("mine_bitext_margin", """
    WITH ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
                FROM embeddings, generate_series(1, 64) AS t(i)),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY vec_id),
    dots AS (SELECT s.vec_id AS sid, t.vec_id AS tid, sum(s.x * t.x) AS dot
             FROM ex s JOIN ex t ON s.i = t.i
             WHERE s.vec_id % 2 = 0 AND t.vec_id % 2 = 1
             GROUP BY 1, 2),
    cos AS (SELECT sid, tid, dot / (ns.nrm * nt.nrm) AS c
            FROM dots JOIN norms ns ON ns.vec_id = sid
                      JOIN norms nt ON nt.vec_id = tid),
    fwd AS (SELECT sid, tid, c,
                   row_number() OVER (PARTITION BY sid
                                      ORDER BY c DESC, tid) AS r
            FROM cos WHERE sid % 10 = 0),
    favg AS (SELECT sid, avg(c) AS favg FROM fwd WHERE r <= 4 GROUP BY sid),
    bwd AS (SELECT sid, tid, c,
                   row_number() OVER (PARTITION BY tid
                                      ORDER BY c DESC, sid) AS r
            FROM cos),
    bavg AS (SELECT tid, avg(c) AS bavg FROM bwd WHERE r <= 4 GROUP BY tid),
    best AS (SELECT sid, tid, c FROM fwd WHERE r = 1),
    m AS (SELECT b.sid AS src_id, b.tid AS tgt_id,
                 round(b.c, 6) AS cosine,
                 round(b.c / (0.5 * (f.favg + g.bavg)), 6) AS margin
          FROM best b JOIN favg f USING (sid)
                      JOIN bavg g ON g.tid = b.tid)
    SELECT src_id, tgt_id, cosine, margin FROM m WHERE margin >= 1.2
    """)
def mine_bitext_margin(spark, sf_dir):
    """Margin-based PARALLEL-PAIR MINING (Artetxe & Schwenk 2019 — the
    CCMatrix/WikiMatrix recipe): treat the even/odd halves of the
    embeddings table as two monolingual sides, score each queried src
    row's best tgt neighbor by the RATIO MARGIN — cosine divided by
    the mean of both directions' k=4 neighborhood averages — and mine
    pairs past the threshold. The denominator corrects hubness (a tgt
    close to everything carries a high backward average, deflating its
    margins), which a raw cosine threshold cannot. Plan: two
    broadcast-GEMM cosine_topk passes (no corpus shuffle), k-row
    neighborhood aggregates, pair-sized margin join; at 100 TB the
    corpus side rides the IVF index probe instead of the exact GEMM.
    The oracle replays both directions' neighborhoods and the margin
    arithmetic from scratch."""
    from openverse_catalog_spark.operators import knn

    e = _t(spark, sf_dir, "embeddings")["embeddings"].select(
        "vec_id", "embedding"
    )
    src = e.filter(F.col("vec_id") % 2 == 0)
    tgt = e.filter(F.col("vec_id") % 2 == 1)
    src_q = src.filter(F.col("vec_id") % 10 == 0)
    return knn.mine_bitext_margin(src, tgt, k=4, threshold=1.2, queries=src_q)
