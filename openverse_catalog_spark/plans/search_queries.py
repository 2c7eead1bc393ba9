"""IR-style text search over the documents table: TF-IDF term ranking,
BM25 retrieval, and PMI collocation mining.

A training-data engine needs keyword retrieval next to embedding KNN
(operators/knn.py): BM25 is the standard lexical baseline, TF-IDF the
standard per-corpus term profile, and PMI the standard collocation
statistic for tokenizer/vocab work. All three are pure DataFrame
programs — tokenization is a row-local JVM expression (split + filter,
no UDF), counts are partial-agg groupBys, and the scalar corpus stats
(N, avgdl, totals) ride along as broadcast one-row joins, so nothing
here adds a shuffle beyond the count aggregations themselves.

Determinism: both engines rank on the ROUNDED score with a full tie
break, so last-ulp ln() differences between libm implementations cannot
reorder the output.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from openverse_catalog_spark.session import literal_df

from openverse_catalog_spark.plans.analytics import _t, register

# Identical tokenization on both engines: lowercase, split on non-letters,
# keep tokens of length >= 3.
_TOKS_SQL = "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> length(x) >= 3)"


def _tokens_col():
    return F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: F.length(x) >= 3
    )


@register(
    "search_tfidf_topk",
    f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS_SQL}) AS term FROM documents
    ),
    tf AS (SELECT source, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    n_src AS (SELECT count(DISTINCT source) AS n FROM tf),
    df AS (SELECT term, count(DISTINCT source) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.source, tf.term, tf.tf,
             round(tf.tf * ln((1.0 + n_src.n) / (1.0 + df.df)), 6) AS score
      FROM tf JOIN df USING (term), n_src
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY score DESC, term) AS rk
      FROM scored
    )
    SELECT source, term, CAST(tf AS BIGINT) AS tf, score
    FROM ranked WHERE rk <= 5
    """,
)
def search_tfidf_topk(spark, sf_dir):
    """Top-5 distinguishing terms per source by smoothed TF-IDF
    (idf = ln((1+N)/(1+df)), sklearn-style smoothing so the ratio is
    defined even for terms present in every source).

    Plan: one explode + groupBy for tf (partial agg on (source, term)),
    a tiny df aggregate joined broadcast (vocab-sized), the scalar N as
    a one-row broadcast, then a per-source top-k window. The only big
    shuffle is the tf groupBy; everything after operates on vocab-sized
    data. Ranking uses the rounded score + term tie-break so both
    engines order identically."""
    d = _t(spark, sf_dir, "documents")["documents"]
    toks = d.select("source", F.explode(_tokens_col()).alias("term"))
    tf = toks.groupBy("source", "term").agg(F.count("*").alias("tf"))
    n_src = tf.select(F.countDistinct("source").alias("n"))
    df = tf.groupBy("term").agg(F.countDistinct("source").alias("df"))
    scored = (
        tf.crossJoin(F.broadcast(n_src))
        .join(F.broadcast(df), "term")
        .select(
            "source",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log((1.0 + F.col("n")) / (1.0 + F.col("df"))), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("source", "term", "tf", "score")
    )


_BM25_TERMS = ["join", "hash", "vector", "spark"]
_K1, _B = 1.2, 0.75


@register(
    "search_bm25",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('join', 'hash', 'vector', 'spark') GROUP BY 1, 2
    ),
    idf AS (
      SELECT tf.term,
             ln(1.0 + (stats.n - count(DISTINCT tf.doc_id) + 0.5)
                      / (count(DISTINCT tf.doc_id) + 0.5)) AS idf
      FROM tf, stats GROUP BY tf.term, stats.n
    ),
    scored AS (
      SELECT tf.doc_id,
             sum(idf.idf * tf.tf * ({_K1} + 1.0)
                 / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl)))
               AS score
      FROM tf
      JOIN idf USING (term)
      JOIN dl USING (doc_id), stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 6) AS score
    FROM scored ORDER BY round(score, 6) DESC, doc_id LIMIT 20
    """,
)
def search_bm25(spark, sf_dir):
    """BM25 retrieval (k1=1.2, b=0.75) for a fixed conjunctive-OR query,
    top-20 docs.

    Plan shape for scale: the per-doc token explode feeds TWO partial
    aggregates (doc length, and tf restricted to the query terms — the
    term filter is pushed below the groupBy so the tf shuffle carries
    only query-term rows, a tiny fraction of the corpus). idf is a
    vocab-of-4 broadcast; corpus stats a one-row broadcast; final top-20
    is TakeOrderedAndProject (per-partition heaps, no global sort)."""
    d = _t(spark, sf_dir, "documents")["documents"]
    toks = d.select("doc_id", F.explode(_tokens_col()).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.select(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
    tf = (
        toks.filter(F.col("term").isin(_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    idf = (
        tf.crossJoin(F.broadcast(stats.select("n")))
        .groupBy("term", "n")
        .agg(F.countDistinct("doc_id").alias("df"))
        .select(
            "term",
            F.log(
                1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    per_term = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .select(
            "doc_id",
            (
                F.col("idf")
                * F.col("tf")
                * (_K1 + 1.0)
                / (F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl")))
            ).alias("term_score"),
        )
    )
    scored = per_term.groupBy("doc_id").agg(
        F.round(F.sum("term_score"), 6).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(20)


@register(
    "search_pmi_bigrams",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS ts FROM documents
    ),
    uni AS (
      SELECT tok, count(*) AS c FROM (SELECT unnest(ts) AS tok FROM toks)
      GROUP BY 1
    ),
    uni_total AS (SELECT sum(c) AS t FROM uni),
    big AS (
      SELECT ts[i] AS w1, ts[i + 1] AS w2, count(*) AS c_ab
      FROM toks, unnest(generate_series(1, len(ts) - 1)) AS u(i)
      WHERE len(ts) >= 2
      GROUP BY 1, 2
    ),
    big_total AS (SELECT sum(c_ab) AS b FROM big),
    pmi AS (
      SELECT big.w1, big.w2, big.c_ab,
             round(ln((big.c_ab / big_total.b)
                      / ((u1.c / uni_total.t) * (u2.c / uni_total.t))), 6) AS pmi
      FROM big
      JOIN uni u1 ON u1.tok = big.w1
      JOIN uni u2 ON u2.tok = big.w2, big_total, uni_total
      WHERE big.c_ab >= 5
    )
    SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab, pmi
    FROM pmi ORDER BY pmi DESC, w1, w2 LIMIT 20
    """,
)
def search_pmi_bigrams(spark, sf_dir):
    """Top-20 adjacent-token collocations by pointwise mutual information
    (min pair count 5) — the statistic behind BPE-merge candidates and
    multi-word-expression mining.

    The load-bearing scale decision: bigram *extraction is row-local* —
    a ``transform`` over the token array builds (w1, w2) structs inside
    the row, so there is NO positions self-join (the oracle's lateral
    unnest form is quadratic in engine work; ours is an Expand). The two
    groupBys (unigrams, bigrams) are the only shuffles, both on bounded
    vocab/vocab² key spaces; totals ride as one-row broadcasts and the
    unigram joins broadcast vocab-sized tables."""
    d = _t(spark, sf_dir, "documents")["documents"]
    toks = d.select(_tokens_col().alias("ts")).filter(F.size("ts") >= 2)
    uni = (
        toks.select(F.explode("ts").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    uni_total = uni.select(F.sum("c").alias("t"))
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 1), "
                "i -> struct(element_at(ts, i) AS w1, element_at(ts, i + 1) AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    big = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c_ab"))
    big_total = big.select(F.sum("c_ab").alias("b"))
    pmi = (
        big.filter(F.col("c_ab") >= 5)
        .join(F.broadcast(uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))), "w1")
        .join(F.broadcast(uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))), "w2")
        .crossJoin(F.broadcast(uni_total))
        .crossJoin(F.broadcast(big_total))
        .select(
            "w1",
            "w2",
            "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab") / F.col("b"))
                    / ((F.col("c1") / F.col("t")) * (F.col("c2") / F.col("t")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return pmi.orderBy(F.col("pmi").desc(), "w1", "w2").limit(20)


_RRF_K = 60  # standard reciprocal-rank-fusion damping (Cormack et al.)
_HYBRID_DEPTH = 50  # candidates taken from each arm before fusion


@register(
    "search_hybrid_rrf",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('join', 'hash', 'vector', 'spark') GROUP BY 1, 2
    ),
    idf AS (
      SELECT tf.term,
             ln(1.0 + (stats.n - count(DISTINCT tf.doc_id) + 0.5)
                      / (count(DISTINCT tf.doc_id) + 0.5)) AS idf
      FROM tf, stats GROUP BY tf.term, stats.n
    ),
    bm AS (
      SELECT tf.doc_id,
             round(sum(idf.idf * tf.tf * ({_K1} + 1.0)
                 / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))), 6)
               AS score
      FROM tf
      JOIN idf USING (term)
      JOIN dl USING (doc_id), stats
      GROUP BY tf.doc_id
    ),
    lex AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r_lex
      FROM bm QUALIFY r_lex <= {_HYBRID_DEPTH}
    ),
    ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, generate_series(1, 64) AS t(i)),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY vec_id),
    dots AS (SELECT b.vec_id AS doc_id, sum(a.x * b.x) AS dot
             FROM ex a JOIN ex b ON a.i = b.i AND b.vec_id <> 0
             WHERE a.vec_id = 0
             GROUP BY 1),
    cos AS (SELECT dots.doc_id,
                   round(dot / (na.nrm * nb.nrm), 6) AS cosine
            FROM dots JOIN norms na ON na.vec_id = 0
                      JOIN norms nb ON nb.vec_id = dots.doc_id),
    vec AS (
      SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS r_vec
      FROM cos QUALIFY r_vec <= {_HYBRID_DEPTH}
    ),
    fused AS (
      SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
             lex.r_lex, vec.r_vec,
             round(coalesce(1.0 / ({_RRF_K} + lex.r_lex), 0)
                   + coalesce(1.0 / ({_RRF_K} + vec.r_vec), 0), 6) AS rrf
      FROM lex FULL OUTER JOIN vec USING (doc_id)
    )
    SELECT doc_id, r_lex, r_vec, rrf
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 20
    """,
)
def search_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: BM25 lexical arm + embedding-cosine vector arm,
    fused by reciprocal-rank fusion (score = sum 1/(60 + rank), the
    standard parameter-free fusion from Cormack et al.) — the query shape
    every modern RAG/retrieval stack runs, and the natural consumer of
    this repo's BM25 (above) and ANN (operators/knn.py) halves. The
    reference's search handoff is a single lexical index
    (data_refresh_task_factory.py — Elasticsearch); hybrid is the
    superset a training-data engine needs for retrieval-based curation.

    Plan/scale shape: each arm independently reduces the corpus to a
    top-50 candidate list — the lexical arm's tf shuffle carries only
    query-term rows and ends in TakeOrdered; the vector arm is one
    corpus scan with a broadcast 1-row query matrix GEMM (knn.cosine_topk
    — the corpus never shuffles) re-ranked on the rounded score. Fusion
    then operates on 2x50 rows: a full-outer join of two ~50-row frames
    is driver-trivial and executes as a broadcast join. At 100 TB the
    arms are the work and both are single-scan; fusion cost stays
    constant in corpus size. Ranks inside each arm break ties on the
    ROUNDED score then doc_id so both engines rank identically."""
    d = _t(spark, sf_dir, "documents")["documents"]
    e = _t(spark, sf_dir, "embeddings")["embeddings"]

    # -- lexical arm: BM25 (same statistic as search_bm25), rank top-50
    toks = d.select("doc_id", F.explode(_tokens_col()).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.select(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
    tf = (
        toks.filter(F.col("term").isin(_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    idf = (
        tf.crossJoin(F.broadcast(stats.select("n")))
        .groupBy("term", "n")
        .agg(F.countDistinct("doc_id").alias("df"))
        .select(
            "term",
            F.log(
                1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    bm = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .select(
            "doc_id",
            (
                F.col("idf")
                * F.col("tf")
                * (_K1 + 1.0)
                / (F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl")))
            ).alias("term_score"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 6).alias("score"))
    )
    # top-50 FIRST via orderBy+limit (TakeOrderedAndProject — per-partition
    # heaps, no global sort), then the rank window runs over 50 rows only
    w_lex = Window.orderBy(F.col("score").desc(), "doc_id")
    lex = (
        bm.orderBy(F.col("score").desc(), "doc_id")
        .limit(_HYBRID_DEPTH)
        .withColumn("r_lex", F.row_number().over(w_lex))
        .select("doc_id", "r_lex")
    )

    # -- vector arm: cosine vs the vec_id=0 query embedding, rank top-50
    from openverse_catalog_spark.operators import knn

    cand = knn.cosine_topk(
        e, e.filter(F.col("vec_id") == 0), k=_HYBRID_DEPTH, max_queries=4
    ).select(
        F.col("neighbor_id").alias("doc_id"),
        F.round("cosine", 6).alias("cosine"),
    )
    w_vec = Window.orderBy(F.col("cosine").desc(), "doc_id")
    vec = (
        cand.orderBy(F.col("cosine").desc(), "doc_id")
        .limit(_HYBRID_DEPTH)
        .withColumn("r_vec", F.row_number().over(w_vec))
        .select("doc_id", "r_vec")
    )

    # -- reciprocal-rank fusion over the two ~50-row candidate lists
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        "r_lex",
        "r_vec",
        F.round(
            F.coalesce(1.0 / (_RRF_K + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("r_vec")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(20)


_SIDX_ORACLE = f"""
    WITH final AS (
      SELECT doc_id,
             CASE WHEN doc_id % 17 = 0
                  THEN text || ' spark vector hash join'
                  ELSE text END AS text
      FROM documents WHERE source IS DISTINCT FROM 'src4'
      UNION ALL
      SELECT 100000 + i AS doc_id,
             'spark hash join vector quantum flux ' || repeat('pad ', i)
               AS text
      FROM unnest(range(0, 5)) AS u(i)
    ),
    toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM final
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('join', 'hash', 'vector', 'spark') GROUP BY 1, 2
    ),
    idf AS (
      SELECT tf.term,
             ln(1.0 + (stats.n - count(DISTINCT tf.doc_id) + 0.5)
                      / (count(DISTINCT tf.doc_id) + 0.5)) AS idf
      FROM tf, stats GROUP BY tf.term, stats.n
    ),
    scored AS (
      SELECT tf.doc_id,
             sum(idf.idf * tf.tf * ({_K1} + 1.0)
                 / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl)))
               AS score
      FROM tf
      JOIN idf USING (term)
      JOIN dl USING (doc_id), stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 6) AS score
    FROM scored ORDER BY round(score, 6) DESC, doc_id LIMIT 20
    """


@register(
    "search_index_bm25",
    _SIDX_ORACLE,
)
def search_index_bm25(spark, sf_dir):
    """BM25 served from an INCREMENTALLY-MAINTAINED inverted index —
    the Spark-native replacement for the reference's Elasticsearch
    handoff (data_refresh_task_factory.py:183-240 re-ships whole tables
    to an external indexer per refresh). The fixture builds the index
    from a documents snapshot, churns the base (DELETE one source,
    UPDATE every 17th doc's text, INSERT five new docs), refreshes the
    index FROM THE CHANGE FEED (cost O(changed docs): old postings come
    from feed pre-images, never an index scan; one file-skipped
    merge_when per index table), then answers top-20 BM25 from postings
    alone — the corpus is never re-tokenized at query time, and posting
    files are term-range pruned. The oracle recomputes BM25 over the
    post-churn corpus from scratch: the index must equal the scan."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.searchindex import SearchIndex
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    d = _t(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "text", "source"
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_searchidx")
    shutil.rmtree(root, ignore_errors=True)
    base = CowTable.create(
        spark, os.path.join(root, "docs"), d,
        keys=("doc_id",), target_files=4,
    )
    idx = SearchIndex.create(spark, os.path.join(root, "idx"), base)
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    base.delete(F.col("source") == "src4")
    base.update(
        F.col("doc_id") % 17 == 0,
        {"text": F.concat(F.col("text"), F.lit(" spark vector hash join"))},
    )
    cols = [
        ColumnSpec("doc_id", Datatype.int, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("text", Datatype.char),
        ColumnSpec("source", Datatype.char),
    ]
    newdocs = literal_df(spark, 
        [(100000 + i, "spark hash join vector quantum flux " + "pad " * i,
          "srcX") for i in range(5)],
        "doc_id long, text string, source string",
    )
    base.merge(newdocs, cols)
    idx.refresh()
    return idx.bm25(["join", "hash", "vector", "spark"], 20)


#: exact-phrase oracle over the SAME post-churn corpus as
#: _SIDX_ORACLE: rebuild the filtered token sequence with 0-based
#: positions from scratch, then a phrase occurrence is one shared
#: start offset where token i of the phrase sits at (start + i) —
#: exactly what the index verifies against its stored positions.
_SIDX_PHRASE_ORACLE = f"""
    WITH final AS (
      SELECT doc_id,
             CASE WHEN doc_id % 17 = 0
                  THEN text || ' spark vector hash join'
                  ELSE text END AS text
      FROM documents WHERE source IS DISTINCT FROM 'src4'
      UNION ALL
      SELECT 100000 + i AS doc_id,
             'spark hash join vector quantum flux ' || repeat('pad ', i)
               AS text
      FROM unnest(range(0, 5)) AS u(i)
    ),
    arrs AS (SELECT doc_id, {_TOKS_SQL} AS arr FROM final
             WHERE text IS NOT NULL),
    tok AS (SELECT doc_id, arr[i] AS term, i - 1 AS pos
            FROM arrs, unnest(range(1, len(arr) + 1)) AS t(i)),
    slots AS (SELECT * FROM (VALUES ('hash', 0), ('join', 1))
              AS v(term, slot)),
    occ AS (SELECT t.doc_id, t.pos - s.slot AS start
            FROM tok t JOIN slots s USING (term)
            GROUP BY t.doc_id, t.pos - s.slot
            HAVING count(DISTINCT s.slot) = 2),
    hits AS (SELECT doc_id, count(*) AS hits FROM occ GROUP BY doc_id)
    SELECT doc_id, hits FROM hits
    ORDER BY hits DESC, doc_id LIMIT 20
    """


@register(
    "search_index_phrase",
    _SIDX_PHRASE_ORACLE,
)
def search_index_phrase(spark, sf_dir):
    """EXACT-PHRASE search served from the POSITIONAL postings — the
    capability BM25's bag-of-terms OR cannot express (the reference's
    ES handoff serves phrase queries via its own positional index,
    data_refresh_task_factory.py:183-240; this is the in-lake twin).
    Same fixture + churn as search_index_bm25 — the positions ride the
    identical CDF net-transition maintenance (they are row-local, so a
    changed doc's postings re-derive wholesale) — then
    ``phrase('hash join', 20)``: candidates from the term-range-pruned
    postings of the phrase's two terms only, adjacency verified against
    stored positions, hits = occurrence count. The oracle rebuilds the
    filtered token sequence from scratch and counts shared-start
    matches — the index must equal the scan."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.searchindex import SearchIndex
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    d = _t(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "text", "source"
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_phraseidx")
    shutil.rmtree(root, ignore_errors=True)
    base = CowTable.create(
        spark, os.path.join(root, "docs"), d,
        keys=("doc_id",), target_files=4,
    )
    idx = SearchIndex.create(spark, os.path.join(root, "idx"), base)
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    base.delete(F.col("source") == "src4")
    base.update(
        F.col("doc_id") % 17 == 0,
        {"text": F.concat(F.col("text"), F.lit(" spark vector hash join"))},
    )
    cols = [
        ColumnSpec("doc_id", Datatype.int, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("text", Datatype.char),
        ColumnSpec("source", Datatype.char),
    ]
    newdocs = literal_df(spark, 
        [(100000 + i, "spark hash join vector quantum flux " + "pad " * i,
          "srcX") for i in range(5)],
        "doc_id long, text string, source string",
    )
    base.merge(newdocs, cols)
    idx.refresh()
    return idx.phrase("hash join", 20)


#: filtered-BM25 oracle: same post-churn corpus, candidates restricted
#: to the predicate's docs BEFORE scoring, while idf/N/avgdl stay
#: corpus-wide (the Lucene/ES filter-context rule the engine follows).
_SIDX_FILTERED_ORACLE = f"""
    WITH final AS (
      SELECT doc_id,
             CASE WHEN doc_id % 17 = 0
                  THEN text || ' spark vector hash join'
                  ELSE text END AS text,
             source
      FROM documents WHERE source IS DISTINCT FROM 'src4'
      UNION ALL
      SELECT 100000 + i AS doc_id,
             'spark hash join vector quantum flux ' || repeat('pad ', i)
               AS text,
             'srcX' AS source
      FROM unnest(range(0, 5)) AS u(i)
    ),
    toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM final
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('join', 'hash', 'vector', 'spark') GROUP BY 1, 2
    ),
    idf AS (
      SELECT tf.term,
             ln(1.0 + (stats.n - count(DISTINCT tf.doc_id) + 0.5)
                      / (count(DISTINCT tf.doc_id) + 0.5)) AS idf
      FROM tf, stats GROUP BY tf.term, stats.n
    ),
    mset AS (SELECT doc_id FROM final WHERE source <> 'srcX'),
    scored AS (
      SELECT tf.doc_id,
             sum(idf.idf * tf.tf * ({_K1} + 1.0)
                 / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl)))
               AS score
      FROM tf
      JOIN mset USING (doc_id)
      JOIN idf USING (term)
      JOIN dl USING (doc_id), stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 6) AS score
    FROM scored ORDER BY round(score, 6) DESC, doc_id LIMIT 20
    """


@register(
    "search_index_filtered",
    _SIDX_FILTERED_ORACLE,
)
def search_index_filtered(spark, sf_dir):
    """FILTERED BM25 from the index — the lexical twin of
    vector_index_filtered (the reference's ES consumers filter by
    license/provider on every request,
    data_refresh_task_factory.py:183-240): the predicate pre-filters
    against the BASE table at the index's applied version and
    candidates semi-join the match set BEFORE scoring, while idf/N/
    avgdl stay CORPUS-WIDE (the Lucene filter-context rule — a filter
    restricts candidates, it does not re-weigh term rarity). The churn
    inserts 'srcX' docs that would dominate the unfiltered top-k; the
    filter excludes them, so the filtered ranking differs materially
    and the oracle pins the exact contract."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.searchindex import SearchIndex
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    d = _t(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "text", "source"
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_fltsidx")
    shutil.rmtree(root, ignore_errors=True)
    base = CowTable.create(
        spark, os.path.join(root, "docs"), d,
        keys=("doc_id",), target_files=4,
    )
    idx = SearchIndex.create(spark, os.path.join(root, "idx"), base)
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    base.delete(F.col("source") == "src4")
    base.update(
        F.col("doc_id") % 17 == 0,
        {"text": F.concat(F.col("text"), F.lit(" spark vector hash join"))},
    )
    cols = [
        ColumnSpec("doc_id", Datatype.int, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("text", Datatype.char),
        ColumnSpec("source", Datatype.char),
    ]
    newdocs = literal_df(spark, 
        [(100000 + i, "spark hash join vector quantum flux " + "pad " * i,
          "srcX") for i in range(5)],
        "doc_id long, text string, source string",
    )
    base.merge(newdocs, cols)
    idx.refresh()
    return idx.bm25(
        ["join", "hash", "vector", "spark"], 20, where="source <> 'srcX'"
    )


@register(
    "sql_search_index",
    _SIDX_ORACLE,
)
def sql_search_index(spark, sf_dir):
    """The search-index lifecycle as pure facade text: ``CREATE SEARCH
    INDEX`` over a CTAS'd documents table, the SAME churn as
    search_index_bm25 applied via DELETE / UPDATE / INSERT statements,
    ``REFRESH SEARCH INDEX`` (O(changed docs), result row carries the
    resync flag), and the inline ``SEARCH_INDEX('idx', 'terms', k)``
    relation — the reference's index handoff as five SQL statements.
    Shares search_index_bm25's oracle: the SQL surface must produce the
    byte-same top-20 as the API surface and the from-scratch scan."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.sql_facade import SqlFacade

    f = SqlFacade(spark)
    f.register_df("documents", _t(spark, sf_dir, "documents")["documents"])
    base = os.path.join(tempfile.gettempdir(), "spark_graft_sql_sidx")
    shutil.rmtree(base, ignore_errors=True)
    f.sql(
        "CREATE TABLE docs PRIMARY KEY (doc_id) "
        f"LOCATION '{base}/docs' AS "
        "SELECT doc_id, text, source FROM documents"
    )
    f.sql(
        "CREATE SEARCH INDEX idx ON docs (text) "
        f"LOCATION '{base}/idx'"
    )
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    f.sql("DELETE FROM docs WHERE source = 'src4'")
    f.sql(
        "UPDATE docs SET text = text || ' spark vector hash join' "
        "WHERE doc_id % 17 = 0"
    )
    f.sql(
        "INSERT INTO docs "
        "SELECT 100000 + id AS doc_id, "
        "concat('spark hash join vector quantum flux ', "
        "repeat('pad ', CAST(id AS INT))) AS text, "
        "'srcX' AS source FROM range(0, 5)"
    )
    r = f.sql("REFRESH SEARCH INDEX idx").head()
    assert r["refreshed"] and not r["resync"], r
    return f.sql(
        "SELECT doc_id, score "
        "FROM SEARCH_INDEX('idx', 'join hash vector spark', 20)"
    )


@register(
    "stream_search_maintenance",
    _SIDX_ORACLE,
)
def stream_search_maintenance(spark, sf_dir):
    """SCHEDULER-LESS index maintenance: the base table's own commit
    log, followed as a file stream, triggers each incremental index
    refresh — no cron, no external indexer queue. The fixture applies
    the standard churn in TWO waves with a maintenance drain after
    each, sharing one stream checkpoint (tick exactly-once across
    drains is pinned by the unit test; here the second drain's
    refreshed count proves the new commit was consumed incrementally),
    then answers the same BM25 query; the oracle is identical to
    search_index_bm25, so the streamed maintenance path must land the
    byte-same index state as the synchronous one."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.searchindex import SearchIndex
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )
    from openverse_catalog_spark.streaming.incremental import (
        stream_index_maintenance,
    )

    d = _t(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "text", "source"
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_stream_sidx")
    shutil.rmtree(root, ignore_errors=True)
    base = CowTable.create(
        spark, os.path.join(root, "docs"), d,
        keys=("doc_id",), target_files=4,
    )
    idx = SearchIndex.create(spark, os.path.join(root, "idx"), base)
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    ckpt = os.path.join(root, "ckpt")
    # wave 1: delete + update, then drain the commit log
    base.delete(F.col("source") == "src4")
    base.update(
        F.col("doc_id") % 17 == 0,
        {"text": F.concat(F.col("text"), F.lit(" spark vector hash join"))},
    )
    r1 = stream_index_maintenance(idx, ckpt)
    assert r1["refreshes"] >= 1 and r1["applied"] == base.version, r1
    # wave 2: the insert lands, the SAME checkpoint drains only the new
    # commit (exactly-once ticks across drains)
    cols = [
        ColumnSpec("doc_id", Datatype.int, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("text", Datatype.char),
        ColumnSpec("source", Datatype.char),
    ]
    newdocs = literal_df(spark, 
        [(100000 + i, "spark hash join vector quantum flux " + "pad " * i,
          "srcX") for i in range(5)],
        "doc_id long, text string, source string",
    )
    base.merge(newdocs, cols)
    r2 = stream_index_maintenance(idx, ckpt)
    assert r2["applied"] == base.version and r2["refreshes"] == 1, r2
    return idx.bm25(["join", "hash", "vector", "spark"], 20)


_HYBRID_IDX_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('join', 'hash', 'vector', 'spark') GROUP BY 1, 2
    ),
    idf AS (
      SELECT tf.term,
             ln(1.0 + (stats.n - count(DISTINCT tf.doc_id) + 0.5)
                      / (count(DISTINCT tf.doc_id) + 0.5)) AS idf
      FROM tf, stats GROUP BY tf.term, stats.n
    ),
    bm AS (
      SELECT tf.doc_id,
             round(sum(idf.idf * tf.tf * ({_K1} + 1.0)
                 / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))), 6)
               AS score
      FROM tf
      JOIN idf USING (term)
      JOIN dl USING (doc_id), stats
      GROUP BY tf.doc_id
    ),
    lex AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r_lex
      FROM bm QUALIFY r_lex <= {_HYBRID_DEPTH}
    ),
    ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, generate_series(1, 64) AS t(i)),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY vec_id),
    cex AS (SELECT vec_id AS centroid_id, i, x FROM ex WHERE vec_id % 40 = 0),
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
    probe AS (SELECT centroid_id FROM (
                SELECT centroid_id,
                       row_number() OVER (ORDER BY c DESC, centroid_id) AS r
                FROM acos WHERE vec_id = 0) WHERE r <= 2),
    cand AS (SELECT a.neighbor_id
             FROM assign a JOIN probe p USING (centroid_id)
             WHERE a.neighbor_id <> 0),
    cdot AS (SELECT e.vec_id AS doc_id, sum(e.x * q.x) AS dot
             FROM ex e JOIN ex q ON q.i = e.i AND q.vec_id = 0
             WHERE e.vec_id IN (SELECT neighbor_id FROM cand)
             GROUP BY e.vec_id),
    cos AS (SELECT cdot.doc_id,
                   round(dot / (na.nrm * nb.nrm), 6) AS cosine
            FROM cdot JOIN norms na ON na.vec_id = 0
                      JOIN norms nb ON nb.vec_id = cdot.doc_id),
    vec AS (
      SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS r_vec
      FROM cos QUALIFY r_vec <= {_HYBRID_DEPTH}
    ),
    fused AS (
      SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
             lex.r_lex, vec.r_vec,
             round(coalesce(1.0 / ({_RRF_K} + lex.r_lex), 0)
                   + coalesce(1.0 / ({_RRF_K} + vec.r_vec), 0), 6) AS rrf
      FROM lex FULL OUTER JOIN vec USING (doc_id)
    )
    SELECT doc_id, r_lex, r_vec, rrf
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 20
"""


#: filtered-hybrid oracle: the SAME predicate (id % 3 == 0 -> 'en')
#: restricts BOTH arms' candidates; lexical idf/N/avgdl stay
#: corpus-wide (the filter-context rule), the vector arm restricts the
#: probed candidates exactly like the engine's pre-filter semi-join.
_HYBRID_FLT_ORACLE = _HYBRID_IDX_ORACLE.replace(
    """    bm AS (
      SELECT tf.doc_id,""",
    """    mset AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
    bm AS (
      SELECT tf.doc_id,""",
).replace(
    """      FROM tf
      JOIN idf USING (term)""",
    """      FROM tf
      JOIN mset USING (doc_id)
      JOIN idf USING (term)""",
).replace(
    """    cand AS (SELECT a.neighbor_id
             FROM assign a JOIN probe p USING (centroid_id)
             WHERE a.neighbor_id <> 0),""",
    """    cand AS (SELECT a.neighbor_id
             FROM assign a JOIN probe p USING (centroid_id)
             WHERE a.neighbor_id <> 0 AND a.neighbor_id % 3 = 0),""",
)


@register("search_hybrid_filtered", _HYBRID_FLT_ORACLE)
def search_hybrid_filtered(spark, sf_dir):
    """FILTERED hybrid retrieval — one predicate pushed through BOTH
    index-served arms (the complete filtered-retrieval story: every
    real consumer of the reference's search handoff filters by
    license/provider on each request, and a hybrid ranker must apply
    the filter consistently on both sides or fusion re-surfaces
    excluded docs). Lexical arm: bm25(where=) — candidates pre-filter
    against the base, idf stays corpus-wide; vector arm:
    probe(where=) — candidates semi-join the match set inside the
    probed lists. Fusion is the same RRF; the oracle replays both
    filtered arms and the fusion exactly."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.searchindex import SearchIndex
    from openverse_catalog_spark.operators.vectorindex import VectorIndex

    d = _t(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "text",
        F.expr("CASE WHEN doc_id % 3 = 0 THEN 'en' "
               "WHEN doc_id % 3 = 1 THEN 'de' ELSE 'fr' END")
        .alias("lang"),
    )
    e = _t(spark, sf_dir, "embeddings")["embeddings"].select(
        "vec_id", "embedding",
        F.expr("CASE WHEN vec_id % 3 = 0 THEN 'en' "
               "WHEN vec_id % 3 = 1 THEN 'de' ELSE 'fr' END")
        .alias("lang"),
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_hybrid_flt")
    shutil.rmtree(root, ignore_errors=True)
    docs = CowTable.create(
        spark, os.path.join(root, "docs"), d, keys=("doc_id",),
        target_files=4,
    )
    vecs = CowTable.create(
        spark, os.path.join(root, "vecs"), e, keys=("vec_id",),
        target_files=4,
    )
    sidx = SearchIndex.create(spark, os.path.join(root, "sidx"), docs)
    vidx = VectorIndex.create(
        spark, os.path.join(root, "vidx"), vecs, centroid_mod=40,
    )
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()

    w_lex = Window.orderBy(F.col("score").desc(), "doc_id")
    lex = (
        sidx.bm25(_BM25_TERMS, _HYBRID_DEPTH, where="lang = 'en'")
        .withColumn("r_lex", F.row_number().over(w_lex))
        .select("doc_id", "r_lex")
    )
    queries = vecs.read().filter(F.col("vec_id") == 0)
    vec = vidx.probe(
        queries, k=_HYBRID_DEPTH, nprobe=2, rank_quantize=6,
        where="lang = 'en'",
    ).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("r_vec"),
    )
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        "r_lex",
        "r_vec",
        F.round(
            F.coalesce(1.0 / (_RRF_K + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("r_vec")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(20)


@register("search_hybrid_indexed", _HYBRID_IDX_ORACLE)
def search_hybrid_indexed(spark, sf_dir):
    """Hybrid BM25 + vector retrieval served FROM BOTH PERSISTED
    INDEXES — the index-served twin of search_hybrid_rrf, which scans
    the corpus for each arm. Here the lexical arm answers from the
    incrementally-maintained inverted index (term-pruned postings: only
    files whose term range matches a query term are opened; the corpus
    is never tokenized at query time) and the vector arm answers from
    the IVF index (nprobe=2 of ~C centroid lists, manifest-pruned: the
    lists table is never scanned whole). Fusion is the same RRF over
    2x{_HYBRID_DEPTH} candidate rows. At 100 TB this is the shape that
    matters: the full-scan variant's arms are single-scans of the
    corpus, the indexed variant's arms read files proportional to the
    QUERY (a few postings files + 2 inverted lists). The vector arm is
    honestly IVF-approximate, so the oracle replays the IVF math
    (deterministic centroids vec_id %% 40 = 0) rather than brute force;
    the lexical arm must byte-match the full-scan BM25."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.searchindex import SearchIndex
    from openverse_catalog_spark.operators.vectorindex import VectorIndex

    d = _t(spark, sf_dir, "documents")["documents"].select("doc_id", "text")
    e = _t(spark, sf_dir, "embeddings")["embeddings"].select(
        "vec_id", "embedding"
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_hybrid_idx")
    shutil.rmtree(root, ignore_errors=True)
    docs = CowTable.create(
        spark, os.path.join(root, "docs"), d, keys=("doc_id",),
        target_files=4,
    )
    vecs = CowTable.create(
        spark, os.path.join(root, "vecs"), e, keys=("vec_id",),
        target_files=4,
    )
    sidx = SearchIndex.create(spark, os.path.join(root, "sidx"), docs)
    vidx = VectorIndex.create(
        spark, os.path.join(root, "vidx"), vecs, centroid_mod=40,
    )
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()

    # lexical arm: index-served BM25, rank over the top-50 rows only
    w_lex = Window.orderBy(F.col("score").desc(), "doc_id")
    lex = (
        sidx.bm25(_BM25_TERMS, _HYBRID_DEPTH)
        .withColumn("r_lex", F.row_number().over(w_lex))
        .select("doc_id", "r_lex")
    )

    # vector arm: IVF probe for the vec_id=0 query embedding; the rank
    # key quantizes to the same 6 decimals the oracle ranks on
    queries = vecs.read().filter(F.col("vec_id") == 0)
    vec = vidx.probe(
        queries, k=_HYBRID_DEPTH, nprobe=2, rank_quantize=6
    ).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("r_vec"),
    )

    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        "r_lex",
        "r_vec",
        F.round(
            F.coalesce(1.0 / (_RRF_K + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("r_vec")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(20)
