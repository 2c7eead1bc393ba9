"""Corpus-construction sampling queries: deterministic Bernoulli samples,
exact stratified draws, and target-weight domain mixing — the sampling
layer a training-data pipeline puts between "cleaned corpus" and "training
shards". All hash-threshold based (operators/sampling.py) so membership is
engine- and partitioning-independent and the DuckDB oracle verifies the
exact sampled set, not just its size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openverse_catalog_spark.operators import sampling as smp
from openverse_catalog_spark.plans.analytics import _t, register

_RATE = 0.2
_SALT = "bern1"


@register(
    "sample_hash_bernoulli",
    f"""
    SELECT doc_id, source
    FROM documents
    WHERE {smp.keyhash_sql("doc_id", _SALT)} < {smp.threshold_sql(str(_RATE))}
    """,
)
def sample_hash_bernoulli(spark, sf_dir):
    """Deterministic 20% Bernoulli sample of the documents table. The
    keep-decision is a pure function of (salt, doc_id), so the sampled
    SET (not just its cardinality) is reproducible on any cluster size —
    unlike df.sample(), whose draw depends on partitioning. Plan: a
    single narrow filter pushed at the scan; no shuffle."""
    d = _t(spark, sf_dir, "documents")["documents"]
    return smp.hash_sample(d, "doc_id", _RATE, _SALT).select("doc_id", "source")


_N_PER = 10
_STRAT_SALT = "strat1"


@register(
    "sample_stratified_source",
    f"""
    SELECT doc_id, source
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {smp.keyhash_sql("doc_id", _STRAT_SALT)}, doc_id
             ) AS rn
      FROM documents
    )
    WHERE rn <= {_N_PER}
    """,
)
def sample_stratified_source(spark, sf_dir):
    """Exactly 10 documents per source, drawn by salted-hash order — an
    unbiased uniform draw per stratum that every engine reproduces.
    One shuffle on the stratum key; per-group state bounded by n."""
    d = _t(spark, sf_dir, "documents")["documents"]
    return smp.stratified_sample(
        d, ["source"], _N_PER, "doc_id", _STRAT_SALT
    ).select("doc_id", "source")


_MIX_WEIGHTS = {"en": 0.30, "de": 0.20, "es": 0.20, "fr": 0.15, "zh": 0.15}
_MIX_SALT = "mix1"
_W_VALUES = ", ".join(
    f"('{k}', CAST({v} AS DOUBLE))" for k, v in _MIX_WEIGHTS.items()
)


@register(
    "corpus_mix_langs",
    f"""
    WITH counts AS (
      SELECT lang, count(*) AS n_rows FROM documents GROUP BY lang
    ),
    need AS (
      SELECT c.lang, c.n_rows,
             coalesce(w.wt, CAST(0 AS DOUBLE)) / c.n_rows AS need
      FROM counts c
      LEFT JOIN (VALUES {_W_VALUES}) w(lang, wt) ON w.lang = c.lang
    ),
    rates AS (
      SELECT lang, need / (SELECT max(need) FROM need) AS rate FROM need
    )
    SELECT d.doc_id, d.lang
    FROM documents d
    JOIN rates r ON r.lang = d.lang
    WHERE {smp.keyhash_sql("d.doc_id", _MIX_SALT)}
          < {smp.threshold_sql("r.rate")}
    """,
)
def corpus_mix_langs(spark, sf_dir):
    """Domain mixing: resample the corpus to target language proportions
    (en is ~44% of rows but targeted at 30%, so it is downsampled; the
    most under-target language keeps every row). The per-language rate
    table is broadcast, so the documents table is filtered without a
    shuffle — the data-mixing step costs one narrow pass at any scale.
    The oracle recomputes the rates and verifies exact membership."""
    d = _t(spark, sf_dir, "documents")["documents"]
    return smp.domain_mix(d, "doc_id", "lang", _MIX_WEIGHTS, _MIX_SALT).select(
        "doc_id", "lang"
    )


_TOPK_SALT, _TOPK_N = "res1", 50


@register(
    "sample_topk_hash",
    f"""
    SELECT doc_id, source FROM documents
    ORDER BY {smp.keyhash_sql("doc_id", _TOPK_SALT)}, doc_id
    LIMIT {_TOPK_N}
    """,
)
def sample_topk_hash(spark, sf_dir):
    """Fixed-size uniform draw (the deterministic reservoir analog):
    the 50 smallest salted key-hashes. Spark plans TakeOrderedAndProject
    — each partition keeps a local top-50 heap and only those rows reach
    the driver-side merge, so no global sort and no full shuffle at any
    scale. Same nested-sample property as hash_sample: growing n only
    adds rows."""
    d = _t(spark, sf_dir, "documents")["documents"]
    h = smp._keyhash(F.col("doc_id"), _TOPK_SALT)
    return (
        d.select("doc_id", "source", h.alias("_h"))
        .orderBy("_h", "doc_id")
        .limit(_TOPK_N)
        .drop("_h")
    )


_LF_SALT = "leakfree"
_LF_D_SQL = """d AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0
    )"""


@register(
    "corpus_split_leakfree",
    f"""
    WITH {_LF_D_SQL},
    reps AS (SELECT text, min(doc_id) AS group_rep FROM d GROUP BY text)
    SELECT d.doc_id, r.group_rep,
           {smp.keyhash_sql("r.group_rep", _LF_SALT)} % 100 AS bucket,
           CASE WHEN {smp.keyhash_sql("r.group_rep", _LF_SALT)} % 100 < 90
                  THEN 'train'
                WHEN {smp.keyhash_sql("r.group_rep", _LF_SALT)} % 100 < 95
                  THEN 'val'
                ELSE 'test' END AS split
    FROM d JOIN reps r ON r.text = d.text
    """,
)
def corpus_split_leakfree(spark, sf_dir):
    """Leakage-free train/val/test split over a corpus salted with exact
    duplicates (every 5th doc repeated under a new id): the split is a
    function of each dup GROUP's representative, so a duplicate can
    never straddle train and test — the guard against eval contamination
    that a per-row hash split (corpus_split_assign) does not give. The
    groupBy shuffles md5(text) keys (32 bytes), never document text; the
    oracle pins that every group lands whole in one split."""
    d = _t(spark, sf_dir, "documents")["documents"]
    corpus = d.select("doc_id", "text").unionAll(
        d.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    out = smp.leakage_free_split(corpus, "doc_id", F.col("text"), salt=_LF_SALT)
    return out.select("doc_id", "group_rep", "bucket", "split")


_TB_SALT, _TB_BUDGET = "tokcap", 700


@register(
    "corpus_token_budget_cap",
    f"""
    WITH t AS (
      SELECT doc_id, source,
             len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '')) AS n_tokens,
             {smp.keyhash_sql("doc_id", _TB_SALT)} AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cum_before
      FROM t
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_before AS BIGINT) AS cum_before
    FROM c WHERE cum_before < {_TB_BUDGET}
    """,
)
def corpus_token_budget_cap(spark, sf_dir):
    """Per-source token budget: walk each source's docs in deterministic
    hash order and keep docs until the tokens before them reach 700 —
    token-level downsampling, the unit a training-mix budget actually
    specifies (domain_mix is doc-level). The operator never sorts a
    whole domain in one task: the hash order splits by its own high bits
    into 1024 ranges, bucket totals cumulate in a tiny window, and the
    exact running sum runs only within each (source, bucket) partition —
    the same keep set as a global walk, shuffle-bounded at any scale.
    The oracle IS the global walk, pinning that equivalence."""
    from openverse_catalog_spark.functions import text as tx

    d = _t(spark, sf_dir, "documents")["documents"]
    t = d.select(
        "doc_id", "source", tx.token_count(F.col("text")).alias("n_tokens")
    )
    out = smp.token_budget_cap(
        t, "doc_id", "n_tokens", "source", _TB_BUDGET, _TB_SALT
    )
    return out.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("cum_before").cast("bigint").alias("cum_before"),
    )


_W_SALT, _W_SCALE_DIV = "wsample", 400.0


@register(
    "sample_weighted",
    f"""
    SELECT doc_id, n_chars
    FROM documents
    WHERE {smp.keyhash_sql("doc_id", _W_SALT)}
          < {smp.threshold_sql(f"least(n_chars / {_W_SCALE_DIV}, 1.0)")}
    """,
)
def sample_weighted(spark, sf_dir):
    """Deterministic weighted Bernoulli: each doc kept with probability
    proportional to its length (min(n_chars/400, 1)) — importance
    sampling where a uniform rate would over-keep short boilerplate.
    Same engine/partition/run independence as the uniform sampler (keep
    decision = pure function of salt, key, weight); a narrow filter,
    no shuffle, exact-membership oracle."""
    d = _t(spark, sf_dir, "documents")["documents"]
    return smp.weighted_sample(
        d, "doc_id", F.col("n_chars") / _W_SCALE_DIV, salt=_W_SALT
    ).select("doc_id", "n_chars")


_EP, _EP_SHARDS = 1, 8


@register(
    "corpus_epoch_shuffle",
    f"""
    SELECT doc_id,
           CAST(h % {_EP_SHARDS} AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY h % {_EP_SHARDS}
                                   ORDER BY h, doc_id) AS INT) AS pos
    FROM (SELECT doc_id, {smp.keyhash_sql("doc_id", f"epoch|{_EP}")} AS h
          FROM documents)
    """,
)
def corpus_epoch_shuffle(spark, sf_dir):
    """Deterministic per-epoch training order: hash(salt|epoch|doc_id)
    drives both shard routing and within-shard position, so every epoch
    is a fresh pseudo-random global permutation that any engine
    reproduces — and nothing global ever sorts (the one shuffle
    partitions on shard; each task orders only its own shard). The
    distributed answer to 'reshuffle the corpus every epoch' that ORDER
    BY rand() gets wrong twice: nondeterministic AND a global sort."""
    d = _t(spark, sf_dir, "documents")["documents"]
    out = smp.epoch_shuffle(d, "doc_id", epoch=_EP, n_shards=_EP_SHARDS)
    return out.select(
        "doc_id", "shard", F.col("pos").cast("int").alias("pos")
    )


_UP_SALT = "upsample"
_UP_FACTORS = {"fr": 2.5, "zh": 3.0}
_UP_VALUES = ", ".join(
    f"('{k}', CAST({v} AS DOUBLE))" for k, v in _UP_FACTORS.items()
)


@register(
    "corpus_upsample_langs",
    f"""
    WITH fac AS (
      SELECT d.doc_id, d.lang,
             coalesce(f.fv, CAST(1.0 AS DOUBLE)) AS f
      FROM documents d
      LEFT JOIN (VALUES {_UP_VALUES}) f(lang, fv) ON f.lang = d.lang
    ),
    n AS (
      SELECT doc_id, lang,
             CAST(floor(f) AS INT)
             + CASE WHEN {smp.keyhash_sql("doc_id", _UP_SALT)}
                         < {smp.threshold_sql("f - floor(f)")}
                    THEN 1 ELSE 0 END AS n
      FROM fac
    )
    SELECT doc_id, lang, CAST(t.copy_id AS INT) AS copy_id
    FROM n, unnest(range(1, n + 1)) AS t(copy_id)
    WHERE n > 0
    """,
)
def corpus_upsample_langs(spark, sf_dir):
    """Deterministic domain UPsampling (fr x2.5, zh x3, rest x1): each
    doc repeats floor(f) times plus a hash-thresholded fractional copy,
    so expected replication is exactly f while the sampled epoch stays
    reproducible on any engine or partitioning — the under-represented-
    domain half of data mixing (domain_mix only downsamples). A narrow
    explode, no shuffle; the oracle verifies exact replica membership
    including every copy_id."""
    d = _t(spark, sf_dir, "documents")["documents"]
    out = smp.domain_upsample(d, "doc_id", "lang", _UP_FACTORS, _UP_SALT)
    return out.select("doc_id", "lang", F.col("copy_id").cast("int").alias("copy_id"))


@register(
    "corpus_mix_temperature",
    f"""
    WITH counts AS (
      SELECT lang, count(*) AS n_rows FROM documents GROUP BY lang
    ),
    rates AS (
      SELECT lang,
             round(pow(CAST(n_rows AS DOUBLE)
                       / (SELECT min(n_rows) FROM counts), -0.5), 9) AS rate
      FROM counts
    )
    SELECT d.doc_id, d.lang
    FROM documents d
    JOIN rates r ON r.lang = d.lang
    WHERE {smp.keyhash_sql("d.doc_id", "tmix")}
          < {smp.threshold_sql("r.rate")}
    """,
)
def corpus_mix_temperature(spark, sf_dir):
    """Temperature sampling (alpha=0.5, the mC4/PaLM multilingual
    recipe): per-language keep-rates (n/n_min)^(alpha-1) flatten the
    language distribution toward uniform — no explicit weight table,
    the corpus's own counts drive the mix. Broadcast rate table + one
    narrow hash filter; rates rounded to 9 decimals so the oracle's
    pow() agrees exactly. Exact-membership oracle."""
    d = _t(spark, sf_dir, "documents")["documents"]
    return smp.temperature_mix(d, "doc_id", "lang", alpha=0.5).select(
        "doc_id", "lang"
    )


# ---------------------------------------------------------------------------
# DSIR — importance resampling toward a target domain (operators/sampling.py)
# ---------------------------------------------------------------------------

_DSIR_TGT = "('src1', 'src2', 'src3')"
_DSIR_TGT_LIST = ["src1", "src2", "src3"]
_DSIR_B = 512
_DSIR_A = 0.5
_DSIR_K = 80


def _dsir_counts_cte() -> str:
    """Shared oracle CTE prefix: gram buckets + target/raw counts and
    totals (bk, tc, rc, tt, rt) — NO trailing comma."""
    return f"""
    WITH bk AS (
      {smp.dsir_grams_sql("documents", "doc_id", "text",
                          n_buckets=_DSIR_B, keep=", source")}
    ),
    tc AS (SELECT bucket, count(*) AS ct FROM bk
           WHERE source IN {_DSIR_TGT} GROUP BY bucket),
    rc AS (SELECT bucket, count(*) AS cr FROM bk
           WHERE source NOT IN {_DSIR_TGT} GROUP BY bucket),
    tt AS (SELECT count(*) AS nt FROM bk WHERE source IN {_DSIR_TGT}),
    rt AS (SELECT count(*) AS nr FROM bk WHERE source NOT IN {_DSIR_TGT})
    """


def _dsir_weights_cte() -> str:
    """Shared oracle CTE chain ending in lw(doc_id, n_grams, logweight)."""
    ab = _DSIR_A * _DSIR_B
    return _dsir_counts_cte() + f""",
    w AS (
      SELECT rc.bucket,
             ln((coalesce(tc.ct, 0) + {_DSIR_A}) / (tt.nt + {ab}))
             - ln((rc.cr + {_DSIR_A}) / (rt.nr + {ab})) AS logw
      FROM rc LEFT JOIN tc USING (bucket) CROSS JOIN tt CROSS JOIN rt
    ),
    lw AS (
      SELECT b.doc_id, count(*) AS n_grams, sum(w.logw) AS logweight
      FROM bk b JOIN w USING (bucket)
      WHERE b.source NOT IN {_DSIR_TGT}
      GROUP BY b.doc_id
    )
    """


def _dsir_frames(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    tgt = d.filter(F.col("source").isin(*_DSIR_TGT_LIST))
    raw = d.filter(~F.col("source").isin(*_DSIR_TGT_LIST))
    return raw, tgt


@register(
    "sample_dsir_weights",
    _dsir_weights_cte()
    + """
    SELECT doc_id, n_grams, round(logweight, 4) AS logweight FROM lw
    """,
)
def sample_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023, arxiv 2302.03169): score
    every raw document by how much its hashed unigram+bigram distribution
    looks like the target domain (here sources src1-3) — log w = sum over
    gram occurrences of ln p_target(bucket) - ln p_raw(bucket), additively
    smoothed, B=512 buckets. THE published recipe for "give me more data
    like this domain sample" corpus construction. Plan: gram arrays built
    inside the token array (zip_with on slices — no token shuffle), one
    explode per side, two <=B-row map-side-combined count tables, a B-row
    broadcast weight join, and a single doc_id shuffle for the per-doc sum.
    Oracle verifies every doc's weight to 4 decimals."""
    raw, tgt = _dsir_frames(spark, sf_dir)
    lw = smp.dsir_logweights(raw, tgt, "doc_id", "text",
                             n_buckets=_DSIR_B, alpha=_DSIR_A)
    return lw.select(
        "doc_id", "n_grams", F.round("logweight", 4).alias("logweight")
    )


@register(
    "sample_dsir_select",
    _dsir_weights_cte()
    + f"""
    SELECT doc_id, source, round(score, 4) AS score
    FROM (
      SELECT lw.doc_id, d.source,
             lw.logweight + {smp.dsir_gumbel_sql("lw.doc_id")} AS score
      FROM lw JOIN documents d USING (doc_id)
    )
    ORDER BY score DESC, doc_id
    LIMIT {_DSIR_K}
    """,
)
def sample_dsir_select(spark, sf_dir):
    """DSIR selection step: Gumbel-top-k over the importance weights —
    score = logweight + Gumbel(0,1), the standard identity for sampling k
    docs WITHOUT replacement proportionally to their importance weight.
    The Gumbel draw is the inverse-CDF of the doc's salted hash60, so the
    selected SET is a pure function of (corpus, salts): reproducible on
    any cluster size, any partitioning — and the oracle verifies exact
    membership, not just the count. TakeOrdered top-k; no global sort."""
    raw, tgt = _dsir_frames(spark, sf_dir)
    sel = smp.dsir_select(
        raw, tgt, "doc_id", "text", _DSIR_K,
        n_buckets=_DSIR_B, alpha=_DSIR_A, keep=["source"],
    )
    return sel.select("doc_id", "source", F.round("score", 4).alias("score"))


@register(
    "sample_dsir_incremental",
    _dsir_counts_cte()
    + f""",
    wd AS (
      SELECT allb.bucket,
             ln((coalesce(tc.ct, 0) + {_DSIR_A}) / (tt.nt + {_DSIR_A * _DSIR_B}))
             - ln((coalesce(rc.cr, 0) + {_DSIR_A}) / (rt.nr + {_DSIR_A * _DSIR_B}))
               AS logw
      FROM (SELECT CAST(u.b AS BIGINT) AS bucket
            FROM unnest(range(0, {_DSIR_B})) AS u(b)) allb
      LEFT JOIN tc USING (bucket)
      LEFT JOIN rc USING (bucket)
      CROSS JOIN tt CROSS JOIN rt
    ),
    batch AS (
      SELECT doc_id + 100000 AS doc_id, bucket
      FROM bk WHERE source IN ('src4', 'src5')
    )
    SELECT b.doc_id, count(*) AS n_grams,
           round(sum(wd.logw), 4) AS logweight
    FROM batch b JOIN wd USING (bucket)
    GROUP BY b.doc_id
    """,
)
def sample_dsir_incremental(spark, sf_dir):
    """The PRODUCTION DSIR shape: fit the importance model ONCE on the
    corpus snapshot, persist it (a dense B-row parquet — every bucket
    0..B-1 carries a weight so unseen grams score at the smoothing
    floor instead of dropping), then score an ARRIVING batch against
    the frozen model without rescanning the fitting corpus. The batch
    here is src4/src5 docs re-keyed as new arrivals. Plan: the batch
    side explodes its grams once, joins the B-row broadcast model, and
    shuffles only the per-doc sum — batch cost is independent of corpus
    size, exactly what a 100 TB corpus's ingest tick needs."""
    import os
    import shutil
    import tempfile

    raw, tgt = _dsir_frames(spark, sf_dir)
    model_dir = os.path.join(
        tempfile.gettempdir(), "spark_graft_dsir_model"
    )
    shutil.rmtree(model_dir, ignore_errors=True)
    smp.dsir_model(
        spark, raw, tgt, "doc_id", "text",
        n_buckets=_DSIR_B, alpha=_DSIR_A,
    ).write.parquet(model_dir)
    d = _t(spark, sf_dir, "documents")["documents"]
    batch = d.filter(F.col("source").isin("src4", "src5")).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    model = spark.read.parquet(model_dir)
    sc = smp.dsir_score(batch, model, "doc_id", "text", n_buckets=_DSIR_B)
    return sc.select(
        "doc_id", "n_grams", F.round("logweight", 4).alias("logweight")
    )
