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
