"""Sequence-assembly queries: length-bucket profiles, shard-local packing
plans, and fixed-stride chunk spans over the documents table. These are
the corpus -> training-sequences steps (batch-shape bucketing, bin
packing against a token budget, sliding-window chunking); each is
deterministic and verified value-exact against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openverse_catalog_spark.functions import text as tx
from openverse_catalog_spark.operators import packing as pk
from openverse_catalog_spark.plans.analytics import _t, register

_TOK_SQL = (
    "len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
    " t -> t <> ''))"
)

_BOUNDS = (16, 24, 32, 40)


@register(
    "corpus_length_buckets",
    f"""
    WITH t AS (SELECT lang, {_TOK_SQL} AS n_tok FROM documents)
    SELECT lang,
           {pk.length_bucket_sql("n_tok", _BOUNDS)} AS bucket,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS tok_sum,
           min(n_tok) AS tok_min,
           max(n_tok) AS tok_max
    FROM t GROUP BY lang, bucket
    """,
)
def corpus_length_buckets(spark, sf_dir):
    """Length-bucket profile per language: bucket = #boundaries <= token
    count. Pure expression (no join, no HOF), so bucketing adds zero
    shuffles on top of the aggregation; downstream batching groups by
    bucket to bound padding waste."""
    d = _t(spark, sf_dir, "documents")["documents"]
    n = tx.token_count(F.col("text"))
    return (
        d.select("lang", n.alias("n_tok"))
        .groupBy("lang", pk.length_bucket(F.col("n_tok"), _BOUNDS).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tok_sum"),
            F.min("n_tok").alias("tok_min"),
            F.max("n_tok").alias("tok_max"),
        )
    )


_BUDGET = 512


@register(
    "corpus_pack_sequences",
    f"""
    WITH t AS (SELECT source, doc_id, {_TOK_SQL} AS n_tok FROM documents),
    off AS (
      SELECT source, n_tok,
             sum(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tok AS start
      FROM t
    )
    SELECT source,
           CAST(floor(start / {_BUDGET}) AS BIGINT) AS bin,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS tok_sum
    FROM off GROUP BY source, bin
    """,
)
def corpus_pack_sequences(spark, sf_dir):
    """Shard-local sequence packing plan: docs stream in doc_id order
    within each source shard; each lands in the bin holding its start
    offset against a 512-token budget. Shards pack in parallel (one
    shuffle on source); a global pack would serialize — at scale the
    shard IS the output-file unit. Returns per-bin fill accounting."""
    d = _t(spark, sf_dir, "documents")["documents"]
    t = d.select("source", "doc_id", tx.token_count(F.col("text")).alias("n_tok"))
    packed = pk.pack_offsets(t, "source", "doc_id", "n_tok", _BUDGET)
    return packed.groupBy("source", F.col("_bin").alias("bin")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("tok_sum"),
    )


_WIN, _STRIDE = 16, 12


@register(
    "corpus_chunk_docs",
    f"""
    WITH t AS (SELECT doc_id, {_TOK_SQL} AS n FROM documents)
    SELECT doc_id,
           CAST(start / {_STRIDE} AS BIGINT) AS chunk_idx,
           start,
           least({_WIN}, n - start) AS chunk_len
    FROM (
      SELECT doc_id, n,
             unnest(range(0, greatest(n - 1, 0) + 1, {_STRIDE})) AS start
      FROM t
    )
    """,
)
def corpus_chunk_docs(spark, sf_dir):
    """Sliding-window chunking: 16-token windows at stride 12 (4-token
    overlap) per document — the standard long-doc -> context-window
    split. Row-local posexplode: no shuffle, output linear in corpus
    tokens / stride; empty docs still emit one zero-length span so
    accounting stays total."""
    d = _t(spark, sf_dir, "documents")["documents"]
    spans = pk.chunk_spans(d, ["doc_id"], "text", _WIN, _STRIDE)
    return spans.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("start").cast("bigint").alias("start"),
        F.col("chunk_len").cast("bigint").alias("chunk_len"),
    )


@register(
    "corpus_pack_segments",
    f"""
    WITH t AS (SELECT source, doc_id, {_TOK_SQL} AS n_tok FROM documents),
    off AS (
      SELECT source, doc_id, n_tok,
             sum(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tok AS start
      FROM t
    )
    SELECT source,
           CAST(floor(start / {_BUDGET}) AS BIGINT) AS bin,
           CAST(row_number() OVER (
             PARTITION BY source, floor(start / {_BUDGET})
             ORDER BY doc_id) - 1 AS INTEGER) AS seg_idx,
           doc_id,
           CAST(start - floor(start / {_BUDGET}) * {_BUDGET} AS BIGINT)
             AS seg_start,
           n_tok AS seg_len
    FROM off
    """,
)
def corpus_pack_segments(spark, sf_dir):
    """The packed corpus as a trainer consumes it: one row per SEGMENT
    with its bin, in-bin index, within-bin token offset and length —
    the attention-mask boundaries of packed-sequence training. Same
    one-shuffle pack as corpus_pack_sequences; the oracle replays the
    identical offsets per segment."""
    d = _t(spark, sf_dir, "documents")["documents"]
    t = d.select("source", "doc_id", tx.token_count(F.col("text")).alias("n_tok"))
    return pk.pack_segments(t, "source", "doc_id", "n_tok", _BUDGET)
