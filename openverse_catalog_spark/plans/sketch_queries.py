"""Sketch queries: count-min heavy hitters with a value-exact oracle.

The reference's volume/duplicate reports are exact GROUP BYs; at 100 TB
the mergeable-sketch form is the one that survives (bounded state,
map-side combinable, streaming-unionable). The md5 hash rows make the
whole grid reproducible in DuckDB, so even the sketch is hash-gated.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openverse_catalog_spark.operators import sketches as sk
from openverse_catalog_spark.plans.analytics import _t, register

_W, _D, _SALT, _TOPK = 64, 4, "hh", 10

_GRID_SQL = "\n      UNION ALL\n".join(
    f"""      SELECT {i} AS row, {sk.cell_sql("user_id", i, _W, _SALT)} AS cell,
             count(*) AS cnt
      FROM events GROUP BY cell"""
    for i in range(_D)
)
_PROBE_SQL = "\n      UNION ALL\n".join(
    f"""      SELECT user_id, {i} AS row,
             {sk.cell_sql("user_id", i, _W, _SALT)} AS cell
      FROM cand"""
    for i in range(_D)
)


@register(
    "sketch_cms_heavy_hitters",
    f"""
    WITH grid AS (
{_GRID_SQL}
    ),
    cand AS (SELECT DISTINCT user_id FROM events),
    probe AS (
{_PROBE_SQL}
    ),
    est AS (
      SELECT p.user_id, min(coalesce(g.cnt, 0)) AS est
      FROM probe p
      LEFT JOIN grid g ON g.row = p.row AND g.cell = p.cell
      GROUP BY p.user_id
    ),
    truth AS (SELECT user_id, count(*) AS true_cnt FROM events GROUP BY user_id)
    SELECT e.user_id, e.est, t.true_cnt
    FROM est e JOIN truth t ON t.user_id = e.user_id
    ORDER BY e.est DESC, e.user_id
    LIMIT {_TOPK}
    """,
)
def sketch_cms_heavy_hitters(spark, sf_dir):
    """Top event producers via a 4x64 count-min sketch, scored against
    exact counts. The grid shuffles 256 counters regardless of input
    size (the input itself is never shuffled to build it), merges by
    addition across partitions/batches/days, and estimates are
    one-sided (est >= true). 150 users in 64 cells guarantees
    collisions, so the oracle also pins the overestimate behavior."""
    e = _t(spark, sf_dir, "events")["events"]
    grid = sk.cms_build(e, "user_id", _W, _D, _SALT)
    cand = e.select("user_id").distinct()
    est = sk.cms_estimate(cand, "user_id", grid, _W, _D, _SALT)
    truth = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    return (
        est.join(truth, "user_id")
        .orderBy(F.desc("est"), "user_id")
        .limit(_TOPK)
        .select("user_id", "est", "true_cnt")
    )


@register(
    "dedup_cross_corpus_bloom",
    """
    SELECT b.doc_id
    FROM documents b
    WHERE b.doc_id % 2 = 0
      AND NOT EXISTS (
        SELECT 1 FROM documents a
        WHERE a.doc_id % 3 = 0 AND a.text = b.text
      )
    """,
)
def dedup_cross_corpus_bloom(spark, sf_dir):
    """Cross-corpus exact dedup with a bloom pre-filter: which docs of
    an incoming batch (doc_id % 2 = 0) are NOT already in the reference
    corpus (doc_id % 3 = 0, same text)? The seen-side text hashes fold
    into a distributed bloom bitmap (bloom_build: partitions OR local
    bitmaps, chunks merge map-side — the shuffle carries bitmaps, never
    keys); the batch probes it executor-side, and only bloom HITS — true
    dups plus the bounded false-positive fraction — reach the exact
    anti-join that keeps the result identical to plain NOT EXISTS. At
    100 TB the seen corpus is a ~GB broadcast bitmap instead of an
    all-rows shuffle, and the anti-join input shrinks to the dup rate."""
    docs = _t(spark, sf_dir, "documents")["documents"]
    seen = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 0)
    bloom = sk.bloom_build(seen, F.md5("text"), n_bits=1 << 17, n_hashes=5)
    out = sk.bloom_anti_join(
        batch, seen, lambda d: F.md5(d["text"]), bloom, n_hashes=5
    )
    return out.select("doc_id")
