"""Sketch queries: count-min heavy hitters with a value-exact oracle.

The reference's volume/duplicate reports are exact GROUP BYs; at 100 TB
the mergeable-sketch form is the one that survives (bounded state,
map-side combinable, streaming-unionable). The md5 hash rows make the
whole grid reproducible in DuckDB, so even the sketch is hash-gated.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openverse_catalog_spark.session import literal_df

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


# --- KMV / theta set algebra ------------------------------------------------

_K = 64
_SPACE = "1152921504606846976.0"  # 2^60 as a double literal


def _kmv_set_sql(label: str, pred: str) -> str:
    return f"""
    h_{label} AS (SELECT DISTINCT {sk.kmv_sql("user_id")} AS h
                  FROM events WHERE {pred} AND user_id IS NOT NULL),
    s_{label} AS (SELECT h FROM h_{label} ORDER BY h LIMIT {_K}),
    n_{label} AS (SELECT count(*) AS c, max(h) AS hk FROM s_{label})"""


def _kmv_est_sql(label: str) -> str:
    """Matches kmv_estimate's float-op order: (k-1)/(hk/2^60)."""
    return (
        f"CASE WHEN n_{label}.c < {_K} THEN n_{label}.c * 1.0 "
        f"ELSE {_K - 1}.0 / (n_{label}.hk / {_SPACE}) END"
    )


@register(
    "sketch_kmv_setops",
    f"""
    WITH {_kmv_set_sql("a", "event_type = 'click'")},
    {_kmv_set_sql("b", "event_type = 'purchase'")},
    s_u AS (SELECT h FROM (SELECT h FROM s_a UNION SELECT h FROM s_b) z
            ORDER BY h LIMIT {_K}),
    n_u AS (SELECT count(*) AS c, max(h) AS hk FROM s_u),
    ib AS (SELECT CASE WHEN n_a.c = {_K} AND n_b.c = {_K}
                         THEN least(n_a.hk, n_b.hk)
                       WHEN n_a.c = {_K} THEN n_a.hk
                       WHEN n_b.c = {_K} THEN n_b.hk END AS hk
           FROM n_a, n_b),
    ic AS (SELECT count(*) AS c FROM s_a JOIN s_b USING (h), ib
           WHERE ib.hk IS NULL OR h < ib.hk),
    ex_a AS (SELECT count(DISTINCT user_id) AS c FROM events
             WHERE event_type = 'click' AND user_id IS NOT NULL),
    ex_b AS (SELECT count(DISTINCT user_id) AS c FROM events
             WHERE event_type = 'purchase' AND user_id IS NOT NULL),
    ex_u AS (SELECT count(DISTINCT user_id) AS c FROM events
             WHERE event_type IN ('click', 'purchase')
               AND user_id IS NOT NULL),
    ex_i AS (SELECT count(*) AS c FROM
             (SELECT DISTINCT user_id FROM events
              WHERE event_type = 'click' AND user_id IS NOT NULL) xa
             JOIN (SELECT DISTINCT user_id FROM events
                   WHERE event_type = 'purchase'
                     AND user_id IS NOT NULL) xb USING (user_id))
    SELECT 'click_est' AS metric, round({_kmv_est_sql("a")}, 3) AS value
    FROM n_a
    UNION ALL SELECT 'purchase_est', round({_kmv_est_sql("b")}, 3) FROM n_b
    UNION ALL SELECT 'union_est', round({_kmv_est_sql("u")}, 3) FROM n_u
    UNION ALL SELECT 'intersect_est',
        round(CASE WHEN ib.hk IS NULL THEN ic.c * 1.0
                   ELSE ic.c / (ib.hk / {_SPACE}) END, 3)
    FROM ib, ic
    UNION ALL SELECT 'click_exact', c * 1.0 FROM ex_a
    UNION ALL SELECT 'purchase_exact', c * 1.0 FROM ex_b
    UNION ALL SELECT 'union_exact', c * 1.0 FROM ex_u
    UNION ALL SELECT 'intersect_exact', c * 1.0 FROM ex_i
    """,
)
def sketch_kmv_setops(spark, sf_dir):
    """Distinct-cardinality SET ALGEBRA via KMV/theta sketches: "users
    who clicked", "who purchased", their union AND intersection — the
    COUNT(DISTINCT)-join questions the reference answers exactly —
    from two k-long hash sketches (operators/sketches.py:kmv_build).
    Exact counts ride along so the result exhibits the error envelope.
    The md5 hash makes every kept hash — and therefore every estimate
    — bit-reproducible in the oracle, which replays sketch build, k-th
    value thresholds, and the theta intersection rule in SQL. SCALE:
    one map-side-combined distinct per side; sketch state is k longs
    (mergeable across days/streams); the exact twins are the part that
    dies at 100 TB."""
    ev = _t(spark, sf_dir, "events")["events"]
    users = ev.filter(F.col("user_id").isNotNull())
    a_rows = users.filter(F.col("event_type") == "click")
    b_rows = users.filter(F.col("event_type") == "purchase")
    a = sk.kmv_build(a_rows, "user_id", _K).localCheckpoint(eager=False)
    b = sk.kmv_build(b_rows, "user_id", _K).localCheckpoint(eager=False)
    u = sk.kmv_merge(a, b, _K)
    ex_a = a_rows.select("user_id").distinct().count()
    ex_b = b_rows.select("user_id").distinct().count()
    ex_u = (
        users.filter(F.col("event_type").isin("click", "purchase"))
        .select("user_id").distinct().count()
    )
    ex_i = (
        a_rows.select("user_id").distinct()
        .join(b_rows.select("user_id").distinct(), on="user_id")
        .count()
    )
    rows = [
        ("click_est", round(sk.kmv_estimate(a, _K), 3)),
        ("purchase_est", round(sk.kmv_estimate(b, _K), 3)),
        ("union_est", round(sk.kmv_estimate(u, _K), 3)),
        ("intersect_est", round(sk.kmv_intersect_estimate(a, b, _K), 3)),
        ("click_exact", float(ex_a)),
        ("purchase_exact", float(ex_b)),
        ("union_exact", float(ex_u)),
        ("intersect_exact", float(ex_i)),
    ]
    return literal_df(spark, rows, "metric string, value double")


# --- hash-rank sample quantiles --------------------------------------------

_QK = 512
_QPS = [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]


def _qs_shard_sql(label: str, pred: str) -> str:
    h = sk.hash60_sql("'qs|' || CAST(event_id AS VARCHAR)")
    return f"""
    s_{label} AS (SELECT {h} AS h, value FROM src
                  WHERE {pred} ORDER BY h LIMIT {_QK})"""


@register(
    "sketch_quantile_sample",
    f"""
    WITH src AS (SELECT event_id, value FROM events
                 WHERE value IS NOT NULL),
    {_qs_shard_sql("0", "event_id % 2 = 0")},
    {_qs_shard_sql("1", "event_id % 2 = 1")},
    samp AS (SELECT h, value
             FROM (SELECT * FROM s_0 UNION ALL SELECT * FROM s_1) z
             ORDER BY h LIMIT {_QK}),
    rs AS (SELECT value, row_number() OVER (ORDER BY value) AS rn,
                  count(*) OVER () AS n FROM samp),
    rx AS (SELECT value, row_number() OVER (ORDER BY value) AS rn,
                  count(*) OVER () AS n FROM src)
    {" UNION ALL ".join(
        f'''SELECT '{name}' AS q,
           (SELECT min(value) FROM rs
            WHERE rn = CAST(ceil({p} * n) AS BIGINT)) AS est,
           (SELECT min(value) FROM rx
            WHERE rn = CAST(ceil({p} * n) AS BIGINT)) AS exact'''
        for name, p in _QPS)}
    """,
)
def sketch_quantile_sample(spark, sf_dir):
    """MERGEABLE approximate percentiles by hash-rank sampling
    (operators/sketches.py:quantile_sample_*): two disjoint shards each
    keep the k rows with the smallest hashed row ids, the shard samples
    MERGE exactly into the corpus sample (the KMV property on row
    identity), and quantiles are order statistics of k rows. The exact
    percentile rides along (operators/popularity.py's ranked rule), so
    the result exhibits the O(1/sqrt(k)) rank-error envelope, and both
    paths share one percentile_disc definition — the oracle replays
    sample AND exact bit-identically. SCALE: per-shard TakeOrdered on
    k rows, no global sort anywhere on the sketch path; the exact twin
    is the full-rank step that dies at 100 TB."""
    from openverse_catalog_spark.operators.popularity import (
        percentile_disc_multi,
    )

    ev = _t(spark, sf_dir, "events")["events"].filter(
        F.col("value").isNotNull()
    )
    shard0 = sk.quantile_sample_build(
        ev.filter(F.col("event_id") % 2 == 0), "event_id", "value", _QK
    )
    shard1 = sk.quantile_sample_build(
        ev.filter(F.col("event_id") % 2 == 1), "event_id", "value", _QK
    )
    samp = sk.quantile_sample_merge(shard0, shard1, _QK)
    ests = sk.quantile_sample_estimate(samp, [p for _, p in _QPS])
    exact = percentile_disc_multi(
        ev.withColumn("__g", F.lit(1)), ["__g"], "value",
        {name: p for name, p in _QPS},
    ).head()
    rows = [
        (name, float(ests[i]), float(exact[name]))
        for i, (name, _) in enumerate(_QPS)
    ]
    return literal_df(spark, rows, "q string, est double, exact double")


_QGK = 128


@register(
    "sketch_quantile_by_group",
    f"""
    WITH src AS (SELECT event_type, event_id, value FROM events
                 WHERE value IS NOT NULL AND event_type IS NOT NULL),
    h AS (SELECT event_type, value,
                 {sk.hash60_sql("'qg|' || CAST(event_id AS VARCHAR)")} AS hh
          FROM src),
    r AS (SELECT event_type, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY hh) AS rn
          FROM h),
    samp AS (SELECT event_type, value FROM r WHERE rn <= {_QGK}),
    rs AS (SELECT event_type, value,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY value) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM samp)
    SELECT event_type,
           min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                    THEN value END) AS p50,
           min(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                    THEN value END) AS p90,
           CAST(max(n) AS BIGINT) AS sample_n
    FROM rs GROUP BY event_type
    """,
)
def sketch_quantile_by_group(spark, sf_dir):
    """Per-GROUP bounded-error quantiles: each event type keeps the
    k=128 rows with the smallest hashed ids (one window shuffle), then
    the EXACT percentile operator runs over the k-bounded sample — so
    the reference's per-provider percentile_disc
    (``popularity/sql.py:214-229``) survives group skew: the hottest
    provider costs k rows of task state, not its full row count. The
    oracle replays hash ranks, the sample boundary, and the
    percentile_disc rule bit-exactly."""
    from openverse_catalog_spark.operators.popularity import (
        percentile_disc_multi,
    )

    ev = _t(spark, sf_dir, "events")["events"].filter(
        F.col("event_type").isNotNull()
    )
    samp = sk.quantile_sample_by_group(
        ev, ["event_type"], "event_id", "value", _QGK
    )
    return percentile_disc_multi(
        samp, ["event_type"], "value", {"p50": 0.5, "p90": 0.9},
        count_col="sample_n",
    )
