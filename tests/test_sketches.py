"""Sketch invariants: CMS one-sided error and mergeability; HLL
(Datasketches) partial-union equivalence — the properties that make both
safe to distribute across partitions, batches, and days."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openverse_catalog_spark.operators import sketches as sk


@pytest.fixture(scope="module")
def vals(spark):
    # zipf-ish: value v appears (101 - v) times, v in 1..100
    rows = [(v,) for v in range(1, 101) for _ in range(101 - v)]
    return spark.createDataFrame(rows, "v long")


def test_cms_never_underestimates(vals, spark):
    grid = sk.cms_build(vals, "v", width=32, depth=4)
    cand = vals.distinct()
    est = sk.cms_estimate(cand, "v", grid, 32, 4)
    truth = vals.groupBy("v").agg(F.count(F.lit(1)).alias("t"))
    joined = est.join(truth, "v").collect()
    assert len(joined) == 100
    assert all(r.est >= r.t for r in joined)  # one-sided by construction
    # depth*width = 128 cells for 100 keys: top keys should be near-exact
    top = {r.v: (r.est, r.t) for r in joined if r.v <= 5}
    for est_v, t in top.values():
        assert est_v - t <= 0.1 * sum(101 - v for v in range(1, 101))


def test_cms_grids_merge_by_addition(vals, spark):
    half1 = vals.filter(F.col("v") % 2 == 0)
    half2 = vals.filter(F.col("v") % 2 == 1)
    merged = (
        sk.cms_build(half1, "v", 32, 4)
        .unionByName(sk.cms_build(half2, "v", 32, 4))
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = sk.cms_build(vals, "v", 32, 4)
    key = lambda r: (r.row, r.cell, r.cnt)  # noqa: E731
    assert sorted(map(key, merged.collect())) == sorted(map(key, whole.collect()))


def test_cms_estimate_zero_for_unseen(vals, spark):
    grid = sk.cms_build(vals.filter("v <= 3"), "v", 1024, 4)
    cand = spark.createDataFrame([(999999,)], "v long")
    est = sk.cms_estimate(cand, "v", grid, 1024, 4).collect()
    # wide grid -> no collision; unseen value estimates 0 via the left join
    assert est[0].est == 0


def test_hll_partial_union_matches_direct(spark):
    df = spark.createDataFrame([(i % 400, i % 3) for i in range(5000)], "v long, g int")
    direct = df.agg(F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("n")).head().n
    merged = (
        df.groupBy("g")
        .agg(F.hll_sketch_agg("v").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .head()
        .n
    )
    # partial sketches per group unioned == one-shot sketch: same digest
    assert merged == direct
    assert abs(direct - 400) / 400 < 0.05


def test_approx_count_distinct_error_bounded(spark):
    df = spark.createDataFrame([(i % 1000,) for i in range(20000)], "v long")
    approx = df.agg(F.approx_count_distinct("v", rsd=0.02).alias("n")).head().n
    assert abs(approx - 1000) / 1000 < 0.06


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpora(spark):
    seen = spark.range(0, 500).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("k")
    )
    batch = spark.range(250, 1000).select(
        F.col("id"), F.concat(F.lit("doc-"), F.col("id")).alias("k")
    )
    return seen, batch


def test_bloom_no_false_negatives(corpora, spark):
    seen, _ = corpora
    bloom = sk.bloom_build(seen.repartition(7), F.col("k"), n_bits=1 << 14)
    flagged = sk.bloom_maybe_contains(seen, F.col("k"), bloom)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_false_positive_rate_bounded(corpora, spark):
    seen, _ = corpora
    bloom = sk.bloom_build(seen, F.col("k"), n_bits=1 << 14)
    # 10k keys never inserted: with 500 keys in 16384 bits / 5 hashes the
    # theoretical fp rate is ~0.1%; assert an order-of-magnitude cushion
    fresh = spark.range(10_000, 20_000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("k")
    )
    fp = sk.bloom_maybe_contains(fresh, F.col("k"), bloom)
    assert fp.filter(F.col("maybe_seen")).count() < 100


def test_bloom_build_partition_independent(corpora, spark):
    seen, _ = corpora
    one = sk.bloom_build(seen.coalesce(1), F.col("k"), n_bits=1 << 13)
    many = sk.bloom_build(seen.repartition(11), F.col("k"), n_bits=1 << 13)
    assert one == many  # chunk OR-merge == single-partition build


def test_bloom_anti_join_is_exact(corpora, spark):
    seen, batch = corpora
    bloom = sk.bloom_build(seen, F.col("k"), n_bits=1 << 14)
    out = sk.bloom_anti_join(batch, seen, lambda d: d["k"], bloom)
    plain = batch.join(seen, batch["k"] == seen["k"], "left_anti")
    assert sorted(r.id for r in out.collect()) == sorted(
        r.id for r in plain.collect()
    )


def test_bloom_prunes_join_input(corpora, spark):
    seen, batch = corpora
    bloom = sk.bloom_build(seen, F.col("k"), n_bits=1 << 14)
    flagged = sk.bloom_maybe_contains(batch, F.col("k"), bloom)
    maybes = flagged.filter(F.col("maybe_seen")).count()
    # 250 true dups + fp fraction of the 500 fresh rows: the anti-join
    # input must be near the dup count, not the batch size
    assert 250 <= maybes < 300


def test_bloom_tolerates_null_keys(spark):
    seen = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    bloom = sk.bloom_build(seen, F.col("k"), n_bits=1 << 12)
    probe = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "zz")], "id long, k string"
    )
    flagged = {r["id"]: r["maybe_seen"]
               for r in sk.bloom_maybe_contains(probe, F.col("k"), bloom).collect()}
    assert flagged[1] is True          # present key hits
    assert flagged[2] is True          # null folds to the sentinel: hits
    assert flagged[3] is False         # fresh key misses
    # the exact anti-join keeps SQL null semantics: null never equals null
    out = sk.bloom_anti_join(probe, seen, lambda d: d["k"], bloom)
    assert sorted(r["id"] for r in out.collect()) == [2, 3]


# --- KMV / theta ------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(30) for _ in range(3)], "uid string"
    )
    s = sk.kmv_build(df, "uid", 64)
    assert sk.kmv_estimate(s, 64) == 30.0


def test_kmv_estimate_within_error_bound(spark):
    """k=256 gives ~1/sqrt(k-1) ≈ 6.3% relative standard error; allow
    3 sigma on one fixed draw of 20k distinct keys."""
    n = 20_000
    df = spark.range(n).select(F.concat(F.lit("key"), "id").alias("uid"))
    est = sk.kmv_estimate(sk.kmv_build(df, "uid", 256), 256)
    assert abs(est - n) / n < 3 / (255 ** 0.5)


def test_kmv_merge_equals_sketch_of_union(spark):
    """Mergeability is EXACT for KMV: the merged sketch's hash set is
    identical to the sketch built over the concatenated input."""
    a = spark.range(0, 5000).select(F.concat(F.lit("k"), "id").alias("u"))
    b = spark.range(3000, 9000).select(F.concat(F.lit("k"), "id").alias("u"))
    merged = sk.kmv_merge(
        sk.kmv_build(a, "u", 128), sk.kmv_build(b, "u", 128), 128
    )
    direct = sk.kmv_build(a.union(b), "u", 128)
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in direct.collect()
    )


def test_kmv_intersection_estimate(spark):
    """Overlap 4000 of 8000/10000; theta intersection lands within 3x
    the union-bound standard error; exact when both sides fit in k."""
    a = spark.range(0, 8000).select(F.concat(F.lit("k"), "id").alias("u"))
    b = spark.range(4000, 14000).select(F.concat(F.lit("k"), "id").alias("u"))
    sa, sb = sk.kmv_build(a, "u", 256), sk.kmv_build(b, "u", 256)
    est = sk.kmv_intersect_estimate(sa, sb, 256)
    assert abs(est - 4000) / 4000 < 0.5  # intersection error compounds
    # both below k -> exact
    a2 = spark.range(0, 100).select(F.concat(F.lit("k"), "id").alias("u"))
    b2 = spark.range(60, 200).select(F.concat(F.lit("k"), "id").alias("u"))
    assert sk.kmv_intersect_estimate(
        sk.kmv_build(a2, "u", 256), sk.kmv_build(b2, "u", 256), 256
    ) == 40.0


# --- hash-rank sample quantiles --------------------------------------------


def test_quantile_sample_merge_is_exact_composition(spark):
    a = spark.range(0, 6000).select("id", (F.col("id") * 7 % 1000)
                                    .cast("double").alias("value"))
    b = spark.range(6000, 15000).select("id", (F.col("id") * 7 % 1000)
                                        .cast("double").alias("value"))
    merged = sk.quantile_sample_merge(
        sk.quantile_sample_build(a, "id", "value", 200),
        sk.quantile_sample_build(b, "id", "value", 200), 200,
    )
    direct = sk.quantile_sample_build(a.union(b), "id", "value", 200)
    assert sorted((r["h"], r["value"]) for r in merged.collect()) == sorted(
        (r["h"], r["value"]) for r in direct.collect()
    )


def test_quantile_sample_rank_error_bound(spark):
    """Median of a 0..9999 uniform column from a k=400 sample: rank
    error within 3/sqrt(k) of the true quantile (one fixed hash
    draw)."""
    df = spark.range(10_000).select(
        "id", F.col("id").cast("double").alias("value")
    )
    s = sk.quantile_sample_build(df, "id", "value", 400)
    (est_med, est_p90) = sk.quantile_sample_estimate(s, [0.5, 0.9])
    for est, p in ((est_med, 0.5), (est_p90, 0.9)):
        assert abs(est / 10_000 - p) < 3 / (400 ** 0.5)


def test_quantile_sample_small_input_is_exact(spark):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([5, 1, 9, 3, 7])],
        "id bigint, value double",
    )
    s = sk.quantile_sample_build(df, "id", "value", 100)
    assert sk.quantile_sample_estimate(s, [0.5, 1.0]) == [5.0, 9.0]
    with pytest.raises(ValueError, match="empty"):
        sk.quantile_sample_estimate(
            sk.quantile_sample_build(df.filter("id > 99"), "id", "value", 10),
            [0.5],
        )


def test_quantile_sample_by_group_bounded_and_stratified(spark):
    """Each group keeps exactly min(k, group size) rows, sampling is
    independent per group (a huge group cannot starve a small one),
    and per-group medians from the sample land near the true ones."""
    big = spark.range(10_000).select(
        F.lit("big").alias("g"), F.col("id"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    small = spark.range(10_000, 10_040).select(
        F.lit("small").alias("g"), F.col("id"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    samp = sk.quantile_sample_by_group(
        big.union(small), ["g"], "id", "v", 200
    )
    sizes = {r["g"]: r["n"] for r in
             samp.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"big": 200, "small": 40}
    med = {
        r["g"]: sorted(x["value"] for x in samp.filter(F.col("g") == r["g"])
                       .collect())[sizes[r["g"]] // 2]
        for r in samp.select("g").distinct().collect()
    }
    assert abs(med["big"] - 500) < 150  # 3/sqrt(200) ~ 21% rank error
