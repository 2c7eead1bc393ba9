"""Sampling operator invariants: determinism across partitionings, exact
stratified cardinality, mix-rate math, and shuffle-free fact-side plans."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from openverse_catalog_spark.operators import sampling as smp
from openverse_catalog_spark.session import load_tables


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_tables(spark, sf_dir, ("documents",))["documents"]


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_hash_sample_partition_independent(docs):
    a = _ids(smp.hash_sample(docs, "doc_id", 0.3, "s"))
    b = _ids(smp.hash_sample(docs.repartition(13, "source"), "doc_id", 0.3, "s"))
    assert a == b and 0 < len(a) < docs.count()


def test_hash_sample_salts_independent(docs):
    a = set(_ids(smp.hash_sample(docs, "doc_id", 0.5, "saltA")))
    b = set(_ids(smp.hash_sample(docs, "doc_id", 0.5, "saltB")))
    # different salts -> different (overlapping ~25%) draws
    assert a != b and a & b


def test_hash_sample_rate_monotone(docs):
    small = set(_ids(smp.hash_sample(docs, "doc_id", 0.1, "s")))
    big = set(_ids(smp.hash_sample(docs, "doc_id", 0.4, "s")))
    assert small <= big  # nested samples: raising the rate only adds rows


def test_stratified_exact_n(docs):
    out = smp.stratified_sample(docs, ["source"], 3, "doc_id")
    per = out.groupBy("source").count().collect()
    n_sources = docs.select("source").distinct().count()
    assert len(per) == n_sources and all(r["count"] == 3 for r in per)
    # deterministic under repartitioning
    again = smp.stratified_sample(
        docs.repartition(7), ["source"], 3, "doc_id"
    )
    assert _ids(out) == _ids(again)


def test_domain_mix_rates_and_proportions(docs):
    weights = {"en": 0.3, "de": 0.2, "es": 0.2, "fr": 0.15, "zh": 0.15}
    rates = {
        r.domain: (r.rate, r.n_rows)
        for r in smp.domain_mix_rates(docs, "lang", weights).collect()
    }
    assert max(rate for rate, _ in rates.values()) == pytest.approx(1.0)
    mixed = smp.domain_mix(docs, "doc_id", "lang", weights)
    got = {r.lang: r["count"] for r in mixed.groupBy("lang").count().collect()}
    # kept counts should track the target ratio (hash noise ~ sqrt(n))
    binding = max(rates, key=lambda d: rates[d][0])
    scale = got[binding] / weights[binding]
    for lang, w in weights.items():
        assert got[lang] == pytest.approx(w * scale, rel=0.35)


def test_domain_mix_unknown_domain_dropped(spark):
    df = spark.createDataFrame(
        [(i, "keep" if i % 2 else "junk") for i in range(100)], "id long, d string"
    )
    out = smp.domain_mix(df, "id", "d", {"keep": 1.0})
    assert out.filter(F.col("d") == "junk").count() == 0
    assert out.count() == 50  # binding domain keeps everything


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_hash_sample_is_narrow(docs):
    plan = _plan(smp.hash_sample(docs, "doc_id", 0.2))
    assert "Exchange" not in plan  # pure filter: no shuffle at any scale


def test_domain_mix_fact_side_not_shuffled(docs):
    plan = _plan(smp.domain_mix(docs, "doc_id", "lang", {"en": 1.0, "de": 1.0}))
    # rate table joins via broadcast; the only exchanges allowed are the
    # tiny rate-table aggregation, never a repartition of the fact scan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_topk_hash_uses_partial_topk_not_full_sort(docs):
    from openverse_catalog_spark.plans import sampling_queries as sq

    df = sq.sample_topk_hash(docs.sparkSession, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan  # per-partition heap, no global sort


# ---------------------------------------------------------------------------
# leakage-free split + token budget cap
# ---------------------------------------------------------------------------


def test_leakfree_split_keeps_groups_whole(spark):
    from pyspark.sql import functions as F

    rows = [(i, f"text-{i % 20}") for i in range(100)]  # 20 groups of 5
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = smp.leakage_free_split(df, "doc_id", F.col("text")).collect()
    by_text = {}
    for r in out:
        by_text.setdefault(r["text"], set()).add((r["split"], r["group_rep"]))
    assert len(out) == 100
    for text, assignments in by_text.items():
        assert len(assignments) == 1  # one (split, rep) per dup group
    reps = {r["group_rep"] for r in out}
    assert reps == set(range(20))  # min doc_id per group


def test_leakfree_split_partition_independent(spark):
    from pyspark.sql import functions as F

    rows = [(i, f"text-{i % 7}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        map(tuple, smp.leakage_free_split(df.coalesce(1), "doc_id", F.col("text"))
            .select("doc_id", "split").collect())
    )
    b = sorted(
        map(tuple, smp.leakage_free_split(df.repartition(13), "doc_id", F.col("text"))
            .select("doc_id", "split").collect())
    )
    assert a == b


def test_token_budget_cap_matches_global_walk(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    rows = [(i, f"d{i % 3}", (i * 7) % 40 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, dom string, toks long")
    out = smp.token_budget_cap(df, "id", "toks", "dom", budget=300,
                               bucket_bits=3)
    # reference: one global window per domain
    h = smp._keyhash(F.col("id"), "tokcap")
    w = (
        W.partitionBy("dom").orderBy(h, "id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ref = (
        df.withColumn("cum_before", F.coalesce(F.sum("toks").over(w), F.lit(0)))
        .filter(F.col("cum_before") < 300)
    )
    got = sorted((r["id"], r["cum_before"]) for r in out.collect())
    want = sorted((r["id"], r["cum_before"]) for r in ref.collect())
    assert got == want
    assert len(got) > 0


def test_token_budget_first_doc_always_kept(spark):
    # a single huge doc exceeds the budget but has nothing before it
    df = spark.createDataFrame(
        [(1, "d", 10_000), (2, "d", 10_000)], "id long, dom string, toks long"
    )
    out = smp.token_budget_cap(df, "id", "toks", "dom", budget=5)
    assert out.count() == 1  # exactly the hash-first doc survives


def test_weighted_sample_rate_tracks_weight(spark):
    from pyspark.sql import functions as F

    # weight 1.0 keeps everything; weight 0 keeps nothing
    df = spark.range(0, 2000).select(F.col("id"))
    all_kept = smp.weighted_sample(df, "id", F.lit(1.0)).count()
    none = smp.weighted_sample(df, "id", F.lit(0.0)).count()
    half = smp.weighted_sample(df, "id", F.lit(0.5)).count()
    assert all_kept == 2000 and none == 0
    assert 850 <= half <= 1150  # ~Bernoulli(0.5)
    # deterministic: same call, same membership
    a = {r["id"] for r in smp.weighted_sample(df, "id", F.lit(0.3)).collect()}
    b = {r["id"] for r in smp.weighted_sample(df, "id", F.lit(0.3)).collect()}
    assert a == b


def test_epoch_shuffle_permutes_and_differs_by_epoch(spark):
    df = spark.range(0, 500).selectExpr("id AS doc_id")
    e1 = smp.epoch_shuffle(df, "doc_id", epoch=1, n_shards=4).collect()
    e2 = smp.epoch_shuffle(df, "doc_id", epoch=2, n_shards=4).collect()
    # complete coverage: every doc exactly once, positions contiguous
    assert len(e1) == 500
    for rows in (e1, e2):
        by_shard: dict[int, list[int]] = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        for poss in by_shard.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))
    # different epochs give different orders (new permutation each epoch)
    o1 = {(r["doc_id"]): (r["shard"], r["pos"]) for r in e1}
    o2 = {(r["doc_id"]): (r["shard"], r["pos"]) for r in e2}
    assert o1 != o2
    # partition-layout independent
    e1b = smp.epoch_shuffle(df.repartition(7), "doc_id", epoch=1, n_shards=4)
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in e1b.collect()} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in e1
    }


def test_domain_upsample_expected_replication(spark):
    from pyspark.sql import functions as F

    df = spark.range(0, 3000).select(
        F.col("id"), F.lit("fr").alias("dom")
    )
    out = smp.domain_upsample(df, "id", "dom", {"fr": 2.5})
    n = out.count()
    # floor(2.5)=2 copies always + fractional 0.5: expect ~2.5x
    assert 2 * 3000 <= n <= 3 * 3000
    assert abs(n - 7500) < 450
    # every kept doc has contiguous copy_ids starting at 1
    by_id = {}
    for r in out.collect():
        by_id.setdefault(r["id"], []).append(r["copy_id"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_id.values())
    # factor-1 domains pass through exactly once; factor-0 drops
    other = spark.range(0, 100).select(F.col("id"), F.lit("en").alias("dom"))
    assert smp.domain_upsample(other, "id", "dom", {"fr": 2.5}).count() == 100
    assert smp.domain_upsample(other, "id", "dom", {"en": 0.0}).count() < 100


def test_group_capped_sample_deterministic_and_bounded(spark):
    from openverse_catalog_spark.operators.sampling import group_capped_sample

    rows = [(i, ["en", "fr", "de"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out1 = group_capped_sample(df, "lang", 20, "doc_id")
    got1 = {(r["doc_id"], r["lang"]) for r in out1.collect()}
    # exactly k per group (every group has >= k members here)
    from collections import Counter

    per = Counter(lang for _, lang in got1)
    assert per == {"en": 20, "fr": 20, "de": 20}
    # identical draw under a different physical layout
    out2 = group_capped_sample(df.repartition(7, "doc_id"), "lang", 20, "doc_id")
    assert {(r["doc_id"], r["lang"]) for r in out2.collect()} == got1
    # groups smaller than k pass through whole
    small = spark.createDataFrame([(1, "xx"), (2, "xx")], "doc_id long, lang string")
    assert group_capped_sample(small, "lang", 20, "doc_id").count() == 2


def test_temperature_mix_flattens_distribution(spark):
    """alpha=0.5 must pull the domain distribution toward uniform: the
    dominant domain's share shrinks, the smallest domain keeps all its
    rows, and the draw is layout-independent."""
    from openverse_catalog_spark.operators.sampling import temperature_mix

    rows = (
        [(i, "en") for i in range(800)]
        + [(i + 1000, "de") for i in range(150)]
        + [(i + 2000, "zh") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mix(df, "doc_id", "lang", alpha=0.5)
    from collections import Counter

    kept = Counter(r["lang"] for r in out.collect())
    assert kept["zh"] == 50                      # smallest domain: rate 1.0
    # en rate = (800/50)^-0.5 = 0.25 -> ~200 kept; binomial tolerance
    assert 140 <= kept["en"] <= 260
    before_share = 800 / 1000
    after_share = kept["en"] / sum(kept.values())
    assert after_share < before_share            # flattened toward uniform
    out2 = temperature_mix(df.repartition(13), "doc_id", "lang", alpha=0.5)
    assert {r["doc_id"] for r in out2.collect()} == {
        r["doc_id"] for r in out.collect()
    }


# --- DSIR importance resampling -------------------------------------------


@pytest.fixture(scope="module")
def dsir_split(docs):
    tgt = docs.filter(F.col("source").isin("src1", "src2", "src3"))
    raw = docs.filter(~F.col("source").isin("src1", "src2", "src3"))
    return raw, tgt


def test_dsir_weights_partition_independent(dsir_split):
    raw, tgt = dsir_split
    a = smp.dsir_logweights(raw, tgt, "doc_id", "text").collect()
    b = smp.dsir_logweights(
        raw.repartition(17, "source"), tgt.repartition(5), "doc_id", "text"
    ).collect()
    av = {r.doc_id: (r.n_grams, round(r.logweight, 9)) for r in a}
    bv = {r.doc_id: (r.n_grams, round(r.logweight, 9)) for r in b}
    assert av == bv and len(av) > 0


def test_dsir_prefers_target_like_text(spark):
    """A raw doc written in the target's vocabulary must outscore one
    written in a disjoint vocabulary."""
    tgt = spark.createDataFrame(
        [(100 + i, "quantum flux capacitor entangled qubit lattice")
         for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "quantum flux capacitor entangled qubit lattice"),
         (2, "banana smoothie recipe with yogurt and honey")],
        "doc_id long, text string",
    )
    w = {r.doc_id: r.logweight
         for r in smp.dsir_logweights(raw, tgt, "doc_id", "text").collect()}
    assert w[1] > w[2]


def test_dsir_select_exact_k_and_deterministic(dsir_split):
    raw, tgt = dsir_split
    a = smp.dsir_select(raw, tgt, "doc_id", "text", 25)
    b = smp.dsir_select(
        raw.repartition(13, "doc_id"), tgt, "doc_id", "text", 25
    )
    ia = sorted(r.doc_id for r in a.collect())
    ib = sorted(r.doc_id for r in b.collect())
    assert ia == ib and len(ia) == 25


def test_dsir_empty_and_short_docs_absent(spark):
    """Zero-token docs contribute no grams and drop out; a one-token doc
    still scores via its unigram (bigram list is empty, not an error)."""
    tgt = spark.createDataFrame(
        [(10, "alpha beta gamma")], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(1, ""), (2, "   !!! "), (3, "alpha"), (4, "alpha beta")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_grams
           for r in smp.dsir_logweights(raw, tgt, "doc_id", "text").collect()}
    assert set(out) == {3, 4} and out[3] == 1 and out[4] == 3


def test_dsir_model_scores_unseen_grams_at_floor(spark):
    """The persisted model is DENSE: a batch doc made of grams neither
    fitting corpus saw still scores (every bucket carries the smoothing
    floor), and scoring equals the direct logweights path for docs the
    corpora did see."""
    tgt = spark.createDataFrame(
        [(10, "alpha beta gamma delta")], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(1, "epsilon zeta eta theta"), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    model = smp.dsir_model(spark, raw, tgt, "doc_id", "text", n_buckets=64)
    assert model.count() == 64  # dense: every bucket present
    # novel-vocabulary batch doc: must score, not vanish
    batch = spark.createDataFrame(
        [(100, "totally novel words here"), (101, "alpha beta gamma")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r
           for r in smp.dsir_score(batch, model, "doc_id", "text",
                                   n_buckets=64).collect()}
    assert set(got) == {100, 101}
    # target-like doc outscores the novel one (which sits at the floor)
    assert got[101].logweight > got[100].logweight
    # model path == direct path for the raw docs themselves
    direct = {r.doc_id: round(r.logweight, 9)
              for r in smp.dsir_logweights(raw, tgt, "doc_id", "text",
                                           n_buckets=64).collect()}
    via_model = {r.doc_id: round(r.logweight, 9)
                 for r in smp.dsir_score(raw, model, "doc_id", "text",
                                         n_buckets=64).collect()}
    assert direct == via_model
