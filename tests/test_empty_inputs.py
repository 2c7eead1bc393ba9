"""Degenerate-input behavior: every operator must return a well-formed
(usually empty) result on empty input rather than throw — at 100 TB an
empty partition, an all-filtered batch, or a first-run empty index is a
daily event, not an edge case."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openverse_catalog_spark.operators import packing as pk
from openverse_catalog_spark.operators import quality as q
from openverse_catalog_spark.operators import sampling as smp
from openverse_catalog_spark.operators import sketches as sk
from openverse_catalog_spark.operators.graph import pagerank
from openverse_catalog_spark.operators.joins import (
    asof_join,
    range_join_bucketed,
    salted_count_distinct,
)
from openverse_catalog_spark.operators.merge import snapshot_diff
from openverse_catalog_spark.operators.profile import (
    compaction_plan,
    profile_table,
)


@pytest.fixture(scope="module")
def empty_kv(spark):
    return spark.createDataFrame([], "k long, v long")


@pytest.fixture(scope="module")
def empty_ts(spark):
    return spark.createDataFrame([], "k long, ts timestamp, x long")


def test_sampling_ops_on_empty(empty_kv):
    assert smp.hash_sample(empty_kv, "k", 0.5).count() == 0
    assert smp.stratified_sample(empty_kv, ["v"], 3, "k").count() == 0
    assert smp.domain_mix(empty_kv, "k", "v", {"1": 1.0}).count() == 0


def test_packing_ops_on_empty(spark, empty_kv):
    assert pk.pack_offsets(empty_kv, "v", "k", "k", 100).count() == 0
    tdf = spark.createDataFrame([], "k long, text string")
    assert pk.chunk_spans(tdf, ["k"], "text", 8, 4).count() == 0


def test_cms_on_empty(spark, empty_kv):
    grid = sk.cms_build(empty_kv, "k", 16, 2)
    assert grid.count() == 0
    cand = spark.createDataFrame([(1,)], "k long")
    est = sk.cms_estimate(cand, "k", grid, 16, 2).collect()
    assert est[0].est == 0  # empty sketch -> everything estimates 0


def test_quality_report_on_empty(empty_kv, spark):
    rep = {
        r.check: (r.violations, r.passed)
        for r in q.quality_report(
            empty_kv,
            rules=[q.not_null("k"), q.unique("k")],
            fk_rules=[q.fk("v", spark.createDataFrame([(1,)], "id long"), "id")],
        ).collect()
    }
    # an empty table violates nothing (sum over zero rows -> 0, not null)
    assert rep == {
        "not_null(k)": (0, True),
        "unique(k)": (0, True),
        "fk(v)": (0, True),
    }


def test_temporal_joins_on_empty(empty_ts, spark):
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 5)], "k long, ts string, x long"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "x")
    assert asof_join(empty_ts, right, ["k"], right_cols=["x"]).count() == 0
    # empty right: every left row survives with null match
    out = asof_join(right, empty_ts, ["k"], right_cols=["x"]).collect()
    assert len(out) == 1 and out[0]["_asof_gap_us"] is None
    assert range_join_bucketed(empty_ts, right, ["k"]).count() == 0


def test_misc_ops_on_empty(empty_kv, spark):
    assert salted_count_distinct(empty_kv, ["v"], "k").count() == 0
    assert snapshot_diff(empty_kv, empty_kv, ["k"], ["v"]).count() == 0
    prof = {r["column"]: r for r in profile_table(empty_kv, ["k"]).collect()}
    assert prof["k"].n_rows == 0 and prof["k"].ndv == 0
    files = spark.createDataFrame([], "dir string, path string, bytes long")
    assert compaction_plan(files, 100).count() == 0
    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank(edges, 2).count() == 0


def test_mmr_rerank_on_empty(spark):
    from openverse_catalog_spark.operators.knn import mmr_rerank

    cand = spark.createDataFrame(
        [], "query_id long, neighbor_id long, cosine double"
    )
    corpus = spark.createDataFrame(
        [], "neighbor_id long, embedding array<double>"
    )
    out = mmr_rerank(cand, corpus, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "mmr_rank", "score"]


def test_mmr_rerank_fewer_candidates_than_k(spark):
    from openverse_catalog_spark.operators.knn import mmr_rerank

    corpus = spark.createDataFrame(
        [(1, [1.0] + [0.0] * 63)], "neighbor_id long, embedding array<double>"
    )
    cand = spark.createDataFrame(
        [(7, 1, 0.9)], "query_id long, neighbor_id long, cosine double"
    )
    rows = mmr_rerank(cand, corpus, k=3).collect()
    assert len(rows) == 1 and rows[0].mmr_rank == 1


def test_pruned_merge_on_empty_source(spark):
    from openverse_catalog_spark.operators.merge import merge_upsert_pruned
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    cols = [
        ColumnSpec("provider", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("fid", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("title", Datatype.char),
    ]
    tgt = spark.createDataFrame(
        [("p1", "a", "t")], "provider string, fid string, title string"
    )
    src = spark.createDataFrame([], "provider string, fid string, title string")
    out = merge_upsert_pruned(
        tgt, src, cols, keys=("provider", "fid"),
        dedupe_source_on_url=False, guard_url_conflicts=False,
    )
    assert [tuple(r) for r in out.collect()] == [("p1", "a", "t")]


def test_adaptive_slices_and_reingestion_empty_tiers():
    from openverse_catalog_spark.sources.landing import (
        reingestion_day_shifts,
        reingestion_dates,
    )

    assert reingestion_day_shifts([]) == []
    assert reingestion_dates("2024-01-01", []) == [["2024-01-01"]]
    assert reingestion_day_shifts([(1, 0), (7, 0)]) == []


def test_kmv_and_quantile_sample_empty_inputs(spark):
    from openverse_catalog_spark.operators import sketches as sk

    empty = spark.createDataFrame([], "uid string")
    s = sk.kmv_build(empty, "uid", 32)
    assert s.count() == 0
    assert sk.kmv_estimate(s, 32) == 0.0
    assert sk.kmv_intersect_estimate(s, s, 32) == 0.0
    # merge with a non-empty side degrades to that side's sketch
    other = sk.kmv_build(
        spark.createDataFrame([("a",), ("b",)], "uid string"), "uid", 32
    )
    assert sk.kmv_estimate(sk.kmv_merge(s, other, 32), 32) == 2.0
    # all-NULL column: every row excluded, same as empty
    nulls = spark.createDataFrame([(None,), (None,)], "uid string")
    assert sk.kmv_build(nulls, "uid", 32).count() == 0
