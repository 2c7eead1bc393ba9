"""Regenerate PLANS.md: the physical plans of the flagship queries with
the scale-relevant properties called out. Evidence that the declared
plan shapes (broadcasts, pushdown, partial agg, shuffle-free Arrow
passes) are what the optimizer actually produces — the same properties
tests/test_plan_shapes.py pins, in human-readable form.

Usage: python tools/plan_audit.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from openverse_catalog_spark.session import get_spark  # noqa: E402

AUDIT = [
    (
        "join_5way_enrich",
        "Every dimension broadcasts; the fact side reaches the final "
        "aggregation without one sort-merge shuffle.",
    ),
    (
        "sample_hash_bernoulli",
        "A deterministic sample is a narrow filter pushed at the scan — "
        "no exchange anywhere in the plan.",
    ),
    (
        "corpus_mix_langs",
        "Domain mixing: the per-language rate table aggregates (tiny) and "
        "broadcasts; the documents scan is filtered without a shuffle.",
    ),
    (
        "join_asof_last_click",
        "As-of join as union + ONE window exchange on user_id — no "
        "inequality join, no nested loop.",
    ),
    (
        "sketch_cms_heavy_hitters",
        "The count-min grid shuffles depth*width counters (not the "
        "input); probes join the grid by broadcast.",
    ),
    (
        "quality_report_orders",
        "Five rules fused into one scan's aggregate; the FK rule is a "
        "broadcast anti-join.",
    ),
    (
        "corpus_build_funnel",
        "The end-to-end corpus build: quality filter (narrow), dedup "
        "keeper groupBy (one keyed shuffle), mix (broadcast rates), "
        "packing (shard-parallel window).",
    ),
    (
        "pipeline_taxa_enrich",
        "The taxa.sql mini-pipeline in one plan: window + aggregation "
        "share ONE fact exchange; region/nation/ancestor dims broadcast.",
    ),
    (
        "merge_partition_pruned",
        "Partition-pruned merge: broadcast semi/anti split sends only "
        "the batch's provider slice into the full-outer merge join.",
    ),
    (
        "pipeline_popularity_refresh",
        "The whole popularity refresh: ONE fact exchange for the "
        "percentile ranking; constants and raw values return as "
        "broadcasts for the scoring join.",
    ),
    (
        "sql_taxa_enrich",
        "The SQL-facade text compiles to the SAME plan family as the "
        "DataFrame pipeline: one exchange shared by the window and the "
        "grouped agg, tiny dims broadcast.",
    ),
    (
        "merge_cow_dim_pruned",
        "Dynamic file pruning: the selective dim's keys prune fact "
        "FILES through manifest stats/blooms before the scan plans — "
        "the parquet node lists only the surviving files.",
    ),
    (
        "merge_cow_delete_dv",
        "Deletion-vector read: the tiny (file, pos) sidecar anti-joins "
        "as a BROADCAST build side; the fact scan never shuffles.",
    ),
    (
        "text_unigram_nll",
        "Unigram-LM scoring: vocab aggregates map-side; the corpus total "
        "folds in as a 1-row broadcast; the token->vocab join stays an "
        "equi-join AQE sizes at runtime.",
    ),
    (
        "pipeline_inaturalist_bulk",
        "The reference's largest batch load (5-table join + dupes guard) "
        "in one plan: the photos fact shuffles ONCE for the dupes window "
        "(hashpartitioning(photo_id), the same key the observations join "
        "needs, so at scale the SMJ reuses it); observers/taxa/"
        "license_codes broadcast; the 'Not assigned' taxa filter pushes "
        "into the scan. The reference serializes this as 2M-row batches "
        "through one connection.",
    ),
    (
        "dedup_simhash_pairs",
        "Near-dup census in VALUE space: docs collapse to <= 2^16 "
        "(simhash, count) rows in one map-side-combined groupBy; the "
        "band join and the hamming filter run over distinct values, so "
        "no doc-pair row is ever materialized.",
    ),
    (
        "agg_event_funnel",
        "Ordered-step funnel with NO self-joins: one groupBy(user) "
        "collects the sorted event list, a row-local aggregate() fold "
        "walks it, and only the 4-row level histogram shuffles again.",
    ),
    (
        "classifier_logreg_score",
        "Model scoring is a pure SELECT against the weight literals: "
        "no exchange, no UDF — the probability filter a curation "
        "pipeline adds would push down with the scan.",
    ),
    (
        "dedup_cross_corpus_bloom",
        "The seen-side never shuffles as keys: it folds into a bloom "
        "bitmap (chunked map-side OR-merge), the batch probes the "
        "broadcast bitmap in one Arrow pass, and only bloom hits reach "
        "the exact anti-join — the join input shrinks to the dup rate.",
    ),
    (
        "pipeline_popularity_refresh_pruned",
        "Provider-pruned refresh: the scan lists ONLY the changed "
        "provider's partition directory (list-time pruning), the "
        "rescore is one keyed exchange + broadcast constants, and the "
        "write is a dynamic partition overwrite that leaves every other "
        "partition's files untouched.",
    ),
    (
        "dedup_components",
        "Connected components over STAR edges: the LSH buckets aggregate "
        "to (bucket, hub=min) and members join the hub — edges linear "
        "in bucket size (the all-pairs form is quadratic and OOMs on a "
        "dup-heavy corpus), then each propagation round is one "
        "equi-join + one min-aggregate.",
    ),
    (
        "merge_cow_point_lookup",
        "Bloom point lookup: per-file bitmaps (loaded lazily from the "
        "executor-written sidecar, never manifest-resident) rule files "
        "out BEFORE the scan plans — the parquet node lists only the "
        "admitting file(s) and the residual equality filter pushes "
        "into it.",
    ),
    (
        "stream_cdc_tombstones",
        "CDC apply with tombstone retention: the final state is a plain "
        "pruned snapshot scan — the fence work happened at WRITE time "
        "(tombstone semi-state joins keyed on the table's merge keys), "
        "so readers pay nothing for late-delete protection.",
    ),
    (
        "mv_join_agg_incremental",
        "GROUP-BY-over-JOIN MV read: the composed join->aggregate "
        "pipeline materialized, so the user-facing read is ONE pruned "
        "scan of the aggregate table — no join, no aggregation at "
        "query time; all churn work happened incrementally at refresh.",
    ),
    (
        "search_hybrid_rrf",
        "Hybrid RRF fusion: each retrieval arm (BM25, embedding cosine) "
        "reduces the corpus to a top-50 TakeOrdered BEFORE the fusion "
        "join, so the rank-fusion full-outer join is constant-size "
        "regardless of corpus scale.",
    ),
    (
        "sample_dsir_weights",
        "DSIR importance weights: grams are built INSIDE the token array "
        "(zip_with on slices — no token-level shuffle) and exploded once "
        "per side; both count tables aggregate map-side to <= B rows; "
        "the weight table joins back as a B-row BROADCAST, so the only "
        "data-sized exchange is the final per-doc groupBy.",
    ),
]


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()
    # keep the tree; drop the verbose per-node detail blocks to stay readable
    tree = txt.split("\n\n")[0]
    return re.sub(r"#\d+L?", "", tree)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit")
    queries = entrymod.queries()
    out = [
        "# PLANS — flagship physical plans (auto-generated)",
        "",
        f"`python tools/plan_audit.py` over `{sf_dir}`. Operator trees "
        "only (details stripped); the properties below each tree are "
        "pinned by `tests/test_plan_shapes.py` and friends.",
    ]
    for name, why in AUDIT:
        df = queries[name](spark, sf_dir)
        out += ["", f"## {name}", "", why, "", "```", _plan(df).rstrip(), "```"]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote PLANS.md ({len(AUDIT)} plans)")


if __name__ == "__main__":
    main()
