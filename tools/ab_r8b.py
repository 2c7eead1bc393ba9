"""Round-8 second warm A/B: the 14 >=1.3x flags in the end-of-round
BENCH_LOCAL refresh (committed 8c418f7 numbers vs the post-feature
rerun). The common-172 suite total got 9% FASTER while these flagged,
and several flagged queries touch no code changed since (e.g.
agg_pending_reports, join_salted_hot_keys, corpus_build_funnel) —
classic suite-position noise signature; 3 warm runs in one fresh
session decide per the standing protocol.

Usage: python tools/ab_r8b.py   (prints the markdown table)
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402,F401

from openverse_catalog_spark.plans.analytics import QUERIES  # noqa: E402
from openverse_catalog_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"

FLAGS = [
    ("agg_pending_reports", 0.39, 1.00),
    ("merge_unique_guard", 0.89, 2.15),
    ("clean_stored_tsv", 2.02, 4.87),
    ("dedup_incremental_batch", 0.58, 1.22),
    ("merge_cow_table", 1.89, 3.89),
    ("corpus_build_funnel", 1.77, 3.59),
    ("merge_cow_update", 2.06, 4.04),
    ("join_salted_hot_keys", 0.66, 1.22),
    ("merge_struct_audio_set", 0.82, 1.43),
    ("agg_winsorized_values", 0.87, 1.43),
    ("pipeline_inaturalist_bulk", 1.40, 2.28),
    ("dedup_fuzzy_titles", 1.17, 1.90),
    ("dedup_url_canonical", 0.80, 1.25),
    ("merge_snapshot_diff", 1.02, 1.38),
]


def main() -> None:
    spark = get_spark("ab_r8b")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print("| query | committed | rerun cold | warm median | verdict |")
    print("|---|---|---|---|---|")
    for name, committed, cold in FLAGS:
        fn = QUERIES[name]
        fn(spark, SF_DIR).count()  # per-query warm-up, not timed
        walls = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            walls.append(time.time() - t0)
        med = statistics.median(walls)
        verdict = (
            "noise (warm <= committed*1.15)" if med <= committed * 1.15
            else "REGRESSION — investigate"
        )
        print(f"| {name} | {committed:.2f} | {cold:.2f} "
              f"| {med:.2f} | {verdict} |")
    spark.stop()


if __name__ == "__main__":
    main()
