"""Round-7 warm A/B of the DRIVER-tail bench flags (r5 -> r6).

The r6 verdict's process finding: the A/B protocol sourced its flags
only from BENCH_LOCAL; the driver tails (BENCH_r05 vs BENCH_r06) showed
11 pairs >= 1.3x of which 7 were never A/B'd. Protocol (SCALING.md,
since r4): every >= 1.3x single-shot pair gets 3 warm re-runs in one
session before any code changes — cold single-shot suite numbers carry
suite-position noise (cache state, JIT, shuffle-dir reuse) that warm
medians don't.

Usage: python tools/ab_r7.py   (appends the table to SCALING.md)
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

#: (query, r5 driver sec, r6 driver sec) — the 7 un-A/B'd flags named
#: in the r6 verdict, values from the BENCH_r0{5,6} tails.
FLAGS = [
    ("clean_sub_provider_update", 0.52, 0.95),
    ("merge_unique_guard", 0.92, 1.44),
    ("agg_pending_reports", 0.40, 0.62),
    ("clean_stored_tsv", 1.97, 3.02),
    ("pipeline_inaturalist_bulk", 1.52, 2.22),
    ("embed_source_centroids", 0.61, 0.86),
    ("classifier_logreg_train", 0.88, 1.21),
]


def main() -> None:
    spark = get_spark("ab_r7")
    lines = [
        "",
        "## Round-7 warm A/B — driver-tail flags (BENCH_r05 vs r06)",
        "",
        "The 7 pairs the r6 bench protocol missed (flags must be     ",
        "sourced from BENCH_r(N) vs BENCH_r(N-1) AND BENCH_LOCAL —    ",
        "protocol updated). 3 warm runs each in one session; a warm   ",
        "median at-or-below the r5 value = suite-position noise, not  ",
        "a regression.",
        "",
        "| query | r5 cold | r6 cold | warm median (r7) | verdict |",
        "|---|---|---|---|---|",
    ]
    for name, r5, r6 in FLAGS:
        fn = QUERIES[name]
        fn(spark, SF_DIR).count()  # warm-up, not timed
        ts = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            ts.append(time.time() - t0)
        med = statistics.median(ts)
        verdict = (
            "noise (warm <= r5)" if med <= r5 * 1.1 else
            "noise-ish (warm < r6)" if med < r6 else
            "REGRESSION — investigate"
        )
        print(f"{name}: r5={r5:.2f} r6={r6:.2f} warm={med:.2f} "
              f"(runs {', '.join(f'{t:.2f}' for t in ts)}) -> {verdict}")
        lines.append(
            f"| {name} | {r5:.2f} | {r6:.2f} | {med:.2f} | {verdict} |"
        )
    with open("/root/repo/SCALING.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
