"""Round-8 warm A/B of the driver-tail bench flags (r6 -> r7).

Exactly one >=1.3x pair exists in the 60-query common driver tail
(BENCH_r06 vs BENCH_r07): stream_cdc_tombstones 9.25 -> 12.34 (1.33x).
Unlike most flags this one is PLAUSIBLY REAL: round 7 added fenced
tombstone-store creation and expiry-in-fence logic to exactly this path
(streaming/incremental.py:792-866), so the warm median is compared
against BOTH tails — and if the regression reproduces warm, the next
step is profiling the fixed costs (store-create probe, hygiene listdir,
fence semi-join), not dismissing it as suite noise.

Protocol (SCALING.md, since r4): 3 warm re-runs in one session, median
decides. Usage: python tools/ab_r8.py  (appends the table to SCALING.md)
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

#: (query, r6 driver sec, r7 driver sec) — the single >=1.3x pair in
#: the r6-vs-r7 driver tails (verified by re-parsing both tails).
FLAGS = [
    ("stream_cdc_tombstones", 9.25, 12.34),
]


def main() -> None:
    spark = get_spark("ab_r8")
    lines = [
        "",
        "## Round-8 warm A/B — driver-tail flags (BENCH_r06 vs r07)",
        "",
        "One >=1.3x pair in the 60-query common tail. r7 touched this",
        "exact path (fenced tombstone-store creation + expiry-in-fence,",
        "incremental.py:792-866), so a REAL fixed-cost increase is",
        "plausible; 3 warm runs decide, then profile if it reproduces.",
        "",
        "| query | r6 cold | r7 cold | warm median (r8) | verdict |",
        "|---|---|---|---|---|",
    ]
    for name, r6, r7 in FLAGS:
        fn = QUERIES[name]
        fn(spark, SF_DIR).count()  # warm-up, not timed
        ts = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            ts.append(time.time() - t0)
        med = statistics.median(ts)
        verdict = (
            "noise (warm <= r6)" if med <= r6 * 1.1 else
            "noise-ish (warm < r7)" if med < r7 else
            "REGRESSION — investigate"
        )
        print(f"{name}: r6={r6:.2f} r7={r7:.2f} warm={med:.2f} "
              f"(runs {', '.join(f'{t:.2f}' for t in ts)}) -> {verdict}")
        lines.append(
            f"| {name} | {r6:.2f} | {r7:.2f} | {med:.2f} | {verdict} |"
        )
    with open("/root/repo/SCALING.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
