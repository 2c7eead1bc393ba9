"""Round-8 10x probe: DSIR importance resampling.

sample_dsir_weights / sample_dsir_select at sf0.1 (~5k docs) and on a
10x doc_id-offset replication (~50k docs; the src1-3 target sample and
the raw side both scale since `source` is preserved). Cores fixed, so a
per-row ratio <= ~1.2x is the evidence the plan is linear: gram explode
scales with tokens, the two count tables stay <= B rows, the weight
join is a B-row broadcast at any corpus size, and the only data-sized
shuffle is the per-doc groupBy.

Usage: python tools/probe_r8_dsir.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

from openverse_catalog_spark.plans.analytics import QUERIES  # noqa: E402
from openverse_catalog_spark.session import get_spark  # noqa: E402
from tools.scale_probe import SF_DIR, replicate, timed  # noqa: E402

PROBES = ("sample_dsir_weights", "sample_dsir_select")


def main() -> None:
    spark = get_spark("probe_dsir")
    tmp = tempfile.mkdtemp(prefix="sf10x_dsir_")
    replicate(spark, SF_DIR, tmp, {"documents": ["doc_id"]}, copies=10)
    print("| query | 1x wall (s) | 10x wall (s) | per-row ratio |")
    print("|---|---|---|---|")
    for name in PROBES:
        fn = QUERIES[name]
        base = min(timed(fn, spark, SF_DIR) for _ in range(2))
        big = min(timed(fn, spark, tmp) for _ in range(2))
        print(
            f"| {name} | {base:.2f} | {big:.2f} "
            f"| {big / base / 10:.2f}x |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
