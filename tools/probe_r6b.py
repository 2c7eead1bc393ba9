"""10x probe for the operators added after the first round-6 batch:
incremental ANALYZE and the text-driven join+agg MV.

Usage: python tools/probe_r6b.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

from openverse_catalog_spark.session import get_spark, load_tables  # noqa: E402
from tools.scale_probe import COPIES, SF_DIR, replicate, timed  # noqa: E402

R6B_PROBES = [
    ("stats_incremental_analyze", {"orders": ["o_orderkey"]}),
    ("sql_mv_join_agg", {"orders": ["o_orderkey"]}),
]


def main() -> None:
    spark = get_spark("probe_r6b")
    queries = entrymod.queries()
    tmp = tempfile.mkdtemp(prefix="sf10x_r6b_")
    tables_needed: dict[str, list[str]] = {}
    for _, offs in R6B_PROBES:
        tables_needed.update(offs)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        if t not in tables_needed:
            load_tables(spark, SF_DIR, (t,))[t].write.mode(
                "overwrite"
            ).parquet(f"{tmp}/{t}.parquet")
    replicate(spark, SF_DIR, tmp, tables_needed, copies=COPIES)

    rows = []
    for name, _ in R6B_PROBES:
        fn = queries[name]
        timed(fn, spark, SF_DIR)  # warm
        t1 = timed(fn, spark, SF_DIR)
        t10 = timed(fn, spark, tmp)
        rows.append((name, t1, t10, t10 / t1, t10 / t1 / COPIES))
        print(
            f"{name}: {t1:.2f}s -> {t10:.2f}s "
            f"({t10 / t1:.1f}x wall, {t10 / t1 / COPIES:.2f}x/row)"
        )
    lines = [
        "",
        "## Round-6 10x probe, batch 2 (incremental ANALYZE / "
        "text-driven join+agg MV)",
        "",
        "Same harness (key-offset replication, cores fixed). "
        "stats_incremental_analyze includes the table build + the "
        "kmv-seeded FULL analyze at both scales (the O(table) seed is "
        "the one-time cost; the incremental step itself reads only the "
        "three churn commits' feed). sql_mv_join_agg includes the full "
        "CREATE MATERIALIZED VIEW build + churn + two text REFRESHes.",
        "",
        "| query | sf0.1 (s) | 10x (s) | wall | per-row |",
        "|---|---|---|---|---|",
    ]
    for name, t1, t10, w, pr in rows:
        lines.append(
            f"| {name} | {t1:.2f} | {t10:.2f} | {w:.1f}x | {pr:.2f}x |"
        )
    with open("/root/repo/SCALING.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
