"""10x probe of the fifth round-5 batch (hidden partitioning, hybrid
RRF retrieval): key-offset replication + per-row linearity check,
appended to SCALING.md.

Usage: python tools/probe_r5e.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

from openverse_catalog_spark.session import get_spark, load_tables  # noqa: E402
from tools.scale_probe import COPIES, SF_DIR, replicate, timed  # noqa: E402

R5E_PROBES = [
    ("merge_cow_partitioned", {"orders": ["o_orderkey"]}),
    ("search_hybrid_rrf", {"documents": ["doc_id"], "embeddings": ["vec_id"]}),
]


def main() -> None:
    spark = get_spark("probe_r5e")
    queries = entrymod.queries()
    tmp = tempfile.mkdtemp(prefix="sf10x_r5e_")
    tables_needed: dict[str, list[str]] = {}
    for _, offs in R5E_PROBES:
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
    for name, _ in R5E_PROBES:
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
        "## Round-5 10x probe, batch 5 (hidden partitioning / hybrid RRF)",
        "",
        "Same harness (key-offset replication, cores fixed): per-row "
        "<= ~1.2x = the shuffle/partition shape holds. The partitioned "
        "query includes the full create + merge + pruned-read chain at "
        "both scales (orders replicate with offset keys, so the table "
        "and every month partition grow 10x); the hybrid query's two "
        "arms each reduce the 10x corpus to a fixed top-50 list before "
        "the constant-size fusion join.",
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
