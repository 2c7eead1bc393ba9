"""One-off 10x probe of the round-5 additions (deletion vectors,
dynamic file pruning, SQL facade, IVF-PQ, JPEG decode): same key-offset
replication + per-row linearity check as tools/scale_probe.py, focused
on the queries added this round. Appends a section to SCALING.md.

Usage: python tools/probe_r5.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

from openverse_catalog_spark.session import get_spark, load_tables  # noqa: E402
from tools.scale_probe import COPIES, SF_DIR, replicate, timed  # noqa: E402

R5_PROBES = [
    ("merge_cow_delete_dv", {"customer": ["c_custkey"]}),
    ("merge_cow_dim_pruned", {"customer": ["c_custkey"]}),
    ("merge_cow_point_lookup", {"customer": ["c_custkey"]}),
    ("sql_taxa_enrich", {"customer": ["c_custkey"]}),
    ("sql_cow_time_travel", {"customer": ["c_custkey"]}),
    ("knn_ivf_pq", {"embeddings": ["vec_id"]}),
    ("multimodal_jpeg_decode", {"documents": ["doc_id"]}),
]


def main() -> None:
    spark = get_spark("probe_r5")
    queries = entrymod.queries()
    tmp = tempfile.mkdtemp(prefix="sf10x_r5_")
    tables_needed: dict[str, list[str]] = {}
    for _, offs in R5_PROBES:
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
    for name, _ in R5_PROBES:
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
        "## Round-5 10x probe (deletion vectors / DFP / SQL facade / "
        "IVF-PQ / JPEG)",
        "",
        "Same harness as the 10x table above (key-offset replication, "
        "cores fixed): per-row <= ~1.2x = the shuffle/partition shape "
        "holds. CoW queries rebuild their tables per run, so their "
        "numbers include create+commit I/O at both scales; knn_ivf_pq "
        "includes the index build at both scales.",
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
