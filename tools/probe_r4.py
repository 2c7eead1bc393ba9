"""One-off 10x probe of the round-4 additions (CDF, BPE, TF-IDF/PMI,
streaming commit log, data skipping, IVF upsert): same key-offset
replication + per-row linearity check as tools/scale_probe.py, focused
on the queries added this round. Appends a section to SCALING.md.

Usage: python tools/probe_r4.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

from openverse_catalog_spark.session import get_spark, load_tables  # noqa: E402
from tools.scale_probe import COPIES, SF_DIR, replicate, timed  # noqa: E402

R4_PROBES = [
    ("merge_cow_changes", {"customer": ["c_custkey"]}),
    ("merge_cow_publish_incremental", {"customer": ["c_custkey"]}),
    ("merge_cow_read_skipped", {"customer": ["c_custkey"]}),
    ("stream_cow_changes", {"customer": ["c_custkey"]}),
    ("pipeline_popularity_refresh_cdf", {"events": ["event_id", "user_id"]}),
    ("corpus_bpe_vocab", {"documents": ["doc_id"]}),
    ("corpus_bpe_encode", {"documents": ["doc_id"]}),
    ("search_tfidf_topk", {"documents": ["doc_id"]}),
    ("search_pmi_bigrams", {"documents": ["doc_id"]}),
    ("knn_ivf_index_upsert", {"embeddings": ["vec_id"]}),
]


def main() -> None:
    spark = get_spark("probe_r4")
    queries = entrymod.queries()
    tmp = tempfile.mkdtemp(prefix="sf10x_r4_")
    tables_needed: dict[str, list[str]] = {}
    for _, offs in R4_PROBES:
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
    for name, _ in R4_PROBES:
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
        "## Round-4 10x probe (CDF / BPE / corpus stats / index upsert)",
        "",
        "Same harness as the 10x table above (key-offset replication, "
        "cores fixed): per-row <= ~1.2x = the shuffle/partition shape "
        "holds. CoW queries rebuild their tables per run, so their "
        "numbers include create+merge commit I/O at both scales.",
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
