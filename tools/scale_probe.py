"""10x scale probe: run representative queries at sf0.1 and again on a
10x-replicated copy of the same tables, and report the wall-clock ratio.
Near-linear ratios (~<=12x for 10x data on fixed cores, i.e. <=1.2x
per-row cost) are the evidence that the operator's shuffle/partition
shape holds as data grows — the local stand-in for the 100 TB question.

Replication: each table is unioned 10x with key columns offset per copy
so join/group cardinalities scale with the data (a pure row copy would
leave key counts flat and overstate group-by scaling).

Usage: python tools/scale_probe.py   (writes SCALING.md)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from openverse_catalog_spark.session import get_spark, load_tables  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
COPIES = 10

# (query, key columns to offset per copy so cardinalities scale)
PROBES = [
    ("corpus_build_funnel", {"documents": ["doc_id"]}),
    ("dedup_incremental_batch", {"documents": ["doc_id"]}),
    ("merge_snapshot_diff", {"orders": ["o_orderkey"]}),
    ("sketch_cms_heavy_hitters", {"events": ["event_id", "user_id"]}),
    ("join_asof_last_click", {"events": ["event_id", "user_id"]}),
    ("corpus_pack_sequences", {"documents": ["doc_id"]}),
    ("window_event_gaps", {"events": ["event_id", "user_id"]}),
    ("agg_salted_distinct_users", {"events": ["event_id", "user_id"]}),
    ("pipeline_taxa_enrich", {"customer": ["c_custkey"]}),
    ("text_unigram_nll", {"documents": ["doc_id"]}),
    # offset l_orderkey and o_orderkey together so the photos join keys
    # keep matching across copies; observer/taxon ids stay in range
    ("pipeline_inaturalist_bulk", {"lineitem": ["l_orderkey"], "orders": ["o_orderkey"]}),
    ("dedup_simhash_pairs", {"documents": ["doc_id"]}),
    ("clean_stored_tsv", {"orders": ["o_orderkey"]}),
    ("merge_unique_guard", {"customer": ["c_custkey"]}),
    ("clean_sub_provider_update", {"orders": ["o_orderkey"]}),
    ("dedup_cross_corpus_bloom", {"documents": ["doc_id"]}),
    ("corpus_token_budget_cap", {"documents": ["doc_id"]}),
    ("dedup_exact_substring", {"documents": ["doc_id"]}),
    ("corpus_upsample_langs", {"documents": ["doc_id"]}),
]


def replicate(spark, src_dir: str, out_dir: str, offsets: dict[str, list[str]]) -> None:
    for table, keys in offsets.items():
        df = load_tables(spark, src_dir, (table,))[table]
        base = df.agg(*[F.max(k).alias(k) for k in keys]).head()
        parts = []
        for i in range(COPIES):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * (base[k] + 1)))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")


def timed(fn, spark, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).count()
    return time.time() - t0


def main() -> None:
    spark = get_spark("scale_probe")
    queries = entrymod.queries()
    tmp = tempfile.mkdtemp(prefix="sf10x_")
    tables_needed: dict[str, list[str]] = {}
    for _, offs in PROBES:
        tables_needed.update(offs)
    # the 10x dir must contain every table load_tables expects
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        if t not in tables_needed:
            load_tables(spark, SF_DIR, (t,))[t].write.mode("overwrite").parquet(
                f"{tmp}/{t}.parquet"
            )
    replicate(spark, SF_DIR, tmp, tables_needed)

    rows = []
    for name, _ in PROBES:
        fn = queries[name]
        timed(fn, spark, SF_DIR)  # warm (worker pools, file index)
        t1 = timed(fn, spark, SF_DIR)
        t10 = timed(fn, spark, tmp)
        rows.append((name, t1, t10, t10 / t1))

    lines = [
        "# SCALING — 10x probe (auto-generated)",
        "",
        f"`python tools/scale_probe.py`: each query at sf0.1, then on a "
        f"{COPIES}x key-offset replication of the same tables "
        "(cardinalities scale with rows). Fixed local[*] cores, so "
        "<=12x wall for 10x data means per-row cost held within ~1.2x — "
        "the shuffle/partition shape survives growth.",
        "",
        "| query | sf0.1 (s) | 10x (s) | ratio |",
        "|---|---|---|---|",
    ]
    for name, t1, t10, r in rows:
        lines.append(f"| {name} | {t1:.2f} | {t10:.2f} | {r:.1f}x |")
    table_lines = list(lines[-len(rows):])

    # Throughput anchor vs the reference's only published number: the
    # iNaturalist bulk load runs 2M-photo batches serially at a median
    # 18 min/batch (inaturalist.py:400-402) ~= 1.9k rows/s.
    inat = next((x for x in rows if x[0] == "pipeline_inaturalist_bulk"), None)
    if inat is not None:
        n10 = load_tables(spark, tmp, ("lineitem",))["lineitem"].count()
        rps = n10 / inat[2]
        lines += [
            "",
            "## Baseline anchor",
            "",
            f"`pipeline_inaturalist_bulk` — the same 5-table join + clean the "
            f"reference's iNaturalist load runs — processes {n10:,} photo rows "
            f"in {inat[2]:.2f} s on local[32] ({rps/1e6:.1f}M rows/s input-side) "
            "as ONE distributed plan. The reference's measured anchor for this "
            "job is ~1.9k rows/s (2M-row batches, median 18 min each, serialized "
            "through one connection — `inaturalist.py:400-402`).",
        ]

    with open("/root/repo/SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(table_lines))


if __name__ == "__main__":
    main()
