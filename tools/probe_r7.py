"""Round-7 probes: (a) CDC trigger amortization, (b) 100x lakehouse/MV.

(a) The r6 10x probe flagged stream_cdc_apply / stream_cdc_tombstones
at 0.28-0.30x per-row — a NAMED exception caused by the fixtures'
worst-case ``maxFilesPerTrigger=1`` (every landing file = one merge
commit, so a 10x log pays the fixed trigger+commit machinery 10x).
This probe drains the SAME 10x log with an unbounded trigger (all
pending files collapse latest-wins into ONE merge — the production
setting for catch-up/backfill) and records the per-row ratio, which
should drop toward the merge-only cost. Final-state equality across
trigger sizes is pinned in tests/test_cowtable.py
(test_cdc_stream_trigger_size_independence).

(b) The only 100x evidence on record is r1's top-5 pipelines; the
heaviest queries today have only 10x rows. One 100x batch (key-offset
replication, same harness) over mv_join_agg_incremental,
mv_join_incremental, stream_cdc_apply, stream_cdc_tombstones,
merge_cow_partitioned, pipeline_popularity_refresh_cdf.

Usage:
  python tools/probe_r7.py cdc    # part (a), ~minutes
  python tools/probe_r7.py deep   # part (b), tens of minutes
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402,F401  (registry import)

from openverse_catalog_spark.plans.analytics import QUERIES  # noqa: E402
from openverse_catalog_spark.session import get_spark  # noqa: E402
from tools.scale_probe import COPIES, SF_DIR, replicate, timed  # noqa: E402

CDC_QUERIES = ("stream_cdc_apply", "stream_cdc_tombstones")

DEEP_COPIES = 100
DEEP_PROBES = [
    ("mv_join_incremental", {"orders": ["o_orderkey"]}),
    ("mv_join_agg_incremental", {"orders": ["o_orderkey"]}),
    ("stream_cdc_apply", {"orders": ["o_orderkey"]}),
    ("stream_cdc_tombstones", {"orders": ["o_orderkey"]}),
    ("merge_cow_partitioned", {"orders": ["o_orderkey"]}),
    ("pipeline_popularity_refresh_cdf", {"orders": ["o_orderkey"]}),
]


def _timed_kw(fn, spark, sf_dir, **kw) -> float:
    t0 = time.time()
    fn(spark, sf_dir, **kw).count()
    return time.time() - t0


def cdc_main() -> None:
    spark = get_spark("probe_r7_cdc")
    tmp = tempfile.mkdtemp(prefix="sf10x_r7cdc_")
    replicate(spark, SF_DIR, tmp, {"orders": ["o_orderkey"]},
              copies=COPIES)
    lines = [
        "",
        "## Round-7 CDC trigger-amortization probe",
        "",
        "The r6 named exception (stream_cdc_* at 0.28-0.30x per-row)  ",
        "re-measured with an unbounded trigger: the same 10x CDC log  ",
        "drains as ONE latest-wins merge commit instead of one commit ",
        "per landing file. Equality of final state across trigger     ",
        "sizes is test-pinned (test_cdc_stream_trigger_size_independence).",
        "",
        "| query | trigger | sf0.1 (s) | 10x (s) | wall | per-row |",
        "|---|---|---|---|---|---|",
    ]
    for name in CDC_QUERIES:
        fn = QUERIES[name]
        for label, mfpt in (("1 file", 1), ("all files", None)):
            _timed_kw(fn, spark, SF_DIR,
                      _max_files_per_trigger=mfpt)  # warm
            t1 = _timed_kw(fn, spark, SF_DIR,
                           _max_files_per_trigger=mfpt)
            t10 = _timed_kw(fn, spark, tmp,
                            _max_files_per_trigger=mfpt)
            w = t10 / t1
            print(f"{name} [{label}]: {t1:.2f}s -> {t10:.2f}s "
                  f"({w:.1f}x wall, {w / COPIES:.2f}x/row)")
            lines.append(
                f"| {name} | {label} | {t1:.2f} | {t10:.2f} "
                f"| {w:.1f}x | {w / COPIES:.2f}x |"
            )
    with open("/root/repo/SCALING.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


def deep_main() -> None:
    from openverse_catalog_spark.session import load_tables

    spark = get_spark("probe_r7_deep")
    tmp = tempfile.mkdtemp(prefix="sf100x_r7_")
    needed: dict[str, list[str]] = {}
    for _, offs in DEEP_PROBES:
        needed.update(offs)
    # non-replicated tables copy through unchanged (dimensions stay
    # 1x against the 100x facts, as in every probe batch)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        if t not in needed:
            load_tables(spark, SF_DIR, (t,))[t].write.mode(
                "overwrite"
            ).parquet(f"{tmp}/{t}.parquet")
    replicate(spark, SF_DIR, tmp, needed, copies=DEEP_COPIES)
    lines = [
        "",
        "## Round-7 100x probe (lakehouse / MV / CDC heavyweights)",
        "",
        "Key-offset replication to 100x sf0.1 (~15M orders), cores     ",
        "fixed. These fixtures rebuild their tables and run the whole  ",
        "multi-commit churn chain per invocation, so the numbers       ",
        "include create/commit I/O at both scales. Per-row <= ~1.5x =  ",
        "no shuffle-shape or memory-ceiling break at two orders of     ",
        "magnitude.",
        "",
        "| query | sf0.1 (s) | 100x (s) | wall | per-row |",
        "|---|---|---|---|---|",
    ]
    for name, _ in DEEP_PROBES:
        fn = QUERIES[name]
        timed(fn, spark, SF_DIR)  # warm
        t1 = timed(fn, spark, SF_DIR)
        t100 = timed(fn, spark, tmp)
        w = t100 / t1
        print(f"{name}: {t1:.2f}s -> {t100:.2f}s "
              f"({w:.1f}x wall, {w / DEEP_COPIES:.2f}x/row)")
        lines.append(
            f"| {name} | {t1:.2f} | {t100:.2f} | {w:.1f}x "
            f"| {w / DEEP_COPIES:.2f}x |"
        )
    with open("/root/repo/SCALING.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()




def zmaint_main() -> None:
    """O(churn) z-maintenance probe: fixed-size churn against a 1x vs
    10x z-clustered table; the maintain() tick (z-aware compact +
    drift measure + stats advance + vacuum) must cost ~the churn, not
    the table — flat wall across the 10x base is the evidence."""
    import shutil

    from pyspark.sql import functions as F

    spark = get_spark("probe_r7_zmaint")

    def base_df(n):
        return spark.range(n).select(
            F.concat(F.lit("k"), F.col("id").cast("string")).alias("fid"),
            (F.col("id") % 100_000).cast("double").alias("x"),
        )

    def churn_df(n, seed):
        # half in-bounds, half beyond (exercises the drift measure)
        return spark.range(n).select(
            F.concat(F.lit(f"c{seed}_"), F.col("id").cast("string"))
            .alias("fid"),
            ((F.col("id") % 2) * 200_000 + F.col("id") % 100_000)
            .cast("double").alias("x"),
        )

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    cols = [
        ColumnSpec("fid", Datatype.char,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("x", Datatype.double),
    ]
    results = []
    for label, rows in (("1x", 150_000), ("10x", 1_500_000)):
        root = tempfile.mkdtemp(prefix=f"zmaint_{label}_")
        shutil.rmtree(root, ignore_errors=True)
        t = CowTable.create(
            spark, root, base_df(rows), keys=("fid",),
            target_files=max(2, rows // 50_000), stats_cols=("x",),
        )
        t.compact(
            target_rows=50_000, zorder_by=["x"], zorder_incremental=True
        )
        t.analyze(kmv_k=256)
        ticks = []
        for wave in range(3):
            t.merge(churn_df(5_000, wave), cols, deterministic=True)
            t0 = time.time()
            out = t.maintain(
                target_rows=50_000, small_file_ratio=0.0,
                keep_versions=50,
            )
            ticks.append(time.time() - t0)
            # the probe must exercise the z-compact + drift-measure
            # path, not just ANALYZE+vacuum: small_file_ratio=0 forces
            # the compact decision whenever churn files exist, and the
            # asserts pin that the tick really clustered and counted
            assert out["compacted"], f"{label} wave {wave}: no compact"
        clamp = t._manifest()["zorder_clamp"]
        assert clamp["drifted_rows"] > 0, "drift must have been measured"
        print(f"{label}: drifted_rows={clamp['drifted_rows']} "
              f"fraction={clamp['fraction']:.4f}")
        results.append((label, rows, ticks))
        print(f"{label} ({rows} rows): ticks "
              + ", ".join(f"{s:.2f}s" for s in ticks))
    (l1, n1, t1), (l10, n10, t10) = results
    import statistics

    r = statistics.median(t10) / statistics.median(t1)
    lines = [
        "",
        "## Round-7 z-maintenance O(churn) probe",
        "",
        "Fixed 5k-row churn waves (half out-of-bounds, exercising the  ",
        "drift measure) against a z-clustered 150k vs 1.5M-row table;  ",
        "each tick = maintain(small_file_ratio=0) — the z-aware        ",
        "incremental compact + drift accounting + incremental ANALYZE  ",
        "+ vacuum, with compaction ASSERTED to have run and drift      ",
        "ASSERTED measured each wave. A churn-proportional tick stays  ",
        "~flat across the 10x base.",
        "",
        "| base rows | tick walls (s) | median |",
        "|---|---|---|",
        f"| {n1} | " + ", ".join(f"{s:.2f}" for s in t1)
        + f" | {statistics.median(t1):.2f} |",
        f"| {n10} | " + ", ".join(f"{s:.2f}" for s in t10)
        + f" | {statistics.median(t10):.2f} |",
        "",
        f"10x-base / 1x-base median tick ratio: **{r:.2f}x** "
        "(O(table) would read ~10x).",
    ]
    with open("/root/repo/SCALING.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "cdc"
    if mode == "deep":
        deep_main()
    elif mode == "zmaint":
        zmaint_main()
    else:
        cdc_main()
