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


if __name__ == "__main__" and (len(sys.argv) < 2 or sys.argv[1] != "index"):
    main()


def index_probe() -> None:
    """O(churn) evidence for the incremental search index: build once
    on 1x and 10x corpora, apply the SAME fixed-size churn (500 doc
    updates + 100 new docs), and time refresh(). O(corpus) maintenance
    would scale the refresh ~10x; O(churn) keeps it flat."""
    import tempfile
    import time

    from pyspark.sql import functions as F

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.searchindex import SearchIndex
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec, Datatype, UpsertStrategy,
    )
    from openverse_catalog_spark.session import load_tables

    spark = get_spark("probe_searchindex")
    cols = [
        ColumnSpec("doc_id", Datatype.int, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("text", Datatype.char),
        ColumnSpec("source", Datatype.char),
    ]
    print("| corpus | build (s) | refresh after fixed churn (s) "
          "| query (s) |")
    print("|---|---|---|---|")
    for copies in (1, 10):
        tmp = tempfile.mkdtemp(prefix=f"sidx{copies}x_")
        # same key-offset replication harness as every other probe
        replicate(spark, SF_DIR, tmp, {"documents": ["doc_id"]},
                  copies=copies)
        d = load_tables(spark, tmp, ("documents",))["documents"].select(
            "doc_id", "text", "source"
        )
        base = CowTable.create(
            spark, f"{tmp}/docs", d, keys=("doc_id",), target_files=16
        )
        t0 = time.time()
        idx = SearchIndex.create(spark, f"{tmp}/idx", base)
        t_build = time.time() - t0
        # FIXED-SIZE churn independent of corpus size
        base.update(
            F.col("doc_id") < 500,
            {"text": F.concat(F.col("text"), F.lit(" spark vector"))},
        )
        newdocs = spark.createDataFrame(
            [(10_000_000 + i, "spark hash join vector " + "pad " * (i % 7),
              "srcX") for i in range(100)],
            "doc_id long, text string, source string",
        )
        base.merge(newdocs, cols)
        t0 = time.time()
        idx.refresh()
        t_refresh = time.time() - t0
        t0 = time.time()
        idx.bm25(["join", "hash", "vector", "spark"], 20).collect()
        t_query = time.time() - t0
        print(f"| {copies}x | {t_build:.2f} | {t_refresh:.2f} "
              f"| {t_query:.2f} |")
    spark.stop()


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "index":
    index_probe()
