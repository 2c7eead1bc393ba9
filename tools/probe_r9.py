"""Round-9 scale probes (append results to SCALING.md):

1. ``dsir``    — DSIR INCREMENTAL path: fit the importance model on a
   1x and a 10x corpus, then score the SAME fixed-size arriving batch
   against each frozen model. The model is a dense B=512-row broadcast
   at any corpus size, so the batch rescore must stay FLAT; only the
   one-time fit may scale with the corpus.
2. ``vecidx``  — incremental VECTOR index: build once on 1x and 10x
   embedding corpora, apply the SAME fixed-size churn (300 vector
   updates + 100 inserts), time refresh() and a probe. O(corpus)
   maintenance would scale the refresh ~10x; O(churn) keeps it flat.
   (The twin of probe_r8_dsir.py's search-index probe.)
3. ``pq``      — PQ-mode vector index: same harness as ``vecidx`` but
   with product-quantized lists (codes instead of raw vectors); both
   the refresh and the ADC probe must stay flat at 10x.
4. ``cattick`` — the catalog maintenance tick WITH a registered search
   index attached: 10x base corpus, fixed churn wave per tick; the
   tick (recover + compact decisions + index refresh + protected
   vacuum) must stay O(churn + manifests), now including the index
   refresh it performs.

Usage: python tools/probe_r9.py [dsir|vecidx|pq|cattick|all]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from openverse_catalog_spark.session import get_spark, load_tables  # noqa: E402
from tools.scale_probe import SF_DIR, replicate  # noqa: E402


def probe_dsir(spark) -> None:
    from openverse_catalog_spark.operators import sampling as smp

    print("| corpus | model fit (s) | fixed-batch score (s) |")
    print("|---|---|---|")
    for copies in (1, 10):
        tmp = tempfile.mkdtemp(prefix=f"dsir{copies}x_")
        replicate(spark, SF_DIR, tmp, {"documents": ["doc_id"]},
                  copies=copies)
        d = load_tables(spark, tmp, ("documents",))["documents"]
        tgt = d.filter(F.col("source").isin("src1", "src2", "src3"))
        raw = d.filter(~F.col("source").isin("src1", "src2", "src3"))
        t0 = time.time()
        smp.dsir_model(
            spark, raw, tgt, "doc_id", "text", n_buckets=512, alpha=0.5
        ).write.mode("overwrite").parquet(f"{tmp}/model")
        t_fit = time.time() - t0
        model = spark.read.parquet(f"{tmp}/model")
        # FIXED batch: the same ~1k docs regardless of corpus size
        batch = (
            load_tables(spark, SF_DIR, ("documents",))["documents"]
            .filter(F.col("source").isin("src4", "src5"))
            .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                    "text")
        )
        t0 = time.time()
        smp.dsir_score(batch, model, "doc_id", "text",
                       n_buckets=512).count()
        t_score = time.time() - t0
        print(f"| {copies}x | {t_fit:.2f} | {t_score:.2f} |")


def probe_vecidx(spark) -> None:
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.vectorindex import VectorIndex

    print("| corpus | build (s) | refresh after fixed churn (s) "
          "| probe 100q (s) |")
    print("|---|---|---|---|")
    for copies in (1, 10):
        tmp = tempfile.mkdtemp(prefix=f"vidx{copies}x_")
        replicate(spark, SF_DIR, tmp, {"embeddings": ["vec_id"]},
                  copies=copies)
        e = load_tables(spark, tmp, ("embeddings",))["embeddings"].select(
            "vec_id", "embedding"
        )
        base = CowTable.create(
            spark, f"{tmp}/vecs", e, keys=("vec_id",), target_files=16
        )
        t0 = time.time()
        idx = VectorIndex.create(
            spark, f"{tmp}/idx", base, centroid_mod=40, target_files=16
        )
        t_build = time.time() - t0
        # FIXED-SIZE churn independent of corpus size
        base.update(
            F.col("vec_id") < 300,
            {"embedding": F.reverse(F.col("embedding"))},
        )
        newvecs = e.filter(F.col("vec_id") < 100).select(
            (F.col("vec_id") + 50_000_000).alias("vec_id"),
            F.reverse(F.col("embedding")).alias("embedding"),
        )
        base.merge_when(newvecs, insert=True)
        t0 = time.time()
        r = idx.refresh()
        t_refresh = time.time() - t0
        assert r["refreshed"] and not r.get("resync"), r
        queries = base.read().filter(
            (F.col("vec_id") % 20 == 0) & (F.col("vec_id") < 2000)
        )
        t0 = time.time()
        idx.probe(queries, k=3, nprobe=2).count()
        t_probe = time.time() - t0
        print(f"| {copies}x | {t_build:.2f} | {t_refresh:.2f} "
              f"| {t_probe:.2f} |")


def probe_pq(spark) -> None:
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.vectorindex import VectorIndex

    print("| corpus | pq build (s) | pq refresh fixed churn (s) "
          "| pq probe 100q (s) |")
    print("|---|---|---|---|")
    for copies in (1, 10):
        tmp = tempfile.mkdtemp(prefix=f"vpq{copies}x_")
        replicate(spark, SF_DIR, tmp, {"embeddings": ["vec_id"]},
                  copies=copies)
        e = load_tables(spark, tmp, ("embeddings",))["embeddings"].select(
            "vec_id", "embedding"
        )
        base = CowTable.create(
            spark, f"{tmp}/vecs", e, keys=("vec_id",), target_files=16
        )
        t0 = time.time()
        idx = VectorIndex.create(
            spark, f"{tmp}/idx", base, centroid_mod=40,
            pq_m=8, codebook_mod=25, target_files=16,
        )
        t_build = time.time() - t0
        base.update(
            F.col("vec_id") < 300,
            {"embedding": F.reverse(F.col("embedding"))},
        )
        newvecs = e.filter(F.col("vec_id") < 100).select(
            (F.col("vec_id") + 50_000_000).alias("vec_id"),
            F.reverse(F.col("embedding")).alias("embedding"),
        )
        base.merge_when(newvecs, insert=True)
        t0 = time.time()
        r = idx.refresh()
        t_refresh = time.time() - t0
        assert r["refreshed"] and not r.get("resync"), r
        queries = base.read().filter(
            (F.col("vec_id") % 20 == 0) & (F.col("vec_id") < 2000)
        )
        t0 = time.time()
        idx.probe(queries, k=3, nprobe=2, shortlist=10).count()
        t_probe = time.time() - t0
        print(f"| {copies}x | {t_build:.2f} | {t_refresh:.2f} "
              f"| {t_probe:.2f} |")


def probe_cattick(spark) -> None:
    from openverse_catalog_spark.operators.catalog import LakeCatalog
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.searchindex import SearchIndex
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    cols = [
        ColumnSpec("doc_id", Datatype.int, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("text", Datatype.char),
        ColumnSpec("source", Datatype.char),
    ]
    print("| corpus | tick w/ index: median of 3 (s) | index applied ok |")
    print("|---|---|---|")
    import statistics

    for copies in (1, 10):
        tmp = tempfile.mkdtemp(prefix=f"ctix{copies}x_")
        replicate(spark, SF_DIR, tmp, {"documents": ["doc_id"]},
                  copies=copies)
        d = load_tables(spark, tmp, ("documents",))["documents"].select(
            "doc_id", "text", "source"
        )
        cat = LakeCatalog.create(spark, f"{tmp}/lake")
        docs = CowTable.create(
            spark, f"{tmp}/docs", d, keys=("doc_id",), target_files=16
        )
        cat.register("docs", docs)
        idx = SearchIndex.create(
            spark, f"{tmp}/idx", docs,
            version=cat._entry("docs")["version"],
        )
        cat.register_index("idx", "search", idx.root, "docs",
                           {"id": "doc_id", "text": "text"})
        walls = []
        for wave in range(3):
            # FIXED churn wave through a transaction (publishes a pin)
            with cat.transaction() as txn:
                txn.table("docs").update(
                    F.col("doc_id") < 500,
                    {"text": F.concat(F.col("text"),
                                      F.lit(f" wave{wave} spark"))},
                )
                newdocs = spark.createDataFrame(
                    [(20_000_000 + wave * 1000 + i,
                      "spark hash join " + "pad " * (i % 5), "srcX")
                     for i in range(100)],
                    "doc_id long, text string, source string",
                )
                txn.table("docs").merge(newdocs, cols)
            t0 = time.time()
            rep = cat.maintain_tables(
                target_rows=1, retention_seconds=3600.0
            )
            walls.append(time.time() - t0)
            assert rep["index:idx"]["applied"] == \
                cat._entry("docs")["version"], rep["index:idx"]
        ok = not rep["index:idx"].get("resync")
        print(f"| {copies}x | {statistics.median(walls):.2f} | {ok} |")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("probe_r9")
    if which in ("dsir", "all"):
        probe_dsir(spark)
    if which in ("vecidx", "all"):
        probe_vecidx(spark)
    if which in ("pq", "all"):
        probe_pq(spark)
    if which in ("cattick", "all"):
        probe_cattick(spark)
    spark.stop()


if __name__ == "__main__":
    main()
