"""Round-10 scale probes (append results to SCALING.md):

1. ``decade`` — the 100x DECADE probe for the vector index: build on
   1x / 10x / 100x embedding corpora (key-offset replication), apply
   the SAME fixed-size churn (300 updates + 100 inserts), time
   refresh() and a fixed 100-query probe, and record the index's
   file/byte envelope. centroid_mod grows ~sqrt(n) per the index's own
   guidance, so per-list size is ~sqrt(n): the refresh must stay FLAT
   across both decades (O(churn), never O(corpus)) and the probe must
   grow sublinearly (~sqrt at worst). All prior evidence was one
   decade (10x); this is the second decade the 100 TB claim rests on.
2. ``heal``  — recluster skew heal: a 10x corpus plus a 20k-vector HOT
   CLUSTER aimed at one frozen centroid; probe queries point at the
   hot direction, so the probed list IS the hot list. Measures probe
   cost + skew stat before and after recluster(): the stat must report
   the imbalance and the heal must re-flatten probe cost.
3. ``filtered`` — filtered ANN at 1x and 10x: a COMMON predicate
   (~1/3 of the corpus — no escalation) and a RARE one (~1%% — nprobe
   escalates to the recall floor), single-vector search(where=) each,
   vs the brute-force exact filtered scan. The filtered search must
   stay near-flat at 10x (pre-filter scan is column-pruned; probe
   reads only probed lists) and far under the exact scan.

4. ``sdecade`` — the 100x decade probe for the SEARCH index: same
   harness shape as ``decade`` over replicated documents (fixed churn
   = 500 text updates + 100 inserts; fixed BM25 + phrase queries).
   Refresh must stay flat across both decades; query cost tracks the
   query terms' posting sizes (~linear in corpus for a fixed term —
   the honest bound for an inverted index; file PRUNING keeps the
   constant small).

Usage: python tools/probe_r10.py [decade|heal|filtered|sdecade|all]
"""

from __future__ import annotations

import math
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from openverse_catalog_spark.session import get_spark, load_tables  # noqa: E402
from tools.scale_probe import SF_DIR, replicate  # noqa: E402


def _tree_stats(root: str) -> tuple[int, float]:
    files, size = 0, 0
    for dirpath, _dirs, names in os.walk(root):
        for n in names:
            if n.endswith(".parquet"):
                files += 1
                size += os.path.getsize(os.path.join(dirpath, n))
    return files, size / 1e6


def probe_decade(spark) -> None:
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.vectorindex import VectorIndex

    print("| corpus | rows | C | build (s) | refresh fixed churn (s) "
          "| probe 100q (s) | list files | list MB |")
    print("|---|---|---|---|---|---|---|---|")
    for copies in (1, 10, 100):
        tmp = tempfile.mkdtemp(prefix=f"vdec{copies}x_")
        replicate(spark, SF_DIR, tmp, {"embeddings": ["vec_id"]},
                  copies=copies)
        e = load_tables(spark, tmp, ("embeddings",))["embeddings"].select(
            "vec_id", "embedding"
        )
        n = e.count()
        # C grows ~sqrt(n) (the index's own scaling guidance), so
        # per-list size is ~sqrt(n) and the probed-bytes growth is the
        # sublinear one the design promises
        mod = max(1, int(math.sqrt(n)))
        base = CowTable.create(
            spark, f"{tmp}/vecs", e, keys=("vec_id",),
            target_files=min(64, 16 * copies),
        )
        t0 = time.time()
        idx = VectorIndex.create(
            spark, f"{tmp}/idx", base, centroid_mod=mod,
            target_files=min(64, 16 * copies),
        )
        t_build = time.time() - t0
        n_cents = len(idx._centroid_matrix()[0])
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
        # FIXED query batch (same 100 ids at every scale)
        queries = base.read().filter(
            (F.col("vec_id") % 20 == 0) & (F.col("vec_id") < 2000)
        )
        t0 = time.time()
        idx.probe(queries, k=3, nprobe=2).count()
        t_probe = time.time() - t0
        lf, lmb = _tree_stats(f"{tmp}/idx")
        print(f"| {copies}x | {n} | {n_cents} | {t_build:.2f} "
              f"| {t_refresh:.2f} | {t_probe:.2f} | {lf} | {lmb:.1f} |")


def probe_heal(spark) -> None:
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.vectorindex import VectorIndex

    tmp = tempfile.mkdtemp(prefix="vheal_")
    replicate(spark, SF_DIR, tmp, {"embeddings": ["vec_id"]}, copies=10)
    e = load_tables(spark, tmp, ("embeddings",))["embeddings"].select(
        "vec_id", "embedding"
    )
    base = CowTable.create(
        spark, f"{tmp}/vecs", e, keys=("vec_id",), target_files=16
    )
    idx = VectorIndex.create(
        spark, f"{tmp}/idx", base, centroid_mod=141, target_files=16
    )
    # hot cluster: 20k near-copies of one direction -> one frozen list
    rng = np.random.default_rng(7)
    hot = rng.normal(size=64)
    hot = hot / np.sqrt((hot * hot).sum())
    hot_rows = [
        (60_000_000 + j,
         [float(x) for x in 2.0 * hot + rng.normal(scale=0.02, size=64)])
        for j in range(20_000)
    ]
    base.merge_when(
        spark.createDataFrame(
            hot_rows, "vec_id long, embedding array<double>"
        ),
        insert=True,
    )
    idx.refresh()
    # queries AIMED at the hot direction: the probed list is the hot one
    qrows = [
        (70_000_000 + j,
         [float(x) for x in hot + rng.normal(scale=0.05, size=64)])
        for j in range(100)
    ]
    queries = spark.createDataFrame(
        qrows, "vec_id long, embedding array<double>"
    )

    def timed_probe() -> float:
        t0 = time.time()
        idx.probe(queries, k=3, nprobe=2, exclude_self=False).count()
        return time.time() - t0

    s_before = idx.list_stats()
    t_before = min(timed_probe(), timed_probe())
    t0 = time.time()
    r = idx.recluster()
    t_heal = time.time() - t0
    s_after = idx.list_stats()
    t_after = min(timed_probe(), timed_probe())
    print("| stage | skew (max/median) | max list | hot-probe 100q (s) |")
    print("|---|---|---|---|")
    print(f"| before heal | {s_before['skew']:.1f} "
          f"| {s_before['max_list']} | {t_before:.2f} |")
    print(f"| after recluster ({t_heal:.1f} s, epoch {r['epoch']}, "
          f"C {r['centroids']}) | {s_after['skew']:.1f} "
          f"| {s_after['max_list']} | {t_after:.2f} |")


def probe_filtered(spark) -> None:
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.knn import cosine_expr
    from openverse_catalog_spark.operators.vectorindex import VectorIndex

    q = [float((i * 37 % 19) - 9) for i in range(64)]
    print("| corpus | common filter search (s) | rare filter search (s) "
          "| exact filtered scan (s) |")
    print("|---|---|---|---|")
    for copies in (1, 10):
        tmp = tempfile.mkdtemp(prefix=f"vflt{copies}x_")
        replicate(spark, SF_DIR, tmp, {"embeddings": ["vec_id"]},
                  copies=copies)
        e = load_tables(spark, tmp, ("embeddings",))["embeddings"].select(
            "vec_id", "embedding",
            F.expr(
                "CASE WHEN vec_id % 97 = 0 THEN 'gd' "
                "WHEN vec_id % 3 = 0 THEN 'en' ELSE 'de' END"
            ).alias("lang"),
        )
        base = CowTable.create(
            spark, f"{tmp}/vecs", e, keys=("vec_id",), target_files=16
        )
        idx = VectorIndex.create(
            spark, f"{tmp}/idx", base,
            centroid_mod=40 if copies == 1 else 141, target_files=16,
        )

        def timed(fn):
            t0 = time.time()
            fn()
            a = time.time() - t0
            t0 = time.time()
            fn()
            return min(a, time.time() - t0)  # warm best-of-2

        t_common = timed(
            lambda: idx.search(q, k=10, nprobe=2,
                               where="lang = 'en'").count()
        )
        t_rare = timed(
            lambda: idx.search(q, k=10, nprobe=2,
                               where="lang = 'gd'").count()
        )
        qarr = F.array(*[F.lit(float(x)) for x in q])
        t_exact = timed(
            lambda: base.read()
            .filter("lang = 'gd'")
            .select(cosine_expr(qarr, F.col("embedding")).alias("c"))
            .orderBy(F.col("c").desc()).limit(10).count()
        )
        print(f"| {copies}x | {t_common:.2f} | {t_rare:.2f} "
              f"| {t_exact:.2f} |")


def probe_sdecade(spark) -> None:
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
    print("| corpus | docs | build (s) | refresh fixed churn (s) "
          "| bm25 (s) | phrase (s) | postings files | postings MB |")
    print("|---|---|---|---|---|---|---|---|")
    for copies in (1, 10, 100):
        tmp = tempfile.mkdtemp(prefix=f"sdec{copies}x_")
        replicate(spark, SF_DIR, tmp, {"documents": ["doc_id"]},
                  copies=copies)
        d = load_tables(spark, tmp, ("documents",))["documents"].select(
            "doc_id", "text", "source"
        )
        n = d.count()
        base = CowTable.create(
            spark, f"{tmp}/docs", d, keys=("doc_id",),
            target_files=min(64, 16 * copies),
        )
        t0 = time.time()
        idx = SearchIndex.create(
            spark, f"{tmp}/idx", base,
            target_files=min(64, 16 * copies),
        )
        t_build = time.time() - t0
        # FIXED-SIZE churn independent of corpus size
        base.update(
            F.col("doc_id") < 500,
            {"text": F.concat(F.col("text"),
                              F.lit(" spark vector hash join"))},
        )
        newdocs = spark.createDataFrame(
            [(90_000_000 + i,
              "spark hash join vector quantum flux " + "pad " * (i % 5),
              "srcX") for i in range(100)],
            "doc_id long, text string, source string",
        )
        base.merge(newdocs, cols)
        t0 = time.time()
        r = idx.refresh()
        t_refresh = time.time() - t0
        assert r["refreshed"] and not r.get("resync"), r
        t0 = time.time()
        idx.bm25(["spark", "hash", "join", "vector"], 20).count()
        t_bm = time.time() - t0
        t0 = time.time()
        idx.phrase("hash join", 20).count()
        t_ph = time.time() - t0
        pf, pmb = _tree_stats(f"{tmp}/idx/postings")
        print(f"| {copies}x | {n} | {t_build:.2f} | {t_refresh:.2f} "
              f"| {t_bm:.2f} | {t_ph:.2f} | {pf} | {pmb:.1f} |")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("probe_r10")
    if which in ("decade", "all"):
        probe_decade(spark)
    if which in ("heal", "all"):
        probe_heal(spark)
    if which in ("filtered", "all"):
        probe_filtered(spark)
    if which in ("sdecade", "all"):
        probe_sdecade(spark)
    spark.stop()


if __name__ == "__main__":
    main()
