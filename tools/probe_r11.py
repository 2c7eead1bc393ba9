"""Round-11 scale probes (append results to SCALING.md):

1. ``learned`` — LEARNED-centroid heal vs sampled heal: the round-10
   heal probe fixture (10x corpus + a 20k-vector hot cluster aimed at
   one frozen centroid), healed twice on the same corpus — once with
   the sampled recluster(), once with recluster(learned=2). Sampled
   centroids only ever sit ON corpus points, so the hot region keeps as
   many centroids as it had sample hits; the Lloyd rounds move them
   toward the region's mass. The learned row must land at-or-below the
   sampled row's skew and hot-probe cost.
2. ``selswitch`` — the filtered-ANN selectivity switch: before r11,
   search(where=) ALWAYS materialized the full match-id set
   (localCheckpoint), so a NON-selective predicate (~2/3 of the corpus
   here) paid a corpus-sized id materialization before the probe even
   ran. The switch routes match fractions above PREFILTER_SELECTIVITY
   to POST-FILTER (lazy inner join of the small candidate lists against
   the column-pruned predicate scan). Rows: unfiltered search, the
   ~2/3 filter through the switch (post-filter arm), and the same
   filter FORCED down the old pre-filter arm — at 1x and 10x. The
   switched cost must track the unfiltered cost, not the forced
   pre-filter's.
3. ``bitext`` — batch bitext mining vs target-corpus growth: fixed src
   corpus and a fixed 50-query batch, tgt at 1x and 10x. The backward
   GEMM is bounded to the forward rank-1 winner ids (<= |batch|), so
   batch mining must stay near-flat as tgt grows — before r11 the
   backward pass ran ALL of tgt as queries (O(|tgt| x |src|)) and the
   10x row would also trip the max_queries driver bound we pass here.
4. ``e2e`` — the INTEGRATION decade probe the unit probes never ran:
   the ``pipeline_end_to_end`` chain (landing -> clean -> catalog-txn
   upsert -> MAINTAIN-tick index refresh at the publish pin ->
   popularity -> BM25-from-index join) at 1x/10x/100x corpus with a
   FIXED ~2k-row churn batch. Per-stage split: the churn-priced stages
   (txn upsert + maintenance tick, retrieval+join) must stay flat
   across both decades; the full popularity recompute is the one
   corpus-priced single pruned scan (the reference recomputes the
   whole matview too, popularity/sql.py:286-298) — and the engine's
   O(churn) alternative, popularity_refresh_cdf over the same span, is
   timed alongside and must stay flat.

Usage: python tools/probe_r11.py [learned|selswitch|bitext|e2e|all]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from openverse_catalog_spark.session import get_spark, load_tables  # noqa: E402
from tools.scale_probe import SF_DIR, replicate  # noqa: E402


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    a = time.time() - t0
    t0 = time.time()
    fn()
    return min(a, time.time() - t0)  # warm best-of-2


def probe_learned(spark) -> None:
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.vectorindex import VectorIndex

    tmp = tempfile.mkdtemp(prefix="vlearn_")
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
    qrows = [
        (70_000_000 + j,
         [float(x) for x in hot + rng.normal(scale=0.05, size=64)])
        for j in range(100)
    ]
    queries = spark.createDataFrame(
        qrows, "vec_id long, embedding array<double>"
    )

    def hot_probe() -> float:
        return _timed(
            lambda: idx.probe(
                queries, k=3, nprobe=2, exclude_self=False
            ).count()
        )

    rows = []
    s = idx.list_stats()
    rows.append(("before heal", None, s, hot_probe()))
    t0 = time.time()
    idx.recluster()
    rows.append(
        ("sampled recluster", time.time() - t0, idx.list_stats(),
         hot_probe())
    )
    # learned heal of the SAME corpus: recluster re-samples its seeds
    # from the current corpus each time, so healing again from the
    # sampled epoch is the identical learned-heal experiment
    t0 = time.time()
    r = idx.recluster(learned=2)
    assert r["learned_rounds"] == 2
    rows.append(
        ("learned recluster (2 Lloyd rounds)", time.time() - t0,
         idx.list_stats(), hot_probe())
    )
    print("| stage | heal (s) | skew (max/median) | max list "
          "| hot-probe 100q (s) |")
    print("|---|---|---|---|---|")
    for name, theal, s, tprobe in rows:
        hs = f"{theal:.1f}" if theal is not None else "—"
        print(f"| {name} | {hs} | {s['skew']:.1f} | {s['max_list']} "
              f"| {tprobe:.2f} |")


def probe_selswitch(spark) -> None:
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.vectorindex import VectorIndex

    q = [float((i * 37 % 19) - 9) for i in range(64)]
    print("| corpus | match frac | unfiltered (s) | switched arm (s) "
          "| forced pre-filter (s) |")
    print("|---|---|---|---|---|")
    # driver-side plan construction (~0.5 s of py4j) swamps the job
    # cost below ~10x, so the decade pair is 10x/100x — where the
    # pre-r11 arm's corpus-sized match materialization actually bites
    for copies in (10, 100):
        tmp = tempfile.mkdtemp(prefix=f"vsw{copies}x_")
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
            centroid_mod=141 if copies == 10 else 445, target_files=16,
        )
        where = "lang = 'de'"  # ~2/3 of the corpus matches
        t_plain = _timed(lambda: idx.search(q, k=10, nprobe=2).count())
        t_switch = _timed(
            lambda: idx.search(q, k=10, nprobe=2, where=where).count()
        )

        def pre_r11_arm():
            # the pre-r11 physical plan: count the match set, eagerly
            # materialize it (localCheckpoint), candidate-count the
            # semi-joined level, then rank — three jobs plus a
            # corpus-sized id materialization, vs the adaptive arm's
            # single rank-and-collect job
            import numpy as np

            from openverse_catalog_spark.operators.knn import cosine_expr

            c_ids, c_mat = idx._centroid_matrix()
            qv = np.asarray(q) / np.sqrt((np.asarray(q) ** 2).sum())
            order = np.argsort(-(c_mat @ qv), kind="stable")[:2]
            m = idx._match_set(where).localCheckpoint(eager=True)
            need = min(10, m.count())
            cand = idx.lists.read_pruned(
                sorted(int(c_ids[i]) for i in order)
            ).join(m, "neighbor_id", "semi")
            assert cand.count() >= need
            qarr = F.array(*[F.lit(float(x)) for x in q])
            cand.select(
                "neighbor_id",
                cosine_expr(qarr, F.col("vector")).alias("cosine"),
            ).orderBy(
                F.round(F.col("cosine"), 9).desc(), "neighbor_id"
            ).limit(10).collect()

        t_forced = _timed(pre_r11_arm)
        frac = base.read().filter(where).count() / base.read().count()
        print(f"| {copies}x | {frac:.2f} | {t_plain:.2f} "
              f"| {t_switch:.2f} | {t_forced:.2f} |")


def probe_bitext(spark) -> None:
    from openverse_catalog_spark.operators.knn import mine_bitext_margin

    print("| tgt corpus | tgt rows | batch 50q mine (s) | pairs |")
    print("|---|---|---|---|")
    for copies in (1, 10):
        tmp = tempfile.mkdtemp(prefix=f"btx{copies}x_")
        replicate(spark, SF_DIR, tmp, {"embeddings": ["vec_id"]},
                  copies=copies)
        e = load_tables(spark, tmp, ("embeddings",))["embeddings"].select(
            "vec_id", "embedding"
        )
        # src = a fixed 2k-row language side; tgt = the whole corpus
        # offset into a disjoint id space
        src = e.filter(F.col("vec_id") % 29 == 0).select(
            (F.col("vec_id") * 2).alias("vec_id"), "embedding"
        ).limit(2000)
        tgt = e.select(
            (F.col("vec_id") * 2 + 1).alias("vec_id"), "embedding"
        )
        n_tgt = tgt.count()
        batch = src.limit(50)
        # max_queries=4096 << n_tgt at 10x: only the winner bound on
        # the backward pass lets this run at all
        counts = []
        t = _timed(
            lambda: counts.append(mine_bitext_margin(
                src, tgt, k=4, threshold=0.0,
                queries=batch, max_queries=4096,
            ).count())
        )
        n_pairs = counts[-1]  # from the timed runs; no third mining job
        print(f"| {copies}x | {n_tgt} | {t:.2f} | {n_pairs} |")


def probe_e2e(spark) -> None:
    from openverse_catalog_spark.functions.licenses import normalize_license
    from openverse_catalog_spark.operators.catalog import LakeCatalog
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.popularity import (
        percentile_disc_by_group,
        popularity_constants,
        popularity_refresh_cdf,
        standardized_popularity,
    )
    from openverse_catalog_spark.operators.searchindex import SearchIndex
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec, Datatype, UpsertStrategy, clean_string_expr,
    )

    print("| corpus | rows | fixture publish+index (s) "
          "| churn txn upsert (s) | maintain tick (s) "
          "| popularity full scan (s) | popularity CDF O(churn) (s) "
          "| bm25+join (s) |")
    print("|---|---|---|---|---|---|---|---|")
    for copies in (1, 10, 100):
        tmp = tempfile.mkdtemp(prefix=f"e2e{copies}x_")
        replicate(spark, SF_DIR, tmp, {"orders": ["o_orderkey"]},
                  copies=copies)
        o = load_tables(spark, tmp, ("orders",))["orders"]
        k = F.col("o_orderkey")
        kind = (
            F.when(k % 5 == 0, "sunset landscape")
            .when(k % 5 == 1, "portrait study")
            .when(k % 5 == 2, "landscape panorama")
            .when(k % 5 == 3, "macro detail")
            .otherwise("street scene")
        )
        common = [
            k.alias("media_id"),
            F.when(k % 3 == 0, "flickr").when(k % 3 == 1, "museum")
            .otherwise("archive").alias("provider"),
            F.concat(F.lit("f"), k.cast("string")).alias("fid"),
            F.concat(F.lit("http://m/"), k.cast("string")).alias("url"),
            F.when(k % 7 < 3, "by").otherwise("cc0").alias("license"),
            F.lit("4.0").alias("license_version"),
        ]

        def mk_raw(src, bump: float):
            raw = src.select(
                *common,
                F.concat(F.lit('Item "'), k.cast("string"),
                         F.lit('" '), kind).alias("title_raw"),
                (F.col("o_totalprice").cast("double") + bump)
                .alias("metric"),
            )
            out = normalize_license(raw, spark)
            return out.select(
                "media_id", "provider", "fid", "url",
                "license", "license_version", "license_url",
                clean_string_expr(F.col("title_raw"), None, False)
                .alias("title"),
                "metric",
            )

        c1 = mk_raw(o, 0.0)
        churn_keys = o.orderBy("o_orderkey").limit(2000)
        t0 = time.time()
        cat = LakeCatalog.create(spark, f"{tmp}/lake")
        # file COUNT scales with the corpus so file SIZE stays fixed —
        # what any real table does; a frozen 16-file layout at 100x
        # makes every file hold ~1M rows, so a 2k-row churn rewrites
        # million-row files and the CDF feed carries those files' full
        # pre/post images (churn-cost amplification that is a LAYOUT
        # defect, not an engine one — exactly what OPTIMIZE fixes)
        media = CowTable.create(
            spark, f"{tmp}/media", c1, keys=("media_id",),
            target_files=16 * copies,
        )
        cat.register("media", media)
        pin1 = cat._entry("media")["version"]
        idx = SearchIndex.create(
            spark, f"{tmp}/idx", media,
            id_col="media_id", text_col="title", version=pin1,
            target_files=8 * copies,
        )
        cat.register_index(
            "idx", "search", idx.root, "media",
            {"id": "media_id", "text": "title"},
        )
        n = media.read().count()
        # the fixed-size churn batch is MATERIALIZED in the fixture:
        # deriving it (a corpus-wide TakeOrdered here) is landing-side
        # work, not part of the churn-priced statement being probed
        mk_raw(churn_keys, 50.0).write.mode("overwrite").parquet(
            f"{tmp}/churn"
        )
        c2 = spark.read.parquet(f"{tmp}/churn")
        t_fix = time.time() - t0

        cols = [
            ColumnSpec("media_id", Datatype.int, required=True,
                       upsert_strategy=UpsertStrategy.no_change),
            ColumnSpec("provider", Datatype.char,
                       upsert_strategy=UpsertStrategy.no_change),
            ColumnSpec("fid", Datatype.char,
                       upsert_strategy=UpsertStrategy.no_change),
            ColumnSpec("url", Datatype.char),
            ColumnSpec("license", Datatype.char),
            ColumnSpec("license_version", Datatype.char),
            ColumnSpec("license_url", Datatype.char),
            ColumnSpec("title", Datatype.char),
            ColumnSpec("metric", Datatype.double),
        ]
        t0 = time.time()
        with cat.transaction() as txn:
            txn.table("media").merge(c2, cols)
        t_merge = time.time() - t0
        pin2 = cat._entry("media")["version"]
        t0 = time.time()
        tick = cat.maintain_tables(
            target_rows=1, retention_seconds=3600.0
        )
        t_tick = time.time() - t0
        assert tick["index:idx"]["applied"] == pin2, tick["index:idx"]

        snap = media.read(pin2)
        t0 = time.time()
        p = percentile_disc_by_group(snap, ["provider"], "metric", 0.85)
        pc = popularity_constants(p, 0.85)
        scored = standardized_popularity(
            snap, pc, ["provider"], "metric"
        )
        # the refresh WRITES the matview (popularity is a scheduled
        # materialization in the reference too) — downstream consumers
        # read the parquet, they never recompute the window
        scored.write.mode("overwrite").parquet(f"{tmp}/scored_pin2")
        scored = spark.read.parquet(f"{tmp}/scored_pin2")
        t_pop = time.time() - t0
        # the O(churn) alternative: CDF-driven refresh over the same
        # churn span against a scored table seeded from the fixture
        spath = f"{tmp}/scored"
        standardized_popularity(
            media.read(pin1), pc, ["provider"], "metric"
        ).write.mode("overwrite").parquet(spath)
        t0 = time.time()
        popularity_refresh_cdf(
            spark, spath, media, pin1, pin2,
            group_col="provider", id_col="media_id",
            metric_col="metric",
        )
        t_cdf = time.time() - t0
        t0 = time.time()
        hits = idx.bm25(
            ["landscape", "portrait", "macro"], 20
        ).withColumnRenamed("doc_id", "media_id")
        hits.join(scored, "media_id").select(
            "media_id", "title", "provider",
        ).count()
        t_bm = time.time() - t0
        print(f"| {copies}x | {n} | {t_fix:.1f} | {t_merge:.2f} "
              f"| {t_tick:.2f} | {t_pop:.2f} | {t_cdf:.2f} "
              f"| {t_bm:.2f} |")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark()
    t0 = time.time()
    if which in ("learned", "all"):
        print("\n## r11 probe: learned vs sampled heal (10x + hot)")
        probe_learned(spark)
    if which in ("selswitch", "all"):
        print("\n## r11 probe: filtered-ANN selectivity switch")
        probe_selswitch(spark)
    if which in ("bitext", "all"):
        print("\n## r11 probe: batch bitext vs tgt growth")
        probe_bitext(spark)
    if which in ("e2e", "all"):
        print("\n## r11 probe: pipeline_end_to_end decade (fixed churn)")
        probe_e2e(spark)
    print(f"\nprobe wall: {time.time() - t0:.1f} s")


if __name__ == "__main__":
    main()
