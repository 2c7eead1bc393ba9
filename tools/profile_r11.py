"""Round-11 optimization profiler: run one registry query with
method-level timers on the CoW/commit/index machinery plus a Spark job
counter, so the 8-15 s "statement" costs of the index/MV maintenance
queries decompose into their actual phases (guide §1: measure first).

Usage: python tools/profile_r11.py <query_name> [sf_dir]
Prints per-method {calls, total_sec} sorted by cost, plus the number of
Spark jobs the query ran — at bench scale these statements are
job-count-bound (fixed per-job latency), so the job counter is the
headline number.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

PROF: dict[str, list] = {}
_DEPTH = [0]


def _wrap(cls, name: str) -> None:
    orig = getattr(cls, name)

    @functools.wraps(orig)
    def inner(*a, **k):
        label = f"{cls.__name__}.{name}"
        t0 = time.time()
        _DEPTH[0] += 1
        try:
            return orig(*a, **k)
        finally:
            _DEPTH[0] -= 1
            rec = PROF.setdefault(label, [0, 0.0, 0.0])
            rec[0] += 1
            dt = time.time() - t0
            rec[1] += dt  # inclusive
            if _DEPTH[0] == 0:
                rec[2] += dt  # top-level only

    setattr(cls, name, inner)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from openverse_catalog_spark.operators import cowtable as ct
    from openverse_catalog_spark.operators import incindex as ii
    from openverse_catalog_spark.operators import searchindex as si
    from openverse_catalog_spark.operators import vectorindex as vi
    from openverse_catalog_spark.operators import matview as mv

    for meth in (
        "_merge_when_attempt", "_merge_attempt", "_rewrite_attempt",
        "_dv_rewrite_attempt", "_files_matching", "_batch_boxes",
        "_write_clustered", "_collect_entries", "_commit",
        "read_changes", "_commit_changes", "read", "read_pruned",
        "create", "compact", "vacuum", "maintain",
        "analyze_incremental",
    ):
        if hasattr(ct.CowTable, meth):
            _wrap(ct.CowTable, meth)
    for meth in ("refresh",):
        _wrap(ii.IncrementalIndex, meth)
    for meth in ("_apply_feed", "_reconcile", "bm25", "phrase", "create"):
        if hasattr(si.SearchIndex, meth):
            _wrap(si.SearchIndex, meth)
    for meth in ("_apply_feed", "search", "probe", "create",
                 "_learn_centroids", "recluster"):
        if hasattr(vi.VectorIndex, meth):
            _wrap(vi.VectorIndex, meth)
    for meth in ("refresh", "create"):
        if hasattr(mv.MaterializedView, meth):
            _wrap(mv.MaterializedView, meth)

    import __spark_entry__ as entrymod
    from openverse_catalog_spark.session import get_spark
    from openverse_catalog_spark.plans import timing

    QUERIES = entrymod.queries()
    spark = get_spark("profile-r11")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _ident(batches):
        yield from batches

    spark.range(64, numPartitions=32).mapInPandas(_ident, "id long").count()

    tracker = spark.sparkContext.statusTracker()

    def jobs() -> int:
        ids = tracker.getJobIdsForGroup()
        return max(ids) + 1 if ids else 0

    # warm run (plan/codegen) is skipped: fixture queries tear down and
    # rebuild their fixture, so a warm run doubles everything; run once.
    timing.clear()
    j0, t0 = jobs(), time.time()
    QUERIES[name](spark, sf_dir).count()
    dt = time.time() - t0
    j1 = jobs()
    mark = timing.pop_mark()
    fixture = (mark - t0) if mark is not None else 0.0
    print(f"\n=== {name} @ {sf_dir}")
    print(f"total {dt:.2f}s  fixture {fixture:.2f}s  "
          f"statement {dt - fixture:.2f}s  spark_jobs {j1 - j0}")
    print(f"{'method':42s} {'calls':>5s} {'incl_s':>8s} {'top_s':>8s}")
    for label, (n, tot, top) in sorted(
        PROF.items(), key=lambda kv: -kv[1][2]
    ):
        print(f"{label:42s} {n:5d} {tot:8.2f} {top:8.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
