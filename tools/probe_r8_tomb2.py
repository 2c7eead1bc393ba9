"""Round-8 fine-grained phase timing INSIDE apply_changes for the
stream_cdc_tombstones regression: replicates the r7 tombstone block
with per-phase timers, then times the r6-style create-with-data
alternative on the same inputs.

Usage: python tools/probe_r8_tomb2.py
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from openverse_catalog_spark.operators.cowtable import CowTable  # noqa: E402
from openverse_catalog_spark.session import get_spark  # noqa: E402
from openverse_catalog_spark.streaming.incremental import (  # noqa: E402
    _save_tombstone_retention,
    _tombstone_root,
    _tombstone_store,
)
from tools.probe_r8_tomb import batches  # noqa: E402

ROOT = "/tmp/spark_graft_probe_tomb2"


def timed_apply_b0(table, changes, style):
    """The r7 apply_changes batch-0 path with timers. style='r7' uses
    create-empty + fenced merge; style='r6' uses create-with-data."""
    keys = table.keys
    seq, op, delete_op = "seq", "op", "D"
    retention = 3600.0
    marks = {}

    def mark(name, t0):
        marks[name] = time.time() - t0

    t0 = time.time()
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq).desc(), F.col(op).eqNullSafe(delete_op).desc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    now = time.time()
    ts_root = _tombstone_root(table)
    ts = _tombstone_store(table, keys)
    assert ts is None
    latest = latest.localCheckpoint(eager=False)
    ts_src = latest.select(
        *keys,
        F.col(seq).alias("__ts_seq"),
        F.lit(now).alias("__ts_at"),
        F.when(F.col(op) == delete_op, F.lit("D"))
        .otherwise(F.lit("U")).alias("__op"),
    )
    mark("plan", t0)

    t0 = time.time()
    has_d = bool(ts_src.filter(F.col("__op") == "D").head(1))
    mark("head_probe", t0)
    assert has_d

    if style == "r7":
        t0 = time.time()
        ts = CowTable.create(
            table.spark, ts_root,
            ts_src.drop("__op").limit(0), keys=keys, target_files=2,
        )
        mark("store_create_empty", t0)
        t0 = time.time()
        _save_tombstone_retention(ts_root, retention)
        mark("retention_sidecar", t0)
        t0 = time.time()
        ts.merge_when(
            ts_src,
            delete_cond="s.__op <> 'D'",
            update_set="*",
            update_cond="s.__op = 'D' AND s.__ts_seq >= t.__ts_seq",
            insert_cond="s.__op = 'D'",
            check_duplicate_keys=False,
            txn_app="probe:tombstones",
            txn_version=0,
        )
        mark("store_merge", t0)
    else:
        t0 = time.time()
        first = ts_src.filter(F.col("__op") == "D").drop("__op")
        ts = CowTable.create(
            table.spark, ts_root, first, keys=keys, target_files=2
        )
        mark("store_create_with_data", t0)
        t0 = time.time()
        _save_tombstone_retention(ts_root, retention)
        mark("retention_sidecar", t0)

    t0 = time.time()
    is_del = f"s.{op} = '{delete_op}'"
    fresh = f"s.{seq} >= t.{seq}"
    table.merge_when(
        latest,
        delete_cond=f"{is_del} AND {fresh}",
        update_set="*",
        update_cond=f"NOT {is_del} AND {fresh}",
        insert_cond=f"NOT {is_del}",
        txn_app="probe",
        txn_version=0,
    )
    mark("main_merge", t0)
    return marks


def main() -> None:
    spark = get_spark("probe_r8_tomb2")
    for style in ("r7", "r6", "r7", "r6", "r7", "r6"):
        base, b0, _ = batches(spark)
        shutil.rmtree(ROOT, ignore_errors=True)
        t = CowTable.create(spark, ROOT, base, keys=("fid",), target_files=6)
        marks = timed_apply_b0(t, b0, style)
        total = sum(marks.values())
        parts = " ".join(f"{k}={v:.2f}" for k, v in marks.items())
        print(f"{style}: total={total:.2f} {parts}")
    spark.stop()


if __name__ == "__main__":
    main()
