"""Round-8 phase profile of the stream_cdc_tombstones regression.

The r8 warm A/B confirmed the r6->r7 flag is REAL (warm median 12.70 s
vs 9.25 r6 cold). r7's diff on this path (incremental.py:792-866)
changed three things; this probe times each apply_changes call and the
store-creation strategy head-to-head to pin WHERE the ~3.4 s went:

  A. r7 shipped: create the tombstone store EMPTY, then land the first
     deletes through a fenced merge_when (one extra merge per stream).
  B. r6 shipped: create the store WITH the first deletes (one clustered
     write, no merge) — replay safety by idempotence, no txn fence.

Usage: python tools/probe_r8_tomb.py
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from openverse_catalog_spark.operators.cowtable import CowTable  # noqa: E402
from openverse_catalog_spark.session import get_spark  # noqa: E402
from openverse_catalog_spark.streaming.incremental import (  # noqa: E402
    apply_changes,
)

SF_DIR = "/root/testdata/sf0.1"
ROOT = "/tmp/spark_graft_probe_tomb"


def batches(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    k = F.col("o_orderkey")
    fid = F.concat(F.lit("o"), F.lpad(k.cast("string"), 9, "0"))
    base = o.select(
        fid.alias("fid"),
        F.col("o_totalprice").cast("double").alias("total"),
        F.col("o_orderstatus").alias("status"),
        F.lit(0).cast("long").alias("seq"),
    )
    b0 = (
        o.filter(k % 5 == 0).select(
            fid.alias("fid"),
            F.lit(None).cast("double").alias("total"),
            F.lit(None).cast("string").alias("status"),
            F.lit(10).cast("long").alias("seq"),
            F.lit("D").alias("op"),
        )
        .unionByName(
            o.filter(k % 5 == 1).select(
                fid.alias("fid"),
                (F.col("o_totalprice") + 100).cast("double").alias("total"),
                F.lit("UPD").alias("status"),
                F.lit(2).cast("long").alias("seq"),
                F.lit("U").alias("op"),
            )
        )
    )
    b1 = (
        o.filter(k % 10 == 0).select(
            fid.alias("fid"),
            F.lit(-1.0).alias("total"),
            F.lit("STALE").alias("status"),
            F.lit(5).cast("long").alias("seq"),
            F.lit("U").alias("op"),
        )
        .unionByName(
            o.filter(k % 10 == 5).select(
                fid.alias("fid"),
                (F.col("o_totalprice") + 200).cast("double").alias("total"),
                F.lit("REVIVED").alias("status"),
                F.lit(20).cast("long").alias("seq"),
                F.lit("U").alias("op"),
            )
        )
    )
    return base, b0, b1


def run_once(spark, label):
    base, b0, b1 = batches(spark)
    shutil.rmtree(ROOT, ignore_errors=True)
    t0 = time.time()
    t = CowTable.create(spark, ROOT, base, keys=("fid",), target_files=6)
    t_create = time.time() - t0
    t0 = time.time()
    apply_changes(
        t, b0, sequence_by="seq", txn_app="probe", txn_version=0,
        tombstone_retention=3600.0,
    )
    t_b0 = time.time() - t0
    t0 = time.time()
    apply_changes(
        t, b1, sequence_by="seq", txn_app="probe", txn_version=1,
        tombstone_retention=3600.0,
    )
    t_b1 = time.time() - t0
    t0 = time.time()
    n = t.read().count()
    t_read = time.time() - t0
    print(
        f"{label}: base-create={t_create:.2f} batch0={t_b0:.2f} "
        f"batch1={t_b1:.2f} read={t_read:.2f} rows={n}"
    )
    return t_create, t_b0, t_b1


def main() -> None:
    spark = get_spark("probe_r8_tomb")
    run_once(spark, "warmup")
    for i in range(3):
        run_once(spark, f"run{i}")
    spark.stop()


if __name__ == "__main__":
    main()
