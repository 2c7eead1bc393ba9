"""Profiler and compaction-planner behavior: stat correctness, approx-NDV
sanity, FS listing, and bin-size bounds."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from openverse_catalog_spark.operators.profile import (
    compaction_plan,
    list_files,
    profile_table,
)


def test_profile_exact_stats(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "k long, s string"
    )
    got = {r["column"]: r for r in profile_table(df, ["k", "s"], exact=True).collect()}
    assert got["k"].n_rows == 4 and got["k"].n_nulls == 1 and got["k"].ndv == 2
    assert got["k"].min_s == "1" and got["k"].max_s == "2"
    assert got["s"].n_nulls == 1 and got["s"].ndv == 2
    assert got["s"].min_s == "a" and got["s"].max_s == "b"


def test_profile_approx_close_to_exact(spark):
    df = spark.range(0, 5000).select((F.col("id") % 700).alias("v"))
    row = {r["column"]: r for r in profile_table(df, ["v"]).collect()}["v"]
    assert abs(row.ndv - 700) / 700 < 0.1  # HLL default rsd ~5%


def test_list_and_compaction_plan(spark):
    events = spark.range(0, 2000).withColumn("p", F.col("id") % 2)
    with tempfile.TemporaryDirectory() as tmp:
        # many small files: 16 partitions per partition-dir
        events.repartition(16).write.partitionBy("p").parquet(tmp + "/t")
        files = list_files(spark, tmp + "/t")
        rows = files.collect()
        assert len(rows) >= 16
        assert all(not r.path.rsplit("/", 1)[-1].startswith("_") for r in rows)
        target = int(files.agg(F.sum("bytes")).head()[0] / 4)
        plan = compaction_plan(files, target_bytes=target)
        per_bin = (
            plan.groupBy("dir", "bin").agg(F.sum("bytes").alias("b")).collect()
        )
        # bins stay near target: below target + one straddling file
        mx = files.agg(F.max("bytes")).head()[0]
        assert all(r.b < target + mx for r in per_bin)
        # every small file appears exactly once in the plan
        assert plan.count() == files.filter(F.col("bytes") < target).count()
        assert plan.select("path").distinct().count() == plan.count()


def test_compaction_skips_right_sized_files(spark):
    files = spark.createDataFrame(
        [("d", "d/a", 100), ("d", "d/b", 900), ("d", "d/c", 50)],
        "dir string, path string, bytes long",
    )
    plan = compaction_plan(files, target_bytes=500)
    assert sorted(r.path for r in plan.collect()) == ["d/a", "d/c"]


def test_profile_drift_reports_deltas(spark):
    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, None)], "id long, v string"
    )
    b = spark.createDataFrame(
        [(4, None), (5, None), (6, "y"), (7, "y")], "id long, v string"
    )
    from openverse_catalog_spark.operators.profile import profile_drift

    rep = {r["column"]: r for r in profile_drift(a, b, ["v"], exact=True).collect()}
    r = rep["v"]
    assert (r["rows_a"], r["rows_b"]) == (3, 4)
    # null rate 1/3 -> 2/4: delta = +1/6
    assert abs(r["null_rate_delta"] - (0.5 - 1 / 3)) < 1e-6
    assert (r["ndv_a"], r["ndv_b"]) == (2, 1)
