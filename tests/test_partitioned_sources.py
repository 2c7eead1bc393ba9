"""Partitioned-layout source behavior: partition pruning must reach the
file index (the difference between scanning one day and scanning 100 TB),
dynamic partition overwrite must replace only the written partitions, and
schema evolution must merge across file generations."""

from __future__ import annotations

import contextlib
import io
import tempfile

import pytest
from pyspark.sql import functions as F

from openverse_catalog_spark.session import load_tables


@pytest.fixture(scope="module")
def part_path(spark):
    events = load_tables(spark, "/root/testdata/sf0.001", ("events",))["events"]
    tmp = tempfile.mkdtemp(prefix="part_")
    (
        events.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(tmp)
    )
    return tmp


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_filter_prunes_at_file_index(spark, part_path):
    df = spark.read.parquet(part_path)
    days = sorted(r.day for r in df.select("day").distinct().collect())
    one = df.filter(F.col("day") == days[0])
    plan = _plan(one.select("event_id"))
    # the day predicate must land in PartitionFilters (file-index prune),
    # not in PushedFilters/post-scan Filter (row-level work)
    assert "PartitionFilters: [" in plan
    assert f"isnotnull(day" in plan or "day#" in plan.split("PartitionFilters")[1][:200]
    n_one = one.count()
    assert 0 < n_one < df.count()


def test_dynamic_partition_overwrite_touches_only_written_days(spark, part_path):
    df = spark.read.parquet(part_path)
    days = sorted(r.day for r in df.select("day").distinct().collect())
    assert len(days) >= 2
    target, keep = days[0], days[1]
    before_keep = df.filter(F.col("day") == keep).count()
    patch = (
        df.filter(F.col("day") == target)
        .limit(5)
        .withColumn("value", F.lit(-1.0))
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch.write.mode("overwrite").partitionBy("day").parquet(part_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    after = spark.read.parquet(part_path)
    assert after.filter(F.col("day") == target).count() == 5  # replaced
    assert after.filter(F.col("day") == keep).count() == before_keep  # untouched


def test_merge_schema_unions_file_generations(spark):
    with tempfile.TemporaryDirectory() as tmp:
        spark.range(3).select(F.col("id"), F.lit("a").alias("c1")).write.parquet(
            tmp + "/d", mode="overwrite"
        )
        spark.range(3, 6).select(
            F.col("id"), F.lit(7).alias("c2")
        ).write.parquet(tmp + "/d", mode="append")
        merged = spark.read.option("mergeSchema", "true").parquet(tmp + "/d")
        assert sorted(merged.columns) == ["c1", "c2", "id"]
        assert merged.count() == 6
        # old files surface the new column as NULL, and vice versa
        assert merged.filter(F.col("c2").isNull()).count() == 3
        assert merged.filter(F.col("c1").isNull()).count() == 3
