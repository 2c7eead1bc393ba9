"""Z-order layout: interleave correctness and the data-skipping payoff —
clustered files must have far tighter per-file min/max boxes than
insertion-order files, which is exactly what parquet footer pruning uses."""

from __future__ import annotations

import glob
import tempfile

import pytest
from pyspark.sql import functions as F

from openverse_catalog_spark.operators import layout as lo
from openverse_catalog_spark.session import load_tables


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    z = df.select(
        lo.zvalue([F.col("a"), F.col("b")], bits=3).alias("z")
    ).head().z
    # a bits at even positions (1,0,1 -> 1,16), b at odd (0,1,1 -> 2,8)
    assert z == 0b011011  # = 16+8+2+1 = 27


def test_minmax_bucket_clamps(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (299.9,), (400.0,)], "v double")
    got = [
        r.b
        for r in df.select(
            lo.minmax_bucket(F.col("v"), 0, 300, 8).alias("b")
        ).collect()
    ]
    assert got[0] == 0 and got[1] == 0 and got[2] == 254 and got[3] == 255


def _file_boxes(spark, path):
    """Per-parquet-file (user range * value range) bounding-box areas."""
    boxes = []
    for f in glob.glob(path + "/part-*.parquet"):
        agg = (
            spark.read.parquet(f)
            .agg(
                F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
            )
            .head()
        )
        u = (agg[1] - agg[0]) or 0
        v = (agg[3] - agg[2]) or 0.0
        boxes.append((u + 1) * (v + 1))
    return boxes


def test_zorder_write_tightens_file_boxes(spark):
    events = load_tables(spark, "/root/testdata/sf0.001", ("events",))["events"]
    z = lo.zvalue(
        [
            lo.minmax_bucket(F.col("user_id"), 0, 150, 8),
            lo.minmax_bucket(F.col("value"), 0, 600, 8),
        ],
        8,
    )
    with tempfile.TemporaryDirectory() as tmp:
        lo.write_zordered(events, tmp + "/z", z, n_files=8)
        events.repartition(8).write.mode("overwrite").parquet(tmp + "/plain")
        z_boxes = _file_boxes(spark, tmp + "/z")
        p_boxes = _file_boxes(spark, tmp + "/plain")
        assert len(z_boxes) >= 4
        # every round-robin file spans ~the whole (user, value) space;
        # clustered files tile it — total covered area shrinks a lot
        assert sum(z_boxes) < 0.35 * sum(p_boxes)


def test_zorder_roundtrip_preserves_rows(spark):
    events = load_tables(spark, "/root/testdata/sf0.001", ("events",))["events"]
    z = lo.zvalue([lo.minmax_bucket(F.col("user_id"), 0, 150, 8)], 8)
    with tempfile.TemporaryDirectory() as tmp:
        lo.write_zordered(events, tmp + "/z", z, n_files=4)
        back = spark.read.parquet(tmp + "/z")
        assert back.count() == events.count()
        assert sorted(back.columns) == sorted(events.columns)


def test_overwrite_partitions_touches_only_present_days(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from openverse_catalog_spark.operators.layout import overwrite_partitions

    df = spark.createDataFrame(
        [(1, "d1", 10.0), (2, "d1", 11.0), (3, "d2", 20.0), (4, "d3", 30.0)],
        "id long, day string, v double",
    )
    root = str(tmp_path / "tbl")
    df.write.partitionBy("day").parquet(root)
    d2_files = set(os.listdir(os.path.join(root, "day=d2")))

    fix = spark.createDataFrame([(1, "d1", 99.0)], "id long, day string, v double")
    overwrite_partitions(fix, root, ["day"])

    got = {(r["id"], r["v"]) for r in spark.read.parquet(root).collect()}
    # d1 replaced wholesale by the corrected frame; d2/d3 untouched
    assert got == {(1, 99.0), (3, 20.0), (4, 30.0)}
    assert set(os.listdir(os.path.join(root, "day=d2"))) == d2_files
    # the conf restores to its prior (static) value after the call
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") in (
        "static", "STATIC",
    )
