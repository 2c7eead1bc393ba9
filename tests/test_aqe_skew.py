"""AQE skew-join activation: the session's adaptive config must actually
split a pathologically skewed sort-merge join at runtime — this is the
safety net the engine relies on for moderate skew (explicit salting in
operators/joins.py covers the extreme tail). The final adaptive plan is
only available on the executed DataFrame's own QueryExecution, so the
join is collected, not counted."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
}


@pytest.fixture()
def skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_confs):
    # 90% of left rows share one key -> one shuffle partition dwarfs the rest
    left = spark.range(0, 300_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.lit("x").alias("tag")
    )
    j = left.join(right, "k")
    assert len(j.collect()) == 300_000  # correctness unaffected by the split
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("skew=true") >= 1  # the hot partition was split
