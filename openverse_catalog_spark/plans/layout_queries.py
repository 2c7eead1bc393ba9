"""Physical-layout queries: Morton (z-order) clustering keys as an
oracle-gated computation. The write path itself is exercised in
tests/test_layout.py (file-level min/max tightness); here the clustering
key math — bucketize + bit-interleave — is verified value-exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openverse_catalog_spark.operators import layout as lo
from openverse_catalog_spark.plans.analytics import _t, register

_BITS = 8
_U_LO, _U_HI = 0.0, 1500.0
_V_LO, _V_HI = 0.0, 600.0

_U_SQL = lo.minmax_bucket_sql("user_id", _U_LO, _U_HI, _BITS)
_V_SQL = lo.minmax_bucket_sql("value", _V_LO, _V_HI, _BITS)
_Z_SQL = lo.zvalue_sql([_U_SQL, _V_SQL], _BITS)


@register(
    "layout_zorder_hist",
    f"""
    WITH z AS (SELECT {_Z_SQL} AS zv FROM events)
    SELECT zv >> 8 AS zprefix,
           count(*) AS n,
           min(zv) AS z_min,
           max(zv) AS z_max
    FROM z GROUP BY zprefix
    """,
)
def layout_zorder_hist(spark, sf_dir):
    """Morton clustering keys over events (user_id x value, 8 bits
    each): the distribution of the top-8-bit z prefix is what
    repartitionByRange splits on when writing clustered files. All
    integer shift/mask arithmetic — whole-stage codegen, no UDF — and
    bit-identical in the oracle."""
    e = _t(spark, sf_dir, "events")["events"]
    z = lo.zvalue(
        [
            lo.minmax_bucket(F.col("user_id"), _U_LO, _U_HI, _BITS),
            lo.minmax_bucket(F.col("value"), _V_LO, _V_HI, _BITS),
        ],
        _BITS,
    )
    return (
        e.select(z.alias("zv"))
        .groupBy(F.shiftright("zv", 8).alias("zprefix"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("zv").alias("z_min"),
            F.max("zv").alias("z_max"),
        )
    )
