"""Decorrelated-subquery query shapes.

The reference's SQL surface has no correlated subqueries (its per-group
thresholds are precomputed into config tables — e.g. the popularity
constants of ``catalog/dags/common/popularity/sql.py:249-283`` play the
role of a correlated aggregate), but any engine replacing it must run
the classic decorrelations users write today:

- correlated aggregate predicate (``x < 0.2 * (SELECT avg(..) WHERE
  same key)``) -> aggregate-once + equi-join-back, the textbook
  magic-set rewrite. The aggregate side is bounded by the *dimension*
  key space, never the fact row count, so it broadcasts.
- scalar subquery (``/ (SELECT sum(..) FROM ..)``) -> compute the
  grand total with an empty-frame window over the already-aggregated
  (dimension-sized) result: one scan of the fact table total, no second
  pass, no driver round-trip.

Both stay single-fact-scan at 100 TB; neither materializes a correlated
loop.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from openverse_catalog_spark.plans.analytics import _t, register


@register(
    "sub_below_avg_quantity",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_small_orders
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def sub_below_avg_quantity(spark, sf_dir):
    """TPC-H Q17 shape: small-lot lineitems below 20% of their part's
    average quantity.

    Decorrelation: the correlated ``avg per l_partkey`` becomes one
    grouped aggregate over the brand-pruned fact subset, joined back on
    the part key. Both the part filter and the threshold table are
    dimension-sized -> broadcast, so the fact side NEVER shuffles: the
    cost is two column-pruned scans of the brand-pruned subset (the
    threshold aggregate's shuffle carries only per-part partial avgs,
    bounded by the part key space). The alternative single-scan window
    formulation would instead shuffle+sort the whole pruned subset on
    l_partkey — strictly worse once the fact outweighs the dimension.

    NOTE the oracle's inner subquery averages over ALL lineitems of the
    part, which equals averaging over the brand-pruned subset because
    the part filter selects whole parts, never individual lineitems.
    """
    t = _t(spark, sf_dir, "lineitem", "part")
    li, part = t["lineitem"], t["part"]
    brand_parts = part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    sel = li.join(
        F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    thresholds = sel.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thr")
    )
    return (
        sel.join(F.broadcast(thresholds), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_small_orders"),
        )
    )


@register(
    "sub_scalar_revenue_share",
    """
    SELECT n_name,
           round(revenue, 2) AS revenue,
           round(revenue / sum(revenue) OVER (), 6) AS share
    FROM (
        SELECT n.n_name, sum(o.o_totalprice) AS revenue
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
    )
    """,
)
def sub_scalar_revenue_share(spark, sf_dir):
    """Scalar-subquery shape: each nation's share of global revenue.

    The naive form scans orders twice (once per nation, once for the
    grand total). Here the grand total is an empty-frame window over
    the ALREADY-AGGREGATED 25-row result, so the fact table is scanned
    once and the "scalar subquery" costs one single-partition pass over
    25 rows. Dimension joins (customer->nation) broadcast.
    """
    t = _t(spark, sf_dir, "orders", "customer", "nation")
    o, c, n = t["orders"], t["customer"], t["nation"]
    per_nation = (
        o.join(c.select("c_custkey", "c_nationkey"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    total_w = Window.partitionBy()
    return per_nation.select(
        "n_name",
        F.round(F.col("revenue"), 2).alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(total_w), 6).alias("share"),
    )
