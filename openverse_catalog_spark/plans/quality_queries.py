"""Constraint-based data-quality report as a gate query. The reference
reports per-run load counts (loader/reporting.py); this is the
constraint-suite generalization (deequ-style): declarative rules compiled
to one scan + one broadcast anti-join, emitting a (check, violations,
passed) report the pipeline can gate on.
"""

from __future__ import annotations

from openverse_catalog_spark.operators import quality as q
from openverse_catalog_spark.plans.analytics import _t, register


@register(
    "quality_report_orders",
    """
    WITH s AS (
      SELECT
        count(*) FILTER (WHERE o_custkey IS NULL) AS nn,
        count(*) FILTER (
          WHERE NOT coalesce(o_totalprice BETWEEN 0 AND 400000, false)
        ) AS rng,
        count(*) FILTER (
          WHERE NOT coalesce(o_orderstatus IN ('O', 'F'), false)
        ) AS st,
        count(*) FILTER (
          WHERE NOT coalesce(regexp_matches(o_orderpriority, '^[1-5]-'), false)
        ) AS rx,
        count(o_orderkey) - count(DISTINCT o_orderkey) AS uq
      FROM orders
    ),
    fkv AS (
      SELECT count(*) AS v
      FROM orders o
      LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        ON o.o_custkey = c.c_custkey
      WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL
    )
    SELECT "check", violations, violations = 0 AS passed FROM (
      SELECT 'not_null(o_custkey)' AS "check", nn AS violations FROM s
      UNION ALL SELECT 'in_range(o_totalprice)', rng FROM s
      UNION ALL SELECT 'in_set(o_orderstatus)', st FROM s
      UNION ALL SELECT 'matches(o_orderpriority)', rx FROM s
      UNION ALL SELECT 'unique(o_orderkey)', uq FROM s
      UNION ALL SELECT 'fk(o_custkey)', v FROM fkv
    )
    """,
)
def quality_report_orders(spark, sf_dir):
    """Six-rule constraint suite over orders: the five scalar rules run
    in ONE scan (conditional sums fused in whole-stage codegen, partial
    agg shuffles one row), the FK rule adds a single broadcast anti-join
    against the customer keys. Rules are chosen to produce a mix of
    passing and failing checks so the gate semantics are exercised."""
    t = _t(spark, sf_dir, "orders", "customer")
    return q.quality_report(
        t["orders"],
        rules=[
            q.not_null("o_custkey"),
            q.in_range("o_totalprice", 0, 400_000),
            q.in_set("o_orderstatus", ["O", "F"]),
            q.matches("o_orderpriority", r"^[1-5]-"),
            q.unique("o_orderkey"),
        ],
        fk_rules=[q.fk("o_custkey", t["customer"], "c_custkey")],
    )
