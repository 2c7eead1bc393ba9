"""Constraint-based data-quality report as a gate query. The reference
reports per-run load counts (loader/reporting.py); this is the
constraint-suite generalization (deequ-style): declarative rules compiled
to one scan + one broadcast anti-join, emitting a (check, violations,
passed) report the pipeline can gate on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

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


@register(
    "profile_documents",
    """
    WITH s AS (
      SELECT count(*) AS n_rows,
             count(*) FILTER (WHERE doc_id IS NULL) AS n0,
             count(DISTINCT doc_id) AS d0,
             CAST(min(doc_id) AS VARCHAR) AS mn0,
             CAST(max(doc_id) AS VARCHAR) AS mx0,
             count(*) FILTER (WHERE lang IS NULL) AS n1,
             count(DISTINCT lang) AS d1,
             min(lang) AS mn1, max(lang) AS mx1,
             count(*) FILTER (WHERE source IS NULL) AS n2,
             count(DISTINCT source) AS d2,
             min(source) AS mn2, max(source) AS mx2,
             count(*) FILTER (WHERE n_chars IS NULL) AS n3,
             count(DISTINCT n_chars) AS d3,
             CAST(min(n_chars) AS VARCHAR) AS mn3,
             CAST(max(n_chars) AS VARCHAR) AS mx3
      FROM documents
    )
    SELECT "column", n_rows, n_nulls, ndv, min_s, max_s FROM (
      SELECT 'doc_id' AS "column", n_rows, n0 AS n_nulls, d0 AS ndv,
             mn0 AS min_s, mx0 AS max_s FROM s
      UNION ALL SELECT 'lang', n_rows, n1, d1, mn1, mx1 FROM s
      UNION ALL SELECT 'source', n_rows, n2, d2, mn2, mx2 FROM s
      UNION ALL SELECT 'n_chars', n_rows, n3, d3, mn3, mx3 FROM s
    )
    """,
)
def profile_documents(spark, sf_dir):
    """ANALYZE-TABLE analog: per-column null counts, NDV, and min/max
    for four columns in ONE aggregation over one scan (exact-NDV mode
    here so the profiler is value-gated; the default approx mode swaps
    COUNT(DISTINCT)'s Expand replication for single-pass HLL — the
    shape you run on the real 100 TB table)."""
    from openverse_catalog_spark.operators.profile import profile_table

    d = _t(spark, sf_dir, "documents")["documents"]
    return profile_table(d, ["doc_id", "lang", "source", "n_chars"], exact=True)


@register(
    "profile_drift_orders",
    """
    WITH a AS (SELECT * FROM orders WHERE o_orderdate < DATE '1995-01-01'),
    b AS (SELECT * FROM orders WHERE o_orderdate >= DATE '1995-01-01'),
    sa AS (
      SELECT count(*) AS n_rows,
             count(*) FILTER (WHERE o_orderstatus IS NULL) AS n0,
             count(DISTINCT o_orderstatus) AS d0,
             count(*) FILTER (WHERE o_orderpriority IS NULL) AS n1,
             count(DISTINCT o_orderpriority) AS d1,
             count(*) FILTER (WHERE o_custkey IS NULL) AS n2,
             count(DISTINCT o_custkey) AS d2
      FROM a
    ),
    sb AS (
      SELECT count(*) AS n_rows,
             count(*) FILTER (WHERE o_orderstatus IS NULL) AS n0,
             count(DISTINCT o_orderstatus) AS d0,
             count(*) FILTER (WHERE o_orderpriority IS NULL) AS n1,
             count(DISTINCT o_orderpriority) AS d1,
             count(*) FILTER (WHERE o_custkey IS NULL) AS n2,
             count(DISTINCT o_custkey) AS d2
      FROM b
    ),
    pa AS (
      SELECT 'o_orderstatus' AS "column", n_rows AS rows_a,
             CAST(n0 AS DOUBLE) / n_rows AS nra, d0 AS ndv_a FROM sa
      UNION ALL SELECT 'o_orderpriority', n_rows,
             CAST(n1 AS DOUBLE) / n_rows, d1 FROM sa
      UNION ALL SELECT 'o_custkey', n_rows,
             CAST(n2 AS DOUBLE) / n_rows, d2 FROM sa
    ),
    pb AS (
      SELECT 'o_orderstatus' AS "column", n_rows AS rows_b,
             CAST(n0 AS DOUBLE) / n_rows AS nrb, d0 AS ndv_b FROM sb
      UNION ALL SELECT 'o_orderpriority', n_rows,
             CAST(n1 AS DOUBLE) / n_rows, d1 FROM sb
      UNION ALL SELECT 'o_custkey', n_rows,
             CAST(n2 AS DOUBLE) / n_rows, d2 FROM sb
    )
    SELECT pa."column", rows_a, rows_b,
           round(nrb - nra, 6) AS null_rate_delta, ndv_a, ndv_b
    FROM pa JOIN pb ON pa."column" = pb."column"
    """,
)
def profile_drift_orders(spark, sf_dir):
    """Drift report between two date slices of orders (pre/post 1995):
    per-column null-rate delta and NDV on each side from the one-agg
    profiler run per slice — two scans + a tiny stats join at any table
    width, the monitoring gate that catches schema rot and distribution
    shift (o_orderstatus collapses from 3 values to mostly 'O' in the
    newer slice) before a downstream model does."""
    from openverse_catalog_spark.operators.profile import profile_drift

    o = _t(spark, sf_dir, "orders")["orders"]
    cut = F.lit("1995-01-01").cast("date")
    return profile_drift(
        o.filter(F.col("o_orderdate") < cut),
        o.filter(F.col("o_orderdate") >= cut),
        ["o_orderstatus", "o_orderpriority", "o_custkey"],
        exact=True,
    )
