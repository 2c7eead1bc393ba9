"""Materialized-view queries: incremental GROUP BY maintenance over the
CoW change feed.

The reference's derived aggregate tables are rebuilt wholesale on every
refresh (``REFRESH MATERIALIZED VIEW`` over the full media table,
``common/popularity/sql.py:286-298``). These queries pin the O(delta)
replacement (operators/matview.py): build once, then advance through
base-table churn — a MERGE of updates + inserts followed by a
deletion-vector DELETE — via two incremental refreshes. The oracle
replays the churn as plain SQL and aggregates the FINAL state, so a
pass proves the incremental path lands on exactly the full-recompute
answer, dirty-group min/max recomputes included.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from openverse_catalog_spark.plans.analytics import _t, register
from openverse_catalog_spark.schemas.columns import (
    ColumnSpec,
    Datatype,
    UpsertStrategy,
)

_MV_BASE_SQL = """
  SELECT o_orderkey AS k, o_custkey AS ck,
         o_totalprice AS price, o_orderstatus AS status
  FROM orders WHERE o_orderkey % 4 <> 3
"""

_MV_FINAL_CTES = f"""
    base AS ({_MV_BASE_SQL}),
    upd AS (
      SELECT k, ck, price + 5.0 AS price, status
      FROM base WHERE k % 10 = 0
    ),
    ins AS (
      SELECT o_orderkey AS k, o_custkey AS ck,
             o_totalprice AS price, o_orderstatus AS status
      FROM orders WHERE o_orderkey % 4 = 3 AND o_orderkey % 10 = 7
    ),
    merged AS (
      SELECT b.k, b.ck, COALESCE(u.price, b.price) AS price, b.status
      FROM base b LEFT JOIN upd u ON b.k = u.k
      UNION ALL
      SELECT * FROM ins
    ),
    final AS (SELECT * FROM merged WHERE ck % 7 <> 0)
"""


def _mv_base_df(o):
    return o.filter(F.col("o_orderkey") % 4 != 3).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("ck"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )


_MV_COLS = [
    ColumnSpec("k", Datatype.int, required=True,
               upsert_strategy=UpsertStrategy.no_change),
    ColumnSpec("ck", Datatype.int),
    ColumnSpec("price", Datatype.double),
    ColumnSpec("status", Datatype.char),
]


def _mv_build_and_churn(spark, sf_dir, name, refresh=None):
    """Shared fixture: base CoW table + MV, churned by one merge and one
    DV delete with an incremental refresh after each commit. ``refresh``
    overrides how each refresh is driven (default: direct
    ``mv.refresh()``; the streaming query passes a commit-log-stream
    tick)."""
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.matview import (
        AggSpec,
        MaterializedView,
    )

    if refresh is None:
        def refresh(mv):
            mv.refresh()

    o = _t(spark, sf_dir, "orders")["orders"]
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_{name}")
    shutil.rmtree(root, ignore_errors=True)
    base_df = _mv_base_df(o)
    base = CowTable.create(
        spark, f"{root}/base", base_df, keys=("k",), target_files=6
    )
    mv = MaterializedView(
        spark, base, f"{root}/mv", ["ck"],
        [
            AggSpec("n_orders", "count"),
            AggSpec("sum_price", "sum", "price"),
            AggSpec("avg_price", "avg", "price"),
            AggSpec("min_price", "min", "price"),
            AggSpec("max_price", "max", "price"),
        ],
    )
    mv.build()
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    updates = base_df.filter(F.col("k") % 10 == 0).withColumn(
        "price", F.col("price") + F.lit(5.0)
    )
    inserts = o.filter(
        (F.col("o_orderkey") % 4 == 3) & (F.col("o_orderkey") % 10 == 7)
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("ck"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    base.merge(updates.unionByName(inserts), _MV_COLS, deterministic=True)
    refresh(mv)
    # a deletion-vector delete: the feed must surface DV-marked rows as
    # logical deletes for the MV to subtract
    base.delete(F.col("ck") % 7 == 0, mode="dv")
    refresh(mv)
    return mv


@register(
    "mv_incremental_orders",
    f"""
    WITH {_MV_FINAL_CTES}
    SELECT ck AS custkey,
           count(*) AS n_orders,
           round(sum(price), 2) AS sum_price,
           round(sum(price), 2) / count(*) AS avg_price,
           min(price) AS min_price,
           max(price) AS max_price
    FROM final GROUP BY ck
    """,
)
def mv_incremental_orders(spark, sf_dir):
    """Incrementally-maintained per-customer order aggregates: the MV
    advances through a MERGE (price updates trigger min/max dirty-group
    recomputes — each update's pre-image removes a value that may tie
    the stored bound) and a deletion-vector DELETE (whole groups
    tombstone out). The oracle aggregates the replayed final state, so
    equality proves delta-apply + dirty recompute + tombstoning land on
    the exact full-recompute answer. SCALE: each refresh reads only the
    feed span and the touched MV groups (broadcast semi-join) — O(churn)
    while the reference re-aggregates O(table)."""
    mv = _mv_build_and_churn(spark, sf_dir, "mv_orders")
    # avg is derived from the round-stable sum with NO second rounding:
    # incremental float sums drift ~1e-9 relative (a bare round(avg, 4)
    # flips at .xxxx5 edges, and engines break round ties differently),
    # but division of bit-identical doubles is IEEE-deterministic
    return mv.read().select(
        F.col("ck").alias("custkey"),
        F.col("n_orders"),
        F.round(F.col("sum_price"), 2).alias("sum_price"),
        (F.round(F.col("sum_price"), 2) / F.col("n_orders")).alias(
            "avg_price"
        ),
        F.col("min_price"),
        F.col("max_price"),
    )


@register(
    "sql_mv_refresh",
    f"""
    WITH {_MV_FINAL_CTES}
    SELECT ck AS custkey,
           count(*) AS n_orders,
           round(sum(price), 2) AS sum_price,
           round(sum(price), 2) / count(*) AS avg_price,
           min(price) AS min_price,
           max(price) AS max_price
    FROM final GROUP BY ck
    """,
)
def sql_mv_refresh(spark, sf_dir):
    """The reference's literal refresh surface as text — ``CREATE
    MATERIALIZED VIEW`` + ``REFRESH MATERIALIZED VIEW``
    (``popularity/sql.py:286-298``) — with the ENTIRE lifecycle driven
    through the facade: the churn lands via ANSI ``MERGE INTO`` and
    ``DELETE FROM`` text, and each REFRESH advances the view from the
    base table's change feed in O(churn) instead of the reference's
    full re-aggregation. Oracle = full recompute of the replayed final
    state."""
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.sql_facade import SqlFacade

    o = _t(spark, sf_dir, "orders")["orders"]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_sql_mv")
    shutil.rmtree(root, ignore_errors=True)
    base_df = _mv_base_df(o)
    base = CowTable.create(
        spark, f"{root}/base", base_df, keys=("k",), target_files=6
    )
    f = SqlFacade(spark)
    f.register_table("orders_lake", base, columns=_MV_COLS)
    f.sql(
        "CREATE MATERIALIZED VIEW cust_stats AS "
        "SELECT ck, count(*) AS n_orders, sum(price) AS sum_price, "
        "avg(price) AS avg_price, min(price) AS min_price, "
        "max(price) AS max_price "
        "FROM orders_lake GROUP BY ck"
    )
    updates = base_df.filter(F.col("k") % 10 == 0).withColumn(
        "price", F.col("price") + F.lit(5.0)
    )
    inserts = o.filter(
        (F.col("o_orderkey") % 4 == 3) & (F.col("o_orderkey") % 10 == 7)
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("ck"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    f.register_df("staging", updates.unionByName(inserts))
    f.sql(
        "MERGE INTO orders_lake AS t USING staging AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    f.sql("REFRESH MATERIALIZED VIEW cust_stats")
    f.sql("DELETE FROM orders_lake WHERE ck % 7 = 0")
    f.sql("REFRESH MATERIALIZED VIEW cust_stats")
    return f.sql(
        "SELECT ck AS custkey, n_orders, "
        "round(sum_price, 2) AS sum_price, "
        "round(sum_price, 2) / n_orders AS avg_price, "
        "min_price, max_price "
        "FROM cust_stats"
    )


@register(
    "stream_mv_maintenance",
    f"""
    WITH {_MV_FINAL_CTES}
    SELECT ck AS custkey,
           count(*) AS n_orders,
           round(sum(price), 2) AS sum_price,
           round(sum(price), 2) / count(*) AS avg_price,
           min(price) AS min_price,
           max(price) AS max_price
    FROM final GROUP BY ck
    """,
)
def stream_mv_maintenance_orders(spark, sf_dir):
    """The same MV lifecycle as ``mv_incremental_orders`` but with every
    refresh driven by the COMMIT-LOG STREAM
    (streaming/incremental.py:stream_mv_maintenance): the base table's
    manifests directory is a file-source stream, and each
    AvailableNow tick triggers an incremental refresh — the
    scheduler-less replacement for the reference's cron'd ``REFRESH
    MATERIALIZED VIEW`` DAGs (``popularity/sql.py:286-298``). The
    oracle aggregates the replayed final base state, so a pass proves
    stream-triggered maintenance lands on the exact full-recompute
    answer through merge-update AND deletion-vector churn. SCALE: each
    tick costs one file-source listing of new manifests + an O(churn)
    refresh; idle ticks are a metadata version check."""
    import os as _os

    from openverse_catalog_spark.streaming.incremental import (
        stream_mv_maintenance,
    )

    ckpt = {}

    def refresh(mv):
        if "dir" not in ckpt:
            ckpt["dir"] = _os.path.join(mv.root, "_maint_ckpt")
        stream_mv_maintenance(mv, ckpt["dir"])

    mv = _mv_build_and_churn(spark, sf_dir, "mv_stream_maint", refresh)
    return mv.read().select(
        F.col("ck").alias("custkey"),
        F.col("n_orders"),
        F.round(F.col("sum_price"), 2).alias("sum_price"),
        (F.round(F.col("sum_price"), 2) / F.col("n_orders")).alias(
            "avg_price"
        ),
        F.col("min_price"),
        F.col("max_price"),
    )


@register(
    "mv_join_incremental",
    """
    WITH lbase AS (
      SELECT o_orderkey AS k, o_custkey AS ck,
             CAST(o_totalprice AS DOUBLE) AS price
      FROM orders WHERE o_orderkey % 3 <> 2
    ),
    lupd AS (
      SELECT k, ck, price + 7.0 AS price FROM lbase WHERE k % 10 = 1
    ),
    lins AS (
      SELECT o_orderkey AS k, o_custkey AS ck,
             CAST(o_totalprice AS DOUBLE) AS price
      FROM orders WHERE o_orderkey % 3 = 2 AND o_orderkey % 10 = 5
    ),
    lmerged AS (
      SELECT b.k, b.ck, COALESCE(u.price, b.price) AS price
      FROM lbase b LEFT JOIN lupd u ON b.k = u.k
      UNION ALL SELECT * FROM lins
    ),
    lfinal AS (SELECT * FROM lmerged WHERE k % 20 <> 6),
    rfinal AS (
      SELECT c_custkey AS ck,
             CASE WHEN c_custkey % 11 = 0
                  THEN 'X_' || CAST(c_nationkey AS VARCHAR)
                  ELSE c_mktsegment END AS seg
      FROM customer WHERE c_custkey % 13 <> 0
    )
    SELECT l.k, l.ck, round(l.price, 2) AS price, r.seg
    FROM lfinal l JOIN rfinal r ON l.ck = r.ck
    """,
)
def mv_join_incremental(spark, sf_dir):
    """Materialized JOIN maintained incrementally from BOTH bases'
    change feeds (operators/matview.py:JoinMaterializedView): build the
    orders-x-customer enrichment once, churn the fact side (price
    update + insert + delete) AND the dimension side (segment rewrite
    with fanout to every referencing fact row, plus a dimension DELETE
    that kills its fact rows out of the inner join), then ONE refresh
    reconciles the MV by dirty-key partial recompute — the dimension
    feed's join values prune fact FILES through read_join_pruned. The
    reference re-joins the full table per refresh
    (``popularity/sql.py:286-326``); this is the O(churn x fanout)
    replacement. Oracle replays all churn and re-joins from scratch."""
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.matview import (
        JoinMaterializedView,
    )

    o = _t(spark, sf_dir, "orders")["orders"]
    c = _t(spark, sf_dir, "customer")["customer"]
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    lsel = [
        ok.alias("k"), ck.alias("ck"),
        F.col("o_totalprice").cast("double").alias("price"),
    ]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_mv_join")
    shutil.rmtree(root, ignore_errors=True)
    left = CowTable.create(
        spark, os.path.join(root, "l"),
        o.filter(ok % 3 != 2).select(*lsel),
        keys=("k",), target_files=6, stats_cols=("ck",),
    )
    right = CowTable.create(
        spark, os.path.join(root, "r"),
        c.select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
            F.col("c_nationkey").alias("nat"),
        ),
        keys=("ck",), target_files=4,
    )
    mv = JoinMaterializedView(
        spark, left, right, os.path.join(root, "mv"), on=["ck"],
        how="inner",
    )
    mv.build()
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    cols = [
        ColumnSpec("k", Datatype.int,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("ck", Datatype.int),
        ColumnSpec("price", Datatype.double),
    ]
    left.merge(
        o.filter((ok % 3 != 2) & (ok % 10 == 1)).select(
            ok.alias("k"), ck.alias("ck"),
            (F.col("o_totalprice") + 7).cast("double").alias("price"),
        ).unionByName(
            o.filter((ok % 3 == 2) & (ok % 10 == 5)).select(*lsel)
        ),
        cols, deterministic=True,
    )
    left.delete(F.col("k") % 20 == 6)
    right.update(
        F.col("ck") % 11 == 0,
        {"seg": F.concat(F.lit("X_"), F.col("nat").cast("string"))},
    )
    right.delete(F.col("ck") % 13 == 0)
    res = mv.refresh()
    assert res["refreshed"]
    return mv.read().select(
        "k", "ck", F.round("price", 2).alias("price"), "seg"
    )


@register(
    "mv_join_agg_incremental",
    """
    WITH lbase AS (
      SELECT o_orderkey AS k, o_custkey AS ck,
             CAST(o_totalprice AS DOUBLE) AS price
      FROM orders WHERE o_orderkey % 3 <> 2
    ),
    lupd AS (
      SELECT k, ck, price + 7.0 AS price FROM lbase WHERE k % 10 = 1
    ),
    lins AS (
      SELECT o_orderkey AS k, o_custkey AS ck,
             CAST(o_totalprice AS DOUBLE) AS price
      FROM orders WHERE o_orderkey % 3 = 2 AND o_orderkey % 10 = 5
    ),
    lmerged AS (
      SELECT b.k, b.ck, COALESCE(u.price, b.price) AS price
      FROM lbase b LEFT JOIN lupd u ON b.k = u.k
      UNION ALL SELECT * FROM lins
    ),
    lfinal AS (SELECT * FROM lmerged WHERE k % 20 <> 6),
    rfinal AS (
      SELECT c_custkey AS ck,
             CASE WHEN c_custkey % 11 = 0
                  THEN 'X_' || CAST(c_nationkey AS VARCHAR)
                  ELSE c_mktsegment END AS seg
      FROM customer WHERE c_custkey % 13 <> 0
    )
    SELECT r.seg,
           count(*) AS n_orders,
           round(sum(l.price), 2) AS sum_price,
           round(sum(l.price), 2) / count(*) AS avg_price,
           min(l.price) AS min_price,
           max(l.price) AS max_price
    FROM lfinal l JOIN rfinal r ON l.ck = r.ck
    GROUP BY r.seg
    """,
)
def mv_join_agg_incremental(spark, sf_dir):
    """Materialized GROUP-BY-over-a-JOIN maintained incrementally end
    to end (operators/matview.py:JoinAggMaterializedView) — the shape
    of the reference's real materialized views (``image_view`` is a
    join + computed columns refreshed WHOLE,
    ``popularity/sql.py:232-283``). The DBSP/Materialize composition:
    the join stage reconciles by dirty-key partial recompute from both
    bases' feeds, its CoW table's OWN change feed then drives the
    aggregate stage's algebraic delta apply — every stage O(churn).
    Churn hits both sides: fact price update + insert + delete,
    dimension segment rewrite (fanout moves rows BETWEEN groups: the
    pre-image subtracts from the old segment, the post-image adds to
    the new) and a dimension delete that removes whole groups. Oracle
    replays all churn and aggregates the re-joined final state from
    scratch."""
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.matview import (
        AggSpec,
        JoinAggMaterializedView,
    )

    o = _t(spark, sf_dir, "orders")["orders"]
    c = _t(spark, sf_dir, "customer")["customer"]
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    lsel = [
        ok.alias("k"), ck.alias("ck"),
        F.col("o_totalprice").cast("double").alias("price"),
    ]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_mv_jagg")
    shutil.rmtree(root, ignore_errors=True)
    left = CowTable.create(
        spark, os.path.join(root, "l"),
        o.filter(ok % 3 != 2).select(*lsel),
        keys=("k",), target_files=6, stats_cols=("ck",),
    )
    right = CowTable.create(
        spark, os.path.join(root, "r"),
        c.select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
            F.col("c_nationkey").alias("nat"),
        ),
        keys=("ck",), target_files=4,
    )
    mv = JoinAggMaterializedView(
        spark, left, right, os.path.join(root, "mv"), on=["ck"],
        group_cols=["seg"],
        aggs=[
            AggSpec("n_orders", "count"),
            AggSpec("sum_price", "sum", "price"),
            AggSpec("min_price", "min", "price"),
            AggSpec("max_price", "max", "price"),
        ],
        how="inner",
    )
    mv.build()
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    cols = [
        ColumnSpec("k", Datatype.int,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("ck", Datatype.int),
        ColumnSpec("price", Datatype.double),
    ]
    left.merge(
        o.filter((ok % 3 != 2) & (ok % 10 == 1)).select(
            ok.alias("k"), ck.alias("ck"),
            (F.col("o_totalprice") + 7).cast("double").alias("price"),
        ).unionByName(
            o.filter((ok % 3 == 2) & (ok % 10 == 5)).select(*lsel)
        ),
        cols, deterministic=True,
    )
    left.delete(F.col("k") % 20 == 6)
    right.update(
        F.col("ck") % 11 == 0,
        {"seg": F.concat(F.lit("X_"), F.col("nat").cast("string"))},
    )
    right.delete(F.col("ck") % 13 == 0)
    # ONE refresh reconciles churn from BOTH feeds (the per-stage
    # multi-refresh staging is pinned in tests/test_matview.py)
    res = mv.refresh()
    assert res["join"]["refreshed"] and res["agg"]["refreshed"]
    # avg derived from the round-stable sum (see mv_incremental_orders)
    return mv.read().select(
        "seg",
        "n_orders",
        F.round("sum_price", 2).alias("sum_price"),
        (F.round(F.col("sum_price"), 2) / F.col("n_orders")).alias(
            "avg_price"
        ),
        "min_price",
        "max_price",
    )


@register(
    "sql_mv_join_agg",
    """
    WITH lbase AS (
      SELECT o_orderkey AS k, o_custkey AS ck,
             CAST(o_totalprice AS DOUBLE) AS price
      FROM orders WHERE o_orderkey % 3 <> 2
    ),
    lupd AS (
      SELECT k, ck, price + 7.0 AS price FROM lbase WHERE k % 10 = 1
    ),
    lmerged AS (
      SELECT b.k, b.ck, COALESCE(u.price, b.price) AS price
      FROM lbase b LEFT JOIN lupd u ON b.k = u.k
    ),
    lfinal AS (SELECT * FROM lmerged WHERE k % 20 <> 6),
    rfinal AS (
      SELECT c_custkey AS ck,
             CASE WHEN c_custkey % 11 = 0
                  THEN 'X_' || CAST(c_nationkey AS VARCHAR)
                  ELSE c_mktsegment END AS seg
      FROM customer WHERE c_custkey % 13 <> 0
    )
    SELECT r.seg,
           count(*) AS n_orders,
           round(sum(l.price), 2) AS sum_price,
           min(l.price) AS min_price,
           max(l.price) AS max_price
    FROM lfinal l JOIN rfinal r ON l.ck = r.ck
    GROUP BY r.seg
    """,
)
def sql_mv_join_agg(spark, sf_dir):
    """The reference's literal MV surface — ``CREATE MATERIALIZED VIEW
    ... AS SELECT aggs FROM fact JOIN dim ... GROUP BY`` (image_view,
    ``popularity/sql.py:232-283``) — driven ENTIRELY through SQL text:
    churn on both bases lands via UPDATE/DELETE text and each REFRESH
    advances the composed join->aggregate pipeline in O(churn) where
    the reference re-joins and re-aggregates the whole table. Oracle =
    full recompute of the replayed final state."""
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.sql_facade import SqlFacade

    o = _t(spark, sf_dir, "orders")["orders"]
    c = _t(spark, sf_dir, "customer")["customer"]
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    root = os.path.join(tempfile.gettempdir(), "spark_graft_sql_jagg")
    shutil.rmtree(root, ignore_errors=True)
    left = CowTable.create(
        spark, os.path.join(root, "l"),
        o.filter(ok % 3 != 2).select(
            ok.alias("k"), ck.alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
        keys=("k",), target_files=6, stats_cols=("ck",),
    )
    right = CowTable.create(
        spark, os.path.join(root, "r"),
        c.select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
            F.col("c_nationkey").alias("nat"),
        ),
        keys=("ck",), target_files=4,
    )
    f = SqlFacade(spark)
    f.register_table("fact_orders", left)
    f.register_table("dim_cust", right)
    f.sql(
        "CREATE MATERIALIZED VIEW seg_rollup AS "
        "SELECT seg, count(*) AS n_orders, sum(price) AS sum_price, "
        "min(price) AS min_price, max(price) AS max_price "
        "FROM fact_orders JOIN dim_cust ON fact_orders.ck = dim_cust.ck "
        "GROUP BY seg"
    )
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    f.sql("UPDATE fact_orders SET price = price + 7 WHERE k % 10 = 1")
    f.sql("DELETE FROM fact_orders WHERE k % 20 = 6")
    f.sql("REFRESH MATERIALIZED VIEW seg_rollup")
    f.sql(
        "UPDATE dim_cust SET seg = 'X_' || CAST(nat AS STRING) "
        "WHERE ck % 11 = 0"
    )
    f.sql("DELETE FROM dim_cust WHERE ck % 13 = 0")
    f.sql("REFRESH MATERIALIZED VIEW seg_rollup")
    return f.sql(
        "SELECT seg, n_orders, round(sum_price, 2) AS sum_price, "
        "min_price, max_price FROM seg_rollup"
    )
