"""The engine's query suite: every SURVEY §2 operator family expressed
over the driver's synthetic tables, each paired with an ANSI-SQL oracle
DuckDB runs on the same parquet (the driver's correctness gate).

Each entry: name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None).
Column names are aliased identically on both sides; floating aggregates are
rounded so double-summation order differences collapse; timestamps are
emitted as epoch microseconds (engine-neutral).

The Spark side is the product — idiomatic DataFrame programs calling the
library operators; the SQL is only the cross-check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openverse_catalog_spark.functions.hashing import hash60, hash60_sql
from openverse_catalog_spark.operators import dedupe as dd
from openverse_catalog_spark.operators import knn
from openverse_catalog_spark.operators.merge import (
    distinct_on,
    merge_upsert,
    url_conflict_filter,
)
from openverse_catalog_spark.operators.popularity import (
    percentile_disc_by_group,
    popularity_constants,
    standardized_popularity,
)
from openverse_catalog_spark.schemas.columns import ColumnSpec, Datatype, UpsertStrategy
from openverse_catalog_spark.session import load_tables

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, names)


# ===========================================================================
# Aggregations (SURVEY §2.5)
# ===========================================================================


@register(
    "agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark, sf_dir):
    """Map-side partial agg -> single shuffle on the (tiny) group key."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "agg_dup_detection",
    """
    SELECT o_custkey, count(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING count(*) > 1
    """,
)
def agg_dup_detection(spark, sf_dir):
    """A1: GROUP BY + HAVING duplicate detection (photos.sql:42-49)."""
    o = _t(spark, sf_dir, "orders")["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") > 1)
    )


@register(
    "agg_count_distinct",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def agg_count_distinct(spark, sf_dir):
    """A2: grouped COUNT(DISTINCT) (taxa.sql:102-107)."""
    e = _t(spark, sf_dir, "events")["events"]
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n_events")
    )


@register(
    "agg_percentile_disc",
    """
    SELECT event_type,
           quantile_disc(value, 0.85) AS p85,
           quantile_disc(value, 0.50) AS p50
    FROM events GROUP BY event_type
    """,
)
def agg_percentile_disc(spark, sf_dir):
    """A7: exact discrete percentile per group (popularity/sql.py:214-229).
    Sort-based (scales to huge groups), both percentiles picked from one
    ranked pass — one scan + one shuffle, not one per percentile."""
    from openverse_catalog_spark.operators.popularity import percentile_disc_multi

    e = _t(spark, sf_dir, "events")["events"]
    return percentile_disc_multi(e, ["event_type"], "value", {"p85": 0.85, "p50": 0.50})


@register(
    "agg_popularity_constants",
    """
    WITH p AS (
      SELECT event_type, quantile_disc(value, 0.85) AS raw_value FROM events GROUP BY event_type
    )
    SELECT event_type, raw_value,
           round(((1 - 0.85) / 0.85) * (CASE WHEN raw_value = 0 THEN 1 ELSE raw_value END), 6) AS constant
    FROM p
    """,
)
def agg_popularity_constants(spark, sf_dir):
    """A8: percentile -> zero-guard -> ((1-p)/p)*value (popularity/sql.py:249-283)."""
    e = _t(spark, sf_dir, "events")["events"]
    p = percentile_disc_by_group(e, ["event_type"], "value", 0.85, "percentile_value")
    c = popularity_constants(p, 0.85)
    return c.select(
        "event_type", "raw_value", F.round("constant", 6).alias("constant")
    )


@register(
    "join_broadcast_standardized",
    """
    WITH c AS (
      SELECT event_type,
             ((1 - 0.85) / 0.85) * (CASE WHEN quantile_disc(value, 0.85) = 0 THEN 1
                                         ELSE quantile_disc(value, 0.85) END) AS constant
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, round(e.value / (e.value + c.constant), 6) AS standardized_popularity
    FROM events e JOIN c USING (event_type)
    """,
)
def join_broadcast_standardized(spark, sf_dir):
    """J8 + popularity math: constants broadcast-joined to the fact table,
    score = m/(m+constant) (popularity/sql.py:301-326). The fact side never
    shuffles — explain shows BroadcastHashJoin."""
    e = _t(spark, sf_dir, "events")["events"]
    p = percentile_disc_by_group(e, ["event_type"], "value", 0.85, "percentile_value")
    c = popularity_constants(p, 0.85)
    scored = standardized_popularity(e, c, ["event_type"], "value")
    return scored.select(
        "event_id", F.round("standardized_popularity", 6).alias("standardized_popularity")
    )


# ===========================================================================
# Joins (SURVEY §2.3)
# ===========================================================================


@register(
    "join_5way_enrich",
    """
    SELECT r.r_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_5way_enrich(spark, sf_dir):
    """J1: the iNaturalist-style 5-way equi join
    (transformed_table.template.sql:55-67) — small dims broadcast, big
    sides shuffle once on the join key; no manual 2M-row batching."""
    t = _t(spark, sf_dir, "lineitem", "orders", "customer", "nation", "region")
    return (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "join_anti_orphans",
    """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_orphans(spark, sf_dir):
    """J2: anti-join (photo_dupes NOT EXISTS, transformed_table:69-71)."""
    t = _t(spark, sf_dir, "customer", "orders")
    return t["customer"].join(
        t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@register(
    "join_semi_active",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_semi_active(spark, sf_dir):
    """Semi-join complement of J2."""
    t = _t(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return t["customer"].join(
        urgent, t["customer"].c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_md5_surrogate",
    """
    WITH dim AS (SELECT DISTINCT md5(c_mktsegment) AS seg_key, c_mktsegment AS seg_name
                 FROM customer)
    SELECT d.seg_name, count(*) AS n, round(sum(c.c_acctbal), 2) AS total_bal
    FROM customer c JOIN dim d ON md5(c.c_mktsegment) = d.seg_key
    GROUP BY d.seg_name
    """,
)
def join_md5_surrogate(spark, sf_dir):
    """J5: equi-join on md5 surrogate keys (taxa.sql:112-116, 175-179)."""
    c = _t(spark, sf_dir, "customer")["customer"]
    dim = (
        c.select(
            F.md5("c_mktsegment").alias("seg_key"),
            F.col("c_mktsegment").alias("seg_name"),
        )
        .distinct()
    )
    return (
        c.withColumn("seg_key", F.md5("c_mktsegment"))
        .join(F.broadcast(dim), "seg_key")
        .groupBy("seg_name")
        .agg(F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    )


@register(
    "join_theta_explode",
    """
    WITH tok AS (
      SELECT p_partkey, p_size, unnest(string_split(p_type, ' ')) AS word
      FROM part
    ),
    dim AS (SELECT DISTINCT word FROM tok)
    SELECT d.word, count(*) AS n_parts, min(t.p_size) AS min_size, max(t.p_size) AS max_size
    FROM tok t JOIN dim d ON t.word = d.word
    GROUP BY d.word
    """,
)
def join_theta_explode(spark, sf_dir):
    """J4: theta-join converted to equi-join by exploding a delimited
    string (ancestry ANY-join, taxa.sql:248-251)."""
    p = _t(spark, sf_dir, "part")["part"]
    tok = p.select(
        "p_partkey", "p_size", F.explode(F.split("p_type", " ")).alias("word")
    )
    dim = tok.select("word").distinct()
    return (
        tok.join(F.broadcast(dim), "word")
        .groupBy("word")
        .agg(
            F.count("*").alias("n_parts"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
        )
    )


# ===========================================================================
# Windows / dedup / DISTINCT ON (SURVEY §2.6, J6)
# ===========================================================================


@register(
    "dedup_keep_latest",
    """
    SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
    FROM (SELECT user_id, event_type, event_id, ts,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def dedup_keep_latest(spark, sf_dir):
    """J6/W3: dedup via ranking window — keep newest row per natural key
    (loader/sql.py:220-232 dedup, pinned deterministic winner)."""
    e = _t(spark, sf_dir, "events")["events"]
    out = dd.exact_dedupe(
        e, ["user_id", "event_type"], [F.col("ts").desc(), F.col("event_id").desc()]
    )
    return out.select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us")
    )


@register(
    "window_distinct_on",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_type
    FROM (SELECT user_id, event_id, event_type,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
          FROM events)
    WHERE rn = 1
    """,
)
def window_distinct_on(spark, sf_dir):
    """W2: DISTINCT ON (audioset_view newest-updated_on, popularity/sql.py:341-357)."""
    e = _t(spark, sf_dir, "events")["events"]
    out = distinct_on(e, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()])
    return out.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
    )


@register(
    "window_running_sum",
    """
    SELECT o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    """W1: analytic window with explicit frame (taxa.sql:125-128 running
    title length)."""
    o = _t(spark, sf_dir, "orders")["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_total")
    )


@register(
    "agg_string_cutoff",
    """
    WITH ranked AS (
      SELECT n.n_name, c.c_name,
             sum(length(c.c_name) + 2) OVER (
               PARTITION BY n.n_name ORDER BY c.c_name
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_len
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT n_name,
           string_agg(CASE WHEN running_len < 256 THEN c_name END, ', ' ORDER BY c_name) AS title,
           count(CASE WHEN running_len >= 256 THEN 1 END) AS n_overflow
    FROM ranked GROUP BY n_name
    """,
)
def agg_string_cutoff(spark, sf_dir):
    """A3+W1: ordered string_agg under a running-length cutoff, overflow
    counted (taxa.sql:125-150 vernacular-name title building)."""
    t = _t(spark, sf_dir, "customer", "nation")
    joined = t["customer"].join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy("c_name")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = joined.select(
        "n_name",
        "c_name",
        F.sum(F.length("c_name") + 2).over(w).alias("running_len"),
    )
    return ranked.groupBy("n_name").agg(
        F.array_join(
            F.array_sort(
                F.collect_list(F.when(F.col("running_len") < 256, F.col("c_name")))
            ),
            ", ",
        ).alias("title"),
        F.count(F.when(F.col("running_len") >= 256, F.lit(1))).alias("n_overflow"),
    )


@register(
    "agg_collect_slice_topk",
    """
    WITH names AS (
      SELECT n.n_name, list_sort(list(c.c_name)) AS all_names
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE c.c_acctbal > 0
      GROUP BY n.n_name
    )
    SELECT n_name, array_to_string(all_names[1:20], '|') AS top20,
           len(all_names) AS n_total
    FROM names
    """,
)
def agg_collect_slice_topk(spark, sf_dir):
    """A4+T1/T2: filtered ordered aggregation + top-20 slice
    (taxa.sql:228-247 tag building)."""
    t = _t(spark, sf_dir, "customer", "nation")
    joined = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy("n_name").agg(
        F.array_join(F.slice(F.array_sort(F.collect_list("c_name")), 1, 20), "|").alias(
            "top20"
        ),
        F.count("*").alias("n_total"),
    )


@register(
    "topk_per_group",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice
    FROM (SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                 row_number() OVER (PARTITION BY c.c_mktsegment
                                    ORDER BY o.o_totalprice DESC, o.o_orderkey) rn
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
    WHERE rn <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    """T1: top-k per group via ranking window."""
    t = _t(spark, sf_dir, "orders", "customer")
    joined = t["orders"].join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
    )


# ===========================================================================
# Set ops (SURVEY §2.8)
# ===========================================================================


@register(
    "set_union_accounts",
    """
    SELECT s_name AS name, round(s_acctbal, 2) AS acctbal, 'supplier' AS kind FROM supplier
    UNION ALL
    SELECT c_name, round(c_acctbal, 2), 'customer' FROM customer WHERE c_acctbal < 0
    """,
)
def set_union_accounts(spark, sf_dir):
    """U1: UNION ALL assembly (create_schema.sql:140-167)."""
    t = _t(spark, sf_dir, "supplier", "customer")
    s = t["supplier"].select(
        F.col("s_name").alias("name"),
        F.round("s_acctbal", 2).alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    c = (
        t["customer"]
        .filter(F.col("c_acctbal") < 0)
        .select(
            F.col("c_name").alias("name"),
            F.round("c_acctbal", 2).alias("acctbal"),
            F.lit("customer").alias("kind"),
        )
    )
    return s.unionAll(c)


# ===========================================================================
# Incremental patterns (SURVEY §2.10)
# ===========================================================================


@register(
    "date_time_slices",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE)::VARCHAR AS day,
           extract(hour FROM ts) AS hour,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY 1, 2
    """,
)
def date_time_slices(spark, sf_dir):
    """I1/I2: event-time day/hour slicing (dated DAGs + adaptive
    time-slicing, provider_dag_factory.py:96-99)."""
    e = _t(spark, sf_dir, "events")["events"]
    return e.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.hour("ts").cast("bigint").alias("hour"),
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))


@register(
    "incremental_rollup_merge",
    """
    WITH old_agg AS (
      SELECT user_id, count(*) AS n, sum(value) AS total
      FROM events WHERE ts < TIMESTAMP '2024-01-21' GROUP BY user_id
    ),
    delta_agg AS (
      SELECT user_id, count(*) AS n, sum(value) AS total
      FROM events WHERE ts >= TIMESTAMP '2024-01-21' GROUP BY user_id
    )
    SELECT coalesce(o.user_id, d.user_id) AS user_id,
           coalesce(o.n, 0) + coalesce(d.n, 0) AS n_events,
           round(coalesce(o.total, 0) + coalesce(d.total, 0), 2) AS total_value
    FROM old_agg o FULL OUTER JOIN delta_agg d ON o.user_id = d.user_id
    """,
)
def incremental_rollup_merge(spark, sf_dir):
    """I3/I5: incremental matview refresh as partial-agg + merge — the
    Spark shape of 'REFRESH MATERIALIZED VIEW' done incrementally over a
    new date partition (popularity/sql.py:286-298)."""
    e = _t(spark, sf_dir, "events")["events"]
    cutoff = F.lit("2024-01-21").cast("timestamp")
    old_agg = (
        e.filter(F.col("ts") < cutoff)
        .groupBy("user_id")
        .agg(F.count("*").alias("o_n"), F.sum("value").alias("o_total"))
    )
    delta = (
        e.filter(F.col("ts") >= cutoff)
        .groupBy("user_id")
        .agg(F.count("*").alias("d_n"), F.sum("value").alias("d_total"))
    )
    merged = old_agg.join(delta, "user_id", "full_outer")
    return merged.select(
        "user_id",
        (F.coalesce("o_n", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias("n_events"),
        F.round(
            F.coalesce("o_total", F.lit(0.0)) + F.coalesce("d_total", F.lit(0.0)), 2
        ).alias("total_value"),
    )


@register(
    "json_metric_extract",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                      THEN 1 END) AS n_high,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)
                     / (CAST(json_extract_string(props, '$.k') AS BIGINT) + 25.0)), 6)
             AS std_pop
    FROM events GROUP BY event_type
    """,
)
def json_metric_extract(spark, sf_dir):
    """§2.9 json family: the reference reads popularity metrics out of
    jsonb (``meta_data->>metric``, popularity/sql.py:219-222, 318) — here
    the metric comes out of the ``props`` JSON column via
    get_json_object, feeds the m/(m+c) standardized-popularity math, and
    aggregates per provider-analog. JSON parse + math stay codegen'd."""
    e = _t(spark, sf_dir, "events")["events"]
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.when(k > 50, 1)).alias("n_high"),
        F.round(F.avg(k / (k + F.lit(25.0))), 6).alias("std_pop"),
    )


@register(
    "agg_rollup_day_type",
    """
    SELECT COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
           COALESCE(event_type, 'ALL') AS event_type,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), event_type)
    """,
)
def agg_rollup_day_type(spark, sf_dir):
    """Hierarchical rollup (day, event_type) -> day -> grand total in ONE
    pass — engine capability past the reference's surface (it has no
    grouping sets; SURVEY §2.5). Spark expands the rollup map-side, so it
    is still a single shuffle with partial aggregation."""
    e = _t(spark, sf_dir, "events")["events"]
    return (
        e.rollup(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("d"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.coalesce("d", F.lit("ALL")).alias("day"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n",
            "total",
        )
    )


@register(
    "join_asof_last_click",
    """
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
         m AS (
           SELECT p.event_id, c.event_id AS click_id,
                  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
           FROM p ASOF LEFT JOIN c
             ON p.user_id = c.user_id AND p.ts >= c.ts
         )
    SELECT event_id,
           CASE WHEN gap_us <= 86400000000 THEN click_id END AS click_id,
           CASE WHEN gap_us <= 86400000000 THEN gap_us END AS gap_us
    FROM m
    """,
)
def join_asof_last_click(spark, sf_dir):
    """As-of join (capability past the reference — SURVEY §2.3 notes it
    has none): each purchase matched to the user's latest click at or
    before it, null if none within 24 h. Union+window implementation —
    ONE shuffle on user_id, no inequality join (which Spark would plan
    as a per-key nested loop). Oracle is DuckDB's native ASOF JOIN, so
    the semantics are pinned against an independent implementation."""
    from openverse_catalog_spark.operators.joins import asof_join

    e = _t(spark, sf_dir, "events")["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    res = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        right_cols=["click_id"],
        tolerance_s=86_400,
    )
    return res.select("event_id", "click_id", F.col("_asof_gap_us").alias("gap_us"))


@register(
    "join_range_clicks_after_signup",
    """
    SELECT s.event_id,
           count(c.event_id) AS n_clicks,
           max(epoch_us(c.ts)) AS last_click_us
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = s.user_id
     AND c.ts > s.ts AND c.ts <= s.ts + INTERVAL 24 HOUR
    GROUP BY s.event_id
    """,
)
def join_range_clicks_after_signup(spark, sf_dir):
    """Bounded range join (interval join — absent from both the
    reference and Spark's primitives): clicks within 24 h after each
    signup, aggregated per signup. Bucketed rewrite — both sides keyed
    by (user_id, 24h-bucket) with the left duplicated into ≤2 buckets,
    so the physical plan is a hash equi-join + filter, never the
    nested-loop an inequality join would cost. Unmatched signups kept
    via a left join back onto the anchor set (count 0)."""
    from openverse_catalog_spark.operators.joins import range_join_bucketed

    e = _t(spark, sf_dir, "events")["events"]
    signups = e.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    pairs = range_join_bucketed(
        signups,
        clicks,
        on=["user_id"],
        lower_s=0,
        upper_s=86_400,
        right_cols=["ts", "click_id"],
    )
    per_signup = pairs.groupBy("event_id").agg(
        F.count("r_click_id").alias("n_clicks"),
        F.max(F.unix_micros("r_ts")).alias("last_click_us"),
    )
    return signups.select("event_id").join(per_signup, "event_id", "left").select(
        "event_id",
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        "last_click_us",
    )


@register(
    "agg_salted_distinct_users",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_distinct
    FROM events GROUP BY event_type
    """,
)
def agg_salted_distinct_users(spark, sf_dir):
    """Skew-proof exact distinct: 5 event types over the whole table is
    the worst-case hot-key shape for COUNT(DISTINCT). Value-salting
    splits each key's distinct state over 16 tasks (same value -> same
    salt bucket, so bucket counts sum exactly); the second shuffle moves
    only keys x 16 rows. The oracle is the plain grouped DISTINCT."""
    from openverse_catalog_spark.operators.joins import salted_count_distinct

    e = _t(spark, sf_dir, "events")["events"]
    return salted_count_distinct(e, ["event_type"], "user_id", 16)


@register(
    "window_event_gaps",
    """
    SELECT event_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER w)  AS gap_prev_us,
           epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_next_us,
           row_number() OVER w AS seq
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_event_gaps(spark, sf_dir):
    """lead/lag inter-event gaps + per-user sequence numbers in a single
    window pass: one shuffle on user_id serves all three functions
    (Spark collapses same-spec window expressions into one Window
    operator). The per-user event-history shape behind sessionization
    and funnel timing."""
    e = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_prev_us"
        ),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias(
            "gap_next_us"
        ),
        F.row_number().over(w).alias("seq"),
    )


@register(
    "agg_grouping_sets_cube",
    """
    SELECT coalesce(event_type, '(all)') AS event_type,
           coalesce(CAST(user_id % 4 AS VARCHAR), '(all)') AS cohort,
           count(*) AS n,
           round(sum(value), 2) AS total
    FROM events
    GROUP BY CUBE (event_type, CAST(user_id % 4 AS VARCHAR))
    """,
)
def agg_grouping_sets_cube(spark, sf_dir):
    """CUBE over (event_type, cohort): all four grouping sets computed
    in one shuffle via Expand — 4x the rows into the exchange but ONE
    pass over the input, vs four separate aggregations reading the
    table four times."""
    e = _t(spark, sf_dir, "events")["events"]
    cohort = (F.col("user_id") % 4).cast("string")
    return (
        e.cube(F.col("event_type"), cohort.alias("cohort"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce("cohort", F.lit("(all)")).alias("cohort"),
            "n",
            "total",
        )
    )


@register(
    "set_intersect_except_buyers",
    """
    SELECT user_id, 'both' AS cls FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'error' AND value > 150
    )
    UNION ALL
    SELECT user_id, 'buyer_only' AS cls FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'error' AND value > 150
    )
    """,
)
def set_intersect_except_buyers(spark, sf_dir):
    """INTERSECT / EXCEPT set classification (buyers who did/didn't hit
    errors): Spark plans both as hash aggregates + left-semi/anti joins
    on the deduplicated key sets — no full-row comparison."""
    e = _t(spark, sf_dir, "events")["events"]
    hi = F.col("value") > 150
    buyers = e.filter((F.col("event_type") == "purchase") & hi).select("user_id")
    errs = e.filter((F.col("event_type") == "error") & hi).select("user_id")
    both = buyers.intersect(errs).select("user_id", F.lit("both").alias("cls"))
    only = buyers.subtract(errs).select(
        "user_id", F.lit("buyer_only").alias("cls")
    )
    return both.unionAll(only)


@register(
    "window_ntile_value_deciles",
    """
    SELECT event_id,
           ntile(10) OVER (ORDER BY value, event_id) AS decile
    FROM events WHERE event_type = 'purchase'
    """,
)
def window_ntile_value_deciles(spark, sf_dir):
    """ntile decile assignment over purchase values (the spend-tiering
    shape). A global ORDER BY window is single-partition by nature —
    acceptable for ranked outputs that have already been aggregated or
    filtered (here: one event type); for full-table quantiles use the
    sort-free percentile_disc_multi operator instead."""
    e = _t(spark, sf_dir, "events")["events"]
    w = Window.orderBy("value", "event_id")
    return e.filter(F.col("event_type") == "purchase").select(
        "event_id", F.ntile(10).over(w).alias("decile")
    )


@register(
    "agg_mode_per_group",
    """
    SELECT user_id,
           (max(struct_pack(cnt := cnt, et := event_type))).et AS top_type,
           max(cnt) AS n
    FROM (
      SELECT user_id, event_type, count(*) AS cnt
      FROM events GROUP BY user_id, event_type
    ) t
    GROUP BY user_id
    """,
)
def agg_mode_per_group(spark, sf_dir):
    """Per-user modal event type via count-then-max_by: two partial-agg
    shuffles on bounded keys, never a per-group sort. DuckDB arg_max
    and Spark max_by share tie semantics here because (user, type)
    counts are made unique by the deterministic tie-break column."""
    e = _t(spark, sf_dir, "events")["events"]
    counted = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # deterministic across engines: prefer higher count, then later type
    # name — folded into one orderable struct for max_by
    return counted.groupBy("user_id").agg(
        F.expr("max_by(event_type, struct(cnt, event_type))").alias("top_type"),
        F.max("cnt").alias("n"),
    )


@register(
    "merge_scd2_history",
    """
    WITH marked AS (
      SELECT user_id, event_type AS state, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
      SELECT user_id, state, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM marked
    ),
    spans AS (
      SELECT user_id, state, grp,
             min(ts) AS valid_from, count(*) AS n_events
      FROM islands GROUP BY user_id, state, grp
    )
    SELECT user_id, state,
           epoch_us(valid_from) AS valid_from_us,
           epoch_us(lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)) AS valid_to_us,
           n_events
    FROM spans
    """,
)
def merge_scd2_history(spark, sf_dir):
    """SCD type-2 history from an event stream: collapse consecutive
    same-state events into validity spans (gaps-and-islands via a
    change-flag running sum), then close each span with the next span's
    start (lead; NULL = current). All three window passes share the
    user_id partitioning, so the whole history build is ONE shuffle —
    the warehouse-history shape the reference's full-refresh tables
    never had."""
    e = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = e.select(
        "user_id",
        F.col("event_type").alias("state"),
        "ts",
        "event_id",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0).alias("chg"),
    )
    islands = marked.withColumn("grp", F.sum("chg").over(run))
    spans = islands.groupBy("user_id", "state", "grp").agg(
        F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return spans.select(
        "user_id",
        "state",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros(F.lead("valid_from").over(w2)).alias("valid_to_us"),
        "n_events",
    )


# --- percentile-clipped (winsorized) per-group statistics ------------------


@register(
    "agg_winsorized_values",
    """
    WITH th AS (
      SELECT event_type,
             quantile_disc(value, 0.05) AS lo,
             quantile_disc(value, 0.95) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) AS n,
           round(avg(CASE WHEN e.value < th.lo THEN th.lo
                          WHEN e.value > th.hi THEN th.hi
                          ELSE e.value END), 4) AS clipped_mean,
           round(th.lo, 4) AS lo, round(th.hi, 4) AS hi
    FROM events e JOIN th USING (event_type)
    GROUP BY e.event_type, th.lo, th.hi
    """,
)
def agg_winsorized_values(spark, sf_dir):
    """Outlier-robust per-group statistics: clip each group's values at
    its own exact p05/p95 (discrete percentiles — the A7 operator reused
    as a threshold source) and average the clipped column. The
    threshold table is group-cardinality rows, so it broadcasts back
    onto the fact side: one ranked pass for thresholds + one
    broadcast-join pass for the clip — the fact table shuffles once,
    for the threshold ranking, never for the join."""
    from openverse_catalog_spark.operators.popularity import percentile_disc_multi

    ev = _t(spark, sf_dir, "events")["events"]
    th = percentile_disc_multi(
        ev, ["event_type"], "value", {"lo": 0.05, "hi": 0.95}
    )
    clipped = F.when(F.col("value") < F.col("lo"), F.col("lo")).when(
        F.col("value") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("value"))
    return (
        ev.join(F.broadcast(th), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(clipped), 4).alias("clipped_mean"),
        )
        .select(
            "event_type", "n", "clipped_mean",
            F.round("lo", 4).alias("lo"), F.round("hi", 4).alias("hi"),
        )
    )


# --- one-pass pairwise correlation matrix ----------------------------------


@register(
    "agg_corr_matrix",
    """
    SELECT round(corr(l_quantity, l_extendedprice), 6) AS qty_price,
           round(corr(l_quantity, l_discount), 6) AS qty_disc,
           round(corr(l_extendedprice, l_discount), 6) AS price_disc,
           round(corr(l_extendedprice, l_tax), 6) AS price_tax,
           count(*) AS n
    FROM lineitem
    """,
)
def agg_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlations of the fact table's numeric
    columns, all in ONE aggregation pass (each corr is an independent
    accumulator in the same partial-agg; the table is scanned once and
    never shuffled — partials reduce to a single row). The feature-
    drift / collinearity screen run before training-data featurization."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("qty_disc"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("price_disc"),
        F.round(F.corr("l_extendedprice", "l_tax"), 6).alias("price_tax"),
        F.count(F.lit(1)).alias("n"),
    )


# --- the reference's taxa.sql mini-pipeline, end to end --------------------


@register(
    "pipeline_taxa_enrich",
    """
    WITH ranked AS (
      SELECT n.n_name, n.n_nationkey, n.n_regionkey, c.c_name, c.c_mktsegment,
             sum(length(c.c_name) + 2) OVER (
               PARTITION BY n.n_name ORDER BY c.c_name
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_len
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    agg AS (
      SELECT n_name, n_nationkey, n_regionkey,
             count(DISTINCT c_mktsegment) AS n_sources,
             string_agg(CASE WHEN running_len < 256 THEN c_name END, ', '
                        ORDER BY c_name) AS title,
             array_to_string(
               list_slice(
                 coalesce(list(c_name ORDER BY c_name)
                            FILTER (WHERE running_len >= 256), []),
                 1, 20),
               '|') AS overflow_tags
      FROM ranked
      GROUP BY n_name, n_nationkey, n_regionkey
    ),
    anc_dim AS (
      SELECT 'r' || CAST(r_regionkey AS VARCHAR) AS akey, r_name AS aname FROM region
      UNION ALL
      SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS akey, n_name AS aname FROM nation
    ),
    lineage AS (
      SELECT a.n_name, array_to_string(list_sort(list(d.aname)), '>') AS lineage
      FROM agg a,
           unnest(string_split('r' || CAST(a.n_regionkey AS VARCHAR) || '/n'
                               || CAST(a.n_nationkey AS VARCHAR), '/')) AS u(akey)
      JOIN anc_dim d ON d.akey = u.akey
      GROUP BY a.n_name
    )
    SELECT a.n_name, a.n_sources, a.title, a.overflow_tags,
           r.r_name AS region_name, l.lineage
    FROM agg a
    LEFT JOIN region r ON md5(CAST(a.n_regionkey AS VARCHAR))
                        = md5(CAST(r.r_regionkey AS VARCHAR))
    LEFT JOIN lineage l ON a.n_name = l.n_name
    """,
)
def pipeline_taxa_enrich(spark, sf_dir):
    """SURVEY §3.2's taxa.sql mini-pipeline END TO END in one job: the
    grouped count-distinct (taxa.sql:102-107), the windowed running-
    length title cutoff (:125-128), the filtered ordered aggregation with
    overflow->tags and top-20 slice (:144-150, 228-247), the md5-
    surrogate left join (:175-179), and the ancestry explode self-join
    re-aggregated to a lineage string (:248-256) — chained as ONE
    Catalyst plan where the reference runs a serialized SQL script.
    Shuffle budget: one exchange on the nation key for the window +
    grouped agg (shared), everything else broadcasts (region/nation dims
    are tiny; at 100 TB the taxa dim itself stays far under the fact
    tables this enriches)."""
    t = _t(spark, sf_dir, "customer", "nation", "region")
    c, n, r = t["customer"], t["nation"], t["region"]

    joined = c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    w = (
        Window.partitionBy("n_name")
        .orderBy("c_name")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = joined.select(
        "n_name", "n_nationkey", "n_regionkey", "c_name", "c_mktsegment",
        F.sum(F.length("c_name") + 2).over(w).alias("running_len"),
    )
    # group by n_name ALONE (nationkey/regionkey are functionally
    # dependent, carried with first()) so the aggregation reuses the
    # window's hash partitioning instead of re-exchanging on the wider key
    agg = ranked.groupBy("n_name").agg(
        F.first("n_nationkey").alias("n_nationkey"),
        F.first("n_regionkey").alias("n_regionkey"),
        F.countDistinct("c_mktsegment").alias("n_sources"),
        F.array_join(
            F.array_sort(
                F.collect_list(F.when(F.col("running_len") < 256, F.col("c_name")))
            ),
            ", ",
        ).alias("title"),
        # nullif: a nation with NO overflow yields SQL NULL (DuckDB's
        # string_agg-over-nothing semantics), not '' — the distinction
        # only shows at tiny SFs where no title hits the cutoff
        F.nullif(
            F.array_join(
                F.slice(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("running_len") >= 256, F.col("c_name")
                            )
                        )
                    ),
                    1, 20,
                ),
                "|",
            ),
            F.lit(""),
        ).alias("overflow_tags"),
    )

    anc_dim = r.select(
        F.concat(F.lit("r"), F.col("r_regionkey").cast("string")).alias("akey"),
        F.col("r_name").alias("aname"),
    ).unionAll(
        n.select(
            F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias("akey"),
            F.col("n_name").alias("aname"),
        )
    )
    ancestry = F.split(
        F.concat(
            F.lit("r"), F.col("n_regionkey").cast("string"),
            F.lit("/n"), F.col("n_nationkey").cast("string"),
        ),
        "/",
    )
    lineage = (
        agg.select("n_name", F.explode(ancestry).alias("akey"))
        .join(F.broadcast(anc_dim), "akey")
        .groupBy("n_name")
        .agg(F.array_join(F.array_sort(F.collect_list("aname")), ">").alias("lineage"))
    )

    region_dim = r.select(
        F.md5(F.col("r_regionkey").cast("string")).alias("rk_md5"), "r_name"
    )
    return (
        agg.withColumn("rk_md5", F.md5(F.col("n_regionkey").cast("string")))
        .join(F.broadcast(region_dim), "rk_md5", "left")
        .join(lineage, "n_name", "left")
        .select(
            "n_name", "n_sources", "title", "overflow_tags",
            F.col("r_name").alias("region_name"), "lineage",
        )
    )


# --- explicit skew-salted join ---------------------------------------------


@register(
    "join_salted_hot_keys",
    """
    WITH dim AS (
      SELECT c_custkey % 50 AS k, count(*) AS n_cust
      FROM customer GROUP BY c_custkey % 50
    )
    SELECT e.event_type, count(*) AS n, CAST(sum(d.n_cust) AS BIGINT) AS cust_weight
    FROM events e JOIN dim d ON e.user_id % 50 = d.k
    GROUP BY e.event_type
    """,
)
def join_salted_hot_keys(spark, sf_dir):
    """Explicit fact-salt + dim-replicate join on a pathologically hot
    key space (50 distinct keys over the whole events table — every key
    is a hot key, the case AQE's skew splitter can only partially save).
    ``salted_join`` spreads each key over R tasks by salting the fact
    with a uniform column and exploding the dim R ways; the result set
    is IDENTICAL to the unsalted join, which is exactly what the oracle
    checks. Dim here is deliberately joined non-broadcast in spirit: at
    scale this is the too-big-to-broadcast dim on a skewed key."""
    from openverse_catalog_spark.operators.joins import salted_join

    t = _t(spark, sf_dir, "events", "customer")
    fact = t["events"].select(
        "event_id", "event_type", (F.col("user_id") % 50).alias("k")
    )
    dim = (
        t["customer"]
        .groupBy((F.col("c_custkey") % 50).alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    out = salted_join(fact, dim, ["k"], salt_src="event_id", n_salts=8)
    return out.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("n_cust").alias("cust_weight")
    )


# --- the §3.3 popularity refresh, end to end -------------------------------


@register(
    "pipeline_popularity_refresh",
    """
    WITH p AS (
      SELECT event_type, quantile_disc(value, 0.85) AS raw_value
      FROM events GROUP BY event_type
    ),
    c AS (
      SELECT event_type, raw_value,
             ((1 - 0.85) / 0.85) * (CASE WHEN raw_value = 0 THEN 1
                                         ELSE raw_value END) AS constant
      FROM p
    )
    SELECT e.event_type,
           round(c.raw_value, 4) AS raw_value,
           round(c.constant, 6) AS constant,
           count(*) AS n_scored,
           round(avg(e.value / (e.value + c.constant)), 6) AS avg_score,
           round(max(e.value / (e.value + c.constant)), 6) AS max_score
    FROM events e JOIN c USING (event_type)
    GROUP BY e.event_type, c.raw_value, c.constant
    """,
)
def pipeline_popularity_refresh(spark, sf_dir):
    """SURVEY §3.3 as ONE job: percentile metrics (A7, exact disc) ->
    popularity constants with the zero-guard (A8) -> standardized
    m/(m+c) scoring of every row via broadcast join (J8) -> per-provider
    refresh summary. The reference runs this as three serialized steps
    (metrics upsert, REFRESH MATERIALIZED VIEW constants, full matview
    recompute — popularity/sql.py:139-421); here the whole refresh is
    one Catalyst plan: the fact table shuffles ONCE (for the percentile
    ranking) and the constants come back as a broadcast, so refreshing
    the scored view at 100 TB costs one scan + one keyed exchange."""
    e = _t(spark, sf_dir, "events")["events"]
    p = percentile_disc_by_group(e, ["event_type"], "value", 0.85, "percentile_value")
    c = popularity_constants(p, 0.85)
    scored = standardized_popularity(e, c, ["event_type"], "value")
    summary = scored.groupBy("event_type").agg(
        F.round(F.max("constant"), 6).alias("constant"),
        F.count(F.lit(1)).alias("n_scored"),
        F.round(F.avg("standardized_popularity"), 6).alias("avg_score"),
        F.round(F.max("standardized_popularity"), 6).alias("max_score"),
    )
    raw = c.select("event_type", F.round("raw_value", 4).alias("raw_value"))
    return summary.join(F.broadcast(raw), "event_type").select(
        "event_type", "raw_value", "constant", "n_scored", "avg_score", "max_score"
    )


# --- the popularity RECREATE (drop-and-rebuild), distinct from refresh ----

_POP_SUMMARY_ORACLE = """
    WITH media AS (
      SELECT event_type AS provider,
             CAST(event_id AS VARCHAR) AS foreign_identifier,
             value AS metric
      FROM events
    ),
    p AS (
      SELECT provider, quantile_disc(metric, 0.85) AS raw_value
      FROM media WHERE metric IS NOT NULL GROUP BY provider
    ),
    c AS (
      SELECT provider, raw_value,
             ((1 - 0.85) / 0.85) * (CASE WHEN raw_value = 0 THEN 1
                                         ELSE raw_value END) AS constant
      FROM p
    )
    SELECT m.provider,
           round(c.raw_value, 4) AS raw_value,
           round(c.constant, 6) AS constant,
           count(*) AS n_scored,
           round(avg(m.metric / (m.metric + c.constant)), 6) AS avg_score,
           round(max(m.metric / (m.metric + c.constant)), 6) AS max_score
    FROM media m JOIN c USING (provider)
    GROUP BY m.provider, c.raw_value, c.constant
"""


@register("pipeline_popularity_recreate", _POP_SUMMARY_ORACLE)
def pipeline_popularity_recreate(spark, sf_dir):
    """The reference's RECREATE pipeline
    (database/recreate_popularity_calculation_dag_factory.py), distinct
    from the scheduled refresh: DROP every derived popularity artifact
    and rebuild from the canonical media rows alone — no incremental
    state survives. Here: (1) wipe the fixed table root (the DROP),
    (2) materialize the canonical media table as a CoW lake table v1,
    (3) from THAT SNAPSHOT recompute metrics (exact percentile_disc per
    provider) -> constants matview -> scored view, (4) publish the
    scored view as a fresh snapshot via the atomic publish/alias swap
    (the reference's matview rebuild + promote), and (5) summarize per
    provider from the PUBLISHED artifact — so the oracle, which
    recomputes from raw rows only, gates the whole rebuild chain.
    Compute shape matches refresh (one keyed shuffle + broadcast
    constants); the difference is the from-scratch materialization."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.streaming.incremental import publish_swap

    e = _t(spark, sf_dir, "events")["events"]
    media = e.select(
        F.col("event_type").alias("provider"),
        F.col("event_id").cast("string").alias("foreign_identifier"),
        F.col("value").alias("metric"),
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_pop_recreate")
    shutil.rmtree(root, ignore_errors=True)  # the DROP
    t = CowTable.create(
        spark, os.path.join(root, "media"), media,
        keys=("provider", "foreign_identifier"), target_files=8,
    )
    snap = t.read()
    p = percentile_disc_by_group(snap, ["provider"], "metric", 0.85)
    c = popularity_constants(p, 0.85)
    scored = standardized_popularity(snap, c, ["provider"], "metric")
    publish_swap(scored, root, "pop_recreate_scored", spark)
    view = spark.table("pop_recreate_scored")
    summary = view.groupBy("provider").agg(
        F.round(F.max("constant"), 6).alias("constant"),
        F.count(F.lit(1)).alias("n_scored"),
        F.round(F.avg("standardized_popularity"), 6).alias("avg_score"),
        F.round(F.max("standardized_popularity"), 6).alias("max_score"),
    )
    raw = c.select("provider", F.round("raw_value", 4).alias("raw_value"))
    return summary.join(F.broadcast(raw), "provider").select(
        "provider", "raw_value", "constant", "n_scored", "avg_score", "max_score"
    )


@register("pipeline_popularity_refresh_pruned", _POP_SUMMARY_ORACLE)
def pipeline_popularity_refresh_pruned(spark, sf_dir):
    """Incremental popularity refresh with PROVIDER PRUNING: the scored
    table lives provider-partitioned on disk; a batch of late events
    for ONE provider triggers a refresh that reads and rewrites ONLY
    that provider's partition (popularity_refresh_pruned — partition-
    pruned scan, dynamic partition overwrite). The other providers'
    files are never read; the plan pin in tests/test_plan_shapes.py
    asserts it from the operator's files_read report. The ORACLE IS
    UNCHANGED from a full recompute: non-held-out providers' v1 scores
    already equal the full-data answer, and the refreshed provider
    converges to it — pruning is physical, not semantic."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.popularity import (
        popularity_refresh_pruned,
    )

    e = _t(spark, sf_dir, "events")["events"]
    allr = e.select(
        F.col("event_type").alias("provider"),
        F.col("event_id").alias("event_id"),
        F.col("value").alias("metric"),
    )
    target = allr.select(F.min("provider")).head()[0]  # deterministic pick
    late = allr.filter(
        (F.col("provider") == target) & (F.col("event_id") % 5 == 0)
    )
    initial = allr.filter(
        ~((F.col("provider") == target) & (F.col("event_id") % 5 == 0))
    )
    p = percentile_disc_by_group(initial, ["provider"], "metric", 0.85)
    c = popularity_constants(p, 0.85)
    v1 = (
        standardized_popularity(initial, c, ["provider"], "metric")
        .join(F.broadcast(c.select("provider", "raw_value")), ["provider"], "left")
        .select(
            "event_id", "metric", "raw_value", "constant",
            "standardized_popularity", "provider",
        )
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_pop_pruned")
    shutil.rmtree(root, ignore_errors=True)
    v1.write.partitionBy("provider").parquet(root)
    popularity_refresh_pruned(
        spark, root, late, "provider", "event_id", "metric"
    )
    final = spark.read.parquet(root)
    summary = final.groupBy("provider").agg(
        F.round(F.max("raw_value"), 4).alias("raw_value"),
        F.round(F.max("constant"), 6).alias("constant"),
        F.count(F.lit(1)).alias("n_scored"),
        F.round(F.avg("standardized_popularity"), 6).alias("avg_score"),
        F.round(F.max("standardized_popularity"), 6).alias("max_score"),
    )
    return summary.select(
        "provider", "raw_value", "constant", "n_scored", "avg_score", "max_score"
    )


# --- the iNaturalist bulk load, end to end ---------------------------------
#
# The reference's largest batch pipeline (inaturalist.py:101-158 +
# provider_csv_load_scripts/inaturalist/transformed_table.template.sql):
# PHOTOS (~120M) ⋈ OBSERVATIONS (~70M) ⋈ OBSERVERS ⋈ TAXA_ENRICHED ⋈
# LICENSE_CODES, photos with multiple observations dropped via a NOT
# EXISTS against PHOTO_DUPES (transformed_table:69-71), then the standard
# clean + upsert with per-batch statistics consolidated at the end
# (inaturalist.py:160-184). The reference serializes 2M-photo_id batches
# through one Postgres connection (max_active_tis_per_dag=1, median 18
# min/batch — BASELINE.md's ≈1.9k rows/s anchor); here the whole load is
# ONE distributed plan.
#
# Stand-ins: lineitem→photos (photo_id=l_orderkey, so multi-line orders
# are exactly the reference's multi-observation dupes), orders→
# observations, supplier→observers, customer→taxa_enriched (with a
# 'Not assigned' drop analog, taxa.sql:180), a 6-row literal dim→
# LICENSE_CODES (INNER join drops unlicensed photos, the AIR rows).

_INAT_EXT_SQL = """
      CASE WHEN l_quantity >= 48 THEN NULL
           WHEN l_linenumber % 4 = 0 THEN 'JPG'
           WHEN l_linenumber % 4 = 1 THEN 'jpeg'
           WHEN l_linenumber % 4 = 2 THEN 'Png'
           ELSE 'gif' END
"""

_INAT_ORACLE_BODY = f"""
    WITH photos AS (
      SELECT l_orderkey AS photo_id,
             l_suppkey AS observer_id,
             {_INAT_EXT_SQL} AS ext,
             l_returnflag || l_linestatus AS license_code,
             CAST(l_quantity AS INTEGER) AS width,
             l_linenumber * 100 AS height
      FROM lineitem
    ),
    solo AS (
      SELECT * FROM photos
      QUALIFY count(*) OVER (PARTITION BY photo_id) = 1
    ),
    license_codes AS (
      SELECT * FROM (VALUES
        ('AF', 'by',    '4.0', 'https://creativecommons.org/licenses/by/4.0/'),
        ('NF', 'by-nc', '4.0', 'https://creativecommons.org/licenses/by-nc/4.0/'),
        ('NO', 'cc0',   '1.0', 'https://creativecommons.org/publicdomain/zero/1.0/')
      ) AS t(code, license, license_version, license_url)
    ),
    taxa_enriched AS (
      SELECT c_custkey AS taxon_id, c_name AS title,
             lower(c_mktsegment) || ',inaturalist' AS tags
      FROM customer WHERE c_mktsegment <> 'MACHINERY'
    ),
    loaded AS (
      SELECT p.photo_id, p.ext, p.width, p.height,
             lc.license, lc.license_version, lc.license_url,
             s.s_name AS creator, p.observer_id,
             t.title, t.tags
      FROM solo p
      JOIN orders o ON p.photo_id = o.o_orderkey
      JOIN supplier s ON p.observer_id = s.s_suppkey
      JOIN taxa_enriched t ON o.o_custkey = t.taxon_id
      JOIN license_codes lc ON p.license_code = lc.code
    )
"""


def _inat_photos(li, with_dims: bool = True):
    """Shared photos-from-lineitem derivation for the two iNaturalist
    queries (kept in one place so both stay in sync with the oracle CTE
    _INAT_ORACLE_BODY)."""
    ln = F.col("l_linenumber")
    ext = F.when(F.col("l_quantity") >= 48, F.lit(None).cast("string")).otherwise(
        F.when(ln % 4 == 0, "JPG")
        .when(ln % 4 == 1, "jpeg")
        .when(ln % 4 == 2, "Png")
        .otherwise("gif")
    )
    cols = [
        F.col("l_orderkey").alias("photo_id"),
        F.col("l_suppkey").alias("observer_id"),
        ext.alias("ext"),
        F.concat("l_returnflag", "l_linestatus").alias("license_code"),
    ]
    if with_dims:
        cols += [
            F.col("l_quantity").cast("int").alias("width"),
            (ln * 100).alias("height"),
        ]
    photos = li.select(*cols)
    # PHOTO_DUPES NOT-EXISTS (transformed_table:69-71): photos carrying
    # multiple observation records are skipped. A window count partitions
    # by photo_id — the exact key of the observations join downstream.
    return photos.withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("photo_id"))
    ).filter(F.col("__n") == 1).drop("__n")


@register(
    "pipeline_inaturalist_bulk",
    f"""
    {_INAT_ORACLE_BODY}
    SELECT CAST(photo_id AS VARCHAR) AS foreign_identifier,
           'https://www.inaturalist.org/photos/' || CAST(photo_id AS VARCHAR)
             AS foreign_landing_url,
           'https://inaturalist-open-data.s3.amazonaws.com/photos/'
             || CAST(photo_id AS VARCHAR) || '/original.' || ext AS url,
           lower(ext) AS filetype,
           license, license_version, license_url,
           creator,
           'https://www.inaturalist.org/users/' || CAST(observer_id AS VARCHAR)
             AS creator_url,
           title, tags,
           'photograph' AS category,
           'inaturalist' AS provider,
           'inaturalist' AS source,
           'sql_bulk_load' AS ingestion_type,
           width, height
    FROM loaded
    WHERE ext IS NOT NULL
    """,
)
def pipeline_inaturalist_bulk(spark, sf_dir):
    """The reference's iNaturalist bulk load as ONE Catalyst plan
    (transformed_table.template.sql:17-73 + the clean step of
    inaturalist.py:135-144). Where the reference pulls 2M-row photo_id
    ranges one at a time through a single connection — its own measured
    anchor is ~18 min/batch — this declares the whole 5-table join and
    lets AQE pick the physical strategy.

    Scale plan (the shape that must survive 120M photos ⋈ 70M
    observations at 100 TB): the dupes guard is a window count over
    photo_id, which hash-partitions photos by the SAME key the
    observations join needs, so the exchange is reused — photos shuffle
    once, observations shuffle once, and observers/taxa/license_codes
    (≤ a few M rows, license dim is 6 rows) come in as broadcasts with
    zero additional fact movement. No serialized batching, no driver
    loop; batch ranges fall out of partition pruning if the photos
    source is written partitioned on photo_id ranges."""
    t = _t(spark, sf_dir, "lineitem", "orders", "supplier", "customer")
    li, o, s, c = t["lineitem"], t["orders"], t["supplier"], t["customer"]
    solo = _inat_photos(li)

    from openverse_catalog_spark.functions.dims import values_dim

    license_codes = values_dim(
        spark,
        [
            ("AF", "by", "4.0", "https://creativecommons.org/licenses/by/4.0/"),
            ("NF", "by-nc", "4.0", "https://creativecommons.org/licenses/by-nc/4.0/"),
            ("NO", "cc0", "1.0", "https://creativecommons.org/publicdomain/zero/1.0/"),
        ],
        "code string, license string, license_version string, license_url string",
    )
    taxa = c.filter(F.col("c_mktsegment") != "MACHINERY").select(
        F.col("c_custkey").alias("taxon_id"),
        F.col("c_name").alias("title"),
        F.concat(F.lower("c_mktsegment"), F.lit(",inaturalist")).alias("tags"),
    )
    observations = o.select(
        F.col("o_orderkey").alias("observation_uuid"),
        F.col("o_custkey").alias("taxon_id"),
    )

    loaded = (
        solo.join(observations, solo.photo_id == observations.observation_uuid)
        .join(F.broadcast(s), solo.observer_id == s.s_suppkey)
        .join(F.broadcast(taxa), "taxon_id")
        .join(F.broadcast(license_codes), solo.license_code == license_codes.code)
    )
    pid = F.col("photo_id").cast("string")
    return loaded.filter(F.col("ext").isNotNull()).select(
        pid.alias("foreign_identifier"),
        F.concat(F.lit("https://www.inaturalist.org/photos/"), pid).alias(
            "foreign_landing_url"
        ),
        F.concat(
            F.lit("https://inaturalist-open-data.s3.amazonaws.com/photos/"),
            pid,
            F.lit("/original."),
            F.col("ext"),
        ).alias("url"),
        F.lower("ext").alias("filetype"),
        "license",
        "license_version",
        "license_url",
        F.col("s_name").alias("creator"),
        F.concat(
            F.lit("https://www.inaturalist.org/users/"),
            F.col("observer_id").cast("string"),
        ).alias("creator_url"),
        "title",
        "tags",
        F.lit("photograph").alias("category"),
        F.lit("inaturalist").alias("provider"),
        F.lit("inaturalist").alias("source"),
        F.lit("sql_bulk_load").alias("ingestion_type"),
        "width",
        "height",
    )


@register(
    "agg_inaturalist_load_stats",
    f"""
    {_INAT_ORACLE_BODY}
    SELECT count(*) AS loaded,
           count(*) FILTER (WHERE ext IS NULL) AS missing_columns,
           count(*) FILTER (WHERE ext IS NOT NULL)
             - count(DISTINCT photo_id) FILTER (WHERE ext IS NOT NULL)
             AS foreign_id_dup,
           count(DISTINCT photo_id) FILTER (WHERE ext IS NOT NULL)
             - count(DISTINCT 'https://inaturalist-open-data.s3.amazonaws.com/photos/'
                 || CAST(photo_id AS VARCHAR) || '/original.' || ext)
             AS url_dup,
           count(DISTINCT 'https://inaturalist-open-data.s3.amazonaws.com/photos/'
                 || CAST(photo_id AS VARCHAR) || '/original.' || ext) AS upserted
    FROM loaded
    """,
)
def agg_inaturalist_load_stats(spark, sf_dir):
    """consolidate_load_statistics (inaturalist.py:160-184) without the
    per-batch xcom plumbing: loaded / missing_columns / foreign_id_dup /
    url_dup-as-remainder / upserted in ONE aggregation pass over the
    transformed frame — the reference sums these per 2M-row batch; a
    distributed engine computes them globally with a single map-side
    partial agg (no second scan, no driver loop)."""
    # Rebuild the pre-clean frame (loaded includes the missing-url rows;
    # the observers join is FK-total so it cannot change counts and is
    # omitted — the oracle keeps it, proving that equivalence).
    t = _t(spark, sf_dir, "lineitem", "orders", "supplier", "customer")
    li, o, c = t["lineitem"], t["orders"], t["customer"]
    solo = _inat_photos(li, with_dims=False)
    lic_codes = ["AF", "NF", "NO"]
    taxa_keys = c.filter(F.col("c_mktsegment") != "MACHINERY").select(
        F.col("c_custkey").alias("taxon_id")
    )
    observations = o.select(
        F.col("o_orderkey").alias("observation_uuid"),
        F.col("o_custkey").alias("taxon_id"),
    )
    loaded = (
        solo.filter(F.col("license_code").isin(lic_codes))
        .join(observations, solo.photo_id == observations.observation_uuid)
        .join(F.broadcast(taxa_keys), "taxon_id")
    )
    url = F.concat(
        F.lit("https://inaturalist-open-data.s3.amazonaws.com/photos/"),
        F.col("photo_id").cast("string"),
        F.lit("/original."),
        F.col("ext"),
    )
    ok = F.col("ext").isNotNull()
    return loaded.agg(
        F.count(F.lit(1)).alias("loaded"),
        F.count(F.when(~ok, 1)).alias("missing_columns"),
        (
            F.count(F.when(ok, 1))
            - F.countDistinct(F.when(ok, F.col("photo_id")))
        ).alias("foreign_id_dup"),
        (
            F.countDistinct(F.when(ok, F.col("photo_id")))
            - F.countDistinct(F.when(ok, url))
        ).alias("url_dup"),
        F.countDistinct(F.when(ok, url)).alias("upserted"),
    )


@register(
    "agg_anomaly_mad",
    """
    WITH med AS (
      SELECT event_type, quantile_disc(value, 0.5) AS med
      FROM events GROUP BY 1
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS ad
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (SELECT event_type, quantile_disc(ad, 0.5) AS mad FROM dev GROUP BY 1)
    SELECT d.event_id, d.event_type,
           round(d.value, 2) AS value,
           round(d.med, 2) AS med,
           round(m2.mad, 2) AS mad
    FROM dev d JOIN mad m2 USING (event_type)
    WHERE m2.mad > 0 AND d.ad > 3 * m2.mad
    """,
)
def agg_anomaly_mad(spark, sf_dir):
    """Robust anomaly detection: flag events whose value deviates from
    their type's median by more than 3x the median absolute deviation —
    the outlier rule that mean/stddev z-scores get wrong on skewed
    metrics (the outliers inflate the stddev that is supposed to catch
    them; median and MAD have 50% breakdown). Both statistics are exact
    sort-based percentiles (percentile_disc_multi, huge-group safe) and
    both join back as broadcast dimensions — two bounded shuffles on the
    group key, the fact table itself never sorts globally. The deviation
    compare is raw double arithmetic on both engines, so even the
    boundary rows gate exactly."""
    from openverse_catalog_spark.operators.popularity import percentile_disc_multi

    e = _t(spark, sf_dir, "events")["events"]
    med = percentile_disc_multi(e, ["event_type"], "value", {"med": 0.5})
    dev = (
        e.join(F.broadcast(med), "event_type")
        .withColumn("__ad", F.abs(F.col("value") - F.col("med")))
    )
    mad = percentile_disc_multi(dev, ["event_type"], "__ad", {"mad": 0.5})
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.col("__ad") > 3 * F.col("mad")))
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round("med", 2).alias("med"),
            F.round("mad", 2).alias("mad"),
        )
    )


@register(
    "join_scd2_point_in_time",
    """
    WITH marked AS (
      SELECT user_id, event_type AS state, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events WHERE event_type IN ('click', 'view', 'error')
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
      SELECT user_id, state, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM marked
    ),
    spans AS (
      SELECT user_id, state, min(ts) AS valid_from
      FROM islands GROUP BY user_id, state, grp
    ),
    dim AS (
      SELECT user_id, state, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to
      FROM spans
    )
    SELECT p.event_id, p.user_id, d.state,
           epoch_us(d.valid_from) AS valid_from_us
    FROM events p
    JOIN dim d
      ON d.user_id = p.user_id
     AND p.ts >= d.valid_from
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    WHERE p.event_type = 'purchase'
    """,
)
def join_scd2_point_in_time(spark, sf_dir):
    """Point-in-time join against a versioned dimension: each purchase
    picks the activity-state span (click/view/error SCD2 history) valid
    AT its timestamp — interval containment against type-2 validity
    ranges, the lookup every time-correct feature/training pipeline
    needs (joining today's dimension onto yesterday's facts leaks the
    future). The span dimension is per-user bounded, so the plan is ONE
    user_id equi-join shuffle with the interval predicate as a post-join
    filter; the history build itself reuses the single-shuffle
    gaps-and-islands pass of merge_scd2_history."""
    e = _t(spark, sf_dir, "events")["events"]
    status = e.filter(F.col("event_type").isin("click", "view", "error"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = status.select(
        "user_id",
        F.col("event_type").alias("state"),
        "ts",
        "event_id",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0).alias("chg"),
    )
    islands = marked.withColumn("grp", F.sum("chg").over(run))
    spans = islands.groupBy("user_id", "state", "grp").agg(
        F.min("ts").alias("valid_from")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    dim = spans.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return (
        purchases.join(dim, "user_id")
        .filter(
            (F.col("ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
        )
        .select(
            "event_id",
            "user_id",
            "state",
            F.unix_micros("valid_from").alias("valid_from_us"),
        )
    )


@register(
    "window_rolling_median",
    """
    SELECT event_id, user_id,
           round(value, 2) AS value,
           round(quantile_disc(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 2) AS med5
    FROM events
    """,
)
def window_rolling_median(spark, sf_dir):
    """Trailing 5-event rolling MEDIAN per user (lower median, exactly
    quantile_disc(0.5) over the frame) — the robust smoother for spiky
    metrics where a rolling mean chases outliers. Spark has no windowed
    median builtin; the frame is materialized as a <=5-element array
    (collect_list over a ROWS frame), sorted, and indexed at ceil(n/2) —
    O(k log k) per row with k bounded by the frame, one user_id shuffle
    shared with any other same-spec window."""
    e = _t(spark, sf_dir, "events")["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    frame = F.array_sort(F.collect_list("value").over(w))
    med = F.element_at(frame, F.ceil(F.size(frame) / 2).cast("int"))
    return e.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        F.round(med, 2).alias("med5"),
    )


@register(
    "agg_source_concentration",
    """
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c)
    SELECT count(*) AS n_sources,
           round(sum((n / total) * (n / total)), 6) AS hhi,
           round(max(n / total), 6) AS top_share
    FROM c, t
    """,
)
def agg_source_concentration(spark, sf_dir):
    """Corpus concentration diagnostics: Herfindahl-Hirschman index and
    top-source share over the per-source document counts — the one-row
    report that says whether the corpus is dominated by a single
    provider before mixing (domain_mix's input question). Two bounded
    aggregations: a map-side-combined groupBy on source, then a
    broadcast scalar total folded into one final k-row agg."""
    d = _t(spark, sf_dir, "documents")["documents"]
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").cast("double").alias("total"))
    share = F.col("n") / F.col("total")
    return (
        c.crossJoin(F.broadcast(t))
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.round(F.sum(share * share), 6).alias("hhi"),
            F.round(F.max(share), 6).alias("top_share"),
        )
    )


@register("pipeline_popularity_refresh_cdf", _POP_SUMMARY_ORACLE)
def pipeline_popularity_refresh_cdf(spark, sf_dir):
    """Popularity refresh driven by the CHANGE DATA FEED: the canonical
    media table is a CowTable whose v1 carries STALE metrics for a
    held-out slice of one provider; a MERGE commit (v2) re-delivers the
    true metrics, and ``popularity_refresh_cdf`` consumes
    ``read_changes(1, 2)`` — reading only the files the merge rewrote —
    to rescore exactly the changed provider's partition. THE ORACLE IS
    UNCHANGED from the full recompute (_POP_SUMMARY_ORACLE): after the
    CDF-driven repair the scored table must equal scoring the true
    media rows outright. This is the reference's scheduled popularity
    refresh (popularity/sql.py:286-298, full matview recompute) as an
    O(delta) incremental consumer."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.popularity import (
        popularity_refresh_cdf,
    )
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec, Datatype, UpsertStrategy,
    )

    e = _t(spark, sf_dir, "events")["events"]
    media = e.select(
        F.col("event_type").alias("provider"),
        F.col("event_id").cast("string").alias("foreign_identifier"),
        F.col("value").alias("metric"),
    )
    target = media.select(F.min("provider")).head()[0]
    stale_cond = (F.col("provider") == target) & (
        F.col("foreign_identifier").cast("long") % 5 == 0
    )
    # v1: the held-out slice carries a WRONG metric (value + 7)
    initial = media.withColumn(
        "metric",
        F.when(stale_cond, F.col("metric") + 7).otherwise(F.col("metric")),
    )
    late = media.filter(stale_cond)  # the true re-delivery
    root = os.path.join(tempfile.gettempdir(), "spark_graft_pop_cdf")
    shutil.rmtree(root, ignore_errors=True)
    t = CowTable.create(
        spark, os.path.join(root, "media"), initial,
        keys=("provider", "foreign_identifier"), target_files=8,
    )
    scored_path = os.path.join(root, "scored")
    p = percentile_disc_by_group(t.read(), ["provider"], "metric", 0.85)
    c = popularity_constants(p, 0.85)
    v1_scored = standardized_popularity(
        t.read(), c, ["provider"], "metric"
    ).select("provider", "foreign_identifier", "metric",
             "standardized_popularity")
    v1_scored.write.partitionBy("provider").parquet(scored_path)
    cols = [
        ColumnSpec("provider", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("foreign_identifier", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("metric", Datatype.double),
    ]
    t.merge(late, cols, deterministic=True)  # v2: the true metrics land
    rep = popularity_refresh_cdf(
        spark, scored_path, t, from_version=1,
        group_col="provider", id_col="foreign_identifier",
        metric_col="metric",
    )
    assert rep["changed"] == [target] and rep["to_version"] == 2
    final = spark.read.parquet(scored_path)
    # recompute constants over the repaired rows for the report shape
    pf = percentile_disc_by_group(final, ["provider"], "metric", 0.85)
    cf = popularity_constants(pf, 0.85)
    summary = final.groupBy("provider").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.round(F.avg("standardized_popularity"), 6).alias("avg_score"),
        F.round(F.max("standardized_popularity"), 6).alias("max_score"),
    )
    return summary.join(
        F.broadcast(
            cf.select(
                "provider",
                F.round("raw_value", 4).alias("raw_value"),
                F.round("constant", 6).alias("constant"),
            )
        ),
        "provider",
    ).select(
        "provider", "raw_value", "constant", "n_scored",
        "avg_score", "max_score",
    )
