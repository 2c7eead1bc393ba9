"""Advanced window / reshaping / statistical aggregates.

The reference's window surface stops at ROWS frames and DISTINCT ON
(SURVEY §2.6); a general analytics engine also needs event-time RANGE
frames, distribution ranks, pivot/unpivot reshaping, and the regression
aggregate family. Each query here is one shuffle (or zero for the
row-local reshapes) and every floating aggregate is rounded so the
DuckDB oracle hash-matches despite summation-order differences.

Scale notes (100 TB posture) are in each docstring: RANGE frames and
rank windows partition by a high-cardinality key (user/customer), so
state per task is bounded by the largest single key's rows; pivots use
an explicit value list so the plan is static (no discovery job) and the
output width is fixed; unpivot is a row-local Expand, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from openverse_catalog_spark.plans.analytics import _t, register

_7D_US = 7 * 86400 * 1_000_000  # seven days in microseconds


@register(
    "window_time_range_frame",
    """
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_7d,
           round(sum(value) OVER w, 2) AS sum_7d
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '7' DAY PRECEDING AND CURRENT ROW)
    """,
)
def window_time_range_frame(spark, sf_dir):
    """Event-time RANGE frame: trailing 7-day running count/sum per user.

    Unlike the reference's only analytic window (ROWS frame,
    inaturalist/taxa.sql:125-128), this frame is defined on *event time*,
    so late/duplicate timestamps land in the correct window regardless of
    row order. Spark has no interval RANGE frame over timestamps, so the
    idiomatic rewrite orders by ``unix_micros(ts)`` (exact, no precision
    loss) with a microsecond rangeBetween — same inclusive bounds as the
    SQL ``RANGE BETWEEN INTERVAL ... PRECEDING``. One shuffle on user_id;
    per-task window state is bounded by one user's events."""
    e = _t(spark, sf_dir, "events")["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-_7D_US, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_7d"),
        F.round(F.sum("value").over(w), 2).alias("sum_7d"),
    )


@register(
    "window_rank_distribution",
    """
    SELECT c_custkey, c_mktsegment,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd,
           round(first_value(c_acctbal) OVER
                 (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
             AS seg_top_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_rank_distribution(spark, sf_dir):
    """Distribution ranks (percent_rank / cume_dist) plus a full-frame
    first_value, all sharing ONE c_mktsegment shuffle — Spark collapses
    same-spec windows into a single Window operator, and the differing
    frame on first_value still reuses the same sort order. Ties broken
    by c_custkey so ranks are deterministic on both engines."""
    c = _t(spark, sf_dir, "customer")["customer"]
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_top = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(F.first("c_acctbal").over(w_top), 2).alias("seg_top_bal"),
    )


_STATUSES = ["F", "O", "P"]


@register(
    "pivot_priority_status",
    """
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS total_F,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS total_O,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS total_P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_priority_status(spark, sf_dir):
    """Pivot (long -> wide): order totals per priority x status.

    The status list is passed explicitly, so Spark skips the
    distinct-values discovery job and the plan is a single hash
    aggregate with conditional sums — one shuffle on the grouping key,
    fixed output width. At 100 TB an implicit pivot would first scan the
    fact table just to learn the column set; never do that."""
    o = _t(spark, sf_dir, "orders")["orders"]
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", _STATUSES)
        .agg(F.sum("o_totalprice"))
    )
    return wide.select(
        "o_orderpriority",
        *[F.round(F.col(s), 2).alias(f"total_{s}") for s in _STATUSES],
    )


@register(
    "unpivot_part_measures",
    """
    SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice', CAST(p_retailprice AS DOUBLE) FROM part
    """,
)
def unpivot_part_measures(spark, sf_dir):
    """Unpivot (wide -> long) via ``unpivot`` — a row-local Expand
    operator: each input row emits one row per measure with NO shuffle
    and no second scan (the UNION ALL oracle form reads the table twice;
    the Spark plan reads it once). This is the standard shape for
    feeding per-column metric pipelines from a wide table."""
    p = _t(spark, sf_dir, "part")["part"]
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "measure", "val")


@register(
    "agg_regression_stats",
    """
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
           round(covar_samp(l_extendedprice, l_quantity), 2) AS price_qty_covar,
           round(stddev_samp(l_discount), 6) AS discount_sd,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS price_per_qty,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS price_at_zero
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_regression_stats(spark, sf_dir):
    """Statistical aggregate family (corr / covar / stddev / OLS slope +
    intercept) per return flag — all are algebraic aggregates, so Spark
    computes them map-side-partial in the SAME single hash aggregate as
    a plain sum: one shuffle of 3 grouping keys x a few moments, no
    second pass. Rounded because moment summation order differs between
    engines at the last ulp."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias(
            "price_qty_covar"
        ),
        F.round(F.stddev_samp("l_discount"), 6).alias("discount_sd"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias(
            "price_per_qty"
        ),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
            "price_at_zero"
        ),
    )


@register(
    "agg_value_histogram",
    """
    SELECT CAST(floor(value / 25) AS BIGINT) AS bin,
           count(*) AS n,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi
    FROM events GROUP BY 1
    """,
)
def agg_value_histogram(spark, sf_dir):
    """Fixed-width histogram of event values — the scalable histogram
    shape: bucket id is a pure expression (no sort, no percentile
    state), then an ordinary partial-agg groupBy on a bounded key space.
    At 100 TB this is the ONLY histogram that stays one cheap shuffle;
    equi-depth variants need a quantile pass first."""
    e = _t(spark, sf_dir, "events")["events"]
    return (
        e.groupBy(F.floor(F.col("value") / 25).alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


# --- ordered conversion funnel ---------------------------------------------


@register(
    "window_conversion_funnel",
    """
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purch
      FROM events GROUP BY user_id
    )
    SELECT count(*) FILTER (WHERE t_view IS NOT NULL) AS viewed,
           count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view) AS clicked_after_view,
           count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
                              AND t_purch > t_click) AS purchased_after_click,
           round(avg(epoch_us(t_purch - t_click) / 1e6)
                 FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
                           AND t_purch > t_click), 2) AS avg_click_to_purchase_s
    FROM firsts
    """,
)
def window_conversion_funnel(spark, sf_dir):
    """Ordered conversion funnel: first-view -> first-click -> first-
    purchase per user, each stage requiring event-time order, plus the
    mean click->purchase latency of full converters. ONE conditional-min
    aggregation per user (map-side partials, single user_id shuffle)
    replaces the three self-joins a naive funnel runs — the sequence-
    analytics staple for behavioral/training-data telemetry."""
    e = _t(spark, sf_dir, "events")["events"]
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purch"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purch") > F.col("t_click"))
    return firsts.agg(
        F.count(F.when(viewed, 1)).alias("viewed"),
        F.count(F.when(clicked, 1)).alias("clicked_after_view"),
        F.count(F.when(purchased, 1)).alias("purchased_after_click"),
        F.round(
            F.avg(
                F.when(
                    purchased,
                    (F.unix_micros("t_purch") - F.unix_micros("t_click")) / 1e6,
                )
            ),
            2,
        ).alias("avg_click_to_purchase_s"),
    )


# --- gap fill: last observation carried forward ----------------------------


@register(
    "window_locf_fill",
    """
    WITH src AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_id,
           round(coalesce(
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             -1.0), 2) AS filled
    FROM src
    """,
)
def window_locf_fill(spark, sf_dir):
    """Last-observation-carried-forward gap fill (IGNORE NULLS running
    last_value): nulled readings take the most recent non-null value of
    the same user in event-time order — the telemetry/time-series
    imputation every sensor/metrics pipeline needs. One user_id shuffle;
    the frame is cumulative so state per group is a single value."""
    e = _t(spark, sf_dir, "events")["events"]
    src = e.select(
        "user_id", "event_id", "ts",
        F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return src.select(
        "event_id",
        F.round(
            F.coalesce(F.last("v", ignorenulls=True).over(w), F.lit(-1.0)), 2
        ).alias("filled"),
    )


# --- gap fill: bucket generation + linear interpolation --------------------


@register(
    "window_gapfill_interpolate",
    """
    WITH obs AS (
      SELECT user_id, date_trunc('hour', ts) AS b,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY user_id, date_trunc('hour', ts)
    ),
    nxt AS (
      SELECT user_id, b, cents,
             lead(b) OVER (PARTITION BY user_id ORDER BY b) AS nb,
             lead(cents) OVER (PARTITION BY user_id ORDER BY b) AS nc
      FROM obs
    ),
    gaps AS (
      SELECT user_id, b, cents, nb, nc,
             CASE WHEN nb IS NULL THEN 0
                  ELSE datediff('hour', b, nb) END AS gap
      FROM nxt
    ),
    filled AS (
      SELECT user_id, b AS bucket, CAST(cents AS DOUBLE) AS filled,
             'observed' AS src
      FROM gaps
      UNION ALL
      SELECT user_id, b + g * INTERVAL 1 HOUR AS bucket,
             cents + (nc - cents) * g / gap AS filled,
             'interpolated' AS src
      FROM gaps, unnest(range(1, gap)) AS t(g)
      WHERE gap > 1
    )
    SELECT user_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           filled, src
    FROM filled
    """,
)
def window_gapfill_interpolate(spark, sf_dir):
    """Time-bucket gap fill with linear interpolation (Timescale's
    ``time_bucket_gapfill`` + ``interpolate``, no reference analog —
    the telemetry staple for regularizing event series before training
    or anomaly scoring): hourly per-user totals, with every missing
    interior hour synthesized on the line between its observed
    neighbors.

    SCALE: ONE window shuffle on (user_id) total. The hourly rollup is
    a keyed groupBy; the fill is row-local generation — each observed
    row looks at its lead() neighbor and emits the missing buckets
    between them from a sequence/transform expression, so there is no
    calendar dimension to cross-join, no second join back, and the
    output is linear in observed+filled rows. The series rides as
    integer cents (exact sums, order-free) and interpolates with one
    int-by-int division per filled bucket, so results are
    bit-deterministic across partitionings."""
    e = _t(spark, sf_dir, "events")["events"]
    obs = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("b")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents")
    )
    w = Window.partitionBy("user_id").orderBy("b")
    nxt = obs.select(
        "user_id", "b", "cents",
        F.lead("b").over(w).alias("nb"),
        F.lead("cents").over(w).alias("nc"),
    )
    gap = F.coalesce(F.expr("timestampdiff(HOUR, b, nb)"), F.lit(0))
    observed = F.array(
        F.struct(
            F.col("b").alias("bucket"),
            F.col("cents").cast("double").alias("filled"),
            F.lit("observed").alias("src"),
        )
    )
    interpolated = F.transform(
        F.sequence(F.lit(1), gap - 1),
        lambda g: F.struct(
            F.timestamp_seconds(
                F.unix_timestamp("b") + g.cast("long") * 3600
            ).alias("bucket"),
            (
                F.col("cents")
                + (F.col("nc") - F.col("cents")) * g.cast("long") / gap
            ).alias("filled"),
            F.lit("interpolated").alias("src"),
        ),
    )
    entries = F.concat(
        observed,
        F.when(gap > 1, interpolated).otherwise(
            F.array().cast(
                "array<struct<bucket:timestamp,filled:double,src:string>>"
            )
        ),
    )
    return (
        nxt.select("user_id", F.explode(entries).alias("e"))
        .select(
            "user_id",
            F.date_format("e.bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            F.col("e.filled").alias("filled"),
            F.col("e.src").alias("src"),
        )
    )


# --- event funnel / cohort retention / counter rate ------------------------


@register(
    "agg_event_funnel",
    f"""
    WITH ev AS (SELECT user_id, epoch_us(ts) AS t, event_type
                FROM events WHERE user_id IS NOT NULL),
    u AS (SELECT DISTINCT user_id FROM ev),
    s1 AS (SELECT user_id, min(t) AS t1 FROM ev
           WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.t) AS t2
           FROM ev e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.t > s1.t1
             AND e.t <= s1.t1 + {_7D_US}
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.t) AS t3
           FROM ev e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.t > s2.t2
             AND e.t <= s1.t1 + {_7D_US}
           GROUP BY e.user_id),
    lv AS (SELECT u.user_id,
                  CASE WHEN s3.user_id IS NOT NULL THEN 3
                       WHEN s2.user_id IS NOT NULL THEN 2
                       WHEN s1.user_id IS NOT NULL THEN 1
                       ELSE 0 END AS level
           FROM u LEFT JOIN s1 USING (user_id)
                  LEFT JOIN s2 USING (user_id)
                  LEFT JOIN s3 USING (user_id))
    SELECT level, count(*) AS users FROM lv GROUP BY level
    """,
)
def agg_event_funnel(spark, sf_dir):
    """Ordered-step FUNNEL (ClickHouse's windowFunnel, Amplitude's core
    query): per user, the deepest signup -> click -> purchase prefix
    completed IN ORDER within 7 days of the signup. Spark-first shape:
    ONE groupBy(user) collects the user's (ts, step) events sorted
    in-row, and a single aggregate() fold walks them — no self-joins,
    no per-step shuffle; a user's funnel state is 3 longs regardless of
    event count. The oracle computes the same levels via chained
    min()-CTEs (provably equivalent: each fold step takes the first
    qualifying event in time order, which IS that step's min), so a
    pass pins the fold against an independent formulation. SCALE: one
    keyed shuffle; per-task state bounded by the largest single user's
    events."""
    ev = (
        _t(spark, sf_dir, "events")["events"]
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.unix_micros("ts").alias("t"),
            F.when(F.col("event_type") == "signup", 1)
            .when(F.col("event_type") == "click", 2)
            .when(F.col("event_type") == "purchase", 3)
            .otherwise(0)
            .alias("step"),
        )
    )
    evs = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("t"), F.col("step")))
        ).alias("evs")
    )
    state0 = F.struct(
        F.lit(None).cast("long").alias("t1"),
        F.lit(None).cast("long").alias("t2"),
        F.lit(None).cast("long").alias("t3"),
    )

    def fold(acc, e):
        deadline = acc["t1"] + F.lit(_7D_US)
        take1 = acc["t1"].isNull() & (e["step"] == 1)
        take2 = (
            acc["t1"].isNotNull() & acc["t2"].isNull()
            & (e["step"] == 2) & (e["t"] > acc["t1"]) & (e["t"] <= deadline)
        )
        take3 = (
            acc["t2"].isNotNull() & acc["t3"].isNull()
            & (e["step"] == 3) & (e["t"] > acc["t2"]) & (e["t"] <= deadline)
        )
        return F.struct(
            F.when(take1, e["t"]).otherwise(acc["t1"]).alias("t1"),
            F.when(take2, e["t"]).otherwise(acc["t2"]).alias("t2"),
            F.when(take3, e["t"]).otherwise(acc["t3"]).alias("t3"),
        )

    done = evs.select(
        "user_id", F.aggregate(F.col("evs"), state0, fold).alias("f")
    ).select(
        F.when(F.col("f.t3").isNotNull(), 3)
        .when(F.col("f.t2").isNotNull(), 2)
        .when(F.col("f.t1").isNotNull(), 1)
        .otherwise(0)
        .alias("level")
    )
    return done.groupBy("level").agg(F.count(F.lit(1)).alias("users"))


@register(
    "agg_cohort_retention",
    """
    WITH ev AS (SELECT user_id,
                       CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk
                FROM events WHERE user_id IS NOT NULL),
    cohort AS (SELECT user_id, min(wk) AS wk0 FROM ev GROUP BY user_id)
    SELECT c.wk0 AS cohort_week,
           e.wk - c.wk0 AS weeks_since,
           count(DISTINCT e.user_id) AS active_users
    FROM ev e JOIN cohort c USING (user_id)
    GROUP BY c.wk0, e.wk - c.wk0
    """,
)
def agg_cohort_retention(spark, sf_dir):
    """COHORT RETENTION matrix: users grouped by first-activity week,
    counted distinct in each subsequent week — the engagement triangle
    every analytics stack draws. Week indices are pure integer
    arithmetic on epoch micros (no calendar/timezone function to
    disagree on). Shape: one groupBy(user) for cohorts (broadcast back
    — it is one row per user), one grouped countDistinct; both shuffles
    partial-aggregate map-side."""
    ev = (
        _t(spark, sf_dir, "events")["events"]
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            (F.unix_micros("ts") / F.lit(604800000000))
            .cast("long").alias("wk"),
        )
    )
    cohort = ev.groupBy("user_id").agg(F.min("wk").alias("wk0"))
    return (
        ev.join(F.broadcast(cohort), on="user_id")
        .groupBy(
            F.col("wk0").alias("cohort_week"),
            (F.col("wk") - F.col("wk0")).alias("weeks_since"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@register(
    "window_counter_rate",
    """
    WITH ord AS (SELECT user_id, value,
                        lag(value) OVER (PARTITION BY user_id
                                         ORDER BY epoch_us(ts), event_id)
                          AS prev
                 FROM events
                 WHERE user_id IS NOT NULL AND value IS NOT NULL)
    SELECT user_id,
           round(sum(CASE WHEN prev IS NULL THEN 0
                          WHEN value >= prev THEN value - prev
                          ELSE value END), 6) AS total_increase,
           count(CASE WHEN prev IS NOT NULL AND value < prev THEN 1 END)
             AS resets
    FROM ord GROUP BY user_id
    """,
)
def window_counter_rate(spark, sf_dir):
    """MONOTONIC-COUNTER delta with reset detection (Timescale's
    counter_agg, Prometheus's increase()): per user, total counter
    increase where a value drop means the counter restarted from zero
    (the drop contributes the new value, not a negative delta). One
    window shuffle keyed by user, ties broken by event_id so the lag
    order — and therefore every delta — is deterministic across
    partitionings and engines."""
    from pyspark.sql import Window as W

    ev = (
        _t(spark, sf_dir, "events")["events"]
        .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .select("user_id", "event_id", "value",
                F.unix_micros("ts").alias("t"))
    )
    w = W.partitionBy("user_id").orderBy("t", "event_id")
    d = ev.withColumn("prev", F.lag("value").over(w))
    inc = (
        F.when(F.col("prev").isNull(), F.lit(0.0))
        .when(F.col("value") >= F.col("prev"),
              F.col("value") - F.col("prev"))
        .otherwise(F.col("value"))
    )
    reset = (
        F.col("prev").isNotNull() & (F.col("value") < F.col("prev"))
    ).cast("long")
    return d.groupBy("user_id").agg(
        F.round(F.sum(inc), 6).alias("total_increase"),
        F.sum(reset).alias("resets"),
    )
