"""Unit + plan tests for the temporal join operators (operators/joins.py).

Golden-value edge cases pandas-style merge_asof semantics demand:
equal-timestamp inclusivity vs strict, tolerance cutoff, keys with no
right rows; range-join boundary openness (lower exclusive, upper
inclusive) and bucket-straddling matches. Plus a physical-plan pin: the
as-of join must cost exactly ONE exchange (the window shuffle) — if it
ever degrades to an inequality join Spark plans a nested loop and this
fails long before the 100 TB run.
"""

from __future__ import annotations

import contextlib
import datetime as dt
import io

from pyspark.sql import functions as F

from openverse_catalog_spark.operators.joins import asof_join, range_join_bucketed


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _events(spark, rows, cols=("id", "k", "ts")):
    return spark.createDataFrame([tuple(r) for r in rows], list(cols))


def test_asof_picks_latest_at_or_before(spark):
    left = _events(spark, [(1, "a", _ts(100)), (2, "a", _ts(50)), (3, "b", _ts(100))])
    right = _events(
        spark,
        [(10, "a", _ts(40)), (11, "a", _ts(90)), (12, "a", _ts(101)), (13, "c", _ts(1))],
        cols=("rid", "k", "ts"),
    )
    out = {
        r["id"]: (r["rid"], r["_asof_gap_us"])
        for r in asof_join(left, right, on=["k"], right_cols=["rid"]).collect()
    }
    assert out[1] == (11, 10_000_000)  # latest of the two priors
    assert out[2] == (10, 10_000_000)  # rid=11 is in the future
    assert out[3] == (None, None)  # key b has no right rows


def test_asof_equal_ts_inclusive_vs_strict(spark):
    left = _events(spark, [(1, "a", _ts(100))])
    right = _events(spark, [(10, "a", _ts(100))], cols=("rid", "k", "ts"))
    inc = asof_join(left, right, on=["k"], right_cols=["rid"]).collect()[0]
    assert (inc["rid"], inc["_asof_gap_us"]) == (10, 0)
    strict = asof_join(left, right, on=["k"], right_cols=["rid"], strict=True).collect()[0]
    assert strict["rid"] is None


def test_asof_tolerance_nulls_stale_match(spark):
    left = _events(spark, [(1, "a", _ts(100))])
    right = _events(spark, [(10, "a", _ts(10))], cols=("rid", "k", "ts"))
    hit = asof_join(left, right, on=["k"], right_cols=["rid"], tolerance_s=90)
    assert hit.collect()[0]["rid"] == 10
    miss = asof_join(left, right, on=["k"], right_cols=["rid"], tolerance_s=89)
    assert miss.collect()[0]["rid"] is None


def test_asof_plan_single_exchange(spark):
    left = _events(spark, [(1, "a", _ts(100))])
    right = _events(spark, [(10, "a", _ts(10))], cols=("rid", "k", "ts"))
    df = asof_join(left, right, on=["k"], right_cols=["rid"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # formatted mode prints each node in the tree and again in the detail
    # section — count tree entries only
    assert plan.count("Exchange (") == 1, plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_bounds_and_bucket_straddle(spark):
    left = _events(spark, [(1, "a", _ts(0))])
    # gap 0 excluded (lower open), gap 10 inclusive (upper closed),
    # gap 7 crosses the bucket boundary when bucket == window width
    right = _events(
        spark,
        [(10, "a", _ts(0)), (11, "a", _ts(7)), (12, "a", _ts(10)), (13, "a", _ts(11))],
        cols=("rid", "k", "ts"),
    )
    got = sorted(
        r["r_rid"]
        for r in range_join_bucketed(
            left, right, on=["k"], lower_s=0, upper_s=10, right_cols=["rid"]
        ).collect()
    )
    assert got == [11, 12]


def test_range_join_no_duplicate_pairs(spark):
    # right row exactly once per qualifying left row even when the left
    # window spans 2 buckets
    left = _events(spark, [(1, "a", _ts(5)), (2, "a", _ts(6))])
    right = _events(spark, [(10, "a", _ts(9))], cols=("rid", "k", "ts"))
    rows = range_join_bucketed(
        left, right, on=["k"], lower_s=0, upper_s=10, right_cols=["rid"]
    ).collect()
    assert sorted((r["id"], r["r_rid"]) for r in rows) == [(1, 10), (2, 10)]


def test_asof_matches_naive_on_events(spark, sf_dir):
    from openverse_catalog_spark.session import load_tables

    e = load_tables(spark, sf_dir, ["events"])["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    fast = asof_join(
        purchases, clicks, on=["user_id"], right_cols=["click_id"]
    ).select("event_id", "click_id")
    # naive quadratic reference: max-ts click at or before, per purchase
    naive = (
        purchases.alias("p")
        .join(
            clicks.alias("c"),
            (F.col("p.user_id") == F.col("c.user_id"))
            & (F.col("c.ts") <= F.col("p.ts")),
            "left",
        )
        .groupBy("p.event_id")
        .agg(F.max_by("c.click_id", "c.ts").alias("click_id"))
        .select(F.col("event_id"), "click_id")
    )
    assert fast.exceptAll(naive).count() == 0
    assert naive.exceptAll(fast).count() == 0
