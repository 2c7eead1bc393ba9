"""Quality-rule semantics (null handling, FK orphans, single-scan plan)
and skew-operator equivalence (salted distinct / salted join == plain)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from openverse_catalog_spark.operators import quality as q
from openverse_catalog_spark.operators.joins import (
    salted_count_distinct,
    salted_join,
)


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, 10.0, "O", "ok"),
        (2, -5.0, "F", "ok"),      # range violation
        (3, None, "X", "ok"),      # null value -> range violation; bad status
        (None, 20.0, "O", "ok"),   # null key
        (4, 30.0, "O", None),      # null regex target -> violation
        (4, 40.0, "F", "ok"),      # duplicate key
    ]
    return spark.createDataFrame(rows, "k long, v double, st string, s string")


def _report(df, **kw):
    return {r.check: (r.violations, r.passed) for r in q.quality_report(df, **kw).collect()}


def test_rules_count_violations_with_null_semantics(messy):
    rep = _report(
        messy,
        rules=[
            q.not_null("k"),
            q.in_range("v", 0, 100),
            q.in_set("st", ["O", "F"]),
            q.matches("s", "^ok$"),
            q.unique("k"),
        ],
    )
    assert rep["not_null(k)"] == (1, False)
    assert rep["in_range(v)"] == (2, False)   # -5 and NULL both violate
    assert rep["in_set(st)"] == (1, False)
    assert rep["matches(s)"] == (1, False)    # NULL cannot be proven valid
    assert rep["unique(k)"] == (1, False)     # one extra row for k=4


def test_fk_rule_counts_orphans_ignoring_nulls(messy, spark):
    dim = spark.createDataFrame([(1,), (2,), (4,)], "id long")
    rep = _report(messy, rules=[q.not_null("k")], fk_rules=[q.fk("k", dim, "id")])
    assert rep["fk(k)"] == (1, False)  # only k=3 orphans; NULL k is skipped


def test_all_green_report(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 6.0)], "k long, v double")
    rep = _report(df, rules=[q.not_null("k"), q.in_range("v", 0, 10), q.unique("k")])
    assert all(v == (0, True) for v in rep.values())


def test_scalar_rules_share_one_scan(messy):
    df = q.quality_report(
        messy, rules=[q.not_null("k"), q.in_range("v", 0, 100), q.in_set("st", ["O"])]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # three rules, one source relation in the plan (numbered detail blocks)
    import re

    assert len(re.findall(r"^\(\d+\) Scan ", plan, re.M)) == 1


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%) + long tail; values repeat so DISTINCT is non-trivial
    rows = [(("hot" if i % 10 else f"k{i}"), i % 37) for i in range(2000)]
    return spark.createDataFrame(rows, "k string, v long")


def test_salted_distinct_equals_plain(skewed):
    plain = {
        r.k: r.nd
        for r in skewed.groupBy("k").agg(F.countDistinct("v").alias("nd")).collect()
    }
    salted = {
        r.k: r.n_distinct
        for r in salted_count_distinct(skewed, ["k"], "v", 16).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain_join(skewed, spark):
    dim = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k11", "B")], "k string, tag string"
    )
    plain = sorted((r.k, r.v, r.tag) for r in skewed.join(dim, "k").collect())
    salted = sorted(
        (r.k, r.v, r.tag)
        for r in salted_join(skewed, dim, ["k"], salt_src="v", n_salts=8).collect()
    )
    assert salted == plain and len(plain) > 0


def test_snapshot_diff_classifies_and_drops_unchanged(spark):
    from openverse_catalog_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (3, "c", 3.0), (5, "e", 5.0)],
        "k long, s string, v double",
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    # 1 unchanged -> absent; NULL -> value counts as a change (k=3)
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}


def test_snapshot_diff_null_vs_empty_string_distinct(spark):
    from openverse_catalog_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k long, s string")
    new = spark.createDataFrame([(1, "")], "k long, s string")
    got = snapshot_diff(old, new, ["k"], ["s"]).collect()
    assert len(got) == 1 and got[0].change_type == "changed"
