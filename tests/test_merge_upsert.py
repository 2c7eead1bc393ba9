"""Upsert MERGE semantics matrix — re-expression of the reference's
``catalog/tests/dags/common/loader/test_sql.py`` acceptance cases
(insert :476-602, newest-non-null replacement :661-891,
does-not-replace-with-nulls :785, meta_data merge :892-1025, tags merge
:1026-1248, duplicate-URL no-merge :1249-1423) against the Spark merge
compiler.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openverse_catalog_spark.operators.merge import (
    distinct_on,
    merge_upsert,
    url_conflict_filter,
)
from openverse_catalog_spark.schemas.columns import (
    ColumnSpec,
    Datatype,
    UpsertStrategy,
)

COLS = [
    ColumnSpec("provider", Datatype.char, required=True, upsert_strategy=UpsertStrategy.no_change),
    ColumnSpec("foreign_identifier", Datatype.char, required=True, upsert_strategy=UpsertStrategy.no_change),
    ColumnSpec("url", Datatype.char, required=True),
    ColumnSpec("title", Datatype.char),
    ColumnSpec("filesize", Datatype.int),
    ColumnSpec("meta_data", Datatype.jsonb_map, upsert_strategy=UpsertStrategy.merge_jsonb_objects),
    ColumnSpec("tags", Datatype.jsonb_tags, upsert_strategy=UpsertStrategy.merge_jsonb_arrays),
    ColumnSpec("removed_from_source", Datatype.bool, upsert_strategy=UpsertStrategy.false),
]

SCHEMA = T.StructType([c.struct_field() for c in COLS])


def mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def row(provider="p", fid="f1", url="http://u/1", title=None, filesize=None,
        meta=None, tags=None, removed=None):
    return (provider, fid, url, title, filesize, meta, tags, removed)


def run_merge(spark, target_rows, source_rows, **kw):
    tgt = mk(spark, target_rows)
    src = mk(spark, source_rows)
    out = merge_upsert(tgt, src, COLS, **kw)
    return {(r["provider"], r["foreign_identifier"]): r.asDict() for r in out.collect()}


def test_insert_new_rows(spark):
    got = run_merge(spark, [], [row(title="hello", filesize=10)])
    assert got[("p", "f1")]["title"] == "hello"
    assert got[("p", "f1")]["filesize"] == 10
    assert got[("p", "f1")]["removed_from_source"] is False


def test_newest_non_null_replaces(spark):
    got = run_merge(
        spark,
        [row(title="old", filesize=1)],
        [row(title="new", filesize=2)],
    )
    assert got[("p", "f1")]["title"] == "new"
    assert got[("p", "f1")]["filesize"] == 2


def test_does_not_replace_with_nulls(spark):
    # reference test_sql.py:785 — EXCLUDED null must not clobber old value
    got = run_merge(
        spark,
        [row(title="old", filesize=1)],
        [row(title=None, filesize=None)],
    )
    assert got[("p", "f1")]["title"] == "old"
    assert got[("p", "f1")]["filesize"] == 1


def test_untouched_rows_kept(spark):
    got = run_merge(
        spark,
        [row(fid="keepme", url="http://u/k", title="kept")],
        [row(fid="newone", url="http://u/n", title="fresh")],
    )
    assert got[("p", "keepme")]["title"] == "kept"
    assert got[("p", "newone")]["title"] == "fresh"


def test_meta_data_merge_new_key_wins(spark):
    # jsonb_strip_nulls(old) || jsonb_strip_nulls(new) — columns.py:42-52
    got = run_merge(
        spark,
        [row(meta={"a": "1", "b": "2", "gone": None})],
        [row(meta={"b": "9", "c": "3", "dead": None})],
    )
    assert got[("p", "f1")]["meta_data"] == {"a": "1", "b": "9", "c": "3"}


def test_meta_data_null_sides(spark):
    got = run_merge(spark, [row(meta=None)], [row(meta={"k": "v"})])
    assert got[("p", "f1")]["meta_data"] == {"k": "v"}
    got = run_merge(spark, [row(meta={"k": "v"})], [row(meta=None)])
    assert got[("p", "f1")]["meta_data"] == {"k": "v"}
    got = run_merge(spark, [row(meta=None)], [row(meta=None)])
    assert got[("p", "f1")]["meta_data"] is None


def test_tags_merge_distinct_union(spark):
    t1 = [Row(name="a", provider="p"), Row(name="b", provider="p")]
    t2 = [Row(name="b", provider="p"), Row(name="c", provider="p")]
    got = run_merge(spark, [row(tags=t1)], [row(tags=t2)])
    names = [t["name"] for t in got[("p", "f1")]["tags"]]
    assert names == ["a", "b", "c"]  # distinct + pinned sort


def test_tags_null_handling(spark):
    t1 = [Row(name="a", provider="p")]
    got = run_merge(spark, [row(tags=None)], [row(tags=t1)])
    assert [t["name"] for t in got[("p", "f1")]["tags"]] == ["a"]
    got = run_merge(spark, [row(tags=t1)], [row(tags=None)])
    assert [t["name"] for t in got[("p", "f1")]["tags"]] == ["a"]


def test_removed_reset_false_on_update(spark):
    got = run_merge(spark, [row(removed=True)], [row()])
    assert got[("p", "f1")]["removed_from_source"] is False


def test_duplicate_url_within_batch_picks_one(spark):
    # DISTINCT ON (url) — loader/sql.py:319; deterministic winner = lowest key
    got = run_merge(
        spark,
        [],
        [
            row(fid="z2", url="http://same", title="loser"),
            row(fid="a1", url="http://same", title="winner"),
        ],
    )
    assert ("p", "a1") in got and ("p", "z2") not in got
    assert got[("p", "a1")]["title"] == "winner"


def test_url_conflict_with_target_skipped(spark):
    # loader/sql.py:322-326 — same url, different fid in target -> skip new row
    got = run_merge(
        spark,
        [row(fid="orig", url="http://taken", title="original")],
        [row(fid="intruder", url="http://taken", title="stolen")],
    )
    assert ("p", "intruder") not in got
    assert got[("p", "orig")]["title"] == "original"


def test_url_conflict_same_fid_merges(spark):
    got = run_merge(
        spark,
        [row(fid="same", url="http://taken", title="old")],
        [row(fid="same", url="http://taken", title="new")],
    )
    assert got[("p", "same")]["title"] == "new"


def test_distinct_on_helper_deterministic(spark):
    df = spark.createDataFrame(
        [("u1", 1, "b"), ("u1", 2, "a"), ("u2", 3, "c")], "k string, n int, v string"
    )
    out = distinct_on(df, ["k"], [F.col("n").desc()]).collect()
    got = {r["k"]: r["n"] for r in out}
    assert got == {"u1": 2, "u2": 3}


def test_pruned_merge_equals_full_merge(spark):
    """merge_upsert_pruned is row-identical to merge_upsert while only
    joining the partitions the batch touches."""
    from openverse_catalog_spark.operators.merge import (
        merge_upsert,
        merge_upsert_pruned,
    )
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    cols = [
        ColumnSpec("provider", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("foreign_identifier", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("title", Datatype.char),
    ]
    target = spark.createDataFrame(
        [("p1", "a", "old-a"), ("p1", "b", "old-b"),
         ("p2", "x", "old-x"), ("p3", "y", "old-y")],
        "provider string, foreign_identifier string, title string",
    )
    source = spark.createDataFrame(
        [("p1", "a", "new-a"), ("p1", "c", "new-c")],
        "provider string, foreign_identifier string, title string",
    )
    kw = dict(dedupe_source_on_url=False, guard_url_conflicts=False,
              status_col="st")
    full = merge_upsert(target, source, cols, **kw)
    pruned = merge_upsert_pruned(target, source, cols, **kw)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, pruned.collect()))
    # p2/p3 rows classify as kept and never enter the merge join
    kept = {r.provider for r in pruned.filter("st = 'kept'").collect()}
    assert {"p2", "p3"} <= kept


def test_pruned_merge_cross_partition_url_guard(spark):
    """With guard_url_conflicts=True (the default), a source row whose url
    already exists in an UNTOUCHED partition under a different natural key
    must be skipped (reference loader/sql.py:322-326): the guard must run
    against the full target, not just the pruned slice."""
    from openverse_catalog_spark.operators.merge import (
        merge_upsert,
        merge_upsert_pruned,
    )
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    cols = [
        ColumnSpec("provider", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("foreign_identifier", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("url", Datatype.char),
        ColumnSpec("title", Datatype.char),
    ]
    target = spark.createDataFrame(
        [("p1", "a", "http://a", "old-a"),
         ("p2", "x", "http://taken", "old-x")],
        "provider string, foreign_identifier string, url string, title string",
    )
    # batch touches only p1; the second row's url is taken by p2/x
    source = spark.createDataFrame(
        [("p1", "a", "http://a", "new-a"),
         ("p1", "intruder", "http://taken", "stolen")],
        "provider string, foreign_identifier string, url string, title string",
    )
    kw = dict(status_col="st")  # guard_url_conflicts defaults to True
    full = merge_upsert(target, source, cols, **kw)
    pruned = merge_upsert_pruned(target, source, cols, **kw)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, pruned.collect()))
    assert pruned.filter("foreign_identifier = 'intruder'").count() == 0
    assert pruned.filter("foreign_identifier = 'a'").collect()[0]["title"] == "new-a"


def test_pruned_merge_requires_partition_key(spark):
    import pytest as _pytest

    from openverse_catalog_spark.operators.merge import merge_upsert_pruned

    with _pytest.raises(ValueError, match="merge key"):
        merge_upsert_pruned(None, None, [], keys=("foreign_identifier",))


def test_post_merge_uniqueness_audit(spark):
    """SURVEY §4 custom #3: the reference enforces (provider, md5(fid))
    and url uniqueness with unique indexes (0003_...sql:46-54); here the
    same invariants are a post-merge validation query — the quality-rule
    compiler over the merge output, one scan."""
    from pyspark.sql import functions as F

    from openverse_catalog_spark.operators.merge import merge_upsert
    from openverse_catalog_spark.operators.quality import (
        not_null,
        quality_report,
        unique,
    )
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    cols = [
        ColumnSpec("provider", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("foreign_identifier", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("url", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("title", Datatype.char),
    ]
    tgt = spark.createDataFrame(
        [("p1", "a", "http://u/1", "t1"), ("p1", "b", "http://u/2", "t2")],
        "provider string, foreign_identifier string, url string, title string",
    )
    # batch carries an in-batch url dup AND a url conflicting with b's
    src = spark.createDataFrame(
        [("p1", "a", "http://u/1", "t1x"),
         ("p1", "c", "http://u/3", "t3"),
         ("p1", "c2", "http://u/3", "dup-url"),
         ("p1", "d", "http://u/2", "conflicts-with-b")],
        "provider string, foreign_identifier string, url string, title string",
    )
    merged = merge_upsert(tgt, src, cols, keys=("provider", "foreign_identifier"))
    audited = merged.withColumn(
        "pk", F.concat_ws("|", "provider", "foreign_identifier")
    )
    report = quality_report(
        audited,
        [unique("pk"), unique("url"), not_null("provider"),
         not_null("foreign_identifier"), not_null("url")],
    )
    failed = [r.check for r in report.collect() if not r.passed]
    assert failed == [], f"post-merge constraint violations: {failed}"


def test_merge_validate_unique_repairs_dirty_target(spark):
    """merge_upsert(validate_unique=True) output satisfies both unique-
    index invariants (0003_...sql:46-54) even when the incoming target
    violates them, with deterministic keepers; uniqueness_report is
    empty afterwards and names the violations before."""
    from openverse_catalog_spark.operators.merge import (
        merge_upsert,
        uniqueness_report,
    )
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    cols = [
        ColumnSpec("provider", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("foreign_identifier", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("url", Datatype.char),
        ColumnSpec("title", Datatype.char),
    ]
    # dirty: key dup (p1,a) x2; url dup http://u across p1/p2; two NULL urls
    target = spark.createDataFrame(
        [("p1", "a", "http://u", "t1"), ("p1", "a", "http://z", "t2"),
         ("p2", "b", "http://u", "t3"),
         ("p1", "n1", None, "t4"), ("p2", "n2", None, "t5")],
        "provider string, foreign_identifier string, url string, title string",
    )
    source = spark.createDataFrame(
        [("p3", "c", "http://new", "t6")],
        "provider string, foreign_identifier string, url string, title string",
    )
    before = uniqueness_report(target).collect()
    assert {(r["constraint"], r["n"]) for r in before} == {
        ("provider_md5_fid", 2), ("url", 2),
    }
    out = merge_upsert(target, source, cols, deterministic=True,
                       validate_unique=True)
    assert uniqueness_report(out).count() == 0
    rows = {(r["provider"], r["foreign_identifier"]): r for r in out.collect()}
    # key dup: keeper is the url-ascending row; url dup: keeper is the
    # key-ascending row -> (p1,a,http://u) survives, (p2,b) is dropped
    assert rows[("p1", "a")]["url"] == "http://u"
    assert ("p2", "b") not in rows
    # NULL urls are exempt from the url constraint
    assert ("p1", "n1") in rows and ("p2", "n2") in rows
    assert ("p3", "c") in rows  # the inserted batch row


def test_validate_unique_with_map_column_and_no_url(spark):
    """enforce_unique must work on the REAL canonical schema: map-typed
    columns (meta_data) are excluded from the keeper ordering (maps are
    unorderable in Spark), and a frame without a url column still gets
    the (provider, foreign_identifier) invariant enforced."""
    from openverse_catalog_spark.operators.merge import enforce_unique

    df = spark.createDataFrame(
        [
            ("p", "f1", "http://u/1", {"k": "a"}),
            ("p", "f1", "http://u/2", {"k": "b"}),
        ],
        "provider string, foreign_identifier string, url string, meta_data map<string,string>",
    )
    out = enforce_unique(df).collect()
    assert len(out) == 1 and out[0]["url"] == "http://u/1"

    no_url = spark.createDataFrame(
        [("p", "f1", "t1"), ("p", "f1", "t2"), ("p", "f2", "t3")],
        "provider string, foreign_identifier string, title string",
    )
    out2 = enforce_unique(no_url, url_col="url")
    rows = {(r["provider"], r["foreign_identifier"]) for r in out2.collect()}
    assert rows == {("p", "f1"), ("p", "f2")} and out2.count() == 2
