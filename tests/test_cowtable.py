"""Copy-on-write table: MERGE-through-manifest must be row-identical to
the plain merge compiler, skip files whose key range the batch misses,
keep old snapshots readable (time travel), and drop them on vacuum.

Reference contract: the Postgres canonical table + ON CONFLICT upsert
(loader/sql.py:264-332) with the unique-index invariants
(0003_openledger_image_schema.sql:46-54) — re-expressed as a lake-format
table because that is what the target becomes at 100 TB.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from openverse_catalog_spark.operators.cowtable import CowTable
from openverse_catalog_spark.operators.merge import merge_upsert
from tests.test_merge_upsert import COLS, mk, row


def _base_rows():
    # two providers, fids spread so range clustering separates them
    rows = []
    for i in range(40):
        rows.append(
            row(
                provider="flickr" if i < 20 else "met",
                fid=f"f{i:03d}",
                url=f"http://u/{i}",
                title=f"old{i}",
            )
        )
    return rows


def _batch_rows():
    # touches ONLY met (update f020, insert f999)
    return [
        row(provider="met", fid="f020", url="http://u/20", title="updated"),
        row(provider="met", fid="f999", url="http://u/999", title="brand-new"),
    ]


def _canon(df):
    return {
        (r["provider"], r["foreign_identifier"]): r["title"]
        for r in df.collect()
    }


def test_cow_merge_equals_plain_merge(spark, tmp_path):
    tgt = mk(spark, _base_rows())
    src = mk(spark, _batch_rows())
    t = CowTable.create(spark, str(tmp_path / "tbl"), tgt, target_files=4)
    t.merge(src, COLS, deterministic=True)
    expected = merge_upsert(tgt, src, COLS, deterministic=True)
    assert _canon(t.read()) == _canon(expected)


def test_cow_merge_skips_untouched_files(spark, tmp_path):
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=4
    )
    v1_files = {e["path"] for e in t._manifest()["files"]}
    res = t.merge(mk(spark, _batch_rows()), COLS, deterministic=True)
    assert res["version"] == 2 and t.version == 2
    # the flickr-only files never intersect the met batch -> carried over
    assert res["files_skipped"] > 0
    carried = {e["path"] for e in t._manifest()["files"]} & v1_files
    assert len(carried) == res["files_skipped"]
    # and every carried path is still a v1 data file (no rewrite happened)
    assert all(p.startswith("data/v1/") for p in carried)


def test_cow_time_travel_and_history(spark, tmp_path):
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=4
    )
    t.merge(mk(spark, _batch_rows()), COLS, deterministic=True)
    old = _canon(t.read(version=1))
    new = _canon(t.read())
    assert old[("met", "f020")] == "old20" and new[("met", "f020")] == "updated"
    assert ("met", "f999") not in old and new[("met", "f999")] == "brand-new"
    ops = [h["operation"] for h in t.history()]
    assert ops == ["create", "merge"]


def test_cow_url_guard_sees_untouched_partitions(spark, tmp_path):
    """A source row whose url already exists in a file the batch does NOT
    touch must be skipped — the guard runs against the full snapshot,
    not just the rewritten files (merge_upsert_pruned's invariant)."""
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=4
    )
    poison = [row(provider="met", fid="fX", url="http://u/3", title="thief")]
    t.merge(mk(spark, poison), COLS, deterministic=True)
    got = _canon(t.read())
    assert ("met", "fX") not in got  # url belongs to ("flickr","f003")
    assert got[("flickr", "f003")] == "old3"


def test_cow_vacuum_drops_old_versions(spark, tmp_path):
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=4
    )
    t.merge(mk(spark, _batch_rows()), COLS, deterministic=True)
    deleted = t.vacuum(keep_versions=1)
    # v1 files that were rewritten are gone; carried-over v1 files survive
    live = {e["path"] for e in t._manifest()["files"]}
    assert all(p not in live for p in deleted)
    assert len(deleted) > 0
    # current snapshot still fully readable
    assert _canon(t.read())[("met", "f999")] == "brand-new"
    # old manifest dropped
    import os

    assert not os.path.exists(str(tmp_path / "tbl" / "manifests" / "v1.json"))


def test_cow_empty_batch_is_noop(spark, tmp_path):
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=4
    )
    res = t.merge(mk(spark, []), COLS, deterministic=True)
    assert res["version"] == 1 and res["files_rewritten"] == 0
    assert t.version == 1
    assert len(_canon(t.read())) == 40


def test_cow_single_key_table(spark, tmp_path):
    """File skipping works with a single-column merge key."""
    df = spark.createDataFrame(
        [(f"u{i:03d}", f"T{i}") for i in range(20)], "url string, title string"
    )
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    cols = [
        ColumnSpec("url", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("title", Datatype.char),
    ]
    t = CowTable.create(
        spark, str(tmp_path / "tbl1"), df, keys=("url",), target_files=4
    )
    batch = spark.createDataFrame(
        [("u003", "updated"), ("u999", "new")], "url string, title string"
    )
    res = t.merge(batch, cols, deterministic=True, dedupe_source_on_url=False,
                  guard_url_conflicts=False)
    assert res["files_skipped"] > 0
    got = {r["url"]: r["title"] for r in t.read().collect()}
    assert got["u003"] == "updated" and got["u999"] == "new" and len(got) == 21


def test_cow_compact_binpacks_small_files(spark, tmp_path):
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=8
    )
    t.merge(mk(spark, _batch_rows()), COLS, deterministic=True)
    before = _canon(t.read())
    v_before = t.version
    n_before = len(t._manifest()["files"])
    res = t.compact(target_rows=1000)  # every file is "small"
    assert res["version"] == v_before + 1
    assert res["files_written"] == 1  # 41 rows << 1000 -> one bin
    assert res["files_compacted"] == n_before
    # the data is bit-identical across the compaction commit
    assert _canon(t.read()) == before
    assert _canon(t.read(version=v_before)) == before  # time travel intact
    assert t._manifest()["rows"] == res["rows"] == len(before)


def test_cow_compact_keeps_right_sized_files(spark, tmp_path):
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=2
    )
    # 2 files of ~20 rows each: with target 10 both are already at size
    res = t.compact(target_rows=10)
    assert res["files_written"] == 0 and res["files_compacted"] == 0
    assert t.version == 1  # no new version for a no-op

    # with target 1000 both are small -> packed into one
    res2 = t.compact(target_rows=1000)
    assert res2["files_compacted"] == 2 and res2["files_written"] == 1
    assert t._manifest()["operation"] == "compact"


def test_cow_merge_after_compact(spark, tmp_path):
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=4
    )
    t.compact(target_rows=1000)
    t.merge(mk(spark, _batch_rows()), COLS, deterministic=True)
    tgt = mk(spark, _base_rows())
    expected = merge_upsert(tgt, mk(spark, _batch_rows()), COLS, deterministic=True)
    assert _canon(t.read()) == _canon(expected)


def test_cow_restore_rolls_back_metadata_only(spark, tmp_path):
    import os

    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=4
    )
    v1 = _canon(t.read())
    t.merge(mk(spark, _batch_rows()), COLS, deterministic=True)
    v2 = _canon(t.read())
    assert v2 != v1

    res = t.restore(1)
    assert res["version"] == 3 and res["restored_from"] == 1
    assert _canon(t.read()) == v1            # current state is v1 again
    assert _canon(t.read(version=2)) == v2   # bad version still inspectable
    # metadata-only: no new data directory was written
    assert not os.path.exists(str(tmp_path / "tbl" / "data" / "v3"))
    assert t.history()[-1]["operation"] == "restore(v1)"

    # a merge after restore builds on the restored state
    t.merge(mk(spark, _batch_rows()), COLS, deterministic=True)
    assert _canon(t.read()) == v2
