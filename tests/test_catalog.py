"""Multi-table atomic transactions (operators/catalog.py).

The reference's cross-table atomicity comes from Postgres transactions
(loader + popularity updates in one DAG run, ``common/loader/sql.py``);
the LakeCatalog restores it lakehouse-style: readers resolve tables
through catalog snapshots, a transaction publishes all its tables in
one exclusive-create commit. Pins: atomic visibility, snapshot reads,
cross-table time travel, abort invisibility + durable recover(),
first-committer-wins conflicts, and disjoint-txn re-link.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openverse_catalog_spark.operators.catalog import (
    LakeCatalog,
    TxnConflict,
)
from openverse_catalog_spark.operators.cowtable import CowTable
from openverse_catalog_spark.schemas.columns import (
    ColumnSpec,
    Datatype,
    UpsertStrategy,
)

COLS = [
    ColumnSpec("id", Datatype.int, required=True,
               upsert_strategy=UpsertStrategy.no_change),
    ColumnSpec("val", Datatype.int),
]


def rows(spark, *pairs):
    return spark.createDataFrame(
        [Row(id=i, val=v) for i, v in pairs], "id bigint, val bigint"
    )


def vals(df):
    return {r["id"]: r["val"] for r in df.collect()}


@pytest.fixture
def cat(spark, tmp_path):
    c = LakeCatalog.create(spark, str(tmp_path / "lake"))
    a = CowTable.create(spark, str(tmp_path / "ta"),
                        rows(spark, (1, 10), (2, 20)), keys=("id",))
    b = CowTable.create(spark, str(tmp_path / "tb"),
                        rows(spark, (1, 100)), keys=("id",))
    c.register("img", a)
    c.register("aud", b)
    return c


def test_txn_publishes_all_tables_atomically(spark, cat):
    v0 = cat.version
    with cat.transaction() as txn:
        txn.table("img").merge(rows(spark, (3, 30)), COLS,
                               deterministic=True)
        txn.table("aud").merge(rows(spark, (2, 200)), COLS,
                               deterministic=True)
        # not yet published: catalog readers still see the old pair
        assert vals(cat.read("img")) == {1: 10, 2: 20}
        assert vals(cat.read("aud")) == {1: 100}
        # read-your-writes inside the txn
        assert vals(txn.read("img")) == {1: 10, 2: 20, 3: 30}
    assert cat.version == v0 + 1
    assert vals(cat.read("img")) == {1: 10, 2: 20, 3: 30}
    assert vals(cat.read("aud")) == {1: 100, 2: 200}
    # cross-table time travel: the pre-txn catalog version pins BOTH
    assert vals(cat.read("img", catalog_version=v0)) == {1: 10, 2: 20}
    assert vals(cat.read("aud", catalog_version=v0)) == {1: 100}


def test_abort_is_invisible_and_recover_makes_it_durable(spark, cat):
    v0 = cat.version
    with pytest.raises(RuntimeError, match="boom"):
        with cat.transaction() as txn:
            txn.table("img").merge(rows(spark, (9, 90)), COLS,
                                   deterministic=True)
            txn.table("aud").delete(F.col("id") == 1)
            raise RuntimeError("boom")
    # nothing published; catalog readers see the old pair of snapshots
    assert cat.version == v0
    assert vals(cat.read("img")) == {1: 10, 2: 20}
    assert vals(cat.read("aud")) == {1: 100}
    # the table heads DID drift (orphaned versions) — recover restores
    rep = cat.recover()
    assert set(rep["rolled_back"]) == {"img", "aud"}
    assert vals(cat.table("img").read()) == {1: 10, 2: 20}
    assert vals(cat.table("aud").read()) == {1: 100}
    # post-recover transactions work and never expose the orphans
    with cat.transaction() as txn:
        txn.table("img").merge(rows(spark, (4, 40)), COLS,
                               deterministic=True)
    assert vals(cat.read("img")) == {1: 10, 2: 20, 4: 40}


def test_overlapping_txns_first_committer_wins(spark, cat):
    t1 = cat.transaction().__enter__()
    t2 = cat.transaction().__enter__()
    t1.table("img").merge(rows(spark, (5, 50)), COLS, deterministic=True)
    t2.table("img").merge(rows(spark, (6, 60)), COLS, deterministic=True)
    assert t1.__exit__(None, None, None) is False  # publishes
    with pytest.raises(TxnConflict, match="img"):
        t2.__exit__(None, None, None)
    assert vals(cat.read("img")) == {1: 10, 2: 20, 5: 50, 6: 60} or vals(
        cat.read("img")
    ) == {1: 10, 2: 20, 5: 50}


def test_disjoint_txns_both_publish_via_relink(spark, cat):
    t1 = cat.transaction().__enter__()
    t2 = cat.transaction().__enter__()
    t1.table("img").merge(rows(spark, (7, 70)), COLS, deterministic=True)
    t2.table("aud").merge(rows(spark, (7, 700)), COLS, deterministic=True)
    v0 = cat.version
    t1.__exit__(None, None, None)
    t2.__exit__(None, None, None)  # slot taken -> reload -> re-link
    assert cat.version == v0 + 2
    assert vals(cat.read("img"))[7] == 70
    assert vals(cat.read("aud"))[7] == 700


def test_unregistered_table_and_empty_txn(spark, cat):
    with pytest.raises(KeyError, match="nope"):
        with cat.transaction() as txn:
            txn.table("nope")
    v0 = cat.version
    with cat.transaction():
        pass  # no touched tables -> no catalog commit
    assert cat.version == v0


def test_catalog_vacuum_protects_pinned_versions(spark, cat):
    """The table head advances far past the published pin; catalog-
    aware vacuum drops unpinned history but every surviving catalog
    commit's snapshot stays readable — including below-window pins,
    which get their own checkpoints."""
    img = cat.table("img")
    v_pin0 = cat.version  # pins img@1
    with cat.transaction() as txn:
        # TWO commits in one txn: only the final one (v3) is published,
        # so the intermediate v2 is committed-but-unpinned history
        txn.table("img").merge(rows(spark, (3, 30)), COLS,
                               deterministic=True)
        txn.table("img").merge(rows(spark, (4, 40)), COLS,
                               deterministic=True)
    v_pin1 = cat.version  # pins img@3
    with cat.transaction() as txn:
        txn.table("img").merge(rows(spark, (5, 50)), COLS,
                               deterministic=True)
    assert img.version == 4
    deleted = cat.vacuum_tables(keep_versions=1, retention_seconds=0,
                                catalog_history=None)
    assert set(deleted) == {"img", "aud"}
    # every catalog commit still resolves, including the below-window pins
    assert vals(cat.read("img", catalog_version=v_pin0)) == {1: 10, 2: 20}
    assert vals(cat.read("img", catalog_version=v_pin1)) == {
        1: 10, 2: 20, 3: 30, 4: 40}
    assert vals(cat.read("img"))[5] == 50
    # the UNPINNED intermediate version was actually vacuumed
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        img._manifest(2)

    # trimming catalog history unprotects old pins on the next vacuum
    cat.vacuum_tables(keep_versions=1, retention_seconds=0,
                      catalog_history=1)
    with _pytest.raises(FileNotFoundError):
        cat.read("img", catalog_version=v_pin0)
    assert vals(cat.read("img"))[5] == 50


def test_catalog_maintain_compacts_inside_txn(spark, cat):
    """Small-file accumulation from per-txn merges compacts through a
    PUBLISHED transaction (recover() must not roll it back), and the
    follow-up vacuum keeps every surviving pin readable."""
    for i in range(3, 7):
        with cat.transaction() as txn:
            txn.table("img").merge(rows(spark, (i, i * 10)), COLS,
                                   deterministic=True)
    v_before = cat.version
    rep = cat.maintain_tables(
        target_rows=1_000, keep_versions=1, retention_seconds=0
    )
    assert rep["img"]["compacted"]
    assert cat.version > v_before  # the compaction published
    # recover() sees no drift: the compacted head IS the pinned head
    assert cat.recover()["rolled_back"] == {}
    assert vals(cat.read("img")) == {1: 10, 2: 20, 3: 30, 4: 40,
                                     5: 50, 6: 60}
    # idle tick: nothing further to do, no new catalog commit
    v2 = cat.version
    rep2 = cat.maintain_tables(
        target_rows=1_000, keep_versions=1, retention_seconds=0
    )
    assert not rep2["img"]["compacted"]
    assert cat.version == v2


def test_catalog_maintain_z_aware_and_recover_content(spark, tmp_path):
    """maintain_tables: (a) recover() runs first so a torn head's
    aborted rows are never compacted into a published version; (b) a
    z-maintained table compacts through the incremental z path (tags
    preserved); (c) stats advance; (d) recover() compares CONTENT, so
    repeated rollbacks do not grow an unbounded restore chain."""
    from pyspark.sql import functions as F

    from openverse_catalog_spark.operators.catalog import LakeCatalog
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    t = CowTable.create(
        spark, str(tmp_path / "z"),
        spark.createDataFrame(
            [(f"k{i:03d}", float(i % 50)) for i in range(300)],
            "fid string, x double",
        ),
        keys=("fid",), target_files=3, stats_cols=("x",),
    )
    t.compact(target_rows=200, zorder_by=["x"], zorder_incremental=True)
    t.analyze(kmv_k=64)
    cat = LakeCatalog.create(spark, str(tmp_path / "lake"))
    cat.register("z", t)

    # torn transaction: head advances, never published
    cols = [
        ColumnSpec("fid", Datatype.char,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("x", Datatype.double),
    ]
    with cat.transaction() as txn:
        txn.table("z").merge(
            spark.createDataFrame(
                [("torn", -1.0)], "fid string, x double"
            ),
            cols, deterministic=True,
        )
        # crash before publish: abandon without __exit__ bookkeeping
        txn._touched.clear()

    rep = cat.maintain_tables(
        target_rows=400, small_file_ratio=0.0, keep_versions=3
    )
    assert rep["z"]["compacted"] is True
    assert "torn" not in {
        r["fid"] for r in cat.read("z").collect()
    }, "aborted rows must never be compacted into a published version"
    assert cat.read("z").count() == 300
    # z-awareness: published files carry cluster tags
    pub = CowTable(spark, str(tmp_path / "z"), keys=("fid",))
    m = pub._manifest(cat._entry("z")["version"])
    assert all(e.get("cluster") for e in m["files"]), (
        "catalog maintenance must preserve z clustering"
    )
    assert rep["z"].get("stats_version"), "stats must advance"

    # recover() idempotence: a second recover after the restore must
    # not commit another restore (content already matches the pin)
    v0 = pub.version
    assert cat.recover()["rolled_back"] == {}
    assert pub.version == v0


def test_catalog_vacuum_protects_registered_clones(spark, cat, tmp_path):
    """Shallow-clone-vs-source-vacuum (stock Delta's documented caveat,
    closed when the catalog knows both tables): a registered clone's
    manifests reference the source's data files by absolute path;
    catalog vacuum must union those into the source's keep-set so
    compact + vacuum past retention on the SOURCE never orphans the
    clone — and must RECLAIM the files once the clone localizes
    (compacts) past them. MAINTAIN CATALOG (maintain_tables) runs the
    same pin-protected vacuum, covered below."""
    import os

    img = cat.table("img")
    with cat.transaction() as txn:
        txn.table("img").merge(rows(spark, (3, 30)), COLS,
                               deterministic=True)
    # branch at the published pin, register it — the clone's v1 points
    # at the source's files absolutely (zero copy)
    pin_v = cat._entry("img")["version"]
    clone = img.clone(str(tmp_path / "branch"), version=pin_v)
    cat.register("img_branch", clone)
    ext = {p for p in cat._external_refs()}
    assert ext and all(p.startswith(str(tmp_path / "ta")) for p in ext)
    assert all(os.path.exists(p) for p in ext)
    # commits record external-ref liveness so the catalog scan skips
    # local-only manifests without resolving them
    assert clone._raw_manifest(1)["external_refs"] is True
    assert img._raw_manifest(img.version)["external_refs"] is False
    # clone diverges (through a txn: catalog tables are txn-managed)
    with cat.transaction() as txn:
        txn.table("img_branch").merge(rows(spark, (9, 90)), COLS,
                                      deterministic=True)
    # source churns on and COMPACTS: its head no longer references the
    # files the clone branched from
    for i in (4, 5):
        with cat.transaction() as txn:
            txn.table("img").merge(rows(spark, (i, i * 10)), COLS,
                                   deterministic=True)
    with cat.transaction() as txn:
        txn.table("img").compact(target_rows=1_000)
    # vacuum the source past retention AND past catalog-pin history —
    # only clone protection can keep the branched files now
    # (keep_versions=2 so the CLONE's own v1 — the branch point —
    # survives its vacuum and stays time-travelable; the source still
    # drops every manifest that referenced the branched files)
    cat.vacuum_tables(keep_versions=2, retention_seconds=0,
                      catalog_history=1)
    assert all(os.path.exists(p) for p in ext), (
        "clone-referenced source files must survive source vacuum"
    )
    assert vals(cat.read("img_branch")) == {1: 10, 2: 20, 3: 30, 9: 90}
    assert vals(cat.read("img")) == {1: 10, 2: 20, 3: 30, 4: 40, 5: 50}
    # the clone's own time travel to its branch point still resolves
    branch = cat.table("img_branch")
    assert vals(branch.read(1)) == {1: 10, 2: 20, 3: 30}

    # MAINTAIN CATALOG drives the same protected vacuum
    rep = cat.maintain_tables(target_rows=1_000, keep_versions=1,
                              retention_seconds=0, catalog_history=1)
    assert all(os.path.exists(p) for p in ext)
    assert vals(cat.read("img_branch")) == {1: 10, 2: 20, 3: 30, 9: 90}

    # RECLAIM: localize the clone (compact rewrites every file into the
    # clone's own root), vacuum its external-referencing history, and
    # the source files become garbage on the next catalog vacuum
    with cat.transaction() as txn:
        txn.table("img_branch").compact(target_rows=1_000)
    cat.vacuum_tables(keep_versions=1, retention_seconds=0,
                      catalog_history=1)
    assert cat._external_refs() == set()
    branch_t = cat.table("img_branch")
    assert branch_t._raw_manifest(branch_t.version)["external_refs"] \
        is False, "a localized clone's head must drop the flag"
    assert not any(os.path.exists(p) for p in ext), (
        "localized clone must release the source's old files"
    )
    assert vals(cat.read("img_branch")) == {1: 10, 2: 20, 3: 30, 9: 90}
    assert vals(cat.read("img")) == {1: 10, 2: 20, 3: 30, 4: 40, 5: 50}


def test_catalog_timestamp_time_travel(spark, cat):
    """Cross-table time travel by TIMESTAMP: read(name, as_of=ts)
    resolves the newest catalog commit at or before ts — the whole
    multi-table snapshot a moment in time pinned, exactly the
    table-level as_of lifted a level. Trimmed history raises rather
    than silently resolving to a wrong epoch."""
    import time

    import pytest

    t0 = time.time()
    time.sleep(0.02)
    with cat.transaction() as txn:
        txn.table("img").merge(rows(spark, (3, 30)), COLS,
                               deterministic=True)
    time.sleep(0.02)
    t1 = time.time()
    time.sleep(0.02)
    with cat.transaction() as txn:
        txn.table("img").merge(rows(spark, (4, 40)), COLS,
                               deterministic=True)
        txn.table("aud").merge(rows(spark, (2, 200)), COLS,
                               deterministic=True)
    # before the first txn: the registration-time snapshot
    assert vals(cat.read("img", as_of=t0)) == {1: 10, 2: 20}
    # between the txns: img has 3, aud unchanged — the CROSS-table
    # snapshot at t1 is consistent
    v1 = cat.version_as_of(t1)
    assert vals(cat.read("img", as_of=t1)) == {1: 10, 2: 20, 3: 30}
    assert vals(cat.read("aud", catalog_version=v1)) == {1: 100}
    # now: both tables advanced
    assert vals(cat.read("img")) == {1: 10, 2: 20, 3: 30, 4: 40}
    assert vals(cat.read("aud")) == {1: 100, 2: 200}
    with pytest.raises(ValueError, match="no catalog commit"):
        cat.version_as_of(t0 - 10_000)


def test_alter_returns_own_committed_version_not_head(
    spark, tmp_path, monkeypatch
):
    """Metadata-only ALTERs must return the version THEIR commit
    claimed, never the shared head pointer — TxnTable pins the returned
    version at publish, so returning the head would let an implicit-
    transaction ALTER publish a CONCURRENT writer's unpublished (maybe
    torn) commit into the catalog."""
    t = CowTable.create(
        spark, str(tmp_path / "t"),
        rows(spark, (1, 10)), keys=("id",), target_files=1,
    )
    orig = t._commit

    def commit_then_concurrent_writer(version, entries, **kw):
        orig(version, entries, **kw)
        # a concurrent writer lands the NEXT version before the ALTER
        # reads any shared state
        other = CowTable(spark, t.root, keys=t.keys)
        m = other._manifest()
        other._commit(
            m["version"] + 1, m["files"], op="concurrent",
            schema_json=m.get("schema"),
        )

    monkeypatch.setattr(t, "_commit", commit_then_concurrent_writer)
    for res in (
        t.add_constraint("v_pos", "val >= 0"),      # -> v2 (+v3 race)
        t.add_column("w", "double"),                # -> v4 (+v5 race)
        t.drop_constraint("v_pos"),                 # -> v6 (+v7 race)
        t.set_partition_spec(("bucket(4, id)",)),   # -> v8 (+v9 race)
    ):
        assert res["version"] % 2 == 0, (
            f"ALTER leaked the concurrent head: {res}"
        )


def test_alter_retry_does_not_revert_concurrent_schema(
    spark, tmp_path, monkeypatch
):
    """A CommitConflict retry must re-derive the schema from the fresh
    head: committing a field list computed BEFORE a concurrent
    add_column would silently erase the winner's column (lost
    update)."""
    from openverse_catalog_spark.operators.cowtable import (
        CommitConflict,
        CowTable,
    )

    t = CowTable.create(
        spark, str(tmp_path / "t"),
        rows(spark, (1, 10)), keys=("id",), target_files=1,
    )
    orig = t._commit
    state = {"raced": False}

    def conflict_once_with_concurrent_schema(version, entries, **kw):
        if not state["raced"]:
            state["raced"] = True
            # the concurrent writer lands ITS schema change first
            other = CowTable(spark, t.root, keys=t.keys)
            other.add_column("won", "double")
            raise CommitConflict("simulated lost slot")
        orig(version, entries, **kw)

    monkeypatch.setattr(t, "_commit", conflict_once_with_concurrent_schema)
    t.add_column("mine", "string")
    cols = CowTable(spark, t.root, keys=t.keys).read().columns
    assert "won" in cols and "mine" in cols, (
        f"retry reverted the concurrent column: {cols}"
    )


def test_recover_rolls_back_torn_metadata_only_alter(spark, cat):
    """A crash between a metadata-only ALTER's table commit and its
    catalog publish must be recoverable: the ALTER changes NO file, so
    recover()'s drift equality has to compare the snapshot's metadata
    (schema, constraints, mapping, partition spec), not the file list
    alone — otherwise the aborted schema stays on the head and the
    next DML silently publishes it."""
    img = cat.table("img")
    pin = cat._entry("img")["version"]
    # simulate the torn implicit transaction: the table commit landed,
    # the catalog publish never did
    img.add_column("phantom", "double")
    img.add_constraint("v_pos", "val >= 0")
    assert img.version > pin
    rep = cat.recover()
    assert rep["rolled_back"] == {"img": pin}
    fresh = cat.table("img")
    assert "phantom" not in fresh.read().columns
    assert "v_pos" not in fresh.constraints
    # idempotence: recover again -> content matches, no restore chain
    v_after = fresh.version
    assert cat.recover()["rolled_back"] == {}
    assert cat.table("img").version == v_after
    # same for a torn SET PARTITION SPEC (restore must put the OLD
    # spec back or recover would re-restore forever)
    fresh.set_partition_spec(("bucket(4, id)",))
    assert cat.recover()["rolled_back"] == {"img": pin}
    assert cat.table("img").partition_spec == ()
    assert cat.recover()["rolled_back"] == {}


def test_clone_and_restore_keep_partition_spec(spark, tmp_path):
    """A shallow clone inherits the source snapshot's hidden-partition
    spec (the lazy property must not read the clone's unwritten head
    and commit an empty spec); RESTORE across a SET PARTITION SPEC
    puts the old spec back."""
    t = CowTable.create(
        spark, str(tmp_path / "t"),
        rows(spark, (1, 10), (2, 20)), keys=("id",), target_files=1,
        partition_by=("bucket(4, id)",),
    )
    c = t.clone(str(tmp_path / "c"))
    assert [s["transform"] for s in
            CowTable(spark, str(tmp_path / "c")).partition_spec] \
        == ["bucket"]
    v_before = t.version
    t.set_partition_spec(("truncate(2, id)",))
    t.restore(v_before)
    assert [s["transform"] for s in
            CowTable(spark, str(tmp_path / "t")).partition_spec] \
        == ["bucket"]


def test_snapshot_sig_is_file_order_insensitive():
    """Segment resolution path-sorts file lists; raw checkpoint
    manifests keep commit order. The drift equality must not see that
    as drift (it would re-restore identical snapshots forever)."""
    a = {"files": [{"path": "data/c2/x.parquet", "rows": 1},
                   {"path": "data/c1/a.parquet", "rows": 2}],
         "schema": "s", "constraints": {}, "partition_spec": []}
    b = {"files": [{"path": "data/c1/a.parquet", "rows": 2},
                   {"path": "data/c2/x.parquet", "rows": 1}],
         "schema": "s", "constraints": {}, "partition_spec": []}
    assert LakeCatalog._snapshot_sig(a) == LakeCatalog._snapshot_sig(b)
    b["files"][0]["rows"] = 3
    assert LakeCatalog._snapshot_sig(a) != LakeCatalog._snapshot_sig(b)


def test_rename_during_open_txn_conflicts_cleanly(spark, cat):
    """A concurrent rename (or unregister) of a txn-touched table must
    surface as TxnConflict at publish — not a KeyError, and never a
    re-insert of the old name (which would register the table twice
    with divergent pins)."""
    txn = cat.transaction().__enter__()
    txn.table("img").merge(rows(spark, (8, 80)), COLS, deterministic=True)
    cat.rename("img", "img2")
    with pytest.raises(TxnConflict, match="renamed or unregistered"):
        txn.__exit__(None, None, None)
    # exactly ONE registration survives, under the new name
    tables = cat._load()["tables"]
    assert "img" not in tables and "img2" in tables
    assert vals(cat.read("img2")) == {1: 10, 2: 20}  # txn never landed
    rep = cat.recover()  # the orphaned head rolls back durably
    assert "img2" in rep["rolled_back"] or not rep["rolled_back"]


def test_reregistered_name_conflicts_even_at_same_version(spark, cat, tmp_path):
    """unregister + register of a DIFFERENT table under the same name
    while a txn holds it: the publish must conflict on entry IDENTITY
    (root), not just version numbers — the fresh table's head can
    coincidentally equal the snapshot's pinned version."""
    txn = cat.transaction().__enter__()
    txn.table("img").merge(rows(spark, (9, 90)), COLS, deterministic=True)
    pinned_v = cat._entry("img")["version"]
    cat.unregister("img")
    other = CowTable.create(
        spark, str(tmp_path / "other"), rows(spark, (1, 1)), keys=("id",)
    )
    # force the impostor's head to the pinned version number
    while other.version < pinned_v:
        other.update(F.lit(True), {})
    cat.register("img", other)
    assert cat._entry("img")["version"] == pinned_v  # same NUMBER
    with pytest.raises(TxnConflict, match="different root"):
        txn.__exit__(None, None, None)


def _docs(spark, *rws):
    return spark.createDataFrame(list(rws), "doc_id long, text string")


def test_maintain_catalog_ticks_registered_indexes(spark, tmp_path):
    """Churn + MAINTAIN (catalog tick) must leave a registered search
    index answering the post-churn query with NO explicit REFRESH —
    the unattended tick keeps indexes fresh, not just tables compact."""
    from openverse_catalog_spark.operators.searchindex import (
        SearchIndex,
        _postings_of,
    )

    cat = LakeCatalog.create(spark, str(tmp_path / "lake"))
    docs = CowTable.create(
        spark, str(tmp_path / "docs"),
        _docs(spark, (1, "alpha beta"), (2, "beta gamma"),
              (3, "gamma delta")),
        keys=("doc_id",),
    )
    cat.register("docs", docs)
    pin = cat._entry("docs")["version"]
    idx = SearchIndex.create(
        spark, str(tmp_path / "idx"), docs, version=pin,
    )
    cat.register_index(
        "idx", "search", idx.root, "docs",
        {"id": "doc_id", "text": "text"},
    )
    # churn through a transaction (the published pin advances)
    with cat.transaction() as txn:
        txn.table("docs").update(
            F.col("doc_id") == 1, {"text": F.lit("alpha omega")}
        )
        txn.table("docs").delete(F.col("doc_id") == 2)
    rep = cat.maintain_tables(retention_seconds=3600.0)
    new_pin = cat._entry("docs")["version"]
    assert rep["index:idx"]["refreshed"]
    assert rep["index:idx"]["applied"] == new_pin
    assert not rep["index:idx"]["resync"]
    # the index answers the post-churn state with no explicit refresh
    re = SearchIndex.open(spark, idx.root, docs)
    got = {(r.term, r.doc_id): r.tf for r in re.postings.read().collect()}
    want = {
        (r.term, r.doc_id): r.tf
        for r in _postings_of(
            cat.read("docs"), "doc_id", "text"
        ).collect()
    }
    assert got == want


def test_vacuum_protects_registered_index_feed_span(spark, tmp_path):
    """A STALE registered index's unapplied CDF span must survive an
    aggressive catalog vacuum (registered-consumer protection), so the
    next refresh stays incremental instead of resyncing; once the
    index catches up the protection lapses and history reclaims."""
    from openverse_catalog_spark.operators.searchindex import SearchIndex

    cat = LakeCatalog.create(spark, str(tmp_path / "lake"))
    docs = CowTable.create(
        spark, str(tmp_path / "docs"),
        _docs(spark, (1, "alpha beta"), (2, "beta gamma")),
        keys=("doc_id",),
    )
    cat.register("docs", docs)
    idx = SearchIndex.create(
        spark, str(tmp_path / "idx"), docs,
        version=cat._entry("docs")["version"],
    )
    cat.register_index(
        "idx", "search", idx.root, "docs",
        {"id": "doc_id", "text": "text"},
    )
    # several published commits while the index stays stale
    for i, word in enumerate(["delta", "epsilon", "zeta"]):
        with cat.transaction() as txn:
            txn.table("docs").update(
                F.col("doc_id") == 1, {"text": F.lit(f"alpha {word}")}
            )
    # catalog_history=1 trims the per-commit pins that would otherwise
    # keep every version alive; only the index-span protection remains
    cat.vacuum_tables(
        keep_versions=1, retention_seconds=0.0, catalog_history=1
    )
    pin = cat._entry("docs")["version"]
    r = idx.refresh(to_version=pin)
    assert r["refreshed"] and not r.get("resync"), r
    # an UNREGISTERED consumer gets no such protection: the same churn
    # + vacuum forces the resync path (control for the test above)
    docs2 = CowTable.create(
        spark, str(tmp_path / "docs2"),
        _docs(spark, (1, "alpha beta"), (2, "beta gamma")),
        keys=("doc_id",),
    )
    cat.register("docs2", docs2)
    idx2 = SearchIndex.create(
        spark, str(tmp_path / "idx2"), docs2,
        version=cat._entry("docs2")["version"],
    )
    for i, word in enumerate(["delta", "epsilon", "zeta"]):
        with cat.transaction() as txn:
            txn.table("docs2").update(
                F.col("doc_id") == 1, {"text": F.lit(f"alpha {word}")}
            )
    cat.vacuum_tables(
        keep_versions=1, retention_seconds=0.0, catalog_history=1
    )
    r2 = idx2.refresh(to_version=cat._entry("docs2")["version"])
    assert r2["refreshed"] and r2.get("resync"), r2


def test_facade_create_index_registers_with_catalog(spark, tmp_path):
    """CREATE SEARCH/VECTOR INDEX on a catalog-managed table registers
    the index with the catalog (MAINTAIN CATALOG reports its tick);
    DROP unregisters."""
    import numpy as np

    from openverse_catalog_spark.sql_facade import SqlFacade

    cat = LakeCatalog.create(spark, str(tmp_path / "lake"))
    docs = CowTable.create(
        spark, str(tmp_path / "docs"),
        _docs(spark, (1, "alpha beta"), (2, "beta gamma")),
        keys=("doc_id",),
    )
    rng = np.random.default_rng(3)
    vecs = CowTable.create(
        spark, str(tmp_path / "vecs"),
        spark.createDataFrame(
            [(i, [float(x) for x in rng.normal(size=8)])
             for i in range(20)],
            "vec_id long, embedding array<double>",
        ),
        keys=("vec_id",),
    )
    cat.register("docs", docs)
    cat.register("vecs", vecs)
    f = SqlFacade(spark)
    f.attach_catalog(cat)
    f.sql(
        "CREATE SEARCH INDEX sidx ON docs (text) "
        f"LOCATION '{tmp_path / 'sidx'}'"
    )
    f.sql(
        "CREATE VECTOR INDEX vidx ON vecs (embedding) CENTROID MOD 5 "
        f"LOCATION '{tmp_path / 'vidx'}'"
    )
    assert set(cat.indexes()) == {"sidx", "vidx"}
    f.sql("UPDATE docs SET text = 'alpha omega' WHERE doc_id = 1")
    rows_ = {r["name"]: r for r in f.sql("MAINTAIN CATALOG").collect()}
    assert rows_["index:sidx"]["compacted"]  # refreshed via the tick
    assert rows_["index:sidx"]["version"] == cat._entry("docs")["version"]
    out = f.sql(
        "SELECT doc_id, score FROM SEARCH_INDEX('sidx', 'omega', 5)"
    ).collect()
    assert [r.doc_id for r in out] == [1]
    f.sql("DROP SEARCH INDEX sidx")
    f.sql("DROP VECTOR INDEX vidx")
    assert cat.indexes() == {}


def test_index_registry_collision_rename_and_unregister_guards(
    spark, tmp_path
):
    """Review-pass pins: (a) a cross-kind same-name registration is
    refused (it would clobber the other index's ticks/protection) but
    same-index re-registration (ATTACH) is idempotent; (b) rename()
    re-points registered indexes at the new base name; (c) unregister()
    refuses while indexes still reference the base; (d) unregister
    only removes a marker owned by THIS catalog."""
    from openverse_catalog_spark.operators.searchindex import SearchIndex

    cat = LakeCatalog.create(spark, str(tmp_path / "lake"))
    docs = CowTable.create(
        spark, str(tmp_path / "docs"),
        _docs(spark, (1, "alpha beta"), (2, "beta gamma")),
        keys=("doc_id",),
    )
    cat.register("docs", docs)
    idx = SearchIndex.create(
        spark, str(tmp_path / "idx"), docs,
        version=cat._entry("docs")["version"],
    )
    cat.register_index("idx", "search", idx.root, "docs",
                       {"id": "doc_id", "text": "text"})
    # idempotent re-register (ATTACH in a new session)
    cat.register_index("idx", "search", idx.root, "docs",
                       {"id": "doc_id", "text": "text"})
    # cross-kind / cross-root collision refused
    with pytest.raises(ValueError, match="already registered"):
        cat.register_index("idx", "vector", str(tmp_path / "other"),
                           "docs", {})
    # unregister of the base refuses while the index references it
    with pytest.raises(ValueError, match="registered derived indexes"):
        cat.unregister("docs")
    # rename re-points the index entry; the tick keeps working
    cat.rename("docs", "corpus")
    assert cat.indexes()["idx"]["base"] == "corpus"
    with cat.transaction() as txn:
        txn.table("corpus").update(
            F.col("doc_id") == 1, {"text": F.lit("alpha omega")}
        )
    rep = cat.maintain_tables(retention_seconds=3600.0)
    assert rep["index:idx"]["applied"] == cat._entry("corpus")["version"]
    # marker ownership: a SECOND catalog registering the same root owns
    # the marker last; the first catalog's unregister must not remove it
    import json as _json
    import os as _os

    cat2 = LakeCatalog.create(spark, str(tmp_path / "lake2"))
    cat2.register("corpus_alias", CowTable(
        spark, docs.root, keys=("doc_id",)
    ))
    cat.unregister_index("idx")
    cat.unregister("corpus")
    marker = f"{docs.root}/.catalog.json"
    assert _os.path.exists(marker)
    assert _json.load(open(marker))["catalog"] == cat2.root


def test_recover_backfills_managed_marker(spark, tmp_path):
    """Tables registered before the marker existed gain it via
    recover() (start of every maintenance tick), so the unpinned
    stream-maintenance refusal covers old catalogs too."""
    import os as _os

    cat = LakeCatalog.create(spark, str(tmp_path / "lake"))
    t = CowTable.create(
        spark, str(tmp_path / "t"), rows(spark, (1, 10)), keys=("id",),
    )
    cat.register("t", t)
    _os.remove(f"{t.root}/.catalog.json")  # simulate a pre-marker registry
    cat.recover()
    assert _os.path.exists(f"{t.root}/.catalog.json")


def test_index_base_self_heals_after_lost_rename_repoint(spark, tmp_path):
    """The rename->indexes.json re-point is a second, non-atomic write;
    if it is lost (crash between the two), the maintenance tick must
    resolve the base BY ROOT, keep refreshing, and heal the stored
    name — and vacuum protection must keep covering the span."""
    import json as _json

    from openverse_catalog_spark.operators.searchindex import SearchIndex

    cat = LakeCatalog.create(spark, str(tmp_path / "lake"))
    docs = CowTable.create(
        spark, str(tmp_path / "docs"),
        _docs(spark, (1, "alpha beta"), (2, "beta gamma")),
        keys=("doc_id",),
    )
    cat.register("docs", docs)
    idx = SearchIndex.create(
        spark, str(tmp_path / "idx"), docs,
        version=cat._entry("docs")["version"],
    )
    cat.register_index("idx", "search", idx.root, "docs",
                       {"id": "doc_id", "text": "text"})
    cat.rename("docs", "corpus")
    # simulate the lost second write: put the OLD base name back
    reg = cat.indexes()
    reg["idx"]["base"] = "docs"
    with open(cat._indexes_path(), "w") as fh:
        _json.dump(reg, fh)
    with cat.transaction() as txn:
        txn.table("corpus").update(
            F.col("doc_id") == 1, {"text": F.lit("alpha omega")}
        )
    rep = cat.maintain_tables(retention_seconds=3600.0)
    assert rep["index:idx"]["applied"] == cat._entry("corpus")["version"]
    assert not rep["index:idx"].get("resync")
    # the tick healed the stored name
    assert cat.indexes()["idx"]["base"] == "corpus"


def test_facade_create_index_cleans_up_on_registration_refusal(
    spark, tmp_path
):
    """A catalog-level name collision surfacing from register_index
    must not leave the refusing facade serving an orphan index, and
    the freshly built directory must be removed."""
    import os as _os

    from openverse_catalog_spark.sql_facade import SqlFacade

    cat = LakeCatalog.create(spark, str(tmp_path / "lake"))
    docs = CowTable.create(
        spark, str(tmp_path / "docs"),
        _docs(spark, (1, "alpha beta"), (2, "beta gamma")),
        keys=("doc_id",),
    )
    cat.register("docs", docs)
    f1 = SqlFacade(spark)
    f1.attach_catalog(cat)
    f1.sql(
        "CREATE SEARCH INDEX idx ON docs (text) "
        f"LOCATION '{tmp_path / 'i1'}'"
    )
    f2 = SqlFacade(spark)
    f2.attach_catalog(cat)
    with pytest.raises(ValueError, match="already registered"):
        f2.sql(
            "CREATE SEARCH INDEX idx ON docs (text) "
            f"LOCATION '{tmp_path / 'i2'}'"
        )
    assert "idx" not in f2._sidx  # not exposed
    assert not _os.path.exists(str(tmp_path / "i2"))  # husk removed
    # the original registration is untouched
    assert cat.indexes()["idx"]["root"] == str(tmp_path / "i1")


def test_concurrent_index_registrations_all_survive(spark, tmp_path):
    """register_index serializes through the registry lock file: two
    unlocked concurrent registrations last-writer-won and one entry was
    silently dropped — permanently ending its maintenance ticks and
    vacuum feed-span protection."""
    import threading

    cat = LakeCatalog.create(spark, str(tmp_path / "lake"))
    docs = CowTable.create(
        spark, str(tmp_path / "docs"), _docs(spark, (1, "alpha")),
        keys=("doc_id",),
    )
    cat.register("docs", docs)
    errs = []

    def reg(n):
        try:
            cat.register_index(
                f"i{n}", "search", str(tmp_path / f"i{n}"), "docs",
                {"id": "doc_id", "text": "text"},
            )
        except Exception as exc:  # noqa: BLE001 - surfaced below
            errs.append(exc)

    threads = [
        threading.Thread(target=reg, args=(n,)) for n in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert sorted(cat.indexes()) == [f"i{n}" for n in range(8)]


def test_maintain_reindex_skew_heals_vector_index(spark, tmp_path):
    """MAINTAIN with reindex_skew: the tick reports each vector
    index's list skew and — only when the opt-in bound is hit —
    reclusters it as an atomic epoch swap; without the opt-in the
    frozen centroids stay."""
    import numpy as np

    from openverse_catalog_spark.operators.vectorindex import VectorIndex

    def vec(seed):
        rng = np.random.default_rng(seed)
        return [float(x) for x in rng.normal(size=8)]

    cat = LakeCatalog.create(spark, str(tmp_path / "lake"))
    vecs = CowTable.create(
        spark, str(tmp_path / "vecs"),
        spark.createDataFrame(
            [(i, vec(i)) for i in range(40)],
            "vec_id long, embedding array<double>",
        ),
        keys=("vec_id",),
    )
    cat.register("vecs", vecs)
    idx = VectorIndex.create(
        spark, str(tmp_path / "vi"), vecs, centroid_mod=10,
        version=cat._entry("vecs")["version"],
    )
    cat.register_index("vi", "vector", idx.root, "vecs",
                       {"id": "vec_id", "vector": "embedding"})
    # hot cluster through a catalog txn (publishes the pin)
    rng = np.random.default_rng(3)
    hot = np.asarray(vec(0))
    hot = hot / np.sqrt((hot * hot).sum())
    batch = spark.createDataFrame(
        [(100 + j, [float(x) for x in 2.0 * hot
                    + rng.normal(scale=0.02, size=8)])
         for j in range(120)],
        "vec_id long, embedding array<double>",
    )
    with cat.transaction() as txn:
        txn.table("vecs").merge_when(batch, insert=True)
    # tick WITHOUT the opt-in: refreshed at the pin, skew NOT healed
    rep = cat.maintain_tables(target_rows=1, retention_seconds=3600.0)
    assert rep["index:vi"]["applied"] == cat._entry("vecs")["version"]
    assert "reindexed" not in rep["index:vi"]
    re1 = VectorIndex.open(spark, idx.root, vecs)
    s1 = re1.list_stats()
    assert re1.epoch == 0 and s1["skew"] > 8.0
    # tick WITH the opt-in: skew reported and healed (assert the
    # RELATIVE drop — a 160-row fixture's median is small-sample
    # noisy, so an absolute bound would flake)
    rep = cat.maintain_tables(
        target_rows=1, retention_seconds=3600.0, reindex_skew=8.0
    )
    assert rep["index:vi"]["skew"] > 8.0
    assert rep["index:vi"]["reindexed"]["epoch"] == 1
    re2 = VectorIndex.open(spark, idx.root, vecs)
    s2 = re2.list_stats()
    assert re2.epoch == 1
    assert s2["skew"] < s1["skew"] / 2
    assert s2["max_list"] < s1["max_list"] / 3
    # now below the bound: no further reindex
    rep = cat.maintain_tables(
        target_rows=1, retention_seconds=3600.0, reindex_skew=8.0
    )
    assert "reindexed" not in rep["index:vi"]
    # facade arm parses and routes the threshold
    from openverse_catalog_spark.sql_facade import SqlFacade

    f = SqlFacade(spark)
    f.attach_catalog(cat)
    out = {r["name"]: r for r in f.sql(
        "MAINTAIN CATALOG TARGET 1 ROWS REINDEX SKEW 8.0"
    ).collect()}
    assert "index:vi" in out


def test_maintain_reindex_skew_learned(spark, tmp_path):
    """MAINTAIN ... REINDEX SKEW s LEARNED [n]: the unattended
    auto-heal runs the Lloyd-refined recluster (learned centroids get
    ordinal ids), still retires the old epoch instead of deleting it,
    and the facade clause routes the round count."""
    import numpy as np

    from openverse_catalog_spark.operators.vectorindex import VectorIndex
    from openverse_catalog_spark.sql_facade import SqlFacade

    def vec(seed):
        rng = np.random.default_rng(seed)
        return [float(x) for x in rng.normal(size=8)]

    cat = LakeCatalog.create(spark, str(tmp_path / "lake"))
    vecs = CowTable.create(
        spark, str(tmp_path / "vecs"),
        spark.createDataFrame(
            [(i, vec(i)) for i in range(40)],
            "vec_id long, embedding array<double>",
        ),
        keys=("vec_id",),
    )
    cat.register("vecs", vecs)
    idx = VectorIndex.create(
        spark, str(tmp_path / "vi"), vecs, centroid_mod=10,
        version=cat._entry("vecs")["version"],
    )
    cat.register_index("vi", "vector", idx.root, "vecs",
                       {"id": "vec_id", "vector": "embedding"})
    rng = np.random.default_rng(3)
    hot = np.asarray(vec(0))
    hot = hot / np.sqrt((hot * hot).sum())
    batch = spark.createDataFrame(
        [(100 + j, [float(x) for x in 2.0 * hot
                    + rng.normal(scale=0.02, size=8)])
         for j in range(120)],
        "vec_id long, embedding array<double>",
    )
    with cat.transaction() as txn:
        txn.table("vecs").merge_when(batch, insert=True)
    rep = cat.maintain_tables(
        target_rows=1, retention_seconds=3600.0,
        reindex_skew=8.0, reindex_learned=2,
    )
    heal = rep["index:vi"]["reindexed"]
    assert heal["epoch"] == 1 and heal["learned_rounds"] == 2
    re1 = VectorIndex.open(spark, idx.root, vecs)
    c_ids, _ = re1._centroid_matrix()
    assert list(c_ids) == list(range(heal["centroids"]))  # ordinals
    # retired, not deleted: the next tick reclaims
    assert re1.retired_epochs == [0]
    rep2 = cat.maintain_tables(
        target_rows=1, retention_seconds=3600.0,
        reindex_skew=8.0, reindex_learned=2,
    )
    assert rep2["index:vi"].get("reclaimed_epochs") == [0]
    assert "reindexed" not in rep2["index:vi"]  # healed below bound
    # facade clause: LEARNED default rounds
    f = SqlFacade(spark)
    f.attach_catalog(cat)
    out = {r["name"]: r for r in f.sql(
        "MAINTAIN CATALOG TARGET 1 ROWS REINDEX SKEW 8.0 LEARNED 3"
    ).collect()}
    assert "index:vi" in out
