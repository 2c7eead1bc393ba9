"""SQL facade: lake tables and frames addressable from plain SQL text,
with the Delta-spelling time-travel / CDF constructs rewritten to
manifest-pinned views.

Reference contract: the catalog's users run SQL files against Postgres
(catalog/dags/common/popularity/sql.py, provider_csv_load_scripts);
this is the equivalent front door for the Spark engine.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openverse_catalog_spark.operators.cowtable import CowTable
from openverse_catalog_spark.sql_facade import SqlFacade
from tests.test_cowtable import _base_rows, _batch_rows, _canon
from tests.test_merge_upsert import COLS, mk


def test_facade_head_view_follows_commits(spark, tmp_path):
    """The bare table name always reads the CURRENT snapshot: a merge
    between two sql() calls is visible without re-registration."""
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=2
    )
    f = SqlFacade(spark)
    f.register_table("media", t)
    assert f.sql("SELECT count(*) AS n FROM media").collect()[0]["n"] == 40
    t.merge(mk(spark, _batch_rows()), COLS, deterministic=True)
    got = {
        r["foreign_identifier"]: r["title"]
        for r in f.sql(
            "SELECT foreign_identifier, title FROM media "
            "WHERE provider = 'met' AND foreign_identifier >= 'f020'"
        ).collect()
    }
    assert got["f020"] == "updated" and got["f999"] == "brand-new"


def test_facade_version_and_timestamp_and_changes(spark, tmp_path):
    """VERSION AS OF / TIMESTAMP AS OF / TABLE_CHANGES rewrite to
    manifest-pinned views inside one query text."""
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=2
    )
    t.merge(mk(spark, _batch_rows()), COLS, deterministic=True)
    f = SqlFacade(spark)
    f.register_table("media", t)
    n1 = f.sql(
        "SELECT count(*) AS n FROM media VERSION AS OF 1"
    ).collect()[0]["n"]
    assert n1 == 40
    ts = t._manifest(1)["committed_at"]
    nts = f.sql(
        f"SELECT count(*) AS n FROM media TIMESTAMP AS OF {ts}"
    ).collect()[0]["n"]
    assert nts == 40
    ch = f.sql(
        "SELECT _change_type, count(*) AS n FROM TABLE_CHANGES('media', 1) "
        "GROUP BY _change_type ORDER BY _change_type"
    ).collect()
    assert {r["_change_type"]: r["n"] for r in ch} == {
        "insert": 1, "update_preimage": 1, "update_postimage": 1,
    }
    # joining a snapshot against the head in one text
    joined = f.sql(
        """
        SELECT count(*) AS n
        FROM media h JOIN media VERSION AS OF 1 o
          ON h.provider = o.provider
         AND h.foreign_identifier = o.foreign_identifier
        WHERE h.title <> o.title
        """
    ).collect()[0]["n"]
    assert joined == 1  # the one updated row


def test_facade_unregistered_table_is_refused(spark, tmp_path):
    f = SqlFacade(spark)
    f.register_df("plain", spark.range(3).toDF("id"))
    assert f.sql("SELECT count(*) AS n FROM plain").collect()[0]["n"] == 3
    with pytest.raises(ValueError, match="registered lake table"):
        f.sql("SELECT * FROM plain VERSION AS OF 1")


def test_facade_dv_delete_visible_in_sql(spark, tmp_path):
    """A deletion-vector delete is an ordinary commit to SQL readers."""
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=2
    )
    t.delete(F.col("provider") == "met", mode="dv")
    f = SqlFacade(spark)
    f.register_table("media", t)
    rows = f.sql(
        "SELECT DISTINCT provider FROM media ORDER BY provider"
    ).collect()
    assert [r["provider"] for r in rows] == ["flickr"]
    assert f.sql(
        "SELECT count(*) AS n FROM media VERSION AS OF 1"
    ).collect()[0]["n"] == 40


def test_facade_dml_roundtrip(spark, tmp_path):
    """INSERT INTO routes to the upsert merge (url guard included),
    UPDATE/DELETE to predicated CoW commits; each statement sees the
    previous one's version through the auto-refreshed head view."""
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=2
    )
    f = SqlFacade(spark)
    f.register_table("media", t, columns=COLS)
    f.register_df("staging", mk(spark, _batch_rows()))
    ins = f.sql("INSERT INTO media SELECT * FROM staging").collect()[0]
    assert ins["version"] == 2 and ins["rows"] == 41
    got = _canon(t.read())
    assert got[("met", "f020")] == "updated"
    upd = f.sql(
        "UPDATE media SET title = upper(title) WHERE provider = 'met'"
    ).collect()[0]
    assert upd["version"] == 3
    assert _canon(t.read())[("met", "f020")] == "UPDATED"
    dele = f.sql("DELETE FROM media WHERE provider = 'met'").collect()[0]
    assert dele["version"] == 4
    assert all(p == "flickr" for p, _ in _canon(t.read()))
    # INSERT without registered columns is refused with guidance
    f2 = SqlFacade(spark)
    f2.register_table("m2", t)
    with pytest.raises(ValueError, match="ColumnSpec"):
        f2.sql("INSERT INTO m2 SELECT * FROM staging")


def test_facade_dml_set_parses_top_level_commas_only(spark, tmp_path):
    """SET expressions with function-call commas must not mis-split."""
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=2
    )
    f = SqlFacade(spark)
    f.register_table("media", t)
    f.sql(
        "UPDATE media SET title = concat(provider, ':', "
        "foreign_identifier), url = concat(url, '#x') "
        "WHERE foreign_identifier = 'f000'"
    )
    row_ = (
        t.read().filter(F.col("foreign_identifier") == "f000").collect()[0]
    )
    assert row_["title"] == "flickr:f000" and row_["url"].endswith("#x")


def test_facade_alter_table_text(spark, tmp_path):
    """ALTER TABLE text routes to the metadata-only schema/constraint
    commits: RENAME/DROP COLUMN and ADD/DROP CONSTRAINT CHECK."""
    from openverse_catalog_spark.operators.cowtable import (
        ConstraintViolation,
    )

    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=2
    )
    f = SqlFacade(spark)
    f.register_table("media", t, columns=COLS)
    v = f.sql(
        "ALTER TABLE media RENAME COLUMN title TO headline"
    ).collect()[0]["version"]
    assert v == 2
    assert "headline" in f.sql("SELECT * FROM media").columns
    f.sql(
        "ALTER TABLE media ADD CONSTRAINT scheme CHECK (url LIKE 'http%')"
    )
    with pytest.raises(ConstraintViolation):
        f.sql("UPDATE media SET url = 'ftp://x' "
              "WHERE foreign_identifier = 'f000'")
    f.sql("ALTER TABLE media DROP CONSTRAINT scheme")
    f.sql("UPDATE media SET url = 'ftp://x' "
          "WHERE foreign_identifier = 'f000'")
    f.sql("ALTER TABLE media DROP COLUMN headline")
    assert "headline" not in f.sql("SELECT * FROM media").columns


def test_facade_merge_into_text(spark, tmp_path):
    """MERGE INTO ... WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    THEN INSERT * routes to the upsert merge and matches the API path;
    a mis-keyed or malformed ON clause raises instead of silently
    changing upsert semantics."""
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=2
    )
    api = CowTable.create(
        spark, str(tmp_path / "api"), mk(spark, _base_rows()), target_files=2
    )
    api.merge(mk(spark, _batch_rows()), COLS, deterministic=True)
    f = SqlFacade(spark)
    f.register_table("media", t, columns=COLS)
    f.register_df("staging", mk(spark, _batch_rows()))
    res = f.sql(
        "MERGE INTO media AS t USING staging AS s "
        "ON t.provider = s.provider "
        "AND t.foreign_identifier = s.foreign_identifier "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0]
    assert res["version"] == 2
    assert _canon(t.read()) == _canon(api.read())
    # view without alias: the view name is the source alias
    f.sql(
        "MERGE INTO media USING staging "
        "ON media.provider = staging.provider "
        "AND media.foreign_identifier = staging.foreign_identifier "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    with pytest.raises(ValueError, match="merge keys"):
        f.sql(
            "MERGE INTO media AS t USING staging AS s "
            "ON t.provider = s.provider "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    with pytest.raises(ValueError, match="key equalities"):
        f.sql(
            "MERGE INTO media AS t USING staging AS s "
            "ON t.provider = s.provider AND t.url < s.url "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    with pytest.raises(ValueError, match="ColumnSpec"):
        f2 = SqlFacade(spark)
        f2.register_table("m2", t)
        f2.sql(
            "MERGE INTO m2 AS t USING staging AS s "
            "ON t.provider = s.provider "
            "AND t.foreign_identifier = s.foreign_identifier "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )


def test_facade_maintenance_text(spark, tmp_path):
    """DESCRIBE HISTORY / OPTIMIZE [ZORDER BY (...)] / VACUUM [RETAIN N
    VERSIONS] as plain text — the maintenance surface the reference runs
    as dedicated DAGs, routed to the table's compaction/vacuum commits."""
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=4
    )
    t.merge(mk(spark, _batch_rows()), COLS, deterministic=True)
    f = SqlFacade(spark)
    f.register_table("media", t, columns=COLS)
    hist = f.sql("DESCRIBE HISTORY media").collect()
    assert [r["operation"] for r in hist] == ["create", "merge"]
    before = t.read().count()
    res = f.sql("OPTIMIZE media").collect()[0]
    assert t.read().count() == before
    assert res["version"] >= 2
    n_manifests = len(t._manifest_names())
    out = f.sql("VACUUM media RETAIN 1 VERSIONS").collect()[0]
    assert out["files_deleted"] >= 0
    assert len(t._manifest_names()) <= n_manifests
    # table still reads fine after vacuum
    assert t.read().count() == before


def test_facade_materialized_view_text(spark, tmp_path):
    """CREATE MATERIALIZED VIEW builds the incremental MV; REFRESH
    advances it from the base's change feed; SELECTs read the view
    (stale until refreshed, exact after)."""
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=2
    )
    f = SqlFacade(spark)
    f.register_table("media", t, columns=COLS)
    f.sql(
        "CREATE MATERIALIZED VIEW by_provider AS "
        "SELECT provider, count(*) AS n, max(title) AS top_title "
        "FROM media GROUP BY provider"
    )
    n0 = {
        r["provider"]: r["n"]
        for r in f.sql("SELECT provider, n FROM by_provider").collect()
    }
    assert sum(n0.values()) == 40
    t.merge(mk(spark, _batch_rows()), COLS, deterministic=True)
    # stale until refreshed
    stale = {
        r["provider"]: r["n"]
        for r in f.sql("SELECT provider, n FROM by_provider").collect()
    }
    assert stale == n0
    r = f.sql("REFRESH MATERIALIZED VIEW by_provider").collect()[0]
    assert r["refreshed"]
    fresh = f.sql("SELECT sum(n) AS total FROM by_provider").collect()[0]
    assert fresh["total"] == t.read().count()
    with pytest.raises(ValueError, match="unsupported MV select item"):
        f.sql(
            "CREATE MATERIALIZED VIEW bad AS "
            "SELECT provider, median(title) AS m FROM media GROUP BY provider"
        )
    with pytest.raises(ValueError, match="registered lake table"):
        f.sql(
            "CREATE MATERIALIZED VIEW bad2 AS "
            "SELECT x, count(*) AS n FROM nowhere GROUP BY x"
        )


def test_facade_catalog_transactions(spark, tmp_path):
    """BEGIN/COMMIT publishes multi-table DML atomically through the
    lake catalog; reads inside the txn are snapshot-isolated with
    read-your-writes; ROLLBACK leaves no trace; implicit per-statement
    transactions keep the catalog pin advancing for bare DML."""
    from pyspark.sql import Row

    from openverse_catalog_spark.operators.catalog import LakeCatalog
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    cols = [
        ColumnSpec("id", Datatype.int, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("val", Datatype.int),
    ]

    def rows(*pairs):
        return spark.createDataFrame(
            [Row(id=i, val=v) for i, v in pairs], "id bigint, val bigint"
        )

    cat = LakeCatalog.create(spark, str(tmp_path / "lake"))
    cat.register("img", CowTable.create(
        spark, str(tmp_path / "ta"), rows((1, 10), (2, 20)), keys=("id",)))
    cat.register("aud", CowTable.create(
        spark, str(tmp_path / "tb"), rows((1, 100)), keys=("id",)))

    f = SqlFacade(spark)
    f.attach_catalog(cat, columns={"img": cols, "aud": cols})
    f.register_df("batch_img", rows((3, 30)))
    f.register_df("batch_aud", rows((2, 200)))

    f.sql("BEGIN TRANSACTION")
    f.sql("INSERT INTO img SELECT * FROM batch_img")
    f.sql("INSERT INTO aud SELECT * FROM batch_aud")
    # read-your-writes inside the txn...
    assert f.sql("SELECT count(*) AS n FROM img").head()["n"] == 3
    # ...but catalog readers outside still see the begin snapshot
    assert cat.read("img").count() == 2
    f.sql("COMMIT")
    assert cat.read("img").count() == 3
    assert cat.read("aud").count() == 2
    assert f.sql("SELECT count(*) AS n FROM aud").head()["n"] == 2

    # ROLLBACK: both mutations vanish for every reader
    f.sql("BEGIN")
    f.sql("UPDATE img SET val = -1")
    f.sql("DELETE FROM aud WHERE id = 1")
    assert f.sql("SELECT min(val) AS m FROM img").head()["m"] == -1
    out = f.sql("ROLLBACK").head()
    assert out["tables_rolled_back"] == 2
    assert f.sql("SELECT min(val) AS m FROM img").head()["m"] == 10
    assert f.sql("SELECT count(*) AS n FROM aud").head()["n"] == 2
    assert {r["val"] for r in cat.read("img").collect()} == {10, 20, 30}

    # bare DML on a catalog table = implicit single-statement txn
    v0 = cat.version
    f.sql("DELETE FROM img WHERE id = 2")
    assert cat.version == v0 + 1
    assert cat.read("img").count() == 2

    # statement-state errors
    with pytest.raises(ValueError, match="COMMIT without"):
        f.sql("COMMIT")
    f.sql("BEGIN")
    with pytest.raises(ValueError, match="already open"):
        f.sql("BEGIN")
    f.sql("ROLLBACK")
    f2 = SqlFacade(spark)
    with pytest.raises(ValueError, match="attach_catalog"):
        f2.sql("BEGIN")


def test_facade_create_drop_restore_table_text(spark, tmp_path):
    """CTAS materializes a lake table with derived upsert specs (DML
    text works immediately), RESTORE TABLE rolls back as text, DROP
    TABLE unregisters facade + catalog while history stays readable."""
    from openverse_catalog_spark.operators.catalog import LakeCatalog

    f = SqlFacade(spark, workdir=str(tmp_path / "work"))
    f.register_df(
        "src",
        spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5)], "id bigint, s string, x double"
        ),
    )
    out = f.sql(
        "CREATE TABLE facts PRIMARY KEY (id) AS SELECT * FROM src"
    ).head()
    assert out["table"] == "facts" and out["rows"] == 2
    f.sql("INSERT INTO facts SELECT id + 10 AS id, s, x + 1 AS x FROM src")
    assert f.sql("SELECT count(*) AS n FROM facts").head()["n"] == 4
    res = f.sql("RESTORE TABLE facts TO VERSION AS OF 1").head()
    assert res["restored_from"] == 1
    assert f.sql("SELECT count(*) AS n FROM facts").head()["n"] == 2
    f.sql("DROP TABLE facts")
    with pytest.raises(Exception):
        f.sql("SELECT * FROM facts").collect()
    # recreating at the dropped table's location is refused (files
    # stay for time travel); a fresh LOCATION works
    with pytest.raises(ValueError, match="already exists"):
        f.sql("CREATE TABLE facts PRIMARY KEY (id) AS SELECT * FROM src")
    f.sql(
        f"CREATE TABLE facts PRIMARY KEY (id) "
        f"LOCATION '{tmp_path / 'facts2'}' AS SELECT * FROM src"
    )
    with pytest.raises(ValueError, match="already exists"):
        f.sql(
            f"CREATE TABLE facts PRIMARY KEY (id) "
            f"LOCATION '{tmp_path / 'facts3'}' AS SELECT * FROM src"
        )
    with pytest.raises(ValueError, match="PRIMARY KEY column"):
        f.sql("CREATE TABLE o PRIMARY KEY (nope) AS SELECT * FROM src")
    with pytest.raises(ValueError, match="workdir"):
        SqlFacade(spark).sql(
            "CREATE TABLE o PRIMARY KEY (id) AS SELECT * FROM src"
        )

    # catalog-attached CTAS registers through the catalog; DROP commits
    # the unregistration, and the old catalog version still time-travels
    cat = LakeCatalog.create(spark, str(tmp_path / "lake"))
    fc = SqlFacade(spark, workdir=str(tmp_path / "work2"))
    fc.attach_catalog(cat)
    fc.register_df("src2", spark.range(3).select("id"))
    fc.sql("CREATE TABLE dim PRIMARY KEY (id) AS SELECT id FROM src2")
    v_with = cat.version
    assert cat.read("dim").count() == 3
    fc.sql("DELETE FROM dim WHERE id = 0")  # implicit txn advances pin
    assert cat.read("dim").count() == 2
    fc.sql("DROP TABLE dim")
    with pytest.raises(KeyError):
        cat.read("dim")
    assert cat.read("dim", catalog_version=v_with).count() == 3


def test_facade_show_tables(spark, tmp_path):
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=2
    )
    f = SqlFacade(spark)
    f.register_table("media", t, columns=COLS)
    rows = {r["table"]: r for r in f.sql("SHOW TABLES").collect()}
    assert rows["media"]["kind"] == "lake"
    assert rows["media"]["version"] == 1
    assert rows["media"]["location"].endswith("tbl")


def test_facade_copy_to_exports(spark, tmp_path):
    """COPY (query) TO exports parquet and the reference's TSV load
    format (tab sep, \\N nulls, no header) — reloadable by the tolerant
    TSV reader and Postgres COPY alike."""
    f = SqlFacade(spark)
    f.register_df(
        "src",
        spark.createDataFrame(
            [(1, "a"), (2, None), (3, "c")], "id bigint, s string"
        ),
    )
    pq = str(tmp_path / "out_pq")
    res = f.sql(f"COPY (SELECT * FROM src WHERE id < 3) TO '{pq}' "
                "(FORMAT PARQUET)").head()
    assert res["rows"] == 2 and res["format"] == "PARQUET"
    assert spark.read.parquet(pq).count() == 2

    tsv = str(tmp_path / "out_tsv")
    f.sql(f"COPY (SELECT * FROM src) TO '{tsv}' (FORMAT TSV)")
    back = spark.read.option("sep", "\t").option("nullValue", "\\N").csv(tsv)
    rows = {(r["_c0"], r["_c1"]) for r in back.collect()}
    assert rows == {("1", "a"), ("2", None), ("3", "c")}


def test_facade_partitioned_ctas_and_spec_evolution(spark, tmp_path):
    """PARTITIONED BY in CTAS text creates a hidden-partitioned lake
    table (files record partition fields; reads on the raw column
    prune), and ALTER TABLE ... SET PARTITION SPEC evolves the spec
    metadata-only."""
    import datetime

    f = SqlFacade(spark, workdir=str(tmp_path / "work"))
    rows = [
        (i, f"s{i % 3}", datetime.datetime(2024, 1 + (i % 6), 5, i % 24))
        for i in range(240)
    ]
    f.register_df(
        "src",
        spark.createDataFrame(rows, "id bigint, s string, ts timestamp"),
    )
    out = f.sql(
        "CREATE TABLE ev PRIMARY KEY (id) "
        "PARTITIONED BY (month(ts), bucket(4, s)) "
        "AS SELECT * FROM src"
    ).head()
    assert out["rows"] == 240
    t = f._tables["ev"]
    assert [s["name"] for s in t.partition_spec] == ["ts_month", "s_bucket4"]
    assert all("part" in e for e in t._manifest()["files"])
    picked, rest = t.read_where(
        {"ts": ("2024-03-01 00:00:00", "2024-03-31 23:59:59")}, _split=True
    )
    assert rest, "month partition pruning must skip files"
    n = f.sql(
        "SELECT count(*) AS n FROM ev "
        "WHERE ts >= '2024-03-01' AND ts < '2024-04-01'"
    ).head()["n"]
    assert n == 40
    v = f.sql("ALTER TABLE ev SET PARTITION SPEC (day(ts))").head()["version"]
    assert v == t.version
    assert [s["name"] for s in t.partition_spec] == ["ts_day"]
    # all historical field definitions survive for old-file pruning
    assert set(t.partition_fields) == {"ts_month", "s_bucket4", "ts_day"}


def test_facade_metadata_table_functions(spark, tmp_path):
    """TABLE_FILES / TABLE_PARTITIONS expose the manifest as queryable
    relations (Delta/Iceberg metadata tables) — sums must equal table
    totals, partition rows must be exact for partition-pure files, and
    a version argument pins a historical snapshot's metadata."""
    import datetime

    f = SqlFacade(spark, workdir=str(tmp_path / "work"))
    rows = [
        (i, datetime.datetime(2024, 1 + (i % 3), 4, i % 24), f"v{i}")
        for i in range(90)
    ]
    f.register_df(
        "src", spark.createDataFrame(rows, "id bigint, ts timestamp, s string")
    )
    f.sql(
        "CREATE TABLE mt PRIMARY KEY (id) PARTITIONED BY (month(ts)) "
        "AS SELECT * FROM src"
    )
    total = f.sql(
        "SELECT sum(rows) AS r, count(*) AS files FROM TABLE_FILES('mt')"
    ).head()
    assert total["r"] == 90 and total["files"] >= 3
    parts = {
        r["m"]: r["r"]
        for r in f.sql(
            "SELECT element_at(partition, 'ts_month') AS m, sum(rows) AS r "
            "FROM TABLE_PARTITIONS('mt') GROUP BY 1"
        ).collect()
    }
    assert parts == {"2024-01": 30, "2024-02": 30, "2024-03": 30}
    # version-pinned metadata: delete a month, v1 metadata is unchanged
    f.sql("DELETE FROM mt WHERE ts >= '2024-03-01'")
    now_parts = {
        r["m"]: r["r"]
        for r in f.sql(
            "SELECT element_at(partition, 'ts_month') AS m, sum(rows) AS r "
            "FROM TABLE_PARTITIONS('mt') GROUP BY 1"
        ).collect()
    }
    assert "2024-03" not in now_parts
    v1 = f.sql(
        "SELECT sum(rows) AS r FROM TABLE_FILES('mt', 1)"
    ).head()["r"]
    assert v1 == 90


def test_facade_merge_when_clauses_text(spark, tmp_path):
    """General conditional MERGE text: WHEN MATCHED AND c THEN DELETE /
    WHEN MATCHED AND c THEN UPDATE SET col = expr / WHEN NOT MATCHED
    AND c THEN INSERT * routes to merge_when with the statement's own
    aliases; update-before-delete and duplicate clauses raise."""
    base = spark.createDataFrame(
        [(f"k{i:02d}", 10 * i, "keep") for i in range(20)],
        "fid string, val long, tag string",
    )
    t = CowTable.create(
        spark, str(tmp_path / "mw"), base, keys=("fid",), target_files=2
    )
    f = SqlFacade(spark)
    f.register_table("items", t)
    f.register_df(
        "changes",
        spark.createDataFrame(
            [
                ("k01", 999, "del"),
                ("k02", 999, "upd"),
                ("k03", 999, "other"),
                ("new1", 7, "ins"),
                ("new2", 7, "no"),
            ],
            "fid string, val long, tag string",
        ),
    )
    res = f.sql(
        "MERGE INTO items AS t USING changes AS c ON t.fid = c.fid "
        "WHEN MATCHED AND c.tag = 'del' THEN DELETE "
        "WHEN MATCHED AND c.tag = 'upd' THEN "
        "UPDATE SET val = t.val + c.val, tag = c.tag "
        "WHEN NOT MATCHED AND c.tag = 'ins' THEN INSERT *"
    ).collect()[0]
    assert res["version"] == t.version
    got = {
        r["fid"]: (r["val"], r["tag"])
        for r in f.sql("SELECT * FROM items").collect()
    }
    assert "k01" not in got
    assert got["k02"] == (20 + 999, "upd")
    assert got["k03"] == (30, "keep")
    assert got["new1"] == (7, "ins")
    assert "new2" not in got

    # update-only with SET * (no insert clause -> unmatched dropped)
    f.register_df(
        "stars",
        spark.createDataFrame(
            [("k05", 1, "star"), ("ghost", 1, "star")],
            "fid string, val long, tag string",
        ),
    )
    f.sql(
        "MERGE INTO items AS t USING stars AS s ON t.fid = s.fid "
        "WHEN MATCHED THEN UPDATE SET *"
    )
    got = {
        r["fid"]: (r["val"], r["tag"])
        for r in f.sql("SELECT * FROM items").collect()
    }
    assert got["k05"] == (1, "star") and "ghost" not in got

    # CASE WHEN inside a SET expression does not confuse clause split
    f.sql(
        "MERGE INTO items AS t USING stars AS s ON t.fid = s.fid "
        "WHEN MATCHED THEN UPDATE SET "
        "tag = CASE WHEN s.val > 0 THEN 'pos' ELSE 'neg' END"
    )
    assert {
        r["tag"] for r in
        f.sql("SELECT tag FROM items WHERE fid = 'k05'").collect()
    } == {"pos"}

    with pytest.raises(ValueError, match="DELETE first"):
        f.sql(
            "MERGE INTO items AS t USING stars AS s ON t.fid = s.fid "
            "WHEN MATCHED AND s.val = 1 THEN UPDATE SET val = s.val "
            "WHEN MATCHED THEN DELETE"
        )
    with pytest.raises(ValueError, match="duplicate WHEN NOT MATCHED"):
        f.sql(
            "MERGE INTO items AS t USING stars AS s ON t.fid = s.fid "
            "WHEN NOT MATCHED THEN INSERT * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    with pytest.raises(ValueError, match="unparseable MERGE clause"):
        f.sql(
            "MERGE INTO items AS t USING stars AS s ON t.fid = s.fid "
            "WHEN MATCHED THEN FROB"
        )


def test_facade_join_mv_text(spark, tmp_path):
    """CREATE MATERIALIZED VIEW ... AS SELECT * FROM l JOIN r ON ...
    builds a JoinMaterializedView; REFRESH advances it from both
    feeds; the view name queries the refreshed contents."""
    left = CowTable.create(
        spark, str(tmp_path / "l"),
        spark.createDataFrame(
            [(f"i{n}", n % 3, float(n)) for n in range(12)],
            "iid string, cat int, v double",
        ),
        keys=("iid",), target_files=2,
    )
    right = CowTable.create(
        spark, str(tmp_path / "r"),
        spark.createDataFrame(
            [(0, "zero"), (1, "one"), (2, "two")], "cat int, label string"
        ),
        keys=("cat",), target_files=1,
    )
    f = SqlFacade(spark)
    f.register_table("items", left)
    f.register_table("cats", right)
    f.sql(
        "CREATE MATERIALIZED VIEW enriched AS "
        "SELECT * FROM items JOIN cats ON items.cat = cats.cat"
    )
    assert f.sql("SELECT count(*) AS n FROM enriched").collect()[0]["n"] == 12
    right.update(F.col("cat") == 1, {"label": F.lit("ONE")})
    left.delete(F.col("iid") == "i0")
    res = f.sql("REFRESH MATERIALIZED VIEW enriched").collect()[0]
    assert res["refreshed"]
    got = {
        (r["iid"], r["label"])
        for r in f.sql(
            "SELECT iid, label FROM enriched WHERE cat = 1"
        ).collect()
    }
    assert got == {("i1", "ONE"), ("i4", "ONE"), ("i7", "ONE"),
                   ("i10", "ONE")}
    assert f.sql(
        "SELECT count(*) AS n FROM enriched"
    ).collect()[0]["n"] == 11

    with pytest.raises(ValueError, match="SAME column name"):
        f.sql(
            "CREATE MATERIALIZED VIEW bad AS "
            "SELECT * FROM items JOIN cats ON items.cat = cats.label"
        )
    with pytest.raises(ValueError, match="registered lake"):
        f.sql(
            "CREATE MATERIALIZED VIEW bad AS "
            "SELECT * FROM items JOIN nope ON items.cat = nope.cat"
        )


def test_facade_apply_changes_and_incremental_optimize_text(
    spark, tmp_path
):
    """APPLY CHANGES INTO ... FROM ... SEQUENCE BY applies a sequenced
    CDC batch in one commit; OPTIMIZE ... ZORDER BY (...) INCREMENTAL
    reuses the pinned cluster spec and rewrites only new files."""
    t = CowTable.create(
        spark, str(tmp_path / "tbl"),
        spark.createDataFrame(
            [(f"k{i}", float(i), 0, float(i % 7), float(i % 5))
             for i in range(40)],
            "fid string, val double, seq long, x double, y double",
        ),
        keys=("fid",), target_files=2, stats_cols=("x", "y"),
    )
    f = SqlFacade(spark)
    f.register_table("items", t)
    f.register_df(
        "events",
        spark.createDataFrame(
            [
                ("k1", 100.0, 5, 0.0, 0.0, "U"),
                ("k2", None, 5, None, None, "D"),
                ("knew", 7.0, 5, 1.0, 1.0, "U"),
                ("k3", -1.0, -9, 9.0, 9.0, "U"),  # stale: fenced
            ],
            "fid string, val double, seq long, x double, y double, "
            "op string",
        ),
    )
    f.sql(
        "APPLY CHANGES INTO items FROM events SEQUENCE BY seq"
    )
    got = {r["fid"]: r["val"] for r in f.sql(
        "SELECT fid, val FROM items").collect()}
    assert got["k1"] == 100.0 and "k2" not in got
    assert got["knew"] == 7.0 and got["k3"] == 3.0  # stale fenced

    f.sql("OPTIMIZE items ZORDER BY (x, y)")
    m1 = t._manifest()
    tag = m1["files"][0]["cluster"]
    t.merge_when(
        spark.createDataFrame(
            [("kz", 1.0, 9, 3.0, 3.0)],
            "fid string, val double, seq long, x double, y double",
        ),
        update_set="*",
    )
    res = f.sql("OPTIMIZE items ZORDER BY (x, y) INCREMENTAL").collect()
    m2 = t._manifest()
    clustered_before = {e["path"] for e in m1["files"]}
    assert clustered_before & {e["path"] for e in m2["files"]}, (
        "incremental OPTIMIZE must carry already-clustered files"
    )
    assert all(
        e["cluster"]["bounds"] == tag["bounds"]
        for e in m2["files"] if e.get("cluster")
    )


def test_facade_stats_driven_broadcast(spark, tmp_path):
    """ANALYZE feeds planning: with Spark's size-based auto-broadcast
    disabled, a facade join picks SortMergeJoin until the small side
    is ANALYZEd; once stored stats say it fits under
    spark.openverse.sql.autoBroadcastRows, the head view carries a
    broadcast hint and the SAME query text flips to
    BroadcastHashJoin. Results identical both ways."""
    big = CowTable.create(
        spark, str(tmp_path / "big"),
        spark.range(2000).select(
            F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
            .alias("k"),
            F.col("id").alias("v"),
        ),
        keys=("k", "v"), target_files=4,
    )
    dim = CowTable.create(
        spark, str(tmp_path / "dim"),
        spark.range(50).select(
            F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
            F.concat(F.lit("label"), F.col("id").cast("string"))
            .alias("label"),
        ),
        keys=("k",), target_files=1,
    )
    f = SqlFacade(spark)
    f.register_table("facts", big)
    f.register_table("dim", dim)
    q = (
        "SELECT d.label, count(*) AS n FROM facts x JOIN dim d "
        "ON x.k = d.k GROUP BY d.label"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        before = f.sql(q)
        plan0 = before._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan0
        rows0 = {(r["label"], r["n"]) for r in before.collect()}

        dim.analyze()
        after = f.sql(q)
        plan1 = after._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan1, (
            "stored stats under the row bound must flip the join"
        )
        assert {(r["label"], r["n"]) for r in after.collect()} == rows0

        # the decision is conf-gated: 0 disables stats broadcasting
        spark.conf.set("spark.openverse.sql.autoBroadcastRows", "0")
        f2 = SqlFacade(spark)
        f2.register_table("facts", big)
        f2.register_table("dim", dim)
        plan2 = (
            f2.sql(q)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" not in plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.openverse.sql.autoBroadcastRows")


def test_facade_join_agg_mv_text(spark, tmp_path):
    """CREATE MATERIALIZED VIEW with a JOIN + GROUP BY body — the
    reference's actual MV shape (image_view) — builds the composed
    JoinAggMaterializedView; REFRESH advances it through churn on both
    bases and equals the full recompute."""
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    left = CowTable.create(
        spark, str(tmp_path / "l"),
        spark.createDataFrame(
            [(f"i{n:02d}", n % 3, 10.0 * (n + 1)) for n in range(15)],
            "iid string, cat int, price double",
        ),
        keys=("iid",), target_files=2,
    )
    right = CowTable.create(
        spark, str(tmp_path / "r"),
        spark.createDataFrame(
            [(0, "zero"), (1, "one"), (2, "two")],
            "cat int, label string",
        ),
        keys=("cat",), target_files=1,
    )
    f = SqlFacade(spark)
    lcols = [
        ColumnSpec("iid", Datatype.char,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("cat", Datatype.int),
        ColumnSpec("price", Datatype.double),
    ]
    rcols = [
        ColumnSpec("cat", Datatype.int,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("label", Datatype.char),
    ]
    f.register_table("facts", left, columns=lcols)
    f.register_table("dims", right, columns=rcols)
    f.sql(
        "CREATE MATERIALIZED VIEW seg_stats AS "
        "SELECT label, count(*) AS n, sum(price) AS total, "
        "min(price) AS lo, max(price) AS hi "
        "FROM facts JOIN dims ON facts.cat = dims.cat "
        "GROUP BY label"
    )

    def truth():
        return {
            r["label"]: (r["n"], r["total"], r["lo"], r["hi"])
            for r in left.read().join(right.read(), "cat")
            .groupBy("label").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("price").alias("total"),
                F.min("price").alias("lo"),
                F.max("price").alias("hi"),
            ).collect()
        }

    def got():
        return {
            r["label"]: (r["n"], r["total"], r["lo"], r["hi"])
            for r in f.sql(
                "SELECT label, n, total, lo, hi FROM seg_stats"
            ).collect()
        }

    assert got() == truth()
    # churn both sides through DML text, refresh through text
    f.sql("UPDATE facts SET price = price + 100 WHERE cat = 1")
    f.sql("DELETE FROM facts WHERE iid = 'i00'")
    f.sql("UPDATE dims SET label = 'TWO' WHERE cat = 2")
    out = f.sql("REFRESH MATERIALIZED VIEW seg_stats").collect()[0]
    assert out["refreshed"] is True
    t = truth()
    assert got() == t and "TWO" in t and "two" not in t


def test_facade_show_and_drop_materialized_views(spark, tmp_path):
    """SHOW MATERIALIZED VIEWS lists every registered view with its
    kind; DROP MATERIALIZED VIEW unregisters the name, drops the temp
    view, and removes the backing storage (Postgres semantics)."""
    import os

    base = CowTable.create(
        spark, str(tmp_path / "b"),
        spark.createDataFrame(
            [(f"k{n}", n % 3, float(n)) for n in range(9)],
            "k string, grp int, v double",
        ),
        keys=("k",), target_files=1,
    )
    f = SqlFacade(spark)
    f.register_table("t", base)
    f.sql(
        "CREATE MATERIALIZED VIEW agg1 AS "
        "SELECT grp, count(*) AS n FROM t GROUP BY grp"
    )
    got = {
        (r["view"], r["kind"])
        for r in f.sql("SHOW MATERIALIZED VIEWS").collect()
    }
    assert got == {("agg1", "aggregate")}
    root = f._mvs["agg1"].root
    assert os.path.isdir(root)
    out = f.sql("DROP MATERIALIZED VIEW agg1").collect()
    assert out[0]["dropped"] == "agg1"
    assert not os.path.isdir(root)
    assert f.sql("SHOW MATERIALIZED VIEWS").count() == 0
    import pytest

    with pytest.raises(Exception):
        f.sql("SELECT * FROM agg1").collect()


def test_facade_broadcast_hint_cannot_go_stale(spark, tmp_path):
    """The forced broadcast hint is bounded by the MANIFEST's exact
    live row count at the queried version, not by the analyzed
    snapshot's count: a dimension analyzed while small that then grows
    past the bound drops out of broadcast planning on the very next
    facade query with NO re-ANALYZE — stale statistics can never pin a
    driver-OOM-sized broadcast. A stale-but-still-small table keeps
    the hint (the stats stay the opt-in; the manifest answers size)."""
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    big = CowTable.create(
        spark, str(tmp_path / "big"),
        spark.range(2000).select(
            F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
            .alias("k"),
            F.col("id").alias("v"),
        ),
        keys=("k", "v"), target_files=4,
    )
    dim = CowTable.create(
        spark, str(tmp_path / "dim"),
        spark.range(50).select(
            F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
            F.concat(F.lit("label"), F.col("id").cast("string"))
            .alias("label"),
        ),
        keys=("k",), target_files=1,
    )
    dcols = [
        ColumnSpec("k", Datatype.char,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("label", Datatype.char),
    ]
    q = (
        "SELECT d.label, count(*) AS n FROM facts x JOIN dim d "
        "ON x.k = d.k GROUP BY d.label"
    )

    def plan(f):
        return f.sql(q)._jdf.queryExecution().executedPlan().toString()

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.openverse.sql.autoBroadcastRows", "500")
    try:
        f = SqlFacade(spark)
        f.register_table("facts", big)
        f.register_table("dim", dim, columns=dcols)
        dim.analyze()
        assert "BroadcastHashJoin" in plan(f)
        rows0 = {(r["label"], r["n"]) for r in f.sql(q).collect()}

        # stale-but-still-small: growth UNDER the bound keeps the hint
        # without re-analyzing (manifest answers the size question)
        dim.merge(
            spark.range(100).select(
                F.concat(F.lit("s"), F.col("id").cast("string"))
                .alias("k"),
                F.lit("extra").alias("label"),
            ),
            dcols, deterministic=True,
        )
        assert dim.stats()["version"] < dim.version  # stats ARE stale
        assert "BroadcastHashJoin" in plan(f)

        # 10x backfill past the bound, still no re-ANALYZE: the hint
        # must drop on the next facade query
        dim.merge(
            spark.range(5000).select(
                F.concat(F.lit("g"), F.col("id").cast("string"))
                .alias("k"),
                F.lit("grown").alias("label"),
            ),
            dcols, deterministic=True,
        )
        assert dim.stats()["rows"] <= 500 < dim.live_rows()
        assert "BroadcastHashJoin" not in plan(f), (
            "stale ANALYZE stats must not pin a forced broadcast on a "
            "table that has grown past the bound"
        )
        # results stay identical either way (big side only joins k0..49)
        assert {(r["label"], r["n"]) for r in f.sql(q).collect()} == rows0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.openverse.sql.autoBroadcastRows")


def test_facade_describe_detail_and_tombstones(spark, tmp_path):
    """DESCRIBE DETAIL surfaces the operational state SQL could not
    see: snapshot size, tombstone-store liveness + sequence horizon,
    ANALYZE freshness; TABLE_TOMBSTONES exposes the delete fences as a
    queryable relation (and errors usefully when no store exists)."""
    import pytest

    from openverse_catalog_spark.streaming.incremental import apply_changes

    t = CowTable.create(
        spark, str(tmp_path / "d"),
        spark.createDataFrame(
            [(f"k{i}", float(i), 0) for i in range(10)],
            "fid string, val double, seq long",
        ),
        keys=("fid",), target_files=2,
    )
    f = SqlFacade(spark)
    f.register_table("t", t)

    # fresh table: no tombstones, no stats
    d0 = f.sql("DESCRIBE DETAIL t").collect()[0]
    assert d0["version"] == 1 and d0["rows"] == 10
    assert d0["has_tombstones"] is False and d0["tombstones"] == 0
    assert d0["tombstone_horizon"] is None
    assert d0["stats_version"] is None and d0["stats_lag"] is None
    with pytest.raises(ValueError, match="no live tombstone store"):
        f.sql("SELECT * FROM TABLE_TOMBSTONES('t')")

    # CDC deletes with retention create the store; stats get analyzed
    sch = "fid string, val double, seq long, op string"
    apply_changes(
        t,
        spark.createDataFrame(
            [("k1", None, 50, "D"), ("k2", None, 70, "D"),
             ("k3", 9.9, 30, "U")], sch,
        ),
        sequence_by="seq", tombstone_retention=3600,
    )
    t.analyze()
    d1 = f.sql("DESCRIBE DETAIL t").collect()[0]
    assert d1["has_tombstones"] is True and d1["tombstones"] == 2
    assert d1["tombstone_horizon"] == "70"  # max fenced sequence
    assert d1["stats_version"] == t.version and d1["stats_lag"] == 0

    tomb = f.sql(
        "SELECT fid, __ts_seq FROM TABLE_TOMBSTONES('t') ORDER BY fid"
    ).collect()
    assert [(r["fid"], r["__ts_seq"]) for r in tomb] == [
        ("k1", 50), ("k2", 70),
    ]
    # composes like any relation: horizon via plain SQL
    h = f.sql(
        "SELECT max(__ts_seq) AS h FROM TABLE_TOMBSTONES('t')"
    ).collect()[0]["h"]
    assert h == 70
    # stats_lag counts commits since ANALYZE
    t.delete(F.col("fid") == "k5")
    d2 = f.sql("DESCRIBE DETAIL t").collect()[0]
    assert d2["stats_lag"] == 1


def test_facade_show_mvs_staleness(spark, tmp_path):
    """SHOW MATERIALIZED VIEWS reports each view's applied version(s)
    and its staleness (base commits not yet applied), matching the
    MV's own state file; REFRESH brings staleness back to 0."""
    base = CowTable.create(
        spark, str(tmp_path / "b"),
        spark.createDataFrame(
            [(f"k{n}", n % 3, float(n)) for n in range(9)],
            "k string, grp int, v double",
        ),
        keys=("k",), target_files=1,
    )
    dim = CowTable.create(
        spark, str(tmp_path / "dim"),
        spark.createDataFrame(
            [(f"k{n}", f"lab{n}") for n in range(9)],
            "k string, label string",
        ),
        keys=("k",), target_files=1,
    )
    f = SqlFacade(spark)
    f.register_table("t", base)
    f.register_table("d", dim)
    f.sql(
        "CREATE MATERIALIZED VIEW agg1 AS "
        "SELECT grp, count(*) AS n FROM t GROUP BY grp"
    )
    f.sql(
        "CREATE MATERIALIZED VIEW j1 AS "
        "SELECT * FROM t JOIN d ON t.k = d.k"
    )
    rows = {
        r["view"]: r for r in f.sql("SHOW MATERIALIZED VIEWS").collect()
    }
    st = f._mvs["agg1"]._load_state()
    assert rows["agg1"]["applied"] == f"v{st['applied_base']}"
    assert rows["agg1"]["staleness"] == 0
    assert rows["j1"]["staleness"] == 0

    # base commits the MVs have not applied -> staleness counts them
    base.delete(F.col("k") == "k0")
    base.delete(F.col("k") == "k1")
    dim.delete(F.col("k") == "k2")
    rows = {
        r["view"]: r for r in f.sql("SHOW MATERIALIZED VIEWS").collect()
    }
    st = f._mvs["agg1"]._load_state()
    assert rows["agg1"]["staleness"] == base.version - st["applied_base"]
    assert rows["agg1"]["staleness"] == 2
    assert rows["j1"]["staleness"] == 3  # 2 left + 1 right commits
    jst = f._mvs["j1"]._load_state()
    assert rows["j1"]["applied"] == (
        f"L{jst['applied_left']}/R{jst['applied_right']}"
    )

    f.sql("REFRESH MATERIALIZED VIEW agg1")
    f.sql("REFRESH MATERIALIZED VIEW j1")
    rows = {
        r["view"]: r for r in f.sql("SHOW MATERIALIZED VIEWS").collect()
    }
    assert rows["agg1"]["staleness"] == 0
    assert rows["j1"]["staleness"] == 0


def test_facade_left_join_agg_mv_rejects_right_group_cols(
    spark, tmp_path
):
    """A LEFT JOIN join+agg MV grouping by a right-sourced column is
    rejected at CREATE time: a right-side delete would NULL that group
    key in the change feed and break the aggregate stage's non-NULL
    contract at refresh (also guarded there). Grouping by join or
    left-side columns stays allowed."""
    import pytest

    left = CowTable.create(
        spark, str(tmp_path / "l"),
        spark.createDataFrame(
            [(f"k{n}", n % 3, float(n)) for n in range(9)],
            "k string, grp int, v double",
        ),
        keys=("k",), target_files=1,
    )
    right = CowTable.create(
        spark, str(tmp_path / "r"),
        spark.createDataFrame(
            [(f"k{n}", f"lab{n % 2}") for n in range(9)],
            "k string, label string",
        ),
        keys=("k",), target_files=1,
    )
    f = SqlFacade(spark)
    f.register_table("l", left)
    f.register_table("r", right)
    with pytest.raises(ValueError, match="right-sourced"):
        f.sql(
            "CREATE MATERIALIZED VIEW bad AS "
            "SELECT label, count(*) AS n FROM l LEFT JOIN r "
            "ON l.k = r.k GROUP BY label"
        )
    # left-side grouping is fine; inner join on right col is fine
    f.sql(
        "CREATE MATERIALIZED VIEW ok1 AS "
        "SELECT grp, count(*) AS n FROM l LEFT JOIN r "
        "ON l.k = r.k GROUP BY grp"
    )
    f.sql(
        "CREATE MATERIALIZED VIEW ok2 AS "
        "SELECT label, count(*) AS n FROM l JOIN r "
        "ON l.k = r.k GROUP BY label"
    )
    got = {r["view"] for r in f.sql("SHOW MATERIALIZED VIEWS").collect()}
    assert got == {"ok1", "ok2"}


def test_facade_maintain_statement(spark, tmp_path):
    """MAINTAIN <t> runs the whole unattended tick as one statement:
    small-file compact, stats advance (for ANALYZEd tables), vacuum —
    and the head view re-resolves so the next query sees the tick's
    commits."""
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    t = CowTable.create(
        spark, str(tmp_path / "mt"),
        spark.createDataFrame(
            [(f"k{i:03d}", float(i)) for i in range(100)],
            "fid string, v double",
        ),
        keys=("fid",), target_files=4,
    )
    t.analyze(kmv_k=64)
    cols = [
        ColumnSpec("fid", Datatype.char,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("v", Datatype.double),
    ]
    for i in range(3):  # small-file churn + stats staleness
        t.merge(
            spark.createDataFrame(
                [(f"n{i}{j}", float(j)) for j in range(5)],
                "fid string, v double",
            ),
            cols, deterministic=True,
        )
    f = SqlFacade(spark)
    f.register_table("t", t)
    out = f.sql("MAINTAIN t TARGET 1000 ROWS RETAIN 50 VERSIONS")
    row = out.collect()[0]
    assert row["compacted"] is True
    assert row["stats_version"] == t.version, (
        "the tick must advance ANALYZE stats to head"
    )
    assert f.sql("SELECT count(*) AS n FROM t").collect()[0]["n"] == 115
    d = f.sql("DESCRIBE DETAIL t").collect()[0]
    assert d["stats_lag"] == 0


def test_facade_shallow_clone_statement(spark, tmp_path):
    """CREATE TABLE c SHALLOW CLONE t: zero-copy branch — the clone
    reads the source snapshot, diverges independently (DML on the
    clone never touches the source), and VERSION AS OF clones a past
    snapshot. Name collisions and existing locations are refused."""
    import pytest

    t = CowTable.create(
        spark, str(tmp_path / "src"),
        spark.createDataFrame(
            [(f"k{i}", float(i)) for i in range(20)],
            "fid string, v double",
        ),
        keys=("fid",), target_files=2,
    )
    t.delete(F.col("fid") == "k0")  # v2: 19 rows
    f = SqlFacade(spark)
    f.register_table("t", t)
    out = f.sql(
        f"CREATE TABLE c SHALLOW CLONE t LOCATION '{tmp_path / 'c'}'"
    ).collect()[0]
    assert out["source"] == "t" and out["rows"] == 19

    # the clone diverges; the source stays put
    f.sql("DELETE FROM c WHERE v < 5")
    assert f.sql("SELECT count(*) AS n FROM c").collect()[0]["n"] == 15
    assert f.sql("SELECT count(*) AS n FROM t").collect()[0]["n"] == 19

    # time-travel clone: the pre-delete snapshot
    out2 = f.sql(
        "CREATE TABLE c0 SHALLOW CLONE t VERSION AS OF 1 "
        f"LOCATION '{tmp_path / 'c0'}'"
    ).collect()[0]
    assert out2["rows"] == 20

    with pytest.raises(ValueError, match="already exists"):
        f.sql(
            f"CREATE TABLE c SHALLOW CLONE t LOCATION '{tmp_path / 'x'}'"
        )
    with pytest.raises(ValueError, match="location"):
        f.sql(
            f"CREATE TABLE c2 SHALLOW CLONE t LOCATION '{tmp_path / 'c'}'"
        )


def test_facade_maintain_and_clone_respect_catalog(spark, tmp_path):
    """Catalog-managed tables route maintenance through the catalog:
    per-table MAINTAIN is rejected (its vacuum would delete the version
    the catalog pins; its commits look like torn transactions to
    recover()) and MAINTAIN CATALOG runs the pin-protected tick.
    SHALLOW CLONE of a catalog table clones the PINNED version, never a
    rolled-back head."""
    import pytest
    from pyspark.sql import Row

    from openverse_catalog_spark.operators.catalog import LakeCatalog
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    cols = [
        ColumnSpec("id", Datatype.int, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("val", Datatype.int),
    ]

    def rows(*pairs):
        return spark.createDataFrame(
            [Row(id=i, val=v) for i, v in pairs], "id bigint, val bigint"
        )

    cat = LakeCatalog.create(spark, str(tmp_path / "lake"))
    cat.register("img", CowTable.create(
        spark, str(tmp_path / "ta"), rows((1, 10), (2, 20)),
        keys=("id",), target_files=2,
    ))
    f = SqlFacade(spark)
    f.attach_catalog(cat, columns={"img": cols})

    with pytest.raises(ValueError, match="MAINTAIN\\s+CATALOG"):
        f.sql("MAINTAIN img")
    out = {r["name"]: r for r in f.sql("MAINTAIN CATALOG").collect()}
    assert "img" in out

    # per-table VACUUM is equally rejected: a bare vacuum would delete
    # the version the catalog pins
    with pytest.raises(ValueError, match="MAINTAIN\\s+CATALOG"):
        f.sql("VACUUM img")
    # OPTIMIZE publishes through an implicit transaction — its commit
    # is catalog-visible, never a torn head for recover() to roll back
    f.sql("OPTIMIZE img")
    assert cat._entry("img")["version"] == cat.table("img").version

    # a rolled-back txn leaves an orphaned head version: the clone must
    # take the catalog-pinned state, not the aborted one
    f.register_df("batch", rows((3, 30)))
    f.sql("BEGIN TRANSACTION")
    f.sql("INSERT INTO img SELECT * FROM batch")
    f.sql("ROLLBACK")
    out = f.sql(
        f"CREATE TABLE b SHALLOW CLONE img LOCATION '{tmp_path / 'b'}'"
    ).collect()[0]
    assert out["rows"] == 2, (
        "clone must capture the pinned snapshot, not the aborted head"
    )
    assert {r["id"] for r in f.sql("SELECT * FROM b").collect()} == {1, 2}
    # ...and the clone keeps the source's registered upsert specs when
    # the snapshot still speaks the registration's columns (a pin that
    # merely lags the head must not lose custom strategies)
    assert f._columns["b"] is cols

    # MAINTAIN CATALOG after the rollback must not publish the aborted
    # rows (recover() runs first; compaction reads restored heads)
    f.sql("BEGIN TRANSACTION")
    f.sql("INSERT INTO img SELECT * FROM batch")
    f.sql("ROLLBACK")
    f.sql("MAINTAIN CATALOG TARGET 1 ROWS")
    got = {r["id"] for r in f.sql("SELECT * FROM img").collect()}
    assert got == {1, 2}, "maintenance must never publish aborted rows"
    # and inside an open transaction it is refused outright
    f.sql("BEGIN TRANSACTION")
    with pytest.raises(ValueError, match="inside a transaction"):
        f.sql("MAINTAIN CATALOG")
    f.sql("ROLLBACK")


def test_facade_version_pinned_clone_uses_snapshot_schema(
    spark, tmp_path
):
    """A VERSION AS OF clone derives its upsert specs from the cloned
    snapshot's (historical) schema, so DML text against the branch
    works even after the source renamed columns."""
    t = CowTable.create(
        spark, str(tmp_path / "s"),
        spark.createDataFrame(
            [(f"k{i}", float(i)) for i in range(10)],
            "fid string, old_name double",
        ),
        keys=("fid",), target_files=1,
    )
    t.rename_column("old_name", "new_name")  # v2
    f = SqlFacade(spark)
    f.register_table("t", t)
    f.sql(
        "CREATE TABLE hist SHALLOW CLONE t VERSION AS OF 1 "
        f"LOCATION '{tmp_path / 'h'}'"
    )
    # the branch speaks the HISTORICAL schema
    f.sql("UPDATE hist SET old_name = old_name + 1 WHERE fid = 'k1'")
    got = {
        r["fid"]: r["old_name"]
        for r in f.sql("SELECT fid, old_name FROM hist").collect()
    }
    assert got["k1"] == 2.0 and got["k0"] == 0.0


def test_facade_create_empty_table_ddl(spark, tmp_path):
    """CREATE TABLE with a declared column list and NO AS SELECT: a
    zero-file v1 snapshot (readable, one metadata write), immediately
    accepting INSERT / MERGE / UPDATE text; PARTITIONED BY applies the
    hidden-partition transforms; catalog attachment registers the new
    table; declared-but-unsupported types and mis-declared keys fail
    BEFORE any directory lands on disk."""
    import os

    from openverse_catalog_spark.operators.catalog import LakeCatalog

    f = SqlFacade(spark, workdir=str(tmp_path))
    row = f.sql(
        "CREATE TABLE media (fid string, val double, ts timestamp) "
        "PRIMARY KEY (fid)"
    ).collect()[0]
    assert (row["table"], row["version"], row["rows"]) == ("media", 1, 0)
    assert f.sql("SELECT * FROM media").count() == 0
    assert [x.name for x in f.sql("SELECT * FROM media").schema.fields] \
        == ["fid", "val", "ts"]
    f.sql(
        "INSERT INTO media SELECT 'a' AS fid, 1.5 AS val, "
        "CAST('2024-01-01' AS TIMESTAMP) AS ts"
    )
    f.sql("UPDATE media SET val = 2.5 WHERE fid = 'a'")
    got = f.sql("SELECT fid, val FROM media").collect()
    assert [(r["fid"], r["val"]) for r in got] == [("a", 2.5)]

    # hidden partitioning from the DDL
    f.sql(
        "CREATE TABLE events (eid string, ts timestamp, n bigint) "
        "PRIMARY KEY (eid) PARTITIONED BY (day(ts)) "
        f"LOCATION '{tmp_path / 'ev'}'"
    )
    t = CowTable(spark, str(tmp_path / "ev"), keys=("eid",))
    assert [s["transform"] for s in t.partition_spec] == ["day"]

    # failures: duplicate name, bad key, exotic type, existing location
    with pytest.raises(ValueError, match="already exists"):
        f.sql("CREATE TABLE media (x string) PRIMARY KEY (x)")
    with pytest.raises(ValueError, match="PRIMARY KEY column"):
        f.sql("CREATE TABLE t2 (x string) PRIMARY KEY (y)")
    with pytest.raises(ValueError, match="no default upsert spec"):
        f.sql("CREATE TABLE t3 (x string, m map<string,string>) "
              "PRIMARY KEY (x)")
    assert not os.path.exists(tmp_path / "t3"), (
        "a failed CREATE must not leave a table directory"
    )
    with pytest.raises(ValueError, match="location.*already exists"):
        f.sql(f"CREATE TABLE t4 (x string) PRIMARY KEY (x) "
              f"LOCATION '{tmp_path / 'ev'}'")

    # catalog attachment: the empty table registers and reads via pins
    cat = LakeCatalog.create(spark, str(tmp_path / "lake"))
    fc = SqlFacade(spark, workdir=str(tmp_path / "cw"))
    fc.attach_catalog(cat)
    fc.sql("CREATE TABLE dim (k bigint, v string) PRIMARY KEY (k)")
    assert cat._entry("dim")["version"] == 1
    fc.sql("INSERT INTO dim SELECT 1 AS k, 'x' AS v")
    assert {r["k"]: r["v"] for r in cat.read("dim").collect()} == {1: "x"}


def test_facade_maintain_catalog_history_clause(spark, tmp_path):
    """``MAINTAIN CATALOG ... HISTORY h COMMITS`` trims the catalog's
    commit log to the newest h as part of the tick (the pins dropped
    commits carried stop protecting table versions on the next
    vacuum), while the surviving pins keep reading."""
    import os

    from openverse_catalog_spark.operators.catalog import LakeCatalog

    cat = LakeCatalog.create(spark, str(tmp_path / "lake"))
    t = CowTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([(1, 10)], "id bigint, val bigint"),
        keys=("id",), target_files=2,
    )
    cat.register("media", t)
    f = SqlFacade(spark)
    f.attach_catalog(cat)
    for v in (20, 30, 40):
        f.sql(f"UPDATE media SET val = {v} WHERE id = 1")
    n_before = len([
        n for n in os.listdir(cat._dir) if n.startswith("c")
    ])
    assert n_before >= 4
    f.sql("MAINTAIN CATALOG TARGET 1000 ROWS RETAIN 1 VERSIONS "
          "HISTORY 2 COMMITS")
    survivors = sorted(
        n for n in os.listdir(cat._dir)
        if n.startswith("c") and n.endswith(".json")
    )
    # newest 2 at MAINTAIN time (+ any commit the tick itself
    # published); the oldest commits are gone
    assert "c1.json" not in survivors and "c2.json" not in survivors
    assert len(survivors) <= 3
    assert {r["val"] for r in f.sql("SELECT val FROM media").collect()} \
        == {40}


def test_facade_rename_drop_sync_specs(spark, tmp_path):
    """RENAME/DROP COLUMN keep the facade's upsert specs in step with
    the schema — INSERT text with the NEW name must work right after
    the ALTER (previously the stale spec made every later INSERT/MERGE
    fail on the old name)."""
    f = SqlFacade(spark, workdir=str(tmp_path))
    f.sql("CREATE TABLE media (fid string, val double, note string) "
          "PRIMARY KEY (fid)")
    f.sql("INSERT INTO media SELECT 'a' AS fid, 1.0 AS val, 'x' AS note")
    f.sql("ALTER TABLE media RENAME COLUMN val TO score")
    f.sql("INSERT INTO media SELECT 'b' AS fid, 2.0 AS score, "
          "'y' AS note")
    got = {r["fid"]: r["score"]
           for r in f.sql("SELECT fid, score FROM media").collect()}
    assert got == {"a": 1.0, "b": 2.0}
    f.sql("ALTER TABLE media DROP COLUMN note")
    f.sql("INSERT INTO media SELECT 'c' AS fid, 3.0 AS score")
    assert f.sql("SELECT * FROM media").count() == 3
    assert "note" not in f.sql("SELECT * FROM media").columns


def test_facade_create_refused_inside_explicit_txn(spark, tmp_path):
    """CREATE TABLE (CTAS and empty DDL) with an attached catalog is
    refused inside an explicit transaction: registration is its own
    catalog commit ROLLBACK cannot undo."""
    import pytest

    from openverse_catalog_spark.operators.catalog import LakeCatalog

    cat = LakeCatalog.create(spark, str(tmp_path / "lake"))
    f = SqlFacade(spark, workdir=str(tmp_path / "w"))
    f.attach_catalog(cat)
    f.sql("BEGIN TRANSACTION")
    with pytest.raises(ValueError, match="explicit transaction"):
        f.sql("CREATE TABLE t1 (k bigint) PRIMARY KEY (k)")
    with pytest.raises(ValueError, match="explicit transaction"):
        f.sql("CREATE TABLE t2 PRIMARY KEY (k) AS SELECT 1 AS k")
    f.sql("ROLLBACK")
    f.sql("CREATE TABLE t1 (k bigint) PRIMARY KEY (k)")
    assert cat._entry("t1")["version"] == 1


def test_facade_show_create_roundtrip(spark, tmp_path):
    """SHOW CREATE TABLE emits an executable reproduction script:
    running each ';'-joined statement under a fresh name/location
    builds an empty table with identical schema, keys, partition spec,
    and CHECK constraints."""
    base = spark.range(50).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        (F.col("id") % 5).cast("string").alias("d"),
    )
    t = CowTable.create(
        spark, str(tmp_path / "src"), base, keys=("k",),
        partition_by=("bucket(4, d)",), target_files=2,
    )
    f = SqlFacade(spark)
    f.register_table("src", t)
    f.sql("ALTER TABLE src ADD CONSTRAINT v_nonneg CHECK (v >= 0)")
    row = f.sql("SHOW CREATE TABLE src").collect()[0]
    assert row["table"] == "src"
    script = row["ddl"].replace("TABLE src", "TABLE dup").replace(
        t.root, str(tmp_path / "dup")
    )
    for stmt in script.split(";\n"):
        f.sql(stmt)
    dup = f._tables["dup"]
    assert f.sql("SELECT * FROM dup").schema == t.read().schema
    assert dup.keys == t.keys
    assert dup.partition_spec == t.partition_spec
    assert dup.constraints == t.constraints
    # the recreated table is live: a violating insert must fail its CHECK
    f.sql("INSERT INTO dup SELECT * FROM src")
    assert f.sql("SELECT count(*) AS n FROM dup").collect()[0]["n"] == 50
    with pytest.raises(Exception, match="v_nonneg|CHECK|constraint"):
        f.sql(
            "INSERT INTO dup SELECT CAST(999 AS BIGINT) AS k, "
            "CAST(-1 AS BIGINT) AS v, '0' AS d"
        )


def test_facade_truncate_and_restore_timestamp(spark, tmp_path):
    """TRUNCATE is a metadata-only empty commit (schema kept, old
    snapshot time-travelable); RESTORE ... TO TIMESTAMP AS OF resolves
    the newest commit at-or-before the epoch and relinks it."""
    base = spark.range(80).select(
        F.col("id").alias("k"), (F.col("id") % 9).alias("v")
    )
    t = CowTable.create(spark, str(tmp_path / "t"), base, keys=("k",))
    f = SqlFacade(spark)
    f.register_table(
        "t", t, columns=f._specs_from_schema(t.read().schema, t.keys)
    )
    ts_full = t._manifest()["committed_at"]
    r = f.sql("TRUNCATE TABLE t").collect()[0]
    assert r["rows_deleted"] == 80 and r["version"] == 2
    assert f.sql("SELECT count(*) AS n FROM t").collect()[0]["n"] == 0
    # schema survived: an INSERT with the declared columns works
    f.sql("INSERT INTO t SELECT CAST(1 AS BIGINT) k, CAST(7 AS BIGINT) v")
    assert f.sql("SELECT count(*) AS n FROM t").collect()[0]["n"] == 1
    # pre-truncate snapshot still reachable, then restorable by time
    assert (
        f.sql("SELECT count(*) AS n FROM t VERSION AS OF 1").collect()[0]["n"]
        == 80
    )
    rr = f.sql(f"RESTORE TABLE t TO TIMESTAMP AS OF {ts_full}").collect()[0]
    assert rr["restored_from"] == 1
    assert f.sql("SELECT count(*) AS n FROM t").collect()[0]["n"] == 80


def test_facade_vacuum_dry_run_previews_without_deleting(spark, tmp_path):
    """VACUUM ... DRY RUN reports the committed-history delete set and
    mutates nothing; the following real VACUUM deletes exactly that
    many files."""
    import glob
    import os

    base = spark.range(60).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("v")
    )
    t = CowTable.create(
        spark, str(tmp_path / "t"), base, keys=("k",), target_files=3
    )
    f = SqlFacade(spark)
    f.register_table("t", t)
    f.sql("UPDATE t SET v = v + 1 WHERE k % 2 = 0")  # rewrites files
    files = lambda: sorted(  # noqa: E731
        glob.glob(os.path.join(t.root, "data", "**", "*.parquet"),
                  recursive=True)
    )
    manifests = lambda: sorted(  # noqa: E731
        os.listdir(os.path.join(t.root, "manifests"))
    )
    before_f, before_m = files(), manifests()
    n_preview = f.sql("VACUUM t DRY RUN").collect()[0]["files_would_delete"]
    assert n_preview > 0
    assert files() == before_f and manifests() == before_m  # untouched
    n_real = f.sql("VACUUM t").collect()[0]["files_deleted"]
    assert n_real == n_preview
    assert len(files()) == len(before_f) - n_real


def test_facade_ddl_normalizes_narrow_widths(spark, tmp_path):
    """Declared int/float columns normalize to bigint/double at every
    DDL entry (CREATE empty, CTAS, ADD COLUMN): upsert merges write
    INT64/FP64 engine-wide, so a manifest keeping the narrow width
    would make the table unreadable after its first INSERT."""
    f = SqlFacade(spark)
    f.sql(
        f"CREATE TABLE e (k bigint, g int, x float) PRIMARY KEY (k) "
        f"LOCATION '{tmp_path / 'e'}'"
    )
    f.sql("INSERT INTO e SELECT CAST(1 AS BIGINT) k, "
          "CAST(5 AS INT) g, CAST(0.5 AS FLOAT) x")
    got = {fld.name: fld.dataType.simpleString()
           for fld in f.sql("SELECT * FROM e").schema.fields}
    assert got == {"k": "bigint", "g": "bigint", "x": "double"}
    assert f.sql("SELECT g, x FROM e").collect()[0]["g"] == 5

    f.register_df(
        "src",
        spark.range(10).select(
            F.col("id").cast("string").alias("fid"),
            (F.col("id") % 3).cast("int").alias("grp"),
        ),
    )
    f.sql(
        f"CREATE TABLE c PRIMARY KEY (fid) LOCATION '{tmp_path / 'c'}' "
        "AS SELECT fid, grp FROM src"
    )
    f.sql("INSERT INTO c SELECT '99' AS fid, CAST(1 AS INT) AS grp")
    assert [r["grp"] for r in
            f.sql("SELECT grp FROM c WHERE fid = '99'").collect()] == [1]

    f.sql("ALTER TABLE c ADD COLUMN extra int")
    f.sql("UPDATE c SET extra = 7 WHERE fid = '99'")
    assert (
        f.sql("SELECT * FROM c").schema["extra"].dataType.simpleString()
        == "bigint"
    )
    assert f.sql(
        "SELECT extra FROM c WHERE fid = '99'"
    ).collect()[0]["extra"] == 7


def test_merge_conforms_width_to_table_schema(spark, tmp_path):
    """Writes conform to the TABLE's declared column width: an int32
    table stays int32 through (a) a new-keys-only spec merge (the path
    that builds its input from the SPEC schema, which is LongType) and
    (b) an UPDATE whose SET expression coerces wide — parquet can
    upcast int32->long at read but never the reverse, so ONE widened
    file bricks the column for every narrow-schema read."""
    import pyarrow.parquet as pq

    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    base = spark.range(10).select(
        F.col("id").cast("string").alias("fid"),
        (F.col("id") % 3).cast("int").alias("grp"),
    )
    t = CowTable.create(spark, str(tmp_path / "t"), base, keys=("fid",))
    cols = [
        ColumnSpec("fid", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("grp", Datatype.int),
    ]
    # (a) a batch of only-new keys far outside every file's range:
    # target slice is empty, so the merge input carries SPEC widths
    batch = spark.createDataFrame([("zzz9", 1)], "fid string, grp int")
    t.merge(batch, cols)
    # (b) SET expression that coerces long
    t.update(F.col("fid") == "zzz9", {"grp": F.expr("CAST(2 AS BIGINT)")})
    m = t._manifest()
    for e in m["files"]:
        got = pq.read_schema(f"{t.root}/{e['path']}").field("grp").type
        assert str(got) == "int32", f"{e['path']} widened to {got}"
    assert t.read().schema["grp"].dataType.simpleString() == "int"
    got = {r.fid: r.grp for r in t.read().collect()}
    assert got["zzz9"] == 2 and len(got) == 11


def test_facade_rename_table(spark, tmp_path):
    """ALTER TABLE ... RENAME TO moves the registration (specs, head
    view) without touching files; the old name is gone, DML works on
    the new name immediately."""
    base = spark.range(30).select(
        F.col("id").cast("string").alias("fid"),
        (F.col("id") % 3).alias("v"),
    )
    t = CowTable.create(spark, str(tmp_path / "t"), base, keys=("fid",))
    f = SqlFacade(spark)
    f.register_table(
        "olda", t, columns=f._specs_from_schema(t.read().schema, t.keys)
    )
    r = f.sql("ALTER TABLE olda RENAME TO newb").collect()[0]
    assert (r["renamed_from"], r["renamed_to"]) == ("olda", "newb")
    assert f.sql("SELECT count(*) AS n FROM newb").collect()[0]["n"] == 30
    f.sql("INSERT INTO newb SELECT '99' AS fid, CAST(9 AS BIGINT) AS v")
    assert f.sql("SELECT count(*) AS n FROM newb").collect()[0]["n"] == 31
    with pytest.raises(Exception):
        f.sql("SELECT count(*) AS n FROM olda").collect()
    # root unchanged: rename is registration-only
    assert f._tables["newb"].root == t.root


def test_catalog_rename_preserves_pin(spark, tmp_path):
    """A catalog rename carries the PINNED version verbatim: if the
    table head advanced past the pin (e.g. a rolled-back writer), the
    new name must still resolve the pinned snapshot, not the head."""
    from openverse_catalog_spark.operators.catalog import LakeCatalog

    base = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("v")
    )
    t = CowTable.create(spark, str(tmp_path / "t"), base, keys=("k",))
    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    cat.register("a", t)
    pinned = cat._entry("a")["version"]
    # advance the RAW head without a catalog publish (orphaned head)
    t.update(F.col("k") < 5, {"v": F.lit(99)})
    assert t.version > pinned
    cat.rename("a", "b")
    e = cat._entry("b")
    assert e["version"] == pinned and e["root"] == t.root
    assert cat.read("b").filter("v = 99").count() == 0  # pin, not head
    with pytest.raises(KeyError):
        cat._entry("a")
    # old catalog versions still resolve the old name (time travel)
    hist_v = cat.version - 1
    assert cat._entry("a", catalog_version=hist_v)["version"] == pinned


def test_conform_width_raises_on_overflow_not_wrap(spark, tmp_path):
    """Conforming a wide SET value into an int32 column must RAISE when
    the value cannot fit — the session runs ANSI-off, where a bare cast
    would silently wrap to a negative number."""
    base = spark.range(5).select(
        F.col("id").cast("string").alias("fid"),
        (F.col("id") % 3).cast("int").alias("grp"),
    )
    t = CowTable.create(spark, str(tmp_path / "t"), base, keys=("fid",))
    with pytest.raises(Exception, match="overflow|OVERFLOW"):
        t.update(
            F.col("fid") == "1",
            {"grp": F.expr("CAST(3000000000 AS BIGINT)")},
        )
    # in-range wide values conform fine
    t.update(F.col("fid") == "1", {"grp": F.expr("CAST(7 AS BIGINT)")})
    got = {r.fid: r.grp for r in t.read().collect()}
    assert got["1"] == 7
    assert t.read().schema["grp"].dataType.simpleString() == "int"


def test_rename_refuses_existing_view_names(spark, tmp_path):
    """RENAME TO must not clobber a materialized view or a registered
    frame: both live behind temp views that _refresh_head would
    silently replace."""
    base = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("v")
    )
    t = CowTable.create(spark, str(tmp_path / "t"), base, keys=("k",))
    f = SqlFacade(spark)
    f.register_table("t", t)
    f.register_df("somedf", spark.range(3).toDF("x"))
    f.sql("CREATE MATERIALIZED VIEW mv1 AS "
          "SELECT v, count(*) AS n FROM t GROUP BY v")
    with pytest.raises(ValueError, match="materialized view"):
        f.sql("ALTER TABLE t RENAME TO mv1")
    with pytest.raises(ValueError, match="view/frame"):
        f.sql("ALTER TABLE t RENAME TO somedf")
    # the guards left everything intact
    assert f.sql("SELECT count(*) AS n FROM t").collect()[0]["n"] == 10


def test_conform_width_guards_fractional_and_insert_paths(spark, tmp_path):
    """The overflow guard covers non-integral sources (double->int
    clamps to INT_MAX under ANSI-off) and merge_when's INSERT branch
    (whose old pre-cast wrapped before the write-boundary conform could
    see the value)."""
    base = spark.range(5).select(
        F.col("id").cast("string").alias("fid"),
        (F.col("id") % 3).cast("int").alias("grp"),
    )
    t = CowTable.create(spark, str(tmp_path / "t"), base, keys=("fid",))
    # double SET value out of int range: clamp would be silent — raise
    with pytest.raises(Exception, match="overflow|OVERFLOW"):
        t.update(
            F.col("fid") == "1",
            {"grp": F.expr("CAST(3000000000 AS DOUBLE)")},
        )
    # merge_when INSERT with an out-of-range bigint source value
    src = spark.createDataFrame(
        [("zzz1", 3_000_000_000)], "fid string, grp bigint"
    )
    with pytest.raises(Exception, match="overflow|OVERFLOW"):
        t.merge_when(src, update_set="*", insert=True)
    # in-range values land through the same paths
    ok = spark.createDataFrame([("zzz2", 12)], "fid string, grp bigint")
    t.merge_when(ok, update_set="*", insert=True)
    got = {r.fid: r.grp for r in t.read().collect()}
    assert got["zzz2"] == 12 and len(got) == 6
    assert t.read().schema["grp"].dataType.simpleString() == "int"


def test_conform_width_truncates_fractions_but_raises_on_clamp(spark, tmp_path):
    """Fractional sources keep SQL cast-truncation semantics (3.7 -> 3,
    no error); only genuinely out-of-range values raise — including the
    representability-boundary clamp a roundtrip check cannot see
    (float/double 2^31 clamps to INT_MAX and rounds back to 2^31)."""
    base = spark.range(5).select(
        F.col("id").cast("string").alias("fid"),
        (F.col("id") % 3).cast("int").alias("grp"),
    )
    t = CowTable.create(spark, str(tmp_path / "t"), base, keys=("fid",))
    # plain truncation is ALLOWED (non-ANSI SQL cast semantics)
    t.update(F.col("fid") == "1", {"grp": F.expr("CAST(3.7 AS DOUBLE)")})
    got = {r.fid: r.grp for r in t.read().collect()}
    assert got["1"] == 3
    # the boundary clamp raises (2^31 as double is out of int range)
    with pytest.raises(Exception, match="overflow|OVERFLOW"):
        t.update(
            F.col("fid") == "2",
            {"grp": F.expr("CAST(2147483648.0 AS DOUBLE)")},
        )
    # int min itself is in range and fine
    t.update(
        F.col("fid") == "2",
        {"grp": F.expr("CAST(-2147483648.0 AS DOUBLE)")},
    )
    got = {r.fid: r.grp for r in t.read().collect()}
    assert got["2"] == -2147483648


def test_conform_width_decimal_boundaries_exact(spark, tmp_path):
    """Decimal sources are guarded in the DECIMAL domain: Long.MAX is
    valid (a double-based test would round it up to 2^63 and raise a
    false overflow), while values past the long range raise (a
    double-based test would round -2^63-1 back onto the boundary and
    let the wrap through)."""
    base = spark.range(3).select(
        F.col("id").cast("string").alias("fid"),
        F.col("id").alias("big"),
    )
    t = CowTable.create(spark, str(tmp_path / "t"), base, keys=("fid",))
    # Long.MAX as DECIMAL(20,0): exactly representable, must NOT raise
    t.update(
        F.col("fid") == "0",
        {"big": F.expr("CAST('9223372036854775807' AS DECIMAL(20,0))")},
    )
    got = {r.fid: r.big for r in t.read().collect()}
    assert got["0"] == 9223372036854775807
    # one past Long.MIN: silently wraps under non-ANSI cast — must raise
    with pytest.raises(Exception, match="overflow|OVERFLOW"):
        t.update(
            F.col("fid") == "1",
            {"big": F.expr(
                "CAST('-9223372036854775809' AS DECIMAL(20,0))"
            )},
        )
    # one past Long.MAX — must raise
    with pytest.raises(Exception, match="overflow|OVERFLOW"):
        t.update(
            F.col("fid") == "1",
            {"big": F.expr(
                "CAST('9223372036854775808' AS DECIMAL(20,0))"
            )},
        )
    # fractional decimal truncation stays allowed
    t.update(
        F.col("fid") == "2", {"big": F.expr("CAST(41.7 AS DECIMAL(5,1))")}
    )
    got = {r.fid: r.big for r in t.read().collect()}
    assert got["2"] == 41


def test_conform_width_subword_and_boundary_fractions(spark, tmp_path):
    """The decimal guard at sub-long widths and at fractional
    boundaries: values that TRUNCATE into range conform (min-0.9 into
    int, Long.MAX+0.5 into long), one past the bound raises, and NaN
    raises rather than silently becoming 0."""
    base = spark.range(4).select(
        F.col("id").cast("string").alias("fid"),
        F.col("id").cast("int").alias("grp"),
        F.col("id").alias("big"),
    )
    t = CowTable.create(spark, str(tmp_path / "t"), base, keys=("fid",))
    # decimal min-0.9 into int: truncates toward zero to INT_MIN, valid
    t.update(
        F.col("fid") == "0",
        {"grp": F.expr("CAST('-2147483648.9' AS DECIMAL(11,1))")},
    )
    # decimal max+0.9 into int: truncates to INT_MAX, valid
    t.update(
        F.col("fid") == "1",
        {"grp": F.expr("CAST('2147483647.9' AS DECIMAL(11,1))")},
    )
    got = {r.fid: r.grp for r in t.read().collect()}
    assert got["0"] == -2147483648 and got["1"] == 2147483647
    # one past INT_MIN raises
    with pytest.raises(Exception, match="overflow|OVERFLOW"):
        t.update(
            F.col("fid") == "2",
            {"grp": F.expr("CAST('-2147483649' AS DECIMAL(11,0))")},
        )
    # Long.MAX + 0.5 truncates to Long.MAX, valid
    t.update(
        F.col("fid") == "2",
        {"big": F.expr("CAST('9223372036854775807.5' AS DECIMAL(21,1))")},
    )
    assert {r.fid: r.big for r in t.read().collect()}["2"] \
        == 9223372036854775807
    # NaN into an integral column raises (plain cast would write 0)
    with pytest.raises(Exception, match="overflow|OVERFLOW|NaN"):
        t.update(
            F.col("fid") == "3",
            {"grp": F.expr("CAST('NaN' AS DOUBLE)")},
        )


def test_facade_search_index_statements(spark, tmp_path):
    """CREATE/REFRESH/DROP SEARCH INDEX + the inline SEARCH_INDEX
    relation: results come from postings, refresh is incremental, and
    guards catch unknown indexes/tables and multi-key bases."""
    f = SqlFacade(spark, workdir=str(tmp_path))
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta delta"), (3, "alpha alpha")],
        "doc_id long, text string",
    )
    f.register_df("src", docs)
    f.sql("CREATE TABLE docs PRIMARY KEY (doc_id) AS SELECT * FROM src")
    r = f.sql("CREATE SEARCH INDEX si ON docs (text)").collect()[0]
    assert r["index"] == "si" and r["table"] == "docs"
    got = {
        r["doc_id"]
        for r in f.sql(
            "SELECT doc_id FROM SEARCH_INDEX('si', 'alpha', 10)"
        ).collect()
    }
    assert got == {1, 3}
    # churn + refresh: doc 2 gains alpha, doc 3 loses it
    f.sql("UPDATE docs SET text = 'alpha beta' WHERE doc_id = 2")
    f.sql("UPDATE docs SET text = 'zeta' WHERE doc_id = 3")
    rr = f.sql("REFRESH SEARCH INDEX si").collect()[0]
    assert rr["refreshed"] and not rr["resync"]
    got = {
        r["doc_id"]
        for r in f.sql(
            "SELECT doc_id FROM SEARCH_INDEX('si', 'alpha', 10)"
        ).collect()
    }
    assert got == {1, 2}
    with pytest.raises(ValueError, match="not a registered search index"):
        f.sql("SELECT * FROM SEARCH_INDEX('nope', 'alpha', 5)")
    with pytest.raises(ValueError, match="not a registered lake table"):
        f.sql("CREATE SEARCH INDEX s2 ON ghost (text)")
    f.sql("DROP SEARCH INDEX si")
    import os

    assert not os.path.exists(str(tmp_path / "si"))
    with pytest.raises(ValueError, match="not a registered search index"):
        f.sql("SELECT * FROM SEARCH_INDEX('si', 'alpha', 5)")


def test_facade_search_index_guards_and_attach(spark, tmp_path):
    """Multi-key and unknown-column guards fire; ATTACH reopens a
    persisted index in a NEW facade session and resumes O(churn)
    refresh instead of forcing a rebuild."""
    f = SqlFacade(spark, workdir=str(tmp_path / "w1"))
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    f.register_df("src", docs)
    f.sql("CREATE TABLE docs PRIMARY KEY (doc_id) AS SELECT * FROM src")
    f.sql(
        "CREATE TABLE two PRIMARY KEY (doc_id, text) AS SELECT * FROM src"
    )
    with pytest.raises(ValueError, match="single-column document key"):
        f.sql("CREATE SEARCH INDEX s ON two (text)")
    with pytest.raises(ValueError, match="no column"):
        f.sql("CREATE SEARCH INDEX s ON docs (ghost)")
    f.sql("CREATE SEARCH INDEX si ON docs (text)")
    idx_root = f._sidx["si"].root
    base = f._tables["docs"]

    # a NEW session: attach instead of rebuild
    f2 = SqlFacade(spark)
    f2.register_table(
        "docs", base,
        columns=f2._specs_from_schema(base.read().schema, base.keys),
    )
    with pytest.raises(ValueError, match="LOCATION"):
        f2.sql("ATTACH SEARCH INDEX si ON docs (text)")
    f2.sql(f"ATTACH SEARCH INDEX si ON docs (text) LOCATION '{idx_root}'")
    got = {r["doc_id"] for r in f2.sql(
        "SELECT doc_id FROM SEARCH_INDEX('si', 'alpha', 10)"
    ).collect()}
    assert got == {1}
    f2.sql("UPDATE docs SET text = 'alpha delta' WHERE doc_id = 2")
    assert f2.sql("REFRESH SEARCH INDEX si").collect()[0]["refreshed"]
    got = {r["doc_id"] for r in f2.sql(
        "SELECT doc_id FROM SEARCH_INDEX('si', 'alpha', 10)"
    ).collect()}
    assert got == {1, 2}
    # attaching garbage fails with the named error
    with pytest.raises(ValueError, match="no search index"):
        f2.sql(
            "ATTACH SEARCH INDEX sx ON docs (text) "
            f"LOCATION '{tmp_path / 'nothing'}'"
        )


def test_facade_search_index_respects_catalog_pins(spark, tmp_path):
    """On a catalog-managed base the index pins like every reader:
    CREATE uses the catalog pin, REFRESH refuses inside an open txn and
    never consumes a rolled-back head; a published txn's rows arrive on
    the next refresh."""
    from openverse_catalog_spark.operators.catalog import LakeCatalog

    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    f = SqlFacade(spark, workdir=str(tmp_path / "w"))
    f.attach_catalog(cat)
    f.register_df(
        "src",
        spark.createDataFrame(
            [(1, "alpha beta"), (2, "gamma delta")],
            "doc_id long, text string",
        ),
    )
    f.sql("CREATE TABLE docs PRIMARY KEY (doc_id) AS SELECT * FROM src")
    f.sql("CREATE SEARCH INDEX si ON docs (text)")
    # an ABORTED txn advances the raw head; the index must never see it
    f.sql("BEGIN")
    f.sql("UPDATE docs SET text = 'poison apple' WHERE doc_id = 1")
    with pytest.raises(ValueError, match="inside an explicit"):
        f.sql("REFRESH SEARCH INDEX si")
    with pytest.raises(ValueError, match="not supported"):
        f.sql("CREATE SEARCH INDEX s2 ON docs (text)")
    f.sql("ROLLBACK")
    r = f.sql("REFRESH SEARCH INDEX si").collect()[0]
    assert not r["refreshed"]  # pin unchanged; aborted head invisible
    got = {x["doc_id"] for x in f.sql(
        "SELECT doc_id FROM SEARCH_INDEX('si', 'poison', 10)"
    ).collect()}
    assert got == set()
    # a PUBLISHED txn's rows arrive on the next refresh
    f.sql("BEGIN")
    f.sql("UPDATE docs SET text = 'alpha poison' WHERE doc_id = 2")
    f.sql("COMMIT")
    assert f.sql("REFRESH SEARCH INDEX si").collect()[0]["refreshed"]
    got = {x["doc_id"] for x in f.sql(
        "SELECT doc_id FROM SEARCH_INDEX('si', 'poison', 10)"
    ).collect()}
    assert got == {2}


def test_facade_explain_shows_rewritten_plan(spark, tmp_path):
    """EXPLAIN routes through the SAME rewrite path as sql(): a
    VERSION AS OF query explains as the PINNED snapshot's file scan
    (not the head's), with the predicate pushed and the projection
    pruned to the two referenced columns; EXTENDED returns the full
    four-section rendering; a TABLE_CHANGES TVF query explains without
    leaking its per-statement temp view."""
    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()),
        target_files=2,
    )
    t.merge(mk(spark, _batch_rows()), COLS, deterministic=True)
    f = SqlFacade(spark)
    f.register_table("media", t)

    def plan_text(stmt: str) -> str:
        df = f.sql(stmt)
        assert df.columns == ["plan"]
        return "\n".join(r["plan"] for r in df.collect())

    q = ("SELECT foreign_identifier FROM media{pin} "
         "WHERE provider = 'met'")
    pinned = plan_text("EXPLAIN " + q.format(pin=" VERSION AS OF 1"))
    head = plan_text("EXPLAIN " + q.format(pin=""))
    # pushdown + pruning survive the rewrite, for both plans
    for text in (pinned, head):
        assert "EqualTo(provider,met)" in text
        assert (
            "ReadSchema: struct<provider:string,"
            "foreign_identifier:string>" in text
        )
    # the pinned plan scans the v1 file set, not the head's: the two
    # Location lines name different data directories
    def loc(text: str) -> str:
        return next(
            ln for ln in text.split("\n") if "Location" in ln
        )
    assert loc(pinned) != loc(head)
    ext = plan_text(
        "EXPLAIN EXTENDED " + q.format(pin=" VERSION AS OF 1")
    )
    assert "== Parsed Logical Plan ==" in ext
    assert "== Physical Plan ==" in ext
    # TVF queries explain too, and the per-statement view is dropped
    ch = plan_text(
        "EXPLAIN SELECT _change_type FROM TABLE_CHANGES('media', 1)"
    )
    assert "== Physical Plan ==" in ch
    leaked = [
        v.name for v in spark.catalog.listTables()
        if v.name.startswith("__tc_") or v.name.startswith("__sidx_")
    ]
    assert not leaked
