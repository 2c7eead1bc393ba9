"""SQL-facade queries: the engine driven by plain SQL text.

The reference's users live in SQL (``popularity/sql.py``, the
provider_csv_load_scripts, every maintenance DAG's query file); these
queries pin that a user can run this engine the same way — DataFrames
registered as views, CoW lake tables with time travel and the change
feed addressed through ``VERSION AS OF`` / ``TABLE_CHANGES`` text — and
get oracle-identical results. The facade hands rewritten text straight
to Catalyst, so everything the DataFrame plans get (pruning, broadcast
dims, whole-stage codegen) applies to SQL text too.
"""

from __future__ import annotations

from openverse_catalog_spark.plans.analytics import _t, register
from openverse_catalog_spark.plans.merge_queries import (
    _COW_TARGET_SQL,
    _COW_V2_CTES,
    _cow_build,
    _cow_fixture,
)


def _facade(spark, sf_dir, *tables):
    from openverse_catalog_spark.sql_facade import SqlFacade

    f = SqlFacade(spark)
    loaded = _t(spark, sf_dir, *tables)
    for name, df in loaded.items():
        f.register_df(name, df)
    return f


@register(
    "sql_taxa_enrich",
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
def sql_taxa_enrich(spark, sf_dir):
    """``pipeline_taxa_enrich`` (the reference's taxa.sql mini-pipeline,
    ``analytics.py:pipeline_taxa_enrich``) re-expressed as ONE SQL text
    through the facade: windowed running-length cutoff, filtered ordered
    aggregation with overflow->tags top-20 slice, md5-surrogate left
    join, and the ancestry explode re-aggregated to a lineage string —
    proof a SQL-speaking user of the reference can run this engine
    without touching the Python API. Catalyst plans the text exactly
    like the DataFrame version (same exchanges, same broadcasts)."""
    f = _facade(spark, sf_dir, "customer", "nation", "region")
    return f.sql(
        """
        WITH ranked AS (
          SELECT n.n_name, n.n_nationkey, n.n_regionkey,
                 c.c_name, c.c_mktsegment,
                 sum(length(c.c_name) + 2) OVER (
                   PARTITION BY n.n_name ORDER BY c.c_name
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS running_len
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        ),
        agg AS (
          SELECT n_name,
                 first(n_nationkey) AS n_nationkey,
                 first(n_regionkey) AS n_regionkey,
                 count(DISTINCT c_mktsegment) AS n_sources,
                 array_join(array_sort(collect_list(
                   CASE WHEN running_len < 256 THEN c_name END)), ', ')
                   AS title,
                 nullif(array_join(slice(array_sort(collect_list(
                   CASE WHEN running_len >= 256 THEN c_name END)), 1, 20),
                   '|'), '') AS overflow_tags
          FROM ranked
          GROUP BY n_name
        ),
        anc_dim AS (
          SELECT concat('r', CAST(r_regionkey AS STRING)) AS akey,
                 r_name AS aname
          FROM region
          UNION ALL
          SELECT concat('n', CAST(n_nationkey AS STRING)) AS akey,
                 n_name AS aname
          FROM nation
        ),
        lineage AS (
          SELECT e.n_name,
                 array_join(array_sort(collect_list(d.aname)), '>')
                   AS lineage
          FROM (
            SELECT a.n_name, u.akey
            FROM agg a
            LATERAL VIEW explode(split(concat(
              'r', CAST(a.n_regionkey AS STRING), '/n',
              CAST(a.n_nationkey AS STRING)), '/')) u AS akey
          ) e
          JOIN anc_dim d ON d.akey = e.akey
          GROUP BY e.n_name
        )
        SELECT a.n_name, a.n_sources, a.title, a.overflow_tags,
               r.r_name AS region_name, l.lineage
        FROM agg a
        LEFT JOIN region r ON md5(CAST(a.n_regionkey AS STRING))
                            = md5(CAST(r.r_regionkey AS STRING))
        LEFT JOIN lineage l ON a.n_name = l.n_name
        """
    )


@register(
    "sql_cow_time_travel",
    f"""
    WITH {_COW_V2_CTES},
    v1 AS ({_COW_TARGET_SQL})
    SELECT 'v1' AS snap, provider, foreign_identifier, url, title FROM v1
    UNION ALL
    SELECT 'head', provider, foreign_identifier, url, title FROM v2
    UNION ALL
    SELECT 'changed', v2.provider, v2.foreign_identifier, v2.url, v2.title
    FROM v2 LEFT JOIN v1
      ON v2.provider = v1.provider
     AND v2.foreign_identifier = v1.foreign_identifier
    WHERE v1.provider IS NULL OR v2.title <> v1.title OR v2.url <> v1.url
    """,
)
def sql_cow_time_travel(spark, sf_dir):
    """Lake-table SQL surface end to end: a CoW table registered on the
    facade, read at head by bare name, time-traveled with ``VERSION AS
    OF``, and its change feed queried with ``TABLE_CHANGES(...)`` — all
    in ONE SQL text (the facade rewrites each construct to a
    manifest-pinned view; Delta's spelling, plain Spark underneath).
    The oracle replays v1, the upserted head, and the post-images of
    the merge's logical delta."""
    t = _cow_build(spark, sf_dir, "cow_sqlfacade", _t)
    from openverse_catalog_spark.sql_facade import SqlFacade

    f = SqlFacade(spark)
    f.register_table("media", t)
    return f.sql(
        """
        SELECT 'v1' AS snap, provider, foreign_identifier, url, title
        FROM media VERSION AS OF 1
        UNION ALL
        SELECT 'head', provider, foreign_identifier, url, title
        FROM media
        UNION ALL
        SELECT 'changed', provider, foreign_identifier, url, title
        FROM TABLE_CHANGES('media', 1, 2)
        WHERE _change_type IN ('insert', 'update_postimage')
        """
    )


@register(
    "sql_cow_dml",
    f"""
    WITH {_COW_V2_CTES}
    SELECT provider, foreign_identifier, url,
           CASE WHEN provider = 'p1'
                THEN 'U-' || foreign_identifier ELSE title END AS title
    FROM v2 WHERE provider <> 'p0'
    """,
)
def sql_cow_dml(spark, sf_dir):
    """The WRITE half of the SQL surface: INSERT INTO (the upsert merge
    — a lake table's only insert, the reference's ``INSERT ... ON
    CONFLICT`` loader contract, url guard included), UPDATE ... SET ...
    WHERE and DELETE FROM ... WHERE, all as plain text through the
    facade, each landing as an optimistically-committed copy-on-write
    version. The oracle replays the guarded upsert, the predicated
    update and the delete in SQL; the facade's head view re-resolves
    between statements so each DML sees the previous one's commit."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.sql_facade import SqlFacade

    c = _t(spark, sf_dir, "customer")["customer"]
    target, batch, cols = _cow_fixture(c)
    root = os.path.join(tempfile.gettempdir(), "spark_graft_cow_sqldml")
    shutil.rmtree(root, ignore_errors=True)
    t = CowTable.create(spark, root, target, target_files=6)
    f = SqlFacade(spark)
    f.register_table("media", t, columns=cols)
    f.register_df("staging", batch)
    ins = f.sql("INSERT INTO media SELECT * FROM staging").collect()[0]
    assert ins["version"] == 2
    upd = f.sql(
        "UPDATE media SET title = concat('U-', foreign_identifier) "
        "WHERE provider = 'p1'"
    ).collect()[0]
    assert upd["version"] == 3
    dele = f.sql("DELETE FROM media WHERE provider = 'p0'").collect()[0]
    assert dele["version"] == 4
    return f.sql(
        "SELECT provider, foreign_identifier, url, title FROM media"
    )


@register(
    "sql_cow_merge",
    f"""
    WITH {_COW_V2_CTES}
    SELECT provider, foreign_identifier, url, title FROM v2
    """,
)
def sql_cow_merge(spark, sf_dir):
    """ANSI MERGE INTO through the facade: the same guarded upsert the
    API's ``merge()`` runs (url thief dropped, updates + inserts), but
    spelled as ``MERGE INTO media AS t USING (SELECT ...) AS s ON
    t.<keys> = s.<keys> WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    THEN INSERT *`` — the standard spelling of the reference's
    ``INSERT ... ON CONFLICT`` loader step. The facade validates the ON
    clause against the table's merge keys (a mis-keyed MERGE raises
    rather than silently changing upsert semantics) and routes the
    batch into the copy-on-write commit protocol."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.sql_facade import SqlFacade

    c = _t(spark, sf_dir, "customer")["customer"]
    target, batch, cols = _cow_fixture(c)
    root = os.path.join(tempfile.gettempdir(), "spark_graft_cow_sqlmerge")
    shutil.rmtree(root, ignore_errors=True)
    t = CowTable.create(spark, root, target, target_files=6)
    f = SqlFacade(spark)
    f.register_table("media", t, columns=cols)
    f.register_df("staging", batch)
    res = f.sql(
        "MERGE INTO media AS t USING (SELECT * FROM staging) AS s "
        "ON t.provider = s.provider "
        "AND t.foreign_identifier = s.foreign_identifier "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0]
    assert res["version"] == 2
    return f.sql(
        "SELECT provider, foreign_identifier, url, title FROM media"
    )


@register(
    "sql_partition_metadata",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           count(*) AS rows
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def sql_partition_metadata(spark, sf_dir):
    """METADATA TABLES as SQL relations (Delta/Iceberg's ``table.files``
    / ``table.partitions``): a hidden-partitioned CTAS (``PARTITIONED
    BY (month(ts))``) writes partition-pure files, and
    ``TABLE_PARTITIONS('t')`` then exposes per-partition file/row
    counts STRAIGHT OFF THE MANIFEST — zero data scanned, O(files)
    driver-side work, the operational introspection every maintenance
    loop and cost-based planner needs. The oracle is the true per-month
    GROUP BY over the raw source — manifest metadata must agree exactly
    with the data, or the pruning built on it is lying. TABLE_FILES
    totals are cross-checked in-query against the table's row count."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.sql_facade import SqlFacade

    f = _facade(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), "spark_graft_sql_partmeta"
    )
    shutil.rmtree(root, ignore_errors=True)
    f.workdir = root
    os.makedirs(root, exist_ok=True)
    f.sql(
        "CREATE TABLE pmeta PRIMARY KEY (id) PARTITIONED BY (month(ts)) "
        "AS SELECT o_orderkey AS id, "
        "CAST(o_orderdate AS TIMESTAMP) AS ts FROM orders"
    )
    # files metadata must sum to the table's total — checked here so the
    # oracle only needs the partition grain
    total = f.sql(
        "SELECT sum(rows) AS r FROM TABLE_FILES('pmeta')"
    ).head()["r"]
    n = f.sql("SELECT count(*) AS n FROM pmeta").head()["n"]
    assert total == n, (total, n)
    return f.sql(
        "SELECT element_at(partition, 'ts_month') AS month, "
        "sum(rows) AS rows "
        "FROM TABLE_PARTITIONS('pmeta') "
        "GROUP BY 1 ORDER BY 1"
    )


@register(
    "sql_describe_detail",
    """
    SELECT 'media' AS name,
           CAST(3 AS BIGINT) AS version,
           (SELECT count(*) FROM customer)
             - (SELECT count(*) FROM customer WHERE c_custkey % 97 = 0)
             - 1 AS rows,
           TRUE AS has_tombstones,
           (SELECT count(*) FROM customer WHERE c_custkey % 97 = 0)
             AS tombstones,
           (SELECT CAST(max(c_custkey) AS VARCHAR) FROM customer
             WHERE c_custkey % 97 = 0) AS tombstone_horizon,
           CAST(1 AS BIGINT) AS stats_lag
    """,
)
def sql_describe_detail(spark, sf_dir):
    """``DESCRIBE DETAIL``: the operational-state row the reference
    reads from Postgres catalogs (pg_class/pg_stats + its own side
    tables) — snapshot version/rows, tombstone-store liveness, count
    and SEQUENCE HORIZON (the newest delete fence), and ANALYZE
    freshness as a commit lag. Everything is manifest/state metadata
    except the horizon (one agg over the small fence table). The
    oracle recomputes every field from the raw source: create(v1) +
    CDC apply(v2) + one post-ANALYZE delete(v3) make version and
    stats_lag data-independent, while rows/tombstones/horizon derive
    from the c_custkey % 97 delete rule."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.sql_facade import SqlFacade
    from openverse_catalog_spark.streaming.incremental import apply_changes

    c = _t(spark, sf_dir, "customer")["customer"]
    base = c.select(
        F.col("c_custkey").cast("string").alias("fid"),
        F.col("c_acctbal").cast("double").alias("val"),
        F.lit(0).cast("long").alias("seq"),
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_sql_detail")
    shutil.rmtree(root, ignore_errors=True)
    t = CowTable.create(spark, root, base, keys=("fid",), target_files=4)
    dels = c.filter(F.col("c_custkey") % 97 == 0).select(
        F.col("c_custkey").cast("string").alias("fid"),
        F.lit(None).cast("double").alias("val"),
        F.col("c_custkey").cast("long").alias("seq"),
        F.lit("D").alias("op"),
    )
    apply_changes(t, dels, sequence_by="seq", tombstone_retention=3600.0)
    f = SqlFacade(spark)
    f.register_table("media", t)
    f.sql("ANALYZE TABLE media")
    f.sql("DELETE FROM media WHERE fid = '1'")  # stats now 1 commit old
    return f.sql("DESCRIBE DETAIL media").select(
        "name", "version", "rows", "has_tombstones", "tombstones",
        "tombstone_horizon", "stats_lag",
    )


@register(
    "sql_table_tombstones",
    """
    SELECT CAST(c_custkey AS VARCHAR) AS fid,
           c_custkey AS ts_seq
    FROM customer WHERE c_custkey % 97 = 0
    """,
)
def sql_table_tombstones(spark, sf_dir):
    """``TABLE_TOMBSTONES('t')``: the CDC delete fences as a queryable
    relation — key columns + the fenced sequence — so an operator can
    audit exactly which late upserts a table will drop and up to which
    sequence (``max(__ts_seq)`` is the horizon ``DESCRIBE DETAIL``
    reports). The oracle reproduces the fence set from the raw source
    (every c_custkey % 97 row was CDC-deleted with its key as the
    sequence)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.sql_facade import SqlFacade
    from openverse_catalog_spark.streaming.incremental import apply_changes

    c = _t(spark, sf_dir, "customer")["customer"]
    base = c.select(
        F.col("c_custkey").cast("string").alias("fid"),
        F.lit(0).cast("long").alias("seq"),
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_sql_tomb")
    shutil.rmtree(root, ignore_errors=True)
    t = CowTable.create(spark, root, base, keys=("fid",), target_files=4)
    dels = c.filter(F.col("c_custkey") % 97 == 0).select(
        F.col("c_custkey").cast("string").alias("fid"),
        F.col("c_custkey").cast("long").alias("seq"),
        F.lit("D").alias("op"),
    )
    apply_changes(t, dels, sequence_by="seq", tombstone_retention=3600.0)
    f = SqlFacade(spark)
    f.register_table("media", t)
    return f.sql(
        "SELECT fid, __ts_seq AS ts_seq FROM TABLE_TOMBSTONES('media')"
    )


@register(
    "sql_mv_staleness",
    """
    SELECT 'segcounts' AS view,
           'aggregate' AS kind,
           count(DISTINCT c_mktsegment) AS staleness
    FROM customer
    """,
)
def sql_mv_staleness(spark, sf_dir):
    """``SHOW MATERIALIZED VIEWS`` staleness: each MV row reports the
    base version it last applied and how many base commits it is
    behind — the freshness observability the reference gets free from
    Postgres catalogs, here from mv_state.json + manifest heads
    (metadata only). Fixture: build an aggregate MV, then land one
    DELETE commit per market segment; the MV's staleness must equal
    the number of segments (one un-applied commit each), which the
    oracle counts from the raw source."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.sql_facade import SqlFacade

    c = _t(spark, sf_dir, "customer")["customer"]
    base = c.select(
        F.col("c_custkey").cast("string").alias("fid"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("val"),
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_sql_mvstale")
    shutil.rmtree(root, ignore_errors=True)
    t = CowTable.create(spark, root, base, keys=("fid",), target_files=4)
    f = SqlFacade(spark)
    f.register_table("media", t)
    f.sql(
        "CREATE MATERIALIZED VIEW segcounts AS "
        "SELECT seg, count(*) AS n, sum(val) AS total "
        "FROM media GROUP BY seg"
    )
    segs = sorted(r["seg"] for r in base.select("seg").distinct().collect())
    for s in segs:
        f.sql(f"DELETE FROM media WHERE seg = '{s}'")
    return f.sql("SHOW MATERIALIZED VIEWS").select(
        "view", "kind", "staleness"
    )


@register(
    "sql_maintain_tick",
    """
    WITH base AS (
      SELECT CAST(c_custkey AS VARCHAR) AS fid,
             round(CAST(c_acctbal AS DOUBLE), 2) AS val
      FROM customer),
    churn AS (
      SELECT CAST(c_custkey AS VARCHAR) AS fid,
             round(CAST(c_acctbal AS DOUBLE) + 100, 2) AS val
      FROM customer WHERE c_custkey % 5 = 0)
    SELECT b.fid,
           coalesce(c.val, b.val) AS val
    FROM base b LEFT JOIN churn c ON b.fid = c.fid
    """,
)
def sql_maintain_tick(spark, sf_dir):
    """``MAINTAIN <t>``: the reference's maintenance DAG loop as one
    facade statement — small-file compact (z-aware), drift-gated
    re-cluster, incremental ANALYZE advance, vacuum. The oracle pins
    the tick's core contract: maintenance operations are data-identical
    (compaction re-binpacks, stats/vacuum touch metadata), so the table
    reads back exactly the merge-applied state derived from the raw
    source. The returned stats are asserted fresh in-query (stats_lag
    0 after the tick — the autoanalyze analog)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )
    from openverse_catalog_spark.sql_facade import SqlFacade

    c = _t(spark, sf_dir, "customer")["customer"]
    base = c.select(
        F.col("c_custkey").cast("string").alias("fid"),
        F.round(F.col("c_acctbal").cast("double"), 2).alias("val"),
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_sql_mtick")
    shutil.rmtree(root, ignore_errors=True)
    t = CowTable.create(spark, root, base, keys=("fid",), target_files=6)
    t.analyze(kmv_k=128)
    cols = [
        ColumnSpec("fid", Datatype.char,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("val", Datatype.double),
    ]
    t.merge(
        c.filter(F.col("c_custkey") % 5 == 0).select(
            F.col("c_custkey").cast("string").alias("fid"),
            F.round(F.col("c_acctbal").cast("double") + 100, 2)
            .alias("val"),
        ),
        cols, deterministic=True,
    )
    f = SqlFacade(spark)
    f.register_table("media", t)
    row = f.sql("MAINTAIN media RETAIN 50 VERSIONS").collect()[0]
    assert row["stats_version"] == t.version, "stats must reach head"
    assert f.sql("DESCRIBE DETAIL media").collect()[0]["stats_lag"] == 0
    return f.sql("SELECT fid, val FROM media")


@register(
    "sql_clone_diverge",
    """
    WITH base AS (
      SELECT CAST(c_custkey AS VARCHAR) AS fid,
             round(CAST(c_acctbal AS DOUBLE), 2) AS val
      FROM customer)
    SELECT fid,
           CASE WHEN c_custkey % 4 = 0 THEN round(val + 50, 2)
                ELSE val END AS val,
           CAST(c_custkey % 4 = 0 AS BOOLEAN) AS boosted
    FROM base JOIN customer ON fid = CAST(c_custkey AS VARCHAR)
    WHERE c_custkey % 9 <> 0
    """,
)
def sql_clone_diverge(spark, sf_dir):
    """``CREATE TABLE c SHALLOW CLONE t``: Delta's zero-copy branch as
    facade text — the clone's first manifest references the source's
    files (no data copied; branching a 100 TB table is one metadata
    write), then diverges independently. The fixture clones, then runs
    UPDATE and DELETE text against the CLONE ONLY; the oracle
    recomputes the diverged state from the raw source, and the query
    asserts in-flight that the SOURCE still reads its original rows —
    the isolation half of the contract."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.sql_facade import SqlFacade

    c = _t(spark, sf_dir, "customer")["customer"]
    base = c.select(
        F.col("c_custkey").cast("string").alias("fid"),
        F.round(F.col("c_acctbal").cast("double"), 2).alias("val"),
        F.lit(False).alias("boosted"),
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_sql_clone")
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(root + "_c", ignore_errors=True)
    t = CowTable.create(
        spark, root, base, keys=("fid",), target_files=6
    )
    n_src = t.live_rows()
    f = SqlFacade(spark)
    f.register_table("media", t)
    f.sql(
        "CREATE TABLE branch SHALLOW CLONE media "
        f"LOCATION '{root}_c'"
    )
    f.sql(
        "UPDATE branch SET val = round(val + 50, 2), boosted = true "
        "WHERE CAST(fid AS BIGINT) % 4 = 0"
    )
    f.sql("DELETE FROM branch WHERE CAST(fid AS BIGINT) % 9 = 0")
    # isolation: the source never saw the branch's commits
    assert t.live_rows() == n_src and t.version == 1
    return f.sql("SELECT fid, val, boosted FROM branch")


@register(
    "sql_clone_vacuum_safe",
    """
    WITH base AS (
      SELECT CAST(c_custkey AS VARCHAR) AS fid,
             round(CAST(c_acctbal AS DOUBLE), 2) AS val,
             c_custkey AS k
      FROM customer),
    v2 AS (
      SELECT fid,
             CASE WHEN k % 5 = 0 THEN round(val + 100, 2) ELSE val END
               AS val,
             k
      FROM base)
    SELECT fid, val, 'branch' AS side FROM v2 WHERE k % 9 <> 0
    UNION ALL
    SELECT fid,
           CASE WHEN k % 3 = 0 THEN round(val - 50, 2) ELSE val END AS val,
           'media' AS side
    FROM v2
    """,
)
def sql_clone_vacuum_safe(spark, sf_dir):
    """Clone-protected vacuum: stock Delta documents that vacuuming a
    shallow clone's SOURCE can delete files the clone still references
    (delta.io shallow-clone caveat; the reference has no branching at
    all). With a catalog registering both tables, the caveat closes:
    ``LakeCatalog.vacuum_tables`` unions every registered clone's
    external file references into the source's keep-set (a manifest-
    only scan). The fixture churns the source, branches it via SHALLOW
    CLONE text, diverges both sides, COMPACTS the source (so its head
    drops the branched files), then vacuums past retention AND past
    catalog-pin history — the branch must read back exactly its
    diverged snapshot, which the oracle recomputes from raw customer.
    ``MAINTAIN CATALOG`` runs the same protected vacuum as the
    unattended tick."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from openverse_catalog_spark.operators.catalog import LakeCatalog
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.sql_facade import SqlFacade

    c = _t(spark, sf_dir, "customer")["customer"]
    base = c.select(
        F.col("c_custkey").cast("string").alias("fid"),
        F.round(F.col("c_acctbal").cast("double"), 2).alias("val"),
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_sql_clvac")
    shutil.rmtree(root, ignore_errors=True)
    cat = LakeCatalog.create(spark, os.path.join(root, "lake"))
    t = CowTable.create(
        spark, os.path.join(root, "media"), base,
        keys=("fid",), target_files=6,
    )
    cat.register("media", t)
    f = SqlFacade(spark)
    f.attach_catalog(cat)
    # churn the source, then branch at the published pin
    f.sql(
        "UPDATE media SET val = round(val + 100, 2) "
        "WHERE CAST(fid AS BIGINT) % 5 = 0"
    )
    f.sql(
        "CREATE TABLE branch SHALLOW CLONE media "
        f"LOCATION '{os.path.join(root, 'branch')}'"
    )
    f.sql("DELETE FROM branch WHERE CAST(fid AS BIGINT) % 9 = 0")
    # source diverges past the branch point and compacts: its HEAD no
    # longer references the files the branch pinned
    f.sql(
        "UPDATE media SET val = round(val - 50, 2) "
        "WHERE CAST(fid AS BIGINT) % 3 = 0"
    )
    f.sql("OPTIMIZE media")
    ext = cat._external_refs()
    assert ext, "the registered branch must reference source files"
    # vacuum past retention AND past catalog-pin history: without clone
    # protection the branched files are committed history of dropped
    # manifests — deleted regardless of age
    cat.vacuum_tables(keep_versions=1, retention_seconds=0,
                      catalog_history=1)
    assert all(os.path.exists(p) for p in ext), (
        "clone-referenced source files must survive source vacuum"
    )
    # the unattended tick runs the same protected vacuum
    f.sql("MAINTAIN CATALOG RETAIN 1 VERSIONS")
    assert all(os.path.exists(p) for p in ext)
    return f.sql(
        "SELECT fid, val, 'branch' AS side FROM branch "
        "UNION ALL "
        "SELECT fid, val, 'media' AS side FROM media"
    )


@register(
    "sql_create_empty",
    """
    WITH src AS (
      SELECT CAST(c_custkey AS VARCHAR) AS fid,
             round(CAST(c_acctbal AS DOUBLE), 2) AS val,
             c_custkey AS k
      FROM customer)
    SELECT fid,
           CASE WHEN k % 7 = 0 THEN round(val + 25, 2) ELSE val END AS val,
           CAST(k % 7 = 0 AS BOOLEAN) AS boosted
    FROM src
    """,
)
def sql_create_empty(spark, sf_dir):
    """Empty-table DDL: ``CREATE TABLE t (col type, ...) PRIMARY KEY
    (k) [LOCATION ...]`` with no AS SELECT — the reference's canonical
    tables are created EMPTY by DDL scripts and populated by loader
    upserts (docker/local_postgres/0003_openledger_image_schema.sql:
    16-54); until r8 the facade only had CTAS. The v1 manifest records
    the declared schema with zero data files, so the statement is one
    metadata write at any scale; INSERT (the upsert merge) and ANSI
    MERGE land on it immediately, which the fixture exercises before
    the oracle compare."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.sql_facade import SqlFacade

    f = SqlFacade(spark)
    f.register_df("customer", _t(spark, sf_dir, "customer")["customer"])
    root = os.path.join(tempfile.gettempdir(), "spark_graft_sql_empty")
    shutil.rmtree(root, ignore_errors=True)
    row = f.sql(
        "CREATE TABLE media (fid string, val double, boosted boolean) "
        f"PRIMARY KEY (fid) LOCATION '{root}'"
    ).collect()[0]
    assert (row["version"], row["rows"]) == (1, 0)
    assert f.sql("SELECT * FROM media").count() == 0, (
        "the zero-file v1 snapshot must be readable"
    )
    # INSERT INTO = the upsert merge, landing on the empty snapshot
    f.sql(
        "INSERT INTO media "
        "SELECT CAST(c_custkey AS STRING) AS fid, "
        "round(CAST(c_acctbal AS DOUBLE), 2) AS val, "
        "false AS boosted FROM customer"
    )
    # ANSI MERGE churn on top
    f.sql(
        "MERGE INTO media AS t USING ("
        "SELECT CAST(c_custkey AS STRING) AS fid, "
        "round(CAST(c_acctbal AS DOUBLE) + 25, 2) AS val, "
        "true AS boosted FROM customer WHERE c_custkey % 7 = 0"
        ") AS s ON t.fid = s.fid "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    return f.sql("SELECT fid, val, boosted FROM media")


@register(
    "sql_alter_add_column",
    """
    WITH base AS (
      SELECT CAST(c_custkey AS VARCHAR) AS fid,
             round(CAST(c_acctbal AS DOUBLE), 2) AS val,
             c_custkey AS k
      FROM customer)
    SELECT fid, val,
           CASE WHEN k % 6 = 0 THEN 'vip' ELSE NULL END AS tier
    FROM base
    """,
)
def sql_alter_add_column(spark, sf_dir):
    """``ALTER TABLE t ADD COLUMN c <type>`` — metadata-only schema
    evolution as facade text (Delta/Iceberg add-column semantics: no
    file rewritten, existing rows read NULL through the manifest
    schema; the reference evolves its media schema the same way —
    docker/local_postgres migration files add columns to live tables).
    The fixture CTAS-es a table, ADDs a column, populates it for a
    subset via UPDATE text, and the oracle pins the exact NULL/value
    split the old and new rows must show."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.sql_facade import SqlFacade

    f = SqlFacade(spark)
    f.register_df("customer", _t(spark, sf_dir, "customer")["customer"])
    root = os.path.join(tempfile.gettempdir(), "spark_graft_sql_addcol")
    shutil.rmtree(root, ignore_errors=True)
    f.sql(
        "CREATE TABLE media PRIMARY KEY (fid) "
        f"LOCATION '{root}' AS "
        "SELECT CAST(c_custkey AS STRING) AS fid, "
        "round(CAST(c_acctbal AS DOUBLE), 2) AS val FROM customer"
    )
    n_files = len(
        f._tables["media"]._manifest()["files"]
    )
    f.sql("ALTER TABLE media ADD COLUMN tier string")
    assert len(f._tables["media"]._manifest()["files"]) == n_files, (
        "ADD COLUMN must be metadata-only"
    )
    f.sql(
        "UPDATE media SET tier = 'vip' WHERE CAST(fid AS BIGINT) % 6 = 0"
    )
    return f.sql("SELECT fid, val, tier FROM media")


@register(
    "sql_ddl_roundtrip",
    """
    SELECT CAST(s_suppkey AS VARCHAR) AS fid,
           round(CAST(s_acctbal AS DOUBLE), 2) AS val,
           s_nationkey AS grp
    FROM supplier
    """,
)
def sql_ddl_roundtrip(spark, sf_dir):
    """The DDL lifecycle as facade text: ``SHOW CREATE TABLE`` emits an
    executable reproduction script (CREATE TABLE + ALTER ... ADD
    CONSTRAINT), which is replayed under a new name/location to build
    an empty twin; the twin is populated by INSERT, ``TRUNCATE
    TABLE``-ed (metadata-only empty commit, rows_deleted asserted),
    repopulated with a subset, then ``RESTORE ... TO TIMESTAMP AS OF``
    rolls it back to the full snapshot by commit time. ``VACUUM ... DRY
    RUN`` previews the superseded files without deleting anything
    (manifest count asserted unchanged). The returned rows are the
    restored twin's content; the oracle recomputes them straight from
    supplier — every statement in the chain must behave for the hashes
    to meet."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.sql_facade import SqlFacade

    f = SqlFacade(spark)
    f.register_df("supplier", _t(spark, sf_dir, "supplier")["supplier"])
    base = os.path.join(tempfile.gettempdir(), "spark_graft_sql_ddl_rt")
    shutil.rmtree(base, ignore_errors=True)
    f.sql(
        "CREATE TABLE media PRIMARY KEY (fid) "
        f"LOCATION '{base}/media' AS "
        "SELECT CAST(s_suppkey AS STRING) AS fid, "
        "round(CAST(s_acctbal AS DOUBLE), 2) AS val, "
        "s_nationkey AS grp FROM supplier"
    )
    f.sql("ALTER TABLE media ADD CONSTRAINT grp_ok CHECK (grp >= 0)")
    script = f.sql("SHOW CREATE TABLE media").head()["ddl"]
    script = script.replace("TABLE media", "TABLE twin").replace(
        f"{base}/media", f"{base}/twin"
    )
    for stmt in script.split(";\n"):
        f.sql(stmt)
    f.sql("INSERT INTO twin SELECT * FROM media")
    n_rows = f.sql("SELECT count(*) AS n FROM twin").head()["n"]
    tw = f._tables["twin"]
    ts_full = tw._manifest()["committed_at"]
    tr = f.sql("TRUNCATE TABLE twin").head()
    assert tr["rows_deleted"] == n_rows, "TRUNCATE must report the old rows"
    f.sql("INSERT INTO twin SELECT * FROM media WHERE grp < 5")
    n_manifests = len(os.listdir(os.path.join(tw.root, "manifests")))
    preview = f.sql("VACUUM twin DRY RUN").head()["files_would_delete"]
    assert preview > 0, "superseded files must be previewable"
    assert (
        len(os.listdir(os.path.join(tw.root, "manifests"))) == n_manifests
    ), "DRY RUN must not touch manifests"
    f.sql(f"RESTORE TABLE twin TO TIMESTAMP AS OF {ts_full}")
    return f.sql("SELECT fid, val, grp FROM twin")


@register(
    "sql_rename_table",
    """
    SELECT CAST(n_nationkey AS VARCHAR) AS fid, n_name AS name,
           CASE WHEN n_regionkey >= 3 THEN 'late' ELSE 'early' END AS wave
    FROM nation
    """,
)
def sql_rename_table(spark, sf_dir):
    """``ALTER TABLE t RENAME TO u`` — registration-level rename (no
    file or manifest moves; a catalog rename is ONE catalog commit that
    carries the pinned version verbatim). The fixture CTAS-es half the
    nations, renames the table, then lands the second half by INSERT
    under the NEW name — the oracle's full-nation expectation only
    holds if the rename kept the table, its upsert specs, and its head
    view intact across the name change."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.sql_facade import SqlFacade

    f = SqlFacade(spark)
    f.register_df("nation", _t(spark, sf_dir, "nation")["nation"])
    root = os.path.join(tempfile.gettempdir(), "spark_graft_sql_rename")
    shutil.rmtree(root, ignore_errors=True)
    f.sql(
        "CREATE TABLE staging PRIMARY KEY (fid) "
        f"LOCATION '{root}' AS "
        "SELECT CAST(n_nationkey AS STRING) AS fid, n_name AS name, "
        "'early' AS wave FROM nation WHERE n_regionkey < 3"
    )
    f.sql("ALTER TABLE staging RENAME TO published")
    f.sql(
        "INSERT INTO published "
        "SELECT CAST(n_nationkey AS STRING) AS fid, n_name AS name, "
        "'late' AS wave FROM nation WHERE n_regionkey >= 3"
    )
    return f.sql("SELECT fid, name, wave FROM published")
