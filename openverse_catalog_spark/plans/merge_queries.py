"""Upsert-MERGE and cleaning operators as oracle-checked queries.

These pin the reference's most load-bearing semantics (SURVEY §2.4, the
``test_sql.py`` upsert matrix) on the driver's synthetic tables: a target
("canonical table") and source ("staging batch") are derived
deterministically from ``orders``, merged with per-column strategies by
the library compiler, and compared against a DuckDB full-outer-join
oracle implementing the same strategy SQL the reference generates
(reference ``columns.py:38-78``, ``loader/sql.py:264-332``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from openverse_catalog_spark.session import literal_df

from openverse_catalog_spark.operators.merge import (
    distinct_on,
    merge_upsert,
    url_conflict_filter,
)
from openverse_catalog_spark.plans.analytics import _t, register
from openverse_catalog_spark.schemas.columns import (
    ColumnSpec,
    Datatype,
    UpsertStrategy,
    clean_bool_expr,
    clean_int_expr,
    clean_string_expr,
    pg_int4_guard,
)
from openverse_catalog_spark.functions.cleaning import (
    extract_filetype_expr,
    clean_tags_expr,
)

# --- derivation of the synthetic staging/target inputs (same in SQL) -------
# target: orders with o_orderkey % 4 != 3   (the canonical table)
# source: orders with o_orderkey % 4 != 1   (the new batch; overlap %4 in {0,2})
#
# column construction injects every upsert edge case:
#   status: src NULL when key%3=0            -> newest_non_null keeps tgt
#   total:  src = price+1, NULL when key%7=0 -> newest_non_null keeps tgt
#   tags:   tgt NULL when key%5=0; src NULL when key%11=0 -> array merge fallbacks
#   meta:   per-key coalesce with null-stripping (jsonb object merge)

_TGT_SQL = """
  SELECT o_orderkey AS fid,
         o_orderstatus AS status,
         o_totalprice AS total,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL
              ELSE ['p' || CAST(o_orderkey % 7 AS VARCHAR)] END AS tags,
         CASE WHEN o_orderkey % 6 = 0 THEN NULL ELSE o_orderpriority END AS m_priority,
         'seg' || CAST(o_orderkey % 3 AS VARCHAR) AS m_segment
  FROM orders WHERE o_orderkey % 4 <> 3
"""

_SRC_SQL = """
  SELECT o_orderkey AS fid,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE 'X' || o_orderstatus END AS status,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice + 1 END AS total,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL
              ELSE ['p' || CAST(o_orderkey % 5 AS VARCHAR), 'q'] END AS tags,
         CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE 'NEW' END AS m_priority,
         CAST(NULL AS VARCHAR) AS m_segment
  FROM orders WHERE o_orderkey % 4 <> 1
"""


def _tgt_df(o):
    k = F.col("o_orderkey")
    return o.filter(k % 4 != 3).select(
        k.alias("fid"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total"),
        F.when(k % 5 == 0, F.lit(None)).otherwise(
            F.array(F.concat(F.lit("p"), (k % 7).cast("string")))
        ).alias("tags"),
        F.create_map(
            F.lit("priority"),
            F.when(k % 6 == 0, F.lit(None).cast("string")).otherwise(
                F.col("o_orderpriority")
            ),
            F.lit("segment"),
            F.concat(F.lit("seg"), (k % 3).cast("string")),
        ).alias("meta"),
    )


def _src_df(o):
    k = F.col("o_orderkey")
    return o.filter(k % 4 != 1).select(
        k.alias("fid"),
        F.when(k % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("X"), F.col("o_orderstatus")))
        .alias("status"),
        F.when(k % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice") + 1)
        .alias("total"),
        F.when(k % 11 == 0, F.lit(None).cast("array<string>"))
        .otherwise(
            F.array(F.concat(F.lit("p"), (k % 5).cast("string")), F.lit("q"))
        )
        .alias("tags"),
        F.create_map(
            F.lit("priority"),
            F.when(k % 2 == 0, F.lit(None).cast("string")).otherwise(F.lit("NEW")),
            F.lit("segment"),
            F.lit(None).cast("string"),
        ).alias("meta"),
    )


_MERGE_COLS = [
    ColumnSpec("fid", Datatype.int, required=True, upsert_strategy=UpsertStrategy.no_change),
    ColumnSpec("status", Datatype.char),
    ColumnSpec("total", Datatype.double),
    ColumnSpec("tags", Datatype.array_str, upsert_strategy=UpsertStrategy.merge_array),
    ColumnSpec("meta", Datatype.jsonb_map, upsert_strategy=UpsertStrategy.merge_jsonb_objects),
]


@register(
    "merge_upsert_strategies",
    f"""
    WITH t AS ({_TGT_SQL}), s AS ({_SRC_SQL})
    SELECT coalesce(t.fid, s.fid) AS fid,
           CASE WHEN t.fid IS NOT NULL AND s.fid IS NOT NULL THEN coalesce(s.status, t.status)
                WHEN s.fid IS NOT NULL THEN s.status ELSE t.status END AS status,
           round(CASE WHEN t.fid IS NOT NULL AND s.fid IS NOT NULL THEN coalesce(s.total, t.total)
                      WHEN s.fid IS NOT NULL THEN s.total ELSE t.total END, 2) AS total,
           CASE WHEN t.fid IS NOT NULL AND s.fid IS NOT NULL THEN
                  CASE WHEN t.tags IS NULL THEN array_to_string(s.tags, '|')
                       WHEN s.tags IS NULL THEN array_to_string(t.tags, '|')
                       ELSE array_to_string(list_sort(list_distinct(list_cat(t.tags, s.tags))), '|') END
                WHEN s.fid IS NOT NULL THEN array_to_string(s.tags, '|')
                ELSE array_to_string(t.tags, '|') END AS tags_s,
           CASE WHEN t.fid IS NOT NULL AND s.fid IS NOT NULL THEN
                  concat_ws(';',
                    CASE WHEN coalesce(s.m_priority, t.m_priority) IS NOT NULL
                         THEN 'priority=' || coalesce(s.m_priority, t.m_priority) END,
                    CASE WHEN coalesce(s.m_segment, t.m_segment) IS NOT NULL
                         THEN 'segment=' || coalesce(s.m_segment, t.m_segment) END)
                WHEN s.fid IS NOT NULL THEN
                  concat_ws(';',
                    CASE WHEN s.m_priority IS NOT NULL THEN 'priority=' || s.m_priority END,
                    CASE WHEN s.m_segment IS NOT NULL THEN 'segment=' || s.m_segment END)
                ELSE
                  concat_ws(';',
                    CASE WHEN t.m_priority IS NOT NULL THEN 'priority=' || t.m_priority END,
                    CASE WHEN t.m_segment IS NOT NULL THEN 'segment=' || t.m_segment END)
           END AS meta_s,
           CASE WHEN t.fid IS NOT NULL AND s.fid IS NOT NULL THEN 'updated'
                WHEN s.fid IS NOT NULL THEN 'inserted' ELSE 'kept' END AS row_status
    FROM t FULL OUTER JOIN s ON t.fid = s.fid
    """,
)
def merge_upsert_strategies(spark, sf_dir):
    """J7 + §2.4: the per-column-strategy MERGE, executed by the library
    compiler (operators/merge.py) — newest_non_null fallbacks, array
    set-union with null fallbacks, jsonb-object merge with null-stripping
    and new-key-wins, and outer-join row classification."""
    o = _t(spark, sf_dir, "orders")["orders"]
    merged = merge_upsert(
        _tgt_df(o),
        _src_df(o),
        _MERGE_COLS,
        keys=("fid",),
        dedupe_source_on_url=False,
        guard_url_conflicts=False,
        status_col="row_status",
    )
    meta_s = F.concat_ws(
        ";",
        F.transform(
            F.array_sort(F.map_keys(F.col("meta"))),
            lambda key: F.concat(key, F.lit("="), F.element_at(F.col("meta"), key)),
        ),
    )
    return merged.select(
        "fid",
        "status",
        F.round("total", 2).alias("total"),
        F.array_join(F.col("tags"), "|").alias("tags_s"),
        meta_s.alias("meta_s"),
        "row_status",
    )


# --- DISTINCT ON (url) + url-conflict guard (loader/sql.py:319-326) --------

_STAGE_SQL = """
  SELECT o_orderkey AS fid,
         'prov' || CAST(o_orderkey % 2 AS VARCHAR) AS provider,
         'http://img.example/' || CAST(o_orderkey % 5000 AS VARCHAR) AS url,
         o_totalprice AS total
  FROM orders WHERE o_orderkey % 3 = 0
"""

_CANON_SQL = """
  SELECT o_orderkey AS fid,
         'prov' || CAST(o_orderkey % 2 AS VARCHAR) AS provider,
         'http://img.example/' || CAST(o_orderkey % 5000 AS VARCHAR) AS url
  FROM orders WHERE o_orderkey % 4 = 0
"""


def _stage_df(o):
    k = F.col("o_orderkey")
    return o.filter(k % 3 == 0).select(
        k.alias("fid"),
        F.concat(F.lit("prov"), (k % 2).cast("string")).alias("provider"),
        F.concat(F.lit("http://img.example/"), (k % 5000).cast("string")).alias("url"),
        F.col("o_totalprice").alias("total"),
    )


def _canon_df(o):
    k = F.col("o_orderkey")
    return o.filter(k % 4 == 0).select(
        k.alias("fid"),
        F.concat(F.lit("prov"), (k % 2).cast("string")).alias("provider"),
        F.concat(F.lit("http://img.example/"), (k % 5000).cast("string")).alias("url"),
    )


@register(
    "merge_url_guards",
    f"""
    WITH stage AS ({_STAGE_SQL}), canon AS ({_CANON_SQL}),
    dedup AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY url ORDER BY provider, fid) AS rn
        FROM stage)
      WHERE rn = 1
    )
    SELECT d.fid, d.provider, d.url, round(d.total, 2) AS total
    FROM dedup d
    WHERE NOT EXISTS (
      SELECT 1 FROM canon c
      WHERE c.url = d.url AND NOT (c.provider = d.provider AND c.fid = d.fid)
    )
    """,
)
def merge_url_guards(spark, sf_dir):
    """W3 + J3: DISTINCT ON (url) one-row-per-url batch winner, then the
    url-conflict anti-join against the canonical table
    (loader/sql.py:319-326)."""
    o = _t(spark, sf_dir, "orders")["orders"]
    stage, canon = _stage_df(o), _canon_df(o)
    deduped = distinct_on(stage, ["url"], [F.col("provider"), F.col("fid")])
    survived = url_conflict_filter(deduped, canon, keys=("provider", "fid"))
    return survived.select(
        "fid", "provider", "url", F.round("total", 2).alias("total")
    )


# --- cleaning expressions (P3-P8) ------------------------------------------


@register(
    "clean_sanitize_strings",
    r"""
    WITH raw AS (
      SELECT doc_id,
             '  ' || substr(text, 1, 60) || '  "q"  ' AS messy,
             CAST(doc_id * 1000 AS VARCHAR) || '.' || CAST(doc_id % 10 AS VARCHAR) AS num_s,
             CASE doc_id % 5 WHEN 0 THEN 't' WHEN 1 THEN 'f' WHEN 2 THEN 'true'
                             WHEN 3 THEN 'no' ELSE 'xx' END AS bool_s
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN length(replace(trim(regexp_replace(messy, '\s+', ' ', 'g')), '"', '''')) > 40
                THEN substr(replace(trim(regexp_replace(messy, '\s+', ' ', 'g')), '"', ''''), 1, 40)
                ELSE replace(trim(regexp_replace(messy, '\s+', ' ', 'g')), '"', '''') END AS cleaned,
           CAST(trunc(CAST(num_s AS DOUBLE)) AS BIGINT) AS as_int,
           CAST(CASE WHEN bool_s IN ('t', 'true', '1', 'yes') THEN true
                     WHEN bool_s IN ('f', 'false', '0', 'no') THEN false END AS VARCHAR) AS as_bool
    FROM raw
    """,
)
def clean_sanitize_strings(spark, sf_dir):
    """P3-P6: whitespace collapse, quote swap, char-limit truncate, int
    and bool coercion — the columns.py prepare_string semantics as pure
    Catalyst expressions (schemas/columns.py clean_* builders)."""
    d = _t(spark, sf_dir, "documents")["documents"]
    k = F.col("doc_id")
    raw = d.select(
        k,
        F.concat(F.lit("  "), F.substring("text", 1, 60), F.lit('  "q"  ')).alias("messy"),
        F.concat((k * 1000).cast("string"), F.lit("."), (k % 10).cast("string")).alias("num_s"),
        (
            F.when(k % 5 == 0, F.lit("t"))
            .when(k % 5 == 1, F.lit("f"))
            .when(k % 5 == 2, F.lit("true"))
            .when(k % 5 == 3, F.lit("no"))
            .otherwise(F.lit("xx"))
        ).alias("bool_s"),
    )
    return raw.select(
        "doc_id",
        clean_string_expr(F.col("messy"), size=40, truncate=True).alias("cleaned"),
        clean_int_expr(F.col("num_s")).alias("as_int"),
        clean_bool_expr(F.col("bool_s")).cast("string").alias("as_bool"),
    )


@register(
    "clean_filetype_url",
    """
    WITH urls AS (
      SELECT p_partkey,
             'https://img.example.com/p/' || CAST(p_partkey AS VARCHAR) ||
             CASE p_partkey % 5 WHEN 0 THEN '.JPEG?trackid=123' WHEN 1 THEN '.png'
                                WHEN 2 THEN '.TIF' WHEN 3 THEN '.svg?x=1' ELSE '.webp' END AS url
      FROM part
    )
    SELECT p_partkey, url,
           CASE lower(regexp_extract(url, '\\.(\\w{{1,5}})([?#].*)?$', 1))
                WHEN 'jpeg' THEN 'jpg' WHEN 'tif' THEN 'tiff'
                ELSE CASE WHEN lower(regexp_extract(url, '\\.(\\w{{1,5}})([?#].*)?$', 1))
                               IN ('jpg','png','gif','svg','tiff','webp')
                          THEN lower(regexp_extract(url, '\\.(\\w{{1,5}})([?#].*)?$', 1)) END END AS filetype,
           regexp_replace(url, '\\?.*$', '') AS url_stripped
    FROM urls
    """.replace("{{", "{").replace("}}", "}"),
)
def clean_filetype_url(spark, sf_dir):
    """P7/P8/P19: filetype from URL extension with jpeg->jpg / tif->tiff
    unification (extensions.py:7-12, media.py:313-325) + query-param
    stripping (jamendo.py:69-106)."""
    p = _t(spark, sf_dir, "part")["part"]
    k = F.col("p_partkey")
    urls = p.select(
        k,
        F.concat(
            F.lit("https://img.example.com/p/"),
            k.cast("string"),
            F.when(k % 5 == 0, F.lit(".JPEG?trackid=123"))
            .when(k % 5 == 1, F.lit(".png"))
            .when(k % 5 == 2, F.lit(".TIF"))
            .when(k % 5 == 3, F.lit(".svg?x=1"))
            .otherwise(F.lit(".webp")),
        ).alias("url"),
    )
    return urls.select(
        "p_partkey",
        "url",
        extract_filetype_expr(
            F.col("url"), ("jpg", "png", "gif", "svg", "tiff", "webp")
        ).alias("filetype"),
        F.regexp_replace("url", r"\?.*$", "").alias("url_stripped"),
    )


@register(
    "clean_tags_blacklist",
    """
    WITH raw AS (
      SELECT p_partkey,
             [lower(string_split(p_type, ' ')[1]), 'no person', 'uploaded:by=x',
              lower(p_brand), 'cc0'] AS tags
      FROM part
    ),
    flt AS (
      SELECT p_partkey,
             list_sort(list_distinct(list_transform(
               list_filter(tags, t -> t IS NOT NULL AND trim(t) <> ''
                 AND lower(trim(t)) NOT IN ('no person', 'squareformat')
                 AND NOT contains(lower(trim(t)), 'flickriosapp')
                 AND NOT contains(lower(trim(t)), 'uploaded')
                 AND NOT contains(lower(trim(t)), ':')
                 AND NOT contains(lower(trim(t)), '=')
                 AND NOT contains(lower(trim(t)), 'cc0')
                 AND NOT contains(lower(trim(t)), 'by')
                 AND NOT contains(lower(trim(t)), 'by-nc')
                 AND NOT contains(lower(trim(t)), 'by-nd')
                 AND NOT contains(lower(trim(t)), 'by-sa')
                 AND NOT contains(lower(trim(t)), 'by-nc-nd')
                 AND NOT contains(lower(trim(t)), 'by-nc-sa')
                 AND NOT contains(lower(trim(t)), 'pdm')),
               t -> trim(t) || '@provider_x'))) AS tag_keys
      FROM raw
    )
    SELECT p_partkey, array_to_string(tag_keys, '|') AS tags_s FROM flt
    """,
)
def clean_tags_blacklist(spark, sf_dir):
    """P9: tag blacklist filter + {name, provider} enrichment
    (media.py:252-311). Structs serialized name@provider for comparison."""
    p = _t(spark, sf_dir, "part")["part"]
    raw = p.select(
        "p_partkey",
        F.array(
            F.lower(F.element_at(F.split("p_type", " "), 1)),
            F.lit("no person"),
            F.lit("uploaded:by=x"),
            F.lower("p_brand"),
            F.lit("cc0"),
        ).alias("tags"),
    )
    cleaned = raw.select(
        "p_partkey",
        clean_tags_expr(F.col("tags"), F.lit("provider_x")).alias("tags"),
    )
    return cleaned.select(
        "p_partkey",
        F.array_join(
            F.transform(
                F.col("tags"), lambda t: F.concat(t["name"], F.lit("@"), t["provider"])
            ),
            "|",
        ).alias("tags_s"),
    )


# --- A10 + post-upsert accounting (loader/loader.py:44-67) -----------------
# One staging batch flows loaded -> clean (missing required) -> fid-dedup ->
# DISTINCT ON url + url-conflict guard; the report derives every count from
# the same identity the reference uses:
#   url_dup = loaded - missing_columns - foreign_id_dup - upserted

_REPORT_STAGE_SQL = """
  SELECT o_orderkey % 600 AS fid,
         'prov' || CAST(o_orderkey % 2 AS VARCHAR) AS provider,
         CASE WHEN o_orderkey % 13 = 0 THEN NULL
              ELSE 'http://u/' || CAST(o_orderkey % 500 AS VARCHAR) END AS url
  FROM orders
"""

_REPORT_CANON_SQL = """
  SELECT o_orderkey % 600 AS fid,
         'prov' || CAST(o_orderkey % 2 AS VARCHAR) AS provider,
         'http://u/' || CAST((o_orderkey + 1) % 500 AS VARCHAR) AS url
  FROM orders WHERE o_orderkey % 4 = 0
"""


@register(
    "merge_load_report",
    f"""
    WITH stage AS ({_REPORT_STAGE_SQL}), canon AS ({_REPORT_CANON_SQL}),
    cleaned AS (SELECT * FROM stage WHERE url IS NOT NULL),
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY provider, fid ORDER BY url) AS rn
        FROM cleaned) WHERE rn = 1),
    urlone AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY url ORDER BY provider, fid) AS rn2
        FROM deduped) WHERE rn2 = 1),
    survived AS (
      SELECT * FROM urlone d
      WHERE NOT EXISTS (
        SELECT 1 FROM canon c
        WHERE c.url = d.url AND NOT (c.provider = d.provider AND c.fid = d.fid))),
    n AS (SELECT (SELECT count(*) FROM stage) AS loaded,
                 (SELECT count(*) FROM cleaned) AS n_clean,
                 (SELECT count(*) FROM deduped) AS n_dedup,
                 (SELECT count(*) FROM survived) AS upserted)
    SELECT loaded,
           loaded - n_clean AS missing_columns,
           n_clean - n_dedup AS foreign_id_dup,
           upserted,
           n_dedup - upserted AS url_dup
    FROM n
    """,
)
def merge_load_report(spark, sf_dir):
    """A10: the run-statistics report as one distributed DataFrame — each
    pipeline stage's count is a single-row aggregate, combined by cross
    join (no driver-side collect loops). The identity matches the
    reference: url_dup = loaded - missing - fid_dup - upserted."""
    o = _t(spark, sf_dir, "orders")["orders"]
    k = F.col("o_orderkey")
    stage = o.select(
        (k % 600).alias("fid"),
        F.concat(F.lit("prov"), (k % 2).cast("string")).alias("provider"),
        F.when(k % 13 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("http://u/"), (k % 500).cast("string"))
        ).alias("url"),
    )
    canon = o.filter(k % 4 == 0).select(
        (k % 600).alias("fid"),
        F.concat(F.lit("prov"), (k % 2).cast("string")).alias("provider"),
        F.concat(F.lit("http://u/"), ((k + 1) % 500).cast("string")).alias("url"),
    )
    cleaned = stage.na.drop(subset=["url"])
    deduped = distinct_on(cleaned, ["provider", "fid"], [F.col("url")])
    urlone = distinct_on(deduped, ["url"], [F.col("provider"), F.col("fid")])
    survived = url_conflict_filter(urlone, canon, keys=("provider", "fid"))
    counts = (
        stage.agg(F.count("*").alias("loaded"))
        .crossJoin(F.broadcast(cleaned.agg(F.count("*").alias("n_clean"))))
        .crossJoin(F.broadcast(deduped.agg(F.count("*").alias("n_dedup"))))
        .crossJoin(F.broadcast(survived.agg(F.count("*").alias("upserted"))))
    )
    return counts.select(
        "loaded",
        (F.col("loaded") - F.col("n_clean")).alias("missing_columns"),
        (F.col("n_clean") - F.col("n_dedup")).alias("foreign_id_dup"),
        "upserted",
        (F.col("n_dedup") - F.col("upserted")).alias("url_dup"),
    )


@register(
    "merge_idempotent_reingest",
    f"""
    WITH t AS ({_TGT_SQL}), s AS ({_SRC_SQL})
    SELECT coalesce(t.fid, s.fid) AS fid,
           CASE WHEN t.fid IS NOT NULL AND s.fid IS NOT NULL THEN coalesce(s.status, t.status)
                WHEN s.fid IS NOT NULL THEN s.status ELSE t.status END AS status,
           round(CASE WHEN t.fid IS NOT NULL AND s.fid IS NOT NULL THEN coalesce(s.total, t.total)
                      WHEN s.fid IS NOT NULL THEN s.total ELSE t.total END, 2) AS total,
           CASE WHEN t.fid IS NOT NULL AND s.fid IS NOT NULL THEN
                  CASE WHEN t.tags IS NULL THEN array_to_string(s.tags, '|')
                       WHEN s.tags IS NULL THEN array_to_string(t.tags, '|')
                       ELSE array_to_string(list_sort(list_distinct(list_cat(t.tags, s.tags))), '|') END
                WHEN s.fid IS NOT NULL THEN array_to_string(s.tags, '|')
                ELSE array_to_string(t.tags, '|') END AS tags_s
    FROM t FULL OUTER JOIN s ON t.fid = s.fid
    """,
)
def merge_idempotent_reingest(spark, sf_dir):
    """I3: reingestion is a re-MERGE of already-seen data — the upsert
    must be idempotent. The engine applies the SAME source batch twice
    (merge, then merge again into the result); the oracle computes a
    single application. Equality proves every strategy is idempotent:
    coalesce(s, coalesce(s, t)) == coalesce(s, t), set-union twice ==
    once, jsonb new-wins twice == once."""
    o = _t(spark, sf_dir, "orders")["orders"]
    cols = [c for c in _MERGE_COLS if c.name != "meta"]
    tgt = _tgt_df(o).drop("meta")
    src = _src_df(o).drop("meta")
    once = merge_upsert(
        tgt, src, cols, keys=("fid",),
        dedupe_source_on_url=False, guard_url_conflicts=False,
    )
    twice = merge_upsert(
        once, src, cols, keys=("fid",),
        dedupe_source_on_url=False, guard_url_conflicts=False,
    )
    return twice.select(
        "fid",
        "status",
        F.round("total", 2).alias("total"),
        F.array_join(F.col("tags"), "|").alias("tags_s"),
    )


@register(
    "merge_snapshot_diff",
    """
    WITH old AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 11 <> 3
    ),
    new AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 13 <> 5
    )
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_totalprice <> n.o_totalprice
                  OR o.o_custkey <> n.o_custkey
                  OR o.o_orderstatus <> n.o_orderstatus THEN 'changed'
           END AS change_type
    FROM old o FULL JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE NOT (o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
               AND o.o_totalprice = n.o_totalprice
               AND o.o_custkey = n.o_custkey
               AND o.o_orderstatus = n.o_orderstatus)
    """,
)
def merge_snapshot_diff(spark, sf_dir):
    """CDC between two snapshot versions (the incremental form of the
    reference's full-refresh diffing): rows are reduced to (key,
    md5-row-hash) BEFORE the full-outer join, so diffing wide snapshots
    shuffles keys + 32 bytes instead of the payload. Old/new versions
    are carved from orders identically on both engines (dropped keys ->
    added/removed; +1 price for every 7th key -> changed)."""
    from openverse_catalog_spark.operators.merge import snapshot_diff

    o = _t(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    old = o.filter(F.col("o_orderkey") % 11 != 3)
    new = o.filter(F.col("o_orderkey") % 13 != 5).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(
        old, new, ["o_orderkey"], ["o_custkey", "o_orderstatus", "o_totalprice"]
    )


# --- jsonb_struct merge (audio_set, columns.py:42-52 on a fixed-key object)

_ASET_ORACLE = """
  WITH t AS (
    SELECT o_orderkey AS fid,
           o_orderkey % 13 <> 0 AS t_present,
           CASE WHEN o_orderkey % 13 <> 0 THEN 'T' || CAST(o_orderkey % 10 AS VARCHAR) END AS t_title,
           CASE WHEN o_orderkey % 13 <> 0 AND o_orderkey % 2 <> 0 THEN 'c1' END AS t_creator,
           CASE WHEN o_orderkey % 13 <> 0 THEN 'thumb' || CAST(o_orderkey % 3 AS VARCHAR) END AS t_thumb
    FROM orders WHERE o_orderkey % 4 <> 3
  ), s AS (
    SELECT o_orderkey AS fid,
           o_orderkey % 9 <> 0 AS s_present,
           CASE WHEN o_orderkey % 9 <> 0 AND o_orderkey % 3 <> 0 THEN 'S' || CAST(o_orderkey % 5 AS VARCHAR) END AS s_title,
           CASE WHEN o_orderkey % 9 <> 0 AND o_orderkey % 5 = 0 THEN 'c2' END AS s_creator,
           CAST(NULL AS VARCHAR) AS s_thumb
    FROM orders WHERE o_orderkey % 4 <> 1
  )
  SELECT coalesce(t.fid, s.fid) AS fid,
         CASE WHEN t.fid IS NOT NULL AND s.fid IS NOT NULL THEN
                CASE WHEN NOT s.s_present THEN t.t_title
                     WHEN NOT t.t_present THEN s.s_title
                     ELSE coalesce(s.s_title, t.t_title) END
              WHEN s.fid IS NOT NULL THEN s.s_title ELSE t.t_title END AS set_title,
         CASE WHEN t.fid IS NOT NULL AND s.fid IS NOT NULL THEN
                CASE WHEN NOT s.s_present THEN t.t_creator
                     WHEN NOT t.t_present THEN s.s_creator
                     ELSE coalesce(s.s_creator, t.t_creator) END
              WHEN s.fid IS NOT NULL THEN s.s_creator ELSE t.t_creator END AS set_creator,
         CASE WHEN t.fid IS NOT NULL AND s.fid IS NOT NULL THEN
                CASE WHEN NOT s.s_present THEN t.t_thumb
                     WHEN NOT t.t_present THEN s.s_thumb
                     ELSE coalesce(s.s_thumb, t.t_thumb) END
              WHEN s.fid IS NOT NULL THEN s.s_thumb ELSE t.t_thumb END AS set_thumb,
         CASE WHEN t.fid IS NOT NULL AND s.fid IS NOT NULL THEN NOT (t.t_present OR s.s_present)
              WHEN s.fid IS NOT NULL THEN NOT s.s_present
              ELSE NOT t.t_present END AS set_is_null
  FROM t FULL OUTER JOIN s ON t.fid = s.fid
"""


def _aset_struct(title, creator, thumb):
    from openverse_catalog_spark.schemas.columns import AUDIO_SET_STRUCT

    fields = {f.name: F.lit(None).cast(f.dataType) for f in AUDIO_SET_STRUCT.fields}
    fields["title"] = title
    fields["creator"] = creator
    fields["thumbnail"] = thumb
    return F.struct(*[fields[f.name].alias(f.name) for f in AUDIO_SET_STRUCT.fields])


@register("merge_struct_audio_set", _ASET_ORACLE)
def merge_struct_audio_set(spark, sf_dir):
    """§2.4 merge_jsonb_objects on the fixed-key audio_set struct
    (columns.py:42-52 applied to the jsonb_struct column of the audio
    schema): field-wise new-wins coalesce, whole-side NULL fallbacks.
    The struct never explodes to a map — one codegen'd projection."""
    o = _t(spark, sf_dir, "orders")["orders"]
    k = F.col("o_orderkey")
    tgt = o.filter(k % 4 != 3).select(
        k.alias("fid"),
        F.when(k % 13 == 0, F.lit(None)).otherwise(
            _aset_struct(
                F.concat(F.lit("T"), (k % 10).cast("string")),
                F.when(k % 2 != 0, F.lit("c1")),
                F.concat(F.lit("thumb"), (k % 3).cast("string")),
            )
        ).alias("aset"),
    )
    src = o.filter(k % 4 != 1).select(
        k.alias("fid"),
        F.when(k % 9 == 0, F.lit(None)).otherwise(
            _aset_struct(
                F.when(k % 3 != 0, F.concat(F.lit("S"), (k % 5).cast("string"))),
                F.when(k % 5 == 0, F.lit("c2")),
                F.lit(None).cast("string"),
            )
        ).alias("aset"),
    )
    cols = [
        ColumnSpec("fid", Datatype.int, required=True, upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("aset", Datatype.jsonb_struct, upsert_strategy=UpsertStrategy.merge_jsonb_objects),
    ]
    merged = merge_upsert(
        tgt, src, cols, keys=("fid",),
        dedupe_source_on_url=False, guard_url_conflicts=False,
    )
    return merged.select(
        "fid",
        F.col("aset.title").alias("set_title"),
        F.col("aset.creator").alias("set_creator"),
        F.col("aset.thumbnail").alias("set_thumb"),
        F.col("aset").isNull().alias("set_is_null"),
    )


# --- partition-pruned merge (Delta-style file pruning, DataFrame form) -----


@register(
    "merge_partition_pruned",
    """
    WITH t AS (
      SELECT 'prov' || CAST(o_orderkey % 3 AS VARCHAR) AS provider,
             o_orderkey AS fid, o_orderstatus AS title
      FROM orders
    ), s AS (
      SELECT 'prov1' AS provider, o_orderkey AS fid,
             'N' || o_orderstatus AS title
      FROM orders WHERE o_orderkey % 3 = 1 AND o_orderkey % 2 = 0
    )
    SELECT coalesce(t.provider, s.provider) AS provider,
           coalesce(t.fid, s.fid) AS fid,
           CASE WHEN t.fid IS NOT NULL AND s.fid IS NOT NULL
                  THEN coalesce(s.title, t.title)
                WHEN s.fid IS NOT NULL THEN s.title ELSE t.title END AS title,
           CASE WHEN t.fid IS NOT NULL AND s.fid IS NOT NULL THEN 'updated'
                WHEN s.fid IS NOT NULL THEN 'inserted' ELSE 'kept' END AS st
    FROM t FULL OUTER JOIN s
      ON t.provider = s.provider AND t.fid = s.fid
    """,
)
def merge_partition_pruned(spark, sf_dir):
    """J7 at scale: the partition-pruned merge — the batch names one
    provider of three, so two-thirds of the canonical table bypasses the
    merge join entirely (with on-disk provider partitioning that is
    metadata-only pruning; here it is a broadcast semi/anti split). The
    oracle is the PLAIN full-outer merge — identical results prove the
    pruning is a pure physical optimization."""
    from openverse_catalog_spark.operators.merge import merge_upsert_pruned

    o = _t(spark, sf_dir, "orders")["orders"]
    k = F.col("o_orderkey")
    tgt = o.select(
        F.concat(F.lit("prov"), (k % 3).cast("string")).alias("provider"),
        k.alias("fid"),
        F.col("o_orderstatus").alias("title"),
    )
    src = o.filter((k % 3 == 1) & (k % 2 == 0)).select(
        F.lit("prov1").alias("provider"),
        k.alias("fid"),
        F.concat(F.lit("N"), F.col("o_orderstatus")).alias("title"),
    )
    cols = [
        ColumnSpec("provider", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("fid", Datatype.int, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("title", Datatype.char),
    ]
    return merge_upsert_pruned(
        tgt, src, cols, keys=("provider", "fid"),
        dedupe_source_on_url=False, guard_url_conflicts=False,
        status_col="st",
    )


# --- provider staleness expiration (retired image_expiration_workflow) ----


@register(
    "merge_expire_stale",
    """
    WITH win AS (SELECT * FROM (VALUES
        ('click', 5), ('view', 10), ('signup', 15),
        ('purchase', 20), ('error', 25)) AS v(provider, max_days))
    SELECT e.event_type AS provider,
           count(*) FILTER (WHERE e.ts < TIMESTAMP '2024-01-25 00:00:00'
                              - to_days(w.max_days)) AS n_expired,
           count(*) FILTER (WHERE e.ts >= TIMESTAMP '2024-01-25 00:00:00'
                              - to_days(w.max_days)) AS n_fresh
    FROM events e JOIN win w ON w.provider = e.event_type
    GROUP BY e.event_type
    """,
)
def merge_expire_stale(spark, sf_dir):
    """Provider staleness expiration (reference retired/common/loader/
    sql.py:1-35 + loader/sql.py:29-41 OLDEST_PER_PROVIDER): rows whose
    updated_on is older than the provider's staleness window get flagged
    removed_from_source — the batch watermark analog of streaming
    late-data cutoffs (SURVEY I3). The per-provider window is a literal
    map (no join for the threshold); the flag + counts are one scan with
    map-side partials. Deterministic 'now' so the oracle pins values."""
    ev = _t(spark, sf_dir, "events")["events"]
    windows = {"click": 5, "view": 10, "signup": 15, "purchase": 20, "error": 25}
    entries = []
    for p, d in windows.items():
        entries.append(F.lit(p))
        entries.append(F.lit(d))
    max_days = F.element_at(F.create_map(*entries), F.col("event_type"))
    now_us = F.unix_micros(F.lit("2024-01-25 00:00:00").cast("timestamp"))
    expired = F.unix_micros(F.col("ts")) < (
        now_us - max_days.cast("long") * F.lit(86_400_000_000)
    )
    return (
        ev.filter(max_days.isNotNull())
        .groupBy(F.col("event_type").alias("provider"))
        .agg(
            F.count(F.when(expired, 1)).alias("n_expired"),
            F.count(F.when(~expired, 1)).alias("n_fresh"),
        )
    )


# --- canonical-table uniqueness invariants ---------------------------------
# The reference enforces UNIQUE (provider, md5(foreign_identifier)) and
# UNIQUE (url) with indexes (0003_openledger_image_schema.sql:46-54). Here
# the invariants are operators: `uniqueness_report` quantifies violations,
# `enforce_unique` (also reachable as merge_upsert(validate_unique=True))
# repairs a dirty state with a deterministic keeper per key.

_DIRTY_MEDIA_SQL = """
  SELECT 'p' || CAST(c_custkey % 3 AS VARCHAR) AS provider,
         'f' || CAST(c_custkey % 120 AS VARCHAR) AS foreign_identifier,
         CASE WHEN c_custkey % 17 = 0 THEN NULL
              ELSE 'http://m/' || CAST(c_custkey % 90 AS VARCHAR) END AS url,
         'T' || CAST(c_custkey AS VARCHAR) AS title
  FROM customer
"""


def _dirty_media_df(c):
    k = F.col("c_custkey")
    return c.select(
        F.concat(F.lit("p"), (k % 3).cast("string")).alias("provider"),
        F.concat(F.lit("f"), (k % 120).cast("string")).alias("foreign_identifier"),
        F.when(k % 17 != 0, F.concat(F.lit("http://m/"), (k % 90).cast("string")))
        .alias("url"),
        F.concat(F.lit("T"), k.cast("string")).alias("title"),
    )


_UNIQUE_COLS = [
    ColumnSpec("provider", Datatype.char, required=True,
               upsert_strategy=UpsertStrategy.no_change),
    ColumnSpec("foreign_identifier", Datatype.char, required=True,
               upsert_strategy=UpsertStrategy.no_change),
    ColumnSpec("url", Datatype.char),
    ColumnSpec("title", Datatype.char),
]


@register(
    "merge_unique_guard",
    f"""
    WITH dirty AS ({_DIRTY_MEDIA_SQL}),
    batch AS (
      SELECT 'pnew' AS provider, 'n' || CAST(c_custkey AS VARCHAR) AS foreign_identifier,
             'http://new/' || CAST(c_custkey AS VARCHAR) AS url,
             'NT' || CAST(c_custkey AS VARCHAR) AS title
      FROM customer WHERE c_custkey % 50 = 0),
    merged AS (SELECT * FROM dirty UNION ALL SELECT * FROM batch),
    p1 AS (SELECT *, row_number() OVER (
             PARTITION BY provider, foreign_identifier
             ORDER BY url NULLS LAST, title) AS rn
           FROM merged),
    k1 AS (SELECT provider, foreign_identifier, url, title FROM p1 WHERE rn = 1),
    p2 AS (SELECT *, row_number() OVER (
             PARTITION BY url ORDER BY provider, foreign_identifier, title) AS rn
           FROM k1 WHERE url IS NOT NULL)
    SELECT provider, foreign_identifier, url, title FROM p2 WHERE rn = 1
    UNION ALL
    SELECT provider, foreign_identifier, url, title FROM k1 WHERE url IS NULL
    """,
)
def merge_unique_guard(spark, sf_dir):
    """Upsert into a DIRTY canonical table (seeded cross-provider url
    dups and (provider, fid) dups) with validate_unique=True: the merge
    inserts a clean batch, then `enforce_unique` repairs both unique-
    index invariants with deterministic keepers (first-by-url per key,
    first-by-key per url; NULL urls exempt). The oracle replays the
    keeper windows in SQL, proving the enforced state — not just the
    report — is reproducible."""
    from openverse_catalog_spark.operators.merge import merge_upsert

    c = _t(spark, sf_dir, "customer")["customer"]
    dirty = _dirty_media_df(c)
    ck = F.col("c_custkey")
    batch = c.filter(ck % 50 == 0).select(
        F.lit("pnew").alias("provider"),
        F.concat(F.lit("n"), ck.cast("string")).alias("foreign_identifier"),
        F.concat(F.lit("http://new/"), ck.cast("string")).alias("url"),
        F.concat(F.lit("NT"), ck.cast("string")).alias("title"),
    )
    return merge_upsert(
        dirty, batch, _UNIQUE_COLS, deterministic=True, validate_unique=True
    )


@register(
    "agg_unique_violations",
    f"""
    WITH dirty AS ({_DIRTY_MEDIA_SQL}),
    by_key AS (
      SELECT 'provider_md5_fid' AS "constraint",
             provider || '|' || md5(foreign_identifier) AS key,
             CAST(count(*) AS BIGINT) AS n
      FROM dirty GROUP BY 2 HAVING count(*) > 1),
    by_url AS (
      SELECT 'url' AS "constraint", url AS key, CAST(count(*) AS BIGINT) AS n
      FROM dirty WHERE url IS NOT NULL GROUP BY 2 HAVING count(*) > 1)
    SELECT * FROM by_key UNION ALL SELECT * FROM by_url
    """,
)
def agg_unique_violations(spark, sf_dir):
    """Uniqueness-violation report over a dirty canonical state: one row
    per (constraint, key) with its duplicate count — the observability
    half of the unique-index analog (quality-rule style). Two narrow
    map-side-combined groupBys, no join."""
    from openverse_catalog_spark.operators.merge import uniqueness_report

    c = _t(spark, sf_dir, "customer")["customer"]
    return uniqueness_report(_dirty_media_df(c))


# --- copy-on-write lake-table merge ----------------------------------------
# At 100 TB the reference's Postgres canonical table is a lake-format
# table; operators/cowtable.py provides the minimal ACID-shaped version
# (manifest snapshots, range-clustered files, file-skipping MERGE, time
# travel, vacuum). This query drives the whole lifecycle — create v1,
# merge a batch that updates/inserts/url-conflicts — and returns the v2
# snapshot, which the oracle reproduces as plain SQL merge semantics.

_COW_TARGET_SQL = """
  SELECT 'p' || CAST(c_custkey % 3 AS VARCHAR) AS provider,
         'f' || CAST(c_custkey AS VARCHAR) AS foreign_identifier,
         'http://m/' || CAST(c_custkey AS VARCHAR) AS url,
         'T' || CAST(c_custkey AS VARCHAR) AS title
  FROM customer
"""

_COW_BATCH_SQL = """
  SELECT 'p' || CAST(c_custkey % 3 AS VARCHAR) AS provider,
         'f' || CAST(c_custkey AS VARCHAR) AS foreign_identifier,
         'http://m/' || CAST(c_custkey AS VARCHAR) AS url,
         'NEW' || CAST(c_custkey AS VARCHAR) AS title
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT 'p9', 'n' || CAST(c_custkey AS VARCHAR),
         'http://new/' || CAST(c_custkey AS VARCHAR),
         'INS' || CAST(c_custkey AS VARCHAR)
  FROM customer WHERE c_custkey % 10 = 5
  UNION ALL
  -- url thief: url exists under a different natural key -> guard drops it
  SELECT 'p9', 'x' || CAST(c_custkey AS VARCHAR),
         'http://m/' || CAST(c_custkey + 1 AS VARCHAR),
         'THIEF' || CAST(c_custkey AS VARCHAR)
  FROM customer WHERE c_custkey % 10 = 7
"""



def _cow_fixture(c):
    """Shared target/batch/columns for the CoW-table queries (kept in one
    place so the two oracles' SQL CTEs stay in sync with ONE Spark-side
    derivation)."""
    k = F.col("c_custkey")
    target = c.select(
        F.concat(F.lit("p"), (k % 3).cast("string")).alias("provider"),
        F.concat(F.lit("f"), k.cast("string")).alias("foreign_identifier"),
        F.concat(F.lit("http://m/"), k.cast("string")).alias("url"),
        F.concat(F.lit("T"), k.cast("string")).alias("title"),
    )
    updates = c.filter(k % 10 == 0).select(
        F.concat(F.lit("p"), (k % 3).cast("string")).alias("provider"),
        F.concat(F.lit("f"), k.cast("string")).alias("foreign_identifier"),
        F.concat(F.lit("http://m/"), k.cast("string")).alias("url"),
        F.concat(F.lit("NEW"), k.cast("string")).alias("title"),
    )
    inserts = c.filter(k % 10 == 5).select(
        F.lit("p9").alias("provider"),
        F.concat(F.lit("n"), k.cast("string")).alias("foreign_identifier"),
        F.concat(F.lit("http://new/"), k.cast("string")).alias("url"),
        F.concat(F.lit("INS"), k.cast("string")).alias("title"),
    )
    thieves = c.filter(k % 10 == 7).select(
        F.lit("p9").alias("provider"),
        F.concat(F.lit("x"), k.cast("string")).alias("foreign_identifier"),
        F.concat(F.lit("http://m/"), (k + 1).cast("string")).alias("url"),
        F.concat(F.lit("THIEF"), k.cast("string")).alias("title"),
    )
    batch = updates.unionByName(inserts).unionByName(thieves)
    cols = [
        ColumnSpec("provider", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("foreign_identifier", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("url", Datatype.char),
        ColumnSpec("title", Datatype.char),
    ]
    return target, batch, cols


def _cow_build(spark, sf_dir, name, _t_fn):
    """Create v1 + merge the batch at a FIXED per-query root (wiped
    first), so repeated invocations replace rather than accumulate."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable

    c = _t_fn(spark, sf_dir, "customer")["customer"]
    target, batch, cols = _cow_fixture(c)
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_{name}")
    shutil.rmtree(root, ignore_errors=True)
    t = CowTable.create(spark, root, target, target_files=6)
    t.merge(batch, cols, deterministic=True)
    return t


@register(
    "merge_cow_table",
    f"""
    WITH target AS ({_COW_TARGET_SQL}),
    batch AS ({_COW_BATCH_SQL}),
    guarded AS (
      SELECT b.* FROM batch b
      WHERE NOT EXISTS (
        SELECT 1 FROM target t
        WHERE t.url = b.url
          AND (t.provider <> b.provider
               OR t.foreign_identifier <> b.foreign_identifier))
    )
    SELECT COALESCE(b.provider, t.provider) AS provider,
           COALESCE(b.foreign_identifier, t.foreign_identifier)
             AS foreign_identifier,
           COALESCE(b.url, t.url) AS url,
           COALESCE(b.title, t.title) AS title
    FROM target t
    FULL OUTER JOIN guarded b
      ON t.provider = b.provider
     AND t.foreign_identifier = b.foreign_identifier
    """,
)
def merge_cow_table(spark, sf_dir):
    """Lake-table MERGE through the copy-on-write manifest path: create
    v1 from the clean target (files range-clustered on the merge key),
    merge a batch of updates + inserts + one cross-partition url thief,
    return the v2 snapshot. Semantically identical to merge_upsert (the
    oracle replays it as SQL); physically the commit rewrites only files
    whose key range the batch intersects — the tests pin skipped file
    counts, snapshot isolation (old version stays readable) and vacuum.
    """
    t = _cow_build(spark, sf_dir, "cow_tbl", _t)
    return t.read().select("provider", "foreign_identifier", "url", "title")


@register(
    "merge_cow_read_pruned",
    f"""
    WITH target AS ({_COW_TARGET_SQL}),
    batch AS ({_COW_BATCH_SQL}),
    guarded AS (
      SELECT b.* FROM batch b
      WHERE NOT EXISTS (
        SELECT 1 FROM target t
        WHERE t.url = b.url
          AND (t.provider <> b.provider
               OR t.foreign_identifier <> b.foreign_identifier))
    )
    SELECT COALESCE(b.provider, t.provider) AS provider,
           COALESCE(b.foreign_identifier, t.foreign_identifier)
             AS foreign_identifier,
           COALESCE(b.url, t.url) AS url,
           COALESCE(b.title, t.title) AS title
    FROM target t
    FULL OUTER JOIN guarded b
      ON t.provider = b.provider
     AND t.foreign_identifier = b.foreign_identifier
    WHERE COALESCE(b.provider, t.provider) IN ('p1', 'p9')
    """,
)
def merge_cow_read_pruned(spark, sf_dir):
    """Reader-side file skipping on the CoW table: a per-provider read
    (the reference's dominant access pattern — every DAG operates on
    its own provider's rows) consults the manifest's per-file key
    ranges and scans ONLY the files that can contain the asked-for
    providers; the rest never enter the file index.
    tests/test_cowtable.py pins inputFiles to a strict subset. Result
    is exact (residual isin filter) — the oracle is the plain filtered
    merge result."""
    t = _cow_build(spark, sf_dir, "cow_readp", _t)
    return t.read_pruned(["p1", "p9"]).select(
        "provider", "foreign_identifier", "url", "title"
    )


@register(
    "merge_cow_snapshot_diff",
    f"""
    WITH target AS ({_COW_TARGET_SQL}),
    batch AS ({_COW_BATCH_SQL}),
    guarded AS (
      SELECT b.* FROM batch b
      WHERE NOT EXISTS (
        SELECT 1 FROM target t
        WHERE t.url = b.url
          AND (t.provider <> b.provider
               OR t.foreign_identifier <> b.foreign_identifier))
    ),
    v2 AS (
      SELECT COALESCE(b.provider, t.provider) AS provider,
             COALESCE(b.foreign_identifier, t.foreign_identifier)
               AS foreign_identifier,
             COALESCE(b.url, t.url) AS url,
             COALESCE(b.title, t.title) AS title
      FROM target t
      FULL OUTER JOIN guarded b
        ON t.provider = b.provider
       AND t.foreign_identifier = b.foreign_identifier
    )
    SELECT CASE WHEN t.provider IS NULL THEN 'added'
                WHEN v2.title <> t.title OR v2.url <> t.url THEN 'changed'
           END AS change_type,
           count(*) AS n
    FROM v2
    LEFT JOIN target t
      ON v2.provider = t.provider
     AND v2.foreign_identifier = t.foreign_identifier
    WHERE t.provider IS NULL OR v2.title <> t.title OR v2.url <> t.url
    GROUP BY 1
    """,
)
def merge_cow_snapshot_diff(spark, sf_dir):
    """Change-data capture BETWEEN lake-table versions: time-travel reads
    of v1 and v2 feed snapshot_diff (keys + row-hash full-outer join —
    diffing two 100 TB snapshots shuffles keys and one md5 each, never
    the payload), aggregated per change type. This is the incremental-
    downstream story for the CoW table: consumers read version deltas
    instead of rescanning the snapshot."""
    from openverse_catalog_spark.operators.merge import snapshot_diff

    t = _cow_build(spark, sf_dir, "cow_diff", _t)
    diff = snapshot_diff(
        t.read(version=1), t.read(version=2),
        keys=("provider", "foreign_identifier"),
        compare_cols=("url", "title"),
    )
    return diff.groupBy("change_type").agg(F.count(F.lit(1)).alias("n"))


@register(
    "merge_cow_compact",
    f"""
    WITH target AS ({_COW_TARGET_SQL}),
    batch AS ({_COW_BATCH_SQL}),
    guarded AS (
      SELECT b.* FROM batch b
      WHERE NOT EXISTS (
        SELECT 1 FROM target t
        WHERE t.url = b.url
          AND (t.provider <> b.provider
               OR t.foreign_identifier <> b.foreign_identifier))
    )
    SELECT COALESCE(b.provider, t.provider) AS provider,
           COALESCE(b.foreign_identifier, t.foreign_identifier)
             AS foreign_identifier,
           COALESCE(b.url, t.url) AS url,
           COALESCE(b.title, t.title) AS title
    FROM target t
    FULL OUTER JOIN guarded b
      ON t.provider = b.provider
     AND t.foreign_identifier = b.foreign_identifier
    """,
)
def merge_cow_compact(spark, sf_dir):
    """OPTIMIZE on the lake table: the MERGE leaves a mix of carried-over
    and small rewritten files; ``compact`` bin-packs the small ones into
    range-clustered files near target size and commits a new snapshot.
    Data is bit-identical across the commit — the oracle is exactly the
    post-merge state — while the file count collapses and old versions
    stay readable. The maintenance half of the streaming-ingest story:
    micro-batch MERGEs accumulate small files, and scan cost follows
    file count, not bytes, until compaction folds them."""
    t = _cow_build(spark, sf_dir, "cow_compact", _t)
    before = t._manifest()["files"]
    summary = t.compact(target_rows=1_000_000)
    assert summary["files_compacted"] == len(before) >= 2
    assert summary["files_written"] < summary["files_compacted"]
    return t.read().select("provider", "foreign_identifier", "url", "title")


@register(
    "merge_cow_restore",
    f"""
    {_COW_TARGET_SQL}
    """,
)
def merge_cow_restore(spark, sf_dir):
    """ROLLBACK on the lake table: after the MERGE commits v2, restore
    to v1 — a metadata-only commit (one manifest JSON re-pointing at
    v1's untouched files; zero data I/O, instant at 100 TB), with the
    bad version still inspectable via time travel until vacuum. The
    returned snapshot is exactly the pre-merge target, which is the
    oracle."""
    t = _cow_build(spark, sf_dir, "cow_restore", _t)
    assert t.version == 2
    summary = t.restore(1)
    assert summary["version"] == 3 and summary["restored_from"] == 1
    return t.read().select("provider", "foreign_identifier", "url", "title")


_COW_V2_CTES = f"""
    target AS ({_COW_TARGET_SQL}),
    batch AS ({_COW_BATCH_SQL}),
    guarded AS (
      SELECT b.* FROM batch b
      WHERE NOT EXISTS (
        SELECT 1 FROM target t
        WHERE t.url = b.url
          AND (t.provider <> b.provider
               OR t.foreign_identifier <> b.foreign_identifier))
    ),
    v2 AS (
      SELECT COALESCE(b.provider, t.provider) AS provider,
             COALESCE(b.foreign_identifier, t.foreign_identifier)
               AS foreign_identifier,
             COALESCE(b.url, t.url) AS url,
             COALESCE(b.title, t.title) AS title
      FROM target t
      FULL OUTER JOIN guarded b
        ON t.provider = b.provider
       AND t.foreign_identifier = b.foreign_identifier
    )
"""


@register(
    "merge_cow_update",
    f"""
    WITH {_COW_V2_CTES}
    SELECT provider, foreign_identifier, url,
           CASE WHEN provider = 'p1'
                THEN 'U-' || foreign_identifier ELSE title END AS title
    FROM v2
    """,
)
def merge_cow_update(spark, sf_dir):
    """Predicated UPDATE on the lake table — the reference's
    batched_update DAG (catalog/dags/database/batched_update: arbitrary
    UPDATE run in row batches to bound lock time) re-expressed as ONE
    copy-on-write commit: a find-scan tags which files contain matches,
    only those are rewritten (matching rows get the new expression,
    their file-mates carry in value), every other file carries by
    reference, and the pre-update snapshot stays readable (the
    batch-locking problem disappears — readers never block)."""
    t = _cow_build(spark, sf_dir, "cow_upd", _t)
    t.update(
        F.col("provider") == "p1",
        {"title": F.concat(F.lit("U-"), F.col("foreign_identifier"))},
    )
    return t.read().select("provider", "foreign_identifier", "url", "title")


@register(
    "merge_cow_delete",
    f"""
    WITH {_COW_V2_CTES}
    SELECT provider, foreign_identifier, url, title
    FROM v2 WHERE provider <> 'p0'
    """,
)
def merge_cow_delete(spark, sf_dir):
    """Predicated DELETE on the lake table (the reference's record-
    deletion maintenance path): rows matching the predicate vanish from
    the new snapshot — files fully emptied are simply dropped from the
    manifest, partially-matched files are rewritten without the victims,
    untouched files carry by reference, and the deleted rows remain in
    older snapshots until vacuum (auditable deletion)."""
    t = _cow_build(spark, sf_dir, "cow_del", _t)
    t.delete(F.col("provider") == "p0")
    return t.read().select("provider", "foreign_identifier", "url", "title")


@register(
    "merge_cow_delete_dv",
    f"""
    WITH {_COW_V2_CTES}
    SELECT provider, foreign_identifier, url, title
    FROM v2 WHERE provider <> 'p0'
    """,
)
def merge_cow_delete_dv(spark, sf_dir):
    """DELETE via DELETION VECTORS (merge-on-read, Delta's DV
    contract): instead of rewriting every touched file to drop the
    victims — write amplification the reference never had, Postgres
    deletes in place (``catalog/dags/common/loader/sql.py``) — the
    victims' (file, position) identities land in a tiny sidecar, the
    touched data files carry byte-identical, and readers anti-apply
    the vector. Result set is IDENTICAL to the copy-mode delete (same
    oracle); the physical difference is pinned here: zero files
    rewritten, and the pre-delete snapshot still reads in full."""
    t = _cow_build(spark, sf_dir, "cow_del_dv", _t)
    n_before = t.read().count()
    res = t.delete(F.col("provider") == "p0", mode="dv")
    assert res["files_rewritten"] == 0 and res["files_dv"] >= 1
    assert t.read(version=2).count() == n_before  # time travel intact
    return t.read().select("provider", "foreign_identifier", "url", "title")


@register(
    "merge_cow_changes",
    f"""
    WITH {_COW_V2_CTES},
    upd AS (
      SELECT t.provider AS provider,
             t.foreign_identifier AS foreign_identifier,
             t.url AS pre_url, t.title AS pre_title,
             v2.url AS post_url, v2.title AS post_title
      FROM v2
      JOIN target t
        ON v2.provider = t.provider
       AND v2.foreign_identifier = t.foreign_identifier
      WHERE v2.title <> t.title OR v2.url <> t.url
    )
    SELECT v2.provider AS provider,
           v2.foreign_identifier AS foreign_identifier,
           v2.url AS url, v2.title AS title,
           'insert' AS _change_type,
           CAST(2 AS BIGINT) AS _commit_version
    FROM v2
    LEFT JOIN target t
      ON v2.provider = t.provider
     AND v2.foreign_identifier = t.foreign_identifier
    WHERE t.provider IS NULL
    UNION ALL
    SELECT provider, foreign_identifier, pre_url, pre_title,
           'update_preimage', CAST(2 AS BIGINT)
    FROM upd
    UNION ALL
    SELECT provider, foreign_identifier, post_url, post_title,
           'update_postimage', CAST(2 AS BIGINT)
    FROM upd
    UNION ALL
    SELECT provider, foreign_identifier, url, title,
           'delete', CAST(3 AS BIGINT)
    FROM v2 WHERE provider = 'p0'
    """,
)
def merge_cow_changes(spark, sf_dir):
    """CHANGE DATA FEED on the lake table (Delta CDF contract): after a
    MERGE commit (v2) and a predicated DELETE commit (v3),
    ``read_changes(1, 3)`` returns the exact row-level deltas — inserts
    and update pre/post images tagged _commit_version 2, deletes tagged
    3 — reading ONLY the files those commits added or dropped, with
    carried-identical rows diffed out. The oracle replays both commits
    in SQL and derives the same change set from the three snapshots.
    This is what turns downstream refreshes (popularity, search-index
    handoff) from O(table) rescans into O(delta) consumers — the
    incremental posture the reference's data refresh lacks
    (``data_refresh_task_factory.py:183-240`` re-ships the whole
    table)."""
    t = _cow_build(spark, sf_dir, "cow_cdf", _t)
    t.delete(F.col("provider") == "p0")
    assert t.version == 3
    return t.read_changes(1, 3).select(
        "provider", "foreign_identifier", "url", "title",
        "_change_type", "_commit_version",
    )


@register(
    "merge_cow_publish_incremental",
    f"""
    WITH {_COW_V2_CTES}
    SELECT provider, foreign_identifier, url, title
    FROM v2 WHERE provider <> 'p0'
    """,
)
def merge_cow_publish_incremental(spark, sf_dir):
    """Incremental index publish: the previously published snapshot is
    brought current by APPLYING the change feed (anti-join touched
    keys, union last post-images) instead of re-exporting the table —
    the search-index handoff kept O(delta). Publishes v1 in full, then
    commits a MERGE (v2) and a DELETE (v3) and republishes
    incrementally from the feed; the result must equal a fresh read of
    v3 (the oracle: merge result minus the deleted provider)."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.streaming.incremental import (
        publish_swap,
        publish_swap_incremental,
    )

    t = _cow_build(spark, sf_dir, "cow_pubinc", _t)
    base = os.path.join(tempfile.gettempdir(), "spark_graft_cow_pubinc_idx")
    shutil.rmtree(base, ignore_errors=True)
    publish_swap(t.read(version=1), base, "cow_pubinc_idx", spark)
    t.delete(F.col("provider") == "p0")
    rep = publish_swap_incremental(
        t, from_version=1, base_dir=base, name="cow_pubinc_idx"
    )
    assert rep["mode"] == "incremental" and rep["deletes"] > 0
    return spark.table("cow_pubinc_idx").select(
        "provider", "foreign_identifier", "url", "title"
    )


@register(
    "merge_cow_read_skipped",
    """
    WITH target AS (
      SELECT 'p' AS provider,
             'f' || lpad(CAST(c_custkey AS VARCHAR), 7, '0')
               AS foreign_identifier,
             'http://m/' || CAST(c_custkey AS VARCHAR) AS url,
             CAST(c_custkey AS DOUBLE) AS metric
      FROM customer
    ),
    batch AS (
      SELECT provider, foreign_identifier, url, metric + 0.5 AS metric
      FROM target WHERE CAST(metric AS BIGINT) % 10 = 0
    ),
    v2 AS (
      SELECT COALESCE(b.provider, t.provider) AS provider,
             COALESCE(b.foreign_identifier, t.foreign_identifier)
               AS foreign_identifier,
             COALESCE(b.metric, t.metric) AS metric
      FROM target t
      FULL OUTER JOIN batch b
        ON t.provider = b.provider
       AND t.foreign_identifier = b.foreign_identifier
    )
    SELECT provider, foreign_identifier, metric
    FROM v2 WHERE metric >= 100 AND metric <= 600
    """,
)
def merge_cow_read_skipped(spark, sf_dir):
    """DATA SKIPPING beyond the merge key: the table records per-file
    min/max stats for ``metric`` (stats_cols — a table property every
    commit re-collects, Delta's column stats), and ``read_where``
    prunes files whose recorded range cannot intersect the predicate
    before the scan's file index is even built. Because the key order
    correlates with the metric here (zero-padded ids), range clustering
    gives tight per-file metric ranges and the skip actually bites —
    the general recipe is stats_cols + a layout that clusters them
    (z-order for multi-column). Result stays exact via the residual
    filter; stats survive a MERGE commit (the update lands, then the
    range read reflects it)."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec, Datatype, UpsertStrategy,
    )

    c = _t(spark, sf_dir, "customer")["customer"]
    k = F.col("c_custkey")
    target = c.select(
        F.lit("p").alias("provider"),
        F.concat(
            F.lit("f"), F.lpad(k.cast("string"), 7, "0")
        ).alias("foreign_identifier"),
        F.concat(F.lit("http://m/"), k.cast("string")).alias("url"),
        k.cast("double").alias("metric"),
    )
    batch = target.filter(F.col("metric").cast("long") % 10 == 0).withColumn(
        "metric", F.col("metric") + 0.5
    )
    cols = [
        ColumnSpec("provider", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("foreign_identifier", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("url", Datatype.char),
        ColumnSpec("metric", Datatype.double),
    ]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_cow_skip")
    shutil.rmtree(root, ignore_errors=True)
    t = CowTable.create(
        spark, root, target, target_files=8, stats_cols=("metric",)
    )
    t.merge(batch, cols, deterministic=True)
    out = t.read_where({"metric": (100.0, 600.0)})
    n_all = len(t._manifest()["files"])
    n_read = len({f for f in out.inputFiles()})
    assert n_read < n_all, "data skipping must prune files"
    return out.select("provider", "foreign_identifier", "metric")


@register(
    "stream_cow_changes",
    f"""
    WITH {_COW_V2_CTES},
    upd AS (
      SELECT t.provider
      FROM v2
      JOIN target t
        ON v2.provider = t.provider
       AND v2.foreign_identifier = t.foreign_identifier
      WHERE v2.title <> t.title OR v2.url <> t.url
    )
    SELECT CAST(2 AS BIGINT) AS _commit_version,
           'insert' AS _change_type, count(*) AS n
    FROM v2
    LEFT JOIN target t
      ON v2.provider = t.provider
     AND v2.foreign_identifier = t.foreign_identifier
    WHERE t.provider IS NULL
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'update_preimage', count(*) FROM upd
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'update_postimage', count(*) FROM upd
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'delete', count(*)
    FROM v2 WHERE provider = 'p0'
    """,
)
def stream_cow_changes(spark, sf_dir):
    """The CHANGE FEED AS A STREAM: the CowTable's manifests directory
    is an append-only commit log, so a file stream over it +
    Trigger.AvailableNow turns each new commit into a micro-batch whose
    row-level deltas (read_changes over the newly-seen span) feed the
    consumer — run here as three ticks: tick 1 drains the MERGE commit
    (v1->v2 deltas), a DELETE lands, tick 2 drains exactly the v2->v3
    deltas, tick 3 finds nothing and applies zero batches (the
    exactly-once claim, enforced by the file-source checkpoint + the
    atomically-advanced high-water mark). The sink accumulates every
    delta once; the oracle recomputes the per-commit change counts from
    the replayed SQL."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.streaming.incremental import (
        stream_cow_changes as follow,
    )

    t = _cow_build(spark, sf_dir, "cow_stream_cdf", _t)
    base = os.path.join(tempfile.gettempdir(), "spark_graft_cow_stream_cdf_io")
    shutil.rmtree(base, ignore_errors=True)
    sink = os.path.join(base, "sink")
    ckpt = os.path.join(base, "ckpt")

    def apply_fn(ch, lo, hi):
        ch.write.mode("append").parquet(sink)

    r1 = follow(t, ckpt, apply_fn)   # drains the merge commit (v2)
    t.delete(F.col("provider") == "p0")
    r2 = follow(t, ckpt, apply_fn)   # drains exactly v2->v3
    r3 = follow(t, ckpt, apply_fn)   # nothing new
    assert r1["high_water"] == 2 and r2["high_water"] == 3
    assert r3["batches_applied"] == 0 and r3["high_water"] == 3
    return (
        spark.read.parquet(sink)
        .groupBy("_commit_version", "_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "merge_cow_zorder",
    """
    SELECT 'p' AS provider,
           'f' || lpad(CAST(c_custkey AS VARCHAR), 7, '0')
             AS foreign_identifier,
           CAST((c_custkey * 37) % 100 AS DOUBLE) AS x,
           CAST((c_custkey * 61) % 100 AS DOUBLE) AS y
    FROM customer
    WHERE (c_custkey * 37) % 100 <= 20 AND (c_custkey * 61) % 100 <= 20
    """,
)
def merge_cow_zorder(spark, sf_dir):
    """OPTIMIZE ZORDER + multi-column data skipping, end to end: the
    table starts merge-key-clustered (x/y ranges span every file — a
    range read prunes nothing), a z-order compact on (x, y) Morton-
    interleaves the bucketized columns and rewrites the table clustered
    on the z-value, and the same read_where box now skips files on
    BOTH columns (asserted). The oracle is the plain box filter —
    clustering is physical, never semantic."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable

    c = _t(spark, sf_dir, "customer")["customer"]
    k = F.col("c_custkey")
    target = c.select(
        F.lit("p").alias("provider"),
        F.concat(
            F.lit("f"), F.lpad(k.cast("string"), 7, "0")
        ).alias("foreign_identifier"),
        F.concat(F.lit("http://m/"), k.cast("string")).alias("url"),
        ((k * 37) % 100).cast("double").alias("x"),
        ((k * 61) % 100).cast("double").alias("y"),
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_cow_zorder")
    shutil.rmtree(root, ignore_errors=True)
    t = CowTable.create(
        spark, root, target, target_files=8, stats_cols=("x", "y")
    )
    n_all = len(t._manifest()["files"])
    assert len(t.read_where({"x": (0.0, 20.0)}).inputFiles()) == n_all
    t.compact(
        # ~8 z-clustered output files at any SF, so the skip is testable
        target_rows=max(1, t._manifest()["rows"] // 8),
        zorder_by={"x": (0, 100), "y": (0, 100)},
        zorder_bits=6,
    )
    out = t.read_where({"x": (0.0, 20.0), "y": (0.0, 20.0)})
    n_files = len(t._manifest()["files"])
    assert n_files >= 4
    assert len(out.inputFiles()) < n_files, "z-order skip must bite"
    return out.select("provider", "foreign_identifier", "x", "y")


@register(
    "merge_cow_constraints",
    f"""
    WITH {_COW_V2_CTES}
    SELECT provider, foreign_identifier, url, title FROM v2
    """,
)
def merge_cow_constraints(spark, sf_dir):
    """CHECK constraints as a table property (Delta's ALTER TABLE ADD
    CONSTRAINT): adding validates the whole current snapshot; every
    later write commit re-validates its NEW rows in one aggregation
    pass and a violating MERGE is REJECTED before any file lands (no
    version created) — writer-rejecting semantics, unlike
    merge(validate_rules=...) which row-filters. SQL CHECK NULL
    semantics (NULL passes). The reference encodes these invariants as
    Postgres column constraints + MediaStore validation; a lake table
    needs them in the commit protocol itself."""
    from openverse_catalog_spark.operators.cowtable import (
        ConstraintViolation,
        CowTable,
    )

    c = _t(spark, sf_dir, "customer")["customer"]
    target, batch, cols = _cow_fixture(c)
    import os
    import shutil
    import tempfile

    root = os.path.join(tempfile.gettempdir(), "spark_graft_cow_check")
    shutil.rmtree(root, ignore_errors=True)
    t = CowTable.create(spark, root, target, target_files=6)
    t.add_constraint("title_nonempty", "length(title) > 0")
    t.merge(batch, cols, deterministic=True)  # satisfies the CHECK
    v_after = t.version
    bad = batch.limit(1).withColumn("title", F.lit(""))
    try:
        t.merge(bad, cols, deterministic=True)
        raise AssertionError("violating merge must be rejected")
    except ConstraintViolation:
        pass
    assert t.version == v_after  # no version was created
    # a violating UPDATE is rejected too
    try:
        t.update(F.col("provider") == "p1", {"title": F.lit("")})
        raise AssertionError("violating update must be rejected")
    except ConstraintViolation:
        pass
    assert t.version == v_after
    # an unsatisfiable constraint cannot be added over existing rows
    try:
        t.add_constraint("impossible", "length(title) > 1000")
        raise AssertionError("unsatisfiable constraint must be refused")
    except ConstraintViolation:
        pass
    # a fresh handle rediscovers the property from the manifest
    assert "title_nonempty" in CowTable(spark, t.root).constraints
    return t.read().select("provider", "foreign_identifier", "url", "title")


@register(
    "merge_cow_rename_drop",
    f"""
    WITH {_COW_V2_CTES}
    SELECT provider, foreign_identifier, url, title AS headline FROM v2
    """,
)
def merge_cow_rename_drop(spark, sf_dir):
    """COLUMN MAPPING (Delta's rename/drop-without-rewrite): RENAME
    COLUMN and DROP COLUMN are metadata-only commits — zero data files
    touched, pinned here by comparing entry paths across the ALTERs —
    because files keep their STABLE physical column names and the
    manifest schema + mapping translate at the read/write boundary.
    Old snapshots time-travel with their OWN schema (v1 still shows
    title and note); a merge after the rename upserts through the new
    logical name and writes the old physical one, so old and new files
    stay mutually readable. The reference alters its media columns in
    Postgres DDL; a 100 TB lake table cannot afford the rewrite."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
    )

    c = _t(spark, sf_dir, "customer")["customer"]
    target, batch, cols = _cow_fixture(c)
    target = target.withColumn(
        "note", F.concat(F.lit("N"), F.col("foreign_identifier"))
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_cow_rename")
    shutil.rmtree(root, ignore_errors=True)
    t = CowTable.create(spark, root, target, target_files=6)
    paths_v1 = {e["path"] for e in t._manifest()["files"]}
    t.rename_column("title", "headline")
    t.drop_column("note")
    assert {e["path"] for e in t._manifest()["files"]} == paths_v1, (
        "rename/drop must be metadata-only"
    )
    # time travel shows the OLD schema
    old_cols = set(t.read(version=1).columns)
    assert "title" in old_cols and "note" in old_cols
    # merge through the NEW logical name (physical stays 'title')
    cols2 = [
        sc if sc.name != "title" else ColumnSpec("headline", Datatype.char)
        for sc in cols
    ]
    t.merge(
        batch.withColumnRenamed("title", "headline"), cols2,
        deterministic=True,
    )
    out = t.read()
    assert set(out.columns) == {
        "provider", "foreign_identifier", "url", "headline"
    }
    return out.select("provider", "foreign_identifier", "url", "headline")


@register(
    "merge_cow_dim_pruned",
    """
    SELECT 'p' AS provider,
           'f' || lpad(CAST(c_custkey AS VARCHAR), 7, '0')
             AS foreign_identifier,
           'http://m/' || CAST(c_custkey AS VARCHAR) AS url
    FROM customer WHERE c_custkey % 499 = 7 AND c_custkey <= 600
    """,
)
def merge_cow_dim_pruned(spark, sf_dir):
    """DYNAMIC FILE PRUNING from a join (Spark's runtime DPP extended
    to arbitrary stats columns through the manifest): a selective
    dimension's bounded key set prunes fact FILES before the scan
    plans, not just rows after. Here the dim carries a handful of urls
    scattered across the key order — min/max ranges can't prune an
    uncorrelated column, so the per-file BLOOM bitmaps do: every fact
    file whose bloom rejects all dim urls never enters the scan's file
    index (pinned: a strict subset of files is read). The reference
    rescans the whole table for any per-provider recompute
    (``popularity/sql.py:301-326``); at 100 TB the file-level skip is
    the difference between touching one provider's files and all of
    them."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable

    c = _t(spark, sf_dir, "customer")["customer"]
    k = F.col("c_custkey")
    fact = c.select(
        F.lit("p").alias("provider"),
        F.concat(
            F.lit("f"), F.lpad(k.cast("string"), 7, "0")
        ).alias("foreign_identifier"),
        F.concat(F.lit("http://m/"), k.cast("string")).alias("url"),
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_cow_dimprune")
    shutil.rmtree(root, ignore_errors=True)
    t = CowTable.create(
        spark, root, fact, target_files=8, bloom_cols=("url",)
    )
    # a bounded key set that stays SELECTIVE at every SF (a modulus
    # alone spreads keys across all files as the table grows, leaving
    # nothing skippable)
    dim = c.filter((k % 499 == 7) & (k <= 600)).select(
        F.concat(F.lit("http://m/"), k.cast("string")).alias("url")
    )
    out = t.read_join_pruned(dim, "url")
    n_all = len(t._manifest()["files"])
    assert len(out.inputFiles()) < n_all, "dim-driven file skip must bite"
    return out.select("provider", "foreign_identifier", "url")


@register(
    "merge_cow_point_lookup",
    """
    SELECT 'p' AS provider,
           'f' || lpad(CAST(c_custkey AS VARCHAR), 7, '0')
             AS foreign_identifier,
           'http://m/' || CAST(c_custkey AS VARCHAR) AS url
    FROM customer WHERE c_custkey = 42
    """,
)
def merge_cow_point_lookup(spark, sf_dir):
    """POINT-LOOKUP data skipping via per-file BLOOM bitmaps
    (bloom_cols — the manifest-level analog of parquet bloom filters):
    equality on a high-cardinality column min/max cannot prune (urls
    are uncorrelated with the key clustering) consults each file's
    bloom; the present url reads a strict subset of files, an absent
    url skips every file whose bloom rules it out (no false negatives
    by construction; bitmaps are sized ~10 bits/row so the per-file
    false-positive rate is ~1% — a miss typically reads zero files,
    but the assert pins only a strict subset since fp hits are legal).
    The oracle is the plain equality select — skipping is physical."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable

    c = _t(spark, sf_dir, "customer")["customer"]
    k = F.col("c_custkey")
    target = c.select(
        F.lit("p").alias("provider"),
        F.concat(
            F.lit("f"), F.lpad(k.cast("string"), 7, "0")
        ).alias("foreign_identifier"),
        F.concat(F.lit("http://m/"), k.cast("string")).alias("url"),
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_cow_point")
    shutil.rmtree(root, ignore_errors=True)
    t = CowTable.create(
        spark, root, target, target_files=8, bloom_cols=("url",)
    )
    n_all = len(t._manifest()["files"])
    hit = t.read_where({"url": "http://m/42"})
    assert len(hit.inputFiles()) < n_all, "bloom skip must bite"
    miss = t.read_where({"url": "http://nowhere.example/x"})
    assert len(miss.inputFiles()) < n_all and miss.count() == 0
    return hit.select("provider", "foreign_identifier", "url")


@register(
    "merge_cow_catalog_txn",
    """
    SELECT 'img' AS tbl, c_custkey AS id,
           CASE WHEN c_custkey % 6 = 0 THEN c_nationkey + 100
                ELSE c_nationkey END AS val
    FROM customer WHERE c_custkey % 3 = 0
    UNION ALL
    SELECT 'aud' AS tbl, o_orderkey AS id, o_custkey AS val
    FROM orders WHERE o_orderkey % 50 IN (0, 25)
    """,
)
def merge_cow_catalog_txn(spark, sf_dir):
    """MULTI-TABLE ATOMIC TRANSACTIONS (operators/catalog.py): the
    cross-table guarantee the reference gets from Postgres — one DAG
    run upserting media + popularity + report tables transactionally
    (``common/loader/sql.py``) — rebuilt lakehouse-style: readers
    resolve tables through catalog snapshots and a txn publishes every
    touched table's new version in ONE exclusive-create catalog
    commit. The fixture runs a committed two-table txn, then an
    ABORTED two-table txn (merge + delete, then an injected failure)
    followed by recover(): the oracle is the replay WITHOUT the
    aborted work, so a pass proves the abort left no trace in either
    table through catalog OR direct reads. SCALE: a catalog commit is
    one name->version JSON regardless of table size; isolation and
    time travel cost one metadata lookup per read."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.catalog import LakeCatalog
    from openverse_catalog_spark.operators.cowtable import CowTable

    root = os.path.join(tempfile.gettempdir(), "spark_graft_cattxn")
    shutil.rmtree(root, ignore_errors=True)
    tabs = _t(spark, sf_dir, "customer", "orders")
    img0 = tabs["customer"].filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").cast("long").alias("val"),
    )
    aud0 = tabs["orders"].filter(F.col("o_orderkey") % 50 == 0).select(
        F.col("o_orderkey").alias("id"),
        F.col("o_custkey").cast("long").alias("val"),
    )
    cols = [
        ColumnSpec("id", Datatype.int, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("val", Datatype.int),
    ]
    cat = LakeCatalog.create(spark, root)
    cat.register("img", CowTable.create(
        spark, f"{root}/img", img0, keys=("id",), target_files=4))
    cat.register("aud", CowTable.create(
        spark, f"{root}/aud", aud0, keys=("id",), target_files=4))

    # txn 1 (commits): bump img vals for id%6==0, land a new aud batch
    with cat.transaction() as txn:
        txn.table("img").merge(
            img0.filter(F.col("id") % 6 == 0).withColumn(
                "val", F.col("val") + 100),
            cols, deterministic=True,
        )
        txn.table("aud").merge(
            tabs["orders"].filter(F.col("o_orderkey") % 50 == 25).select(
                F.col("o_orderkey").alias("id"),
                F.col("o_custkey").cast("long").alias("val"),
            ),
            cols, deterministic=True,
        )
    v_good = cat.version

    # txn 2 (ABORTS): would poison img and delete half of aud
    try:
        with cat.transaction() as txn:
            txn.table("img").merge(
                img0.withColumn("val", F.lit(-1).cast("long")),
                cols, deterministic=True,
            )
            txn.table("aud").delete(F.col("id") % 100 == 0)
            raise RuntimeError("injected failure before publish")
    except RuntimeError:
        pass
    assert cat.version == v_good
    rep = cat.recover()
    assert set(rep["rolled_back"]) == {"img", "aud"}

    return (
        cat.read("img").select(F.lit("img").alias("tbl"), "id", "val")
        .unionByName(
            cat.read("aud").select(F.lit("aud").alias("tbl"), "id", "val")
        )
    )


@register(
    "sql_catalog_txn",
    """
    SELECT 'img' AS tbl, c_custkey AS id,
           CASE WHEN c_custkey % 6 = 0 THEN c_nationkey + 100
                ELSE c_nationkey END AS val
    FROM customer WHERE c_custkey % 3 = 0
    UNION ALL
    SELECT 'aud' AS tbl, o_orderkey AS id, o_custkey AS val
    FROM orders WHERE o_orderkey % 50 IN (0, 25)
    """,
)
def sql_catalog_txn(spark, sf_dir):
    """The multi-table transaction lifecycle as PURE SQL TEXT: ``BEGIN
    TRANSACTION`` / two-table DML / ``COMMIT``, then a poison
    transaction un-done by ``ROLLBACK`` — the engine speaking the exact
    dialect the reference's Postgres loader scripts assume
    (``common/loader/sql.py`` runs its media+report writes inside BEGIN
    /COMMIT). Facade reads are catalog-pinned, so the SELECTs between
    statements see snapshot-isolated state; the oracle replays only
    the committed statements."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.catalog import LakeCatalog
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.sql_facade import SqlFacade

    root = os.path.join(tempfile.gettempdir(), "spark_graft_sqlcattxn")
    shutil.rmtree(root, ignore_errors=True)
    tabs = _t(spark, sf_dir, "customer", "orders")
    img0 = tabs["customer"].filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").cast("long").alias("val"),
    )
    aud0 = tabs["orders"].filter(F.col("o_orderkey") % 50 == 0).select(
        F.col("o_orderkey").alias("id"),
        F.col("o_custkey").cast("long").alias("val"),
    )
    cols = [
        ColumnSpec("id", Datatype.int, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("val", Datatype.int),
    ]
    cat = LakeCatalog.create(spark, root)
    cat.register("img", CowTable.create(
        spark, f"{root}/img", img0, keys=("id",), target_files=4))
    cat.register("aud", CowTable.create(
        spark, f"{root}/aud", aud0, keys=("id",), target_files=4))

    f = SqlFacade(spark)
    f.attach_catalog(cat, columns={"img": cols, "aud": cols})
    f.register_df(
        "aud_batch",
        tabs["orders"].filter(F.col("o_orderkey") % 50 == 25).select(
            F.col("o_orderkey").alias("id"),
            F.col("o_custkey").cast("long").alias("val"),
        ),
    )
    f.sql("BEGIN TRANSACTION")
    f.sql("UPDATE img SET val = val + 100 WHERE id % 6 = 0")
    f.sql("INSERT INTO aud SELECT * FROM aud_batch")
    f.sql("COMMIT")

    f.sql("BEGIN TRANSACTION")
    f.sql("UPDATE img SET val = -1")
    f.sql("DELETE FROM aud WHERE id % 100 = 0")
    f.sql("ROLLBACK")

    return f.sql(
        "SELECT 'img' AS tbl, id, val FROM img "
        "UNION ALL SELECT 'aud' AS tbl, id, val FROM aud"
    )


@register(
    "sql_ctas_restore",
    """
    SELECT c_custkey AS id, c_name AS name,
           CAST(c_acctbal AS DOUBLE) AS bal
    FROM customer WHERE c_custkey % 4 = 1
    UNION ALL
    SELECT c_custkey AS id, c_name AS name,
           CAST(c_acctbal + 10.0 AS DOUBLE) AS bal
    FROM customer WHERE c_custkey % 4 = 2
    """,
)
def sql_ctas_restore(spark, sf_dir):
    """Table LIFECYCLE as pure text: ``CREATE TABLE ... PRIMARY KEY ...
    AS`` materializes a lake table straight from a query (per-column
    upsert specs derived from the schema, so the INSERT right after it
    is the standard ON CONFLICT merge), a poison UPDATE lands, and
    ``RESTORE TABLE ... TO VERSION AS OF`` rolls it back as a
    metadata-only commit — the reference's create-load-fix loop
    (provider_csv_load_script + rollback via snapshot restore) with no
    Python API in sight. Oracle = base + inserted batch, poison
    absent."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.sql_facade import SqlFacade

    root = os.path.join(tempfile.gettempdir(), "spark_graft_ctas")
    shutil.rmtree(root, ignore_errors=True)
    tabs = _t(spark, sf_dir, "customer")
    f = SqlFacade(spark, workdir=root)
    f.register_df("customer_src", tabs["customer"])
    f.sql(
        "CREATE TABLE custbal PRIMARY KEY (id) AS "
        "SELECT c_custkey AS id, c_name AS name, "
        "CAST(c_acctbal AS DOUBLE) AS bal "
        "FROM customer_src WHERE c_custkey % 4 = 1"
    )
    f.sql(
        "INSERT INTO custbal "
        "SELECT c_custkey AS id, c_name AS name, "
        "CAST(c_acctbal + 10.0 AS DOUBLE) AS bal "
        "FROM customer_src WHERE c_custkey % 4 = 2"
    )
    f.sql("UPDATE custbal SET bal = -999.0")  # the bad deploy
    f.sql("RESTORE TABLE custbal TO VERSION AS OF 2")
    return f.sql("SELECT id, name, bal FROM custbal")


@register(
    "sql_analyze_stats",
    """
    WITH src AS (SELECT c_custkey AS id, c_name AS name,
                        c_nationkey AS nat
                 FROM customer WHERE c_custkey % 2 = 0)
    SELECT 'id' AS column, count(DISTINCT id) AS ndv,
           count(*) FILTER (WHERE id IS NULL) AS nulls,
           CAST(min(id) AS VARCHAR) AS min_val,
           CAST(max(id) AS VARCHAR) AS max_val,
           count(*) AS rows FROM src
    UNION ALL
    SELECT 'name', count(DISTINCT name),
           count(*) FILTER (WHERE name IS NULL),
           CAST(min(name) AS VARCHAR), CAST(max(name) AS VARCHAR),
           count(*) FROM src
    UNION ALL
    SELECT 'nat', count(DISTINCT nat),
           count(*) FILTER (WHERE nat IS NULL),
           CAST(min(nat) AS VARCHAR), CAST(max(nat) AS VARCHAR),
           count(*) FROM src
    """,
)
def sql_analyze_stats(spark, sf_dir):
    """``ANALYZE TABLE`` as text: per-column NDV / nulls / min / max +
    row count in ONE aggregation pass, stored version-pinned beside the
    log (cowtable.py:analyze) — the cost-based-optimizer inputs the
    reference gets from Postgres autoanalyze (pg_stats). The default is
    exact count(DISTINCT) so the oracle matches bit-for-bit; the
    approx=True HLL path (same plan shape, bounded state — the 100 TB
    mode) is error-bound-pinned in tests instead. SCALE NOTE: the
    broadcast-vs-shuffle decision read_join_pruned and F.broadcast
    callers make is exactly what these NDVs feed."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.sql_facade import SqlFacade

    root = os.path.join(tempfile.gettempdir(), "spark_graft_analyze")
    shutil.rmtree(root, ignore_errors=True)
    src = _t(spark, sf_dir, "customer")["customer"].filter(
        F.col("c_custkey") % 2 == 0
    ).select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
    )
    t = CowTable.create(spark, root, src, keys=("id",), target_files=4)
    f = SqlFacade(spark)
    f.register_table("custstats", t)
    return f.sql("ANALYZE TABLE custstats COMPUTE STATISTICS")


@register(
    "merge_cow_partitioned",
    """
    WITH base AS (
      SELECT 'p' || CAST(o_orderkey % 5 AS VARCHAR) AS provider,
             'o' || lpad(CAST(o_orderkey AS VARCHAR), 9, '0')
               AS foreign_identifier,
             CASE WHEN o_orderkey % 100 = 0
                  THEN 'NEW' || CAST(o_orderkey AS VARCHAR)
                  ELSE 'T' || CAST(o_orderkey AS VARCHAR) END AS title,
             CAST(o_orderdate AS TIMESTAMP) AS created_on
      FROM orders
      UNION ALL
      SELECT 'p9',
             'n' || lpad(CAST(o_orderkey AS VARCHAR), 9, '0'),
             'INS' || CAST(o_orderkey AS VARCHAR),
             TIMESTAMP '1995-08-15 00:00:00'
      FROM orders WHERE o_orderkey % 100 = 50
    )
    SELECT provider, foreign_identifier, title,
           strftime(created_on, '%Y-%m-%d') AS d
    FROM base
    WHERE created_on >= TIMESTAMP '1995-07-01 00:00:00'
      AND created_on <= TIMESTAMP '1995-09-30 23:59:59'
    """,
)
def merge_cow_partitioned(spark, sf_dir):
    """HIDDEN PARTITIONING end to end (Iceberg partition transforms,
    manifest-level — no Hive directory tree): the table is created with
    ``partition_by=("month(created_on)",)``, so every write clusters
    rows month-first and records each file's partition min/max in its
    manifest entry; a MERGE lands updates + inserts through the same
    clustering; and a ``read_where`` on the RAW timestamp column prunes
    files through the transform (asserted: files skipped > 0) while the
    residual filter keeps the result exact. Users never touch the
    derived field — that is what makes the partitioning hidden. The
    oracle is the plain month-range filter over the same derivation:
    partitioning is physical, never semantic.

    At 100 TB this is the difference between a 3-month scan reading 3
    months and reading 7 years: partition values live in the manifest
    (O(files) driver-side metadata, Iceberg's model), pruning happens
    before the scan's file index is built, and spec EVOLUTION
    (set_partition_spec) is a metadata-only commit — no rewrite when
    the ingest cadence changes. Reference: the canonical image table's
    ingestion timestamps (schemas 0001/0004 updated_on/created_on)
    which Postgres indexes but never partitions."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable

    o = _t(spark, sf_dir, "orders")["orders"]
    k = F.col("o_orderkey")
    target = o.select(
        F.concat(F.lit("p"), (k % 5).cast("string")).alias("provider"),
        F.concat(
            F.lit("o"), F.lpad(k.cast("string"), 9, "0")
        ).alias("foreign_identifier"),
        F.concat(F.lit("http://o/"), k.cast("string")).alias("url"),
        F.concat(F.lit("T"), k.cast("string")).alias("title"),
        F.col("o_orderdate").cast("timestamp").alias("created_on"),
    )
    updates = o.filter(k % 100 == 0).select(
        F.concat(F.lit("p"), (k % 5).cast("string")).alias("provider"),
        F.concat(
            F.lit("o"), F.lpad(k.cast("string"), 9, "0")
        ).alias("foreign_identifier"),
        F.concat(F.lit("http://o/"), k.cast("string")).alias("url"),
        F.concat(F.lit("NEW"), k.cast("string")).alias("title"),
        F.col("o_orderdate").cast("timestamp").alias("created_on"),
    )
    inserts = o.filter(k % 100 == 50).select(
        F.lit("p9").alias("provider"),
        F.concat(
            F.lit("n"), F.lpad(k.cast("string"), 9, "0")
        ).alias("foreign_identifier"),
        F.concat(F.lit("http://n/"), k.cast("string")).alias("url"),
        F.concat(F.lit("INS"), k.cast("string")).alias("title"),
        F.lit("1995-08-15 00:00:00").cast("timestamp").alias("created_on"),
    )
    cols = [
        ColumnSpec("provider", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("foreign_identifier", Datatype.char, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("url", Datatype.char),
        ColumnSpec("title", Datatype.char),
        ColumnSpec("created_on", Datatype.timestamp),
    ]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_cow_partitioned")
    shutil.rmtree(root, ignore_errors=True)
    t = CowTable.create(
        spark, root, target, target_files=12,
        partition_by=("month(created_on)",),
    )
    t.merge(updates.unionByName(inserts), cols, deterministic=True)
    bounds = ("1995-07-01 00:00:00", "1995-09-30 23:59:59")
    picked, rest = t.read_where({"created_on": bounds}, _split=True)
    assert rest, "month partition pruning must skip files"
    out = t.read_where({"created_on": bounds})
    return out.select(
        "provider", "foreign_identifier", "title",
        F.date_format("created_on", "yyyy-MM-dd").alias("d"),
    )


@register(
    "merge_cow_when_clauses",
    """
    WITH tgt AS (
      SELECT 'f' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') AS fid,
             CAST(c_acctbal AS DOUBLE) AS balance,
             c_mktsegment AS segment
      FROM customer
    ),
    src AS (
      SELECT 'f' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') AS fid,
             CAST(c_acctbal + 1000 AS DOUBLE) AS balance,
             'NEW' AS segment,
             CASE WHEN c_custkey % 5 = 0 THEN 'del'
                  WHEN c_custkey % 5 = 1 THEN 'upd'
                  ELSE 'noop' END AS tag,
             CAST(c_nationkey AS DOUBLE) AS delta,
             c_nationkey AS nk
      FROM customer WHERE c_custkey % 5 < 3
      UNION ALL
      SELECT 'x' || lpad(CAST(c_custkey AS VARCHAR), 7, '0'),
             CAST(c_acctbal + 1000 AS DOUBLE), 'NEW', 'ins', 0.0,
             c_nationkey
      FROM customer WHERE c_custkey % 5 = 3
    ),
    j AS (
      SELECT t.fid, t.balance, t.segment, s.tag, s.delta
      FROM tgt t LEFT JOIN src s ON t.fid = s.fid
    ),
    kept AS (
      -- Delta clause order: DELETE tested first, then UPDATE, else
      -- the row carries; a NULL condition is false
      SELECT fid,
             CASE WHEN tag = 'upd' THEN balance + delta
                  ELSE balance END AS balance,
             CASE WHEN tag = 'upd' THEN upper(tag)
                  ELSE segment END AS segment
      FROM j
      WHERE NOT coalesce(tag = 'del' AND balance < 5000.0, FALSE)
    ),
    ins AS (
      SELECT fid, balance, segment FROM src s
      WHERE s.fid NOT IN (SELECT fid FROM tgt) AND s.nk < 13
    )
    SELECT fid, round(balance, 2) AS balance, segment FROM kept
    UNION ALL
    SELECT fid, round(balance, 2) AS balance, segment FROM ins
    """,
)
def merge_cow_when_clauses(spark, sf_dir):
    """CONDITIONAL MERGE (ANSI/Delta WHEN clauses) on the lake table:
    one commit applies WHEN MATCHED AND cond THEN DELETE, WHEN MATCHED
    AND cond THEN UPDATE SET <partial, source-referencing exprs>, and
    WHEN NOT MATCHED AND cond THEN INSERT * — logic the reference
    splits across separate UPDATE / DELETE / INSERT-ON-CONFLICT passes
    (``loader/sql.py:214-332``), here a single snapshot-isolated
    copy-on-write commit with the same file skipping and optimistic
    concurrency as the plain upsert. The oracle simulates the full
    clause semantics (delete precedence, NULL-condition-is-false,
    unmatched-insert filter) relationally."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable

    c = _t(spark, sf_dir, "customer")["customer"]
    k = F.col("c_custkey")
    fid = F.concat(F.lit("f"), F.lpad(k.cast("string"), 7, "0"))
    fact = c.select(
        fid.alias("fid"),
        F.col("c_acctbal").cast("double").alias("balance"),
        F.col("c_mktsegment").alias("segment"),
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_cow_when")
    shutil.rmtree(root, ignore_errors=True)
    t = CowTable.create(spark, root, fact, keys=("fid",), target_files=8)
    src = c.filter(k % 5 < 3).select(
        fid.alias("fid"),
        (F.col("c_acctbal") + 1000).cast("double").alias("balance"),
        F.lit("NEW").alias("segment"),
        F.when(k % 5 == 0, "del")
        .when(k % 5 == 1, "upd")
        .otherwise("noop")
        .alias("tag"),
        F.col("c_nationkey").cast("double").alias("delta"),
        F.col("c_nationkey").alias("nk"),
    ).unionByName(
        c.filter(k % 5 == 3).select(
            F.concat(F.lit("x"), F.lpad(k.cast("string"), 7, "0"))
            .alias("fid"),
            (F.col("c_acctbal") + 1000).cast("double").alias("balance"),
            F.lit("NEW").alias("segment"),
            F.lit("ins").alias("tag"),
            F.lit(0.0).alias("delta"),
            F.col("c_nationkey").alias("nk"),
        )
    )
    t.merge_when(
        src,
        delete_cond="s.tag = 'del' AND t.balance < 5000.0",
        update_set={"balance": "t.balance + s.delta",
                    "segment": "upper(s.tag)"},
        update_cond="s.tag = 'upd'",
        insert_cond="s.nk < 13",
    )
    return t.read().select(
        "fid", F.round("balance", 2).alias("balance"), "segment"
    )


@register(
    "stats_incremental_analyze",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_custkey AS ck,
             CASE WHEN o_orderkey % 11 = 0 THEN NULL
                  ELSE CAST(round(o_totalprice * 100) AS BIGINT)
             END AS price_cents
      FROM orders WHERE o_orderkey % 3 <> 2
    ),
    upd AS (
      SELECT k, ck, price_cents + 3300 AS price_cents
      FROM base WHERE k % 5 = 1
    ),
    ins AS (
      SELECT o_orderkey AS k, o_custkey AS ck,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE CAST(round(o_totalprice * 100) AS BIGINT)
             END AS price_cents
      FROM orders WHERE o_orderkey % 3 = 2
    ),
    after_upd AS (
      SELECT k, ck,
             CASE WHEN k % 5 = 1 THEN price_cents + 3300
                  ELSE price_cents END AS price_cents
      FROM base
    ),
    state AS (
      SELECT * FROM after_upd UNION ALL SELECT * FROM ins
    ),
    final AS (
      SELECT * FROM state
      WHERE price_cents IS NULL
         OR price_cents <> (SELECT min(price_cents) FROM state)
    ),
    -- the NDV sketch absorbs every EVER-INSERTED value (base rows,
    -- update post-images, inserts); deletes cannot leave a sketch
    ing AS (
      SELECT ck, price_cents FROM base
      UNION ALL SELECT ck, price_cents FROM upd
      UNION ALL SELECT ck, price_cents FROM ins
    ),
    tck AS (
      SELECT DISTINCT CAST(('0x' || substr(
               md5('kmv|' || CAST(ck AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM ing WHERE ck IS NOT NULL ORDER BY h LIMIT 256
    ),
    tpr AS (
      SELECT DISTINCT CAST(('0x' || substr(
               md5('kmv|' || CAST(price_cents AS VARCHAR)), 1, 15))
             AS BIGINT) AS h
      FROM ing WHERE price_cents IS NOT NULL ORDER BY h LIMIT 256
    ),
    ndvs AS (
      SELECT 'ck' AS col,
             CASE WHEN (SELECT count(*) FROM tck) < 256
                  THEN (SELECT count(*) FROM tck)
                  ELSE CAST(floor(255.0 / ((SELECT max(h) FROM tck)
                       / 1152921504606846976.0)) AS BIGINT)
             END AS ndv
      UNION ALL
      SELECT 'price_cents',
             CASE WHEN (SELECT count(*) FROM tpr) < 256
                  THEN (SELECT count(*) FROM tpr)
                  ELSE CAST(floor(255.0 / ((SELECT max(h) FROM tpr)
                       / 1152921504606846976.0)) AS BIGINT)
             END
    )
    SELECT s.col, s.n_rows, s.nulls, s.min_v, s.max_v, n.ndv
    FROM (
      SELECT 'ck' AS col, count(*) AS n_rows,
             count(*) FILTER (WHERE ck IS NULL) AS nulls,
             min(ck) AS min_v, max(ck) AS max_v
      FROM final
      UNION ALL
      SELECT 'price_cents', count(*),
             count(*) FILTER (WHERE price_cents IS NULL),
             min(price_cents), max(price_cents)
      FROM final
    ) s JOIN ndvs n ON s.col = n.col
    """,
)
def stats_incremental_analyze(spark, sf_dir):
    """INCREMENTAL ANALYZE (cowtable.analyze_incremental): planner
    statistics advanced from the CHANGE FEED in O(churn) instead of a
    full rescan — the statistics analog of the incremental MV, and
    what keeps the facade's stats-driven broadcast planning fresh at
    ingest cadence on a 100 TB table. One incremental call absorbs an
    UPDATE commit (post-images enter the NDV sketch; pre-images adjust
    nulls), an INSERT commit (bounds extend), and a DELETE of every
    min-holding row (the removed value ties the stored bound, forcing
    the exact per-column recompute path). The oracle replays rows /
    nulls / min / max against the FINAL state exactly, and replays the
    KMV NDV estimate bit-for-bit (same md5 hash60, same k smallest,
    same floor formula) over the ever-inserted value set — the
    documented deletes-make-NDV-an-upper-bound semantics, pinned in
    SQL rather than hidden."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.schemas.columns import (
        ColumnSpec,
        Datatype,
        UpsertStrategy,
    )

    o = _t(spark, sf_dir, "orders")["orders"]
    k = F.col("o_orderkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    root = os.path.join(tempfile.gettempdir(), "spark_graft_inc_stats")
    shutil.rmtree(root, ignore_errors=True)
    base = o.filter(k % 3 != 2).select(
        k.alias("k"),
        F.col("o_custkey").alias("ck"),
        F.when(k % 11 == 0, F.lit(None).cast("bigint"))
        .otherwise(cents).alias("price_cents"),
    )
    t = CowTable.create(
        spark, root, base, keys=("k",), target_files=6
    )
    t.analyze(cols=["ck", "price_cents"], kmv_k=256)
    cols = [
        ColumnSpec("k", Datatype.int,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("ck", Datatype.int),
        ColumnSpec("price_cents", Datatype.int),
    ]
    t.update(
        F.col("k") % 5 == 1,
        {"price_cents": F.col("price_cents") + 3300},
    )
    t.merge(
        o.filter(k % 3 == 2).select(
            k.alias("k"),
            F.col("o_custkey").alias("ck"),
            F.when(k % 7 == 0, F.lit(None).cast("bigint"))
            .otherwise(cents).alias("price_cents"),
        ),
        cols, deterministic=True,
    )
    mn = t.read().agg(F.min("price_cents")).head()[0]
    t.delete(F.col("price_cents") == mn)
    doc = t.analyze_incremental()
    assert doc["mode"] == "incremental" and doc["deletes_since_full"] > 0
    rows = [
        (
            c,
            doc["rows"],
            doc["columns"][c]["nulls"],
            int(doc["columns"][c]["min"]),
            int(doc["columns"][c]["max"]),
            doc["columns"][c]["ndv"],
        )
        for c in ("ck", "price_cents")
    ]
    return literal_df(spark, 
        rows,
        "col string, n_rows long, nulls long, min_v long, max_v long, "
        "ndv long",
    )


# --- the full catalog pipeline, end to end ---------------------------------
# Every stage the reference's DAG surface implies, walked by ONE oracle-
# gated query: raw landing batch -> record cleaning (license pair
# validation P2/P11, string sanitization P3, required-field drop P1) ->
# canonical CoW table registered in a LakeCatalog -> a second landing
# batch upserted with per-column strategies (J7/§2.4) INSIDE a catalog
# transaction (publish pin) -> the unattended MAINTAIN tick refreshing
# the registered search index AT the pin -> popularity constants +
# standardized scoring (A7/A8) over the published snapshot -> top-k
# BM25 served FROM THE INDEX joined with the popularity scores. The
# unit suites cover each seam pairwise; this pins the integration:
# the oracle recomputes the final published+indexed state from the raw
# landing fixture alone.


def _e2e_oracle() -> str:
    from openverse_catalog_spark.functions.licenses import license_pairs

    dim_rows = ",\n      ".join(
        f"('{lic}', '{ver}', '{url}')" for lic, ver, url in license_pairs()
    )
    return f"""
    WITH ks AS (SELECT o_orderkey AS k,
                       CAST(o_totalprice AS DOUBLE) AS metric
                FROM orders),
    base AS (
      SELECT k, metric,
        CASE k % 3 WHEN 0 THEN 'flickr' WHEN 1 THEN 'museum'
                   ELSE 'archive' END AS provider,
        CASE WHEN k % 31 = 0 THEN NULL
             ELSE 'f' || CAST(k AS VARCHAR) END AS fid,
        'http://m/' || CAST(k AS VARCHAR) AS url,
        CASE k % 7 WHEN 0 THEN 'BY' WHEN 1 THEN 'by-nc-sa'
                   WHEN 2 THEN 'cc0' WHEN 3 THEN 'by-nd'
                   WHEN 4 THEN 'PDM' WHEN 5 THEN 'junklicense'
                   ELSE ' By-Sa ' END AS lic_raw,
        CASE k % 7 WHEN 0 THEN '2.0' WHEN 1 THEN '4'
                   WHEN 2 THEN CAST(NULL AS VARCHAR)
                   WHEN 3 THEN '5.0' WHEN 4 THEN '1.00'
                   WHEN 5 THEN '1.0' ELSE '3.0' END AS ver_raw,
        'Item  "' || CAST(k AS VARCHAR) || '"   ' ||
          CASE k % 5 WHEN 0 THEN 'sunset landscape'
                     WHEN 1 THEN 'portrait study'
                     WHEN 2 THEN 'landscape panorama'
                     WHEN 3 THEN 'macro detail'
                     ELSE 'street scene' END AS title1,
        CASE WHEN k % 20 = 11 THEN NULL
             ELSE 'Remastered   "' || CAST(k AS VARCHAR)
                  || '"  landscape  edition' END AS title2
      FROM ks),
    norm AS (
      SELECT k, lower(trim(lic_raw)) AS lic,
             COALESCE(
               CASE WHEN try_cast(ver_raw AS DOUBLE) IS NOT NULL THEN
                 CAST(CAST(floor(try_cast(ver_raw AS DOUBLE)) AS BIGINT)
                      AS VARCHAR)
                 || '.' ||
                 CAST(CAST((try_cast(ver_raw AS DOUBLE)
                            - floor(try_cast(ver_raw AS DOUBLE))) * 10
                           AS INT) AS VARCHAR)
               END,
               CASE WHEN lower(trim(lic_raw)) IN ('cc0', 'pdm') THEN '1.0'
                    WHEN lower(trim(lic_raw)) = 'publicdomain'
                      THEN 'N/A' END) AS ver
      FROM base),
    dim AS (SELECT * FROM (VALUES
      {dim_rows}) AS v(license, license_version, license_url)),
    valid AS (
      SELECT n.k, d.license, d.license_version
      FROM norm n JOIN dim d
        ON d.license = n.lic AND d.license_version = n.ver),
    c1 AS (
      SELECT b.k, b.provider, b.fid, b.url, v.license, v.license_version,
             replace(trim(regexp_replace(b.title1, '\\s+', ' ', 'g')),
                     '"', '''') AS title,
             b.metric
      FROM base b JOIN valid v USING (k)
      WHERE b.k % 4 <> 3 AND b.fid IS NOT NULL),
    c2 AS (
      SELECT b.k, b.provider, b.fid, b.url, v.license, v.license_version,
             replace(trim(regexp_replace(
               CASE WHEN b.k % 10 = 1 THEN b.title2 ELSE b.title1 END,
               '\\s+', ' ', 'g')), '"', '''') AS title,
             CASE WHEN b.k % 10 = 1 THEN b.metric + 50
                  ELSE b.metric END AS metric
      FROM base b JOIN valid v USING (k)
      WHERE (b.k % 4 = 3 OR b.k % 10 = 1) AND b.fid IS NOT NULL),
    final AS (
      -- per-column upsert strategies over the keyed full outer join:
      -- no_change -> target wins on match, source seeds the insert;
      -- newest_non_null -> COALESCE(source, target)
      SELECT COALESCE(c1.k, c2.k) AS media_id,
             COALESCE(c1.provider, c2.provider) AS provider,
             COALESCE(c2.title, c1.title) AS title,
             COALESCE(c2.metric, c1.metric) AS metric
      FROM c1 FULL OUTER JOIN c2 ON c1.k = c2.k),
    p AS (SELECT provider, quantile_disc(metric, 0.85) AS raw_value
          FROM final WHERE metric IS NOT NULL GROUP BY provider),
    pc AS (SELECT provider,
                  ((1 - 0.85) / 0.85) * (CASE WHEN raw_value = 0 THEN 1
                                              ELSE raw_value END)
                    AS constant
           FROM p),
    toks AS (
      SELECT media_id AS doc_id,
             unnest(list_filter(regexp_split_to_array(lower(title),
                                                      '[^a-z]+'),
                                x -> length(x) >= 3)) AS term
      FROM final WHERE title IS NOT NULL),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN ('landscape', 'portrait', 'macro')
           GROUP BY 1, 2),
    idf AS (SELECT tf.term,
                   ln(1.0 + (stats.n - count(DISTINCT tf.doc_id) + 0.5)
                            / (count(DISTINCT tf.doc_id) + 0.5)) AS idf
            FROM tf, stats GROUP BY tf.term, stats.n),
    bm AS (SELECT tf.doc_id,
                  sum(idf.idf * tf.tf * (1.2 + 1.0)
                      / (tf.tf + 1.2 * (1.0 - 0.75
                                        + 0.75 * dl.dl / stats.avgdl)))
                    AS score
           FROM tf JOIN idf USING (term)
                   JOIN dl USING (doc_id), stats
           GROUP BY tf.doc_id),
    top AS (SELECT doc_id, round(score, 6) AS score FROM bm
            ORDER BY round(score, 6) DESC, doc_id LIMIT 20)
    SELECT t.doc_id AS media_id, f.title, t.score, f.provider,
           round(f.metric / (f.metric + pc.constant), 6) AS popularity
    FROM top t
    JOIN final f ON f.media_id = t.doc_id
    JOIN pc ON pc.provider = f.provider
    """


@register("pipeline_end_to_end", _e2e_oracle())
def pipeline_end_to_end(spark, sf_dir):
    """THE CATALOG SHOWCASE: landing -> clean -> canonical upsert ->
    catalog publish pin -> MAINTAIN-ticked search index -> popularity
    -> index-served retrieval, one oracle over the whole chain (the
    reference runs this as separate Airflow DAGs: provider ingestion
    ``provider_dag_factory.py``, loader upsert ``loader/sql.py``,
    popularity refresh ``popularity/sql.py``, data refresh + index
    handoff ``data_refresh_task_factory.py``). Integration seams this
    pins that unit suites only cover pairwise: the index builds at the
    FIRST publish pin and the maintenance tick advances it exactly to
    the SECOND (never the raw head), the upsert's per-column strategies
    feed both the index churn (a title nulled by newest-wins leaves the
    postings) and the popularity facts, and the final result joins
    index hits back to published rows."""
    import os
    import shutil
    import tempfile

    from openverse_catalog_spark.functions.licenses import normalize_license
    from openverse_catalog_spark.operators.catalog import LakeCatalog
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.popularity import (
        percentile_disc_by_group,
        popularity_constants,
        standardized_popularity,
    )
    from openverse_catalog_spark.operators.searchindex import SearchIndex

    o = _t(spark, sf_dir, "orders")["orders"]
    k = F.col("o_orderkey")
    kind = (
        F.when(k % 5 == 0, "sunset landscape")
        .when(k % 5 == 1, "portrait study")
        .when(k % 5 == 2, "landscape panorama")
        .when(k % 5 == 3, "macro detail")
        .otherwise("street scene")
    )
    title1 = F.concat(
        F.lit('Item  "'), k.cast("string"), F.lit('"   '), kind
    )
    title2 = F.when(k % 20 == 11, F.lit(None).cast("string")).otherwise(
        F.concat(
            F.lit('Remastered   "'), k.cast("string"),
            F.lit('"  landscape  edition'),
        )
    )
    common = [
        k.alias("media_id"),
        F.when(k % 3 == 0, "flickr").when(k % 3 == 1, "museum")
        .otherwise("archive").alias("provider"),
        F.when(k % 31 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("f"), k.cast("string"))).alias("fid"),
        F.concat(F.lit("http://m/"), k.cast("string")).alias("url"),
        F.when(k % 7 == 0, "BY").when(k % 7 == 1, "by-nc-sa")
        .when(k % 7 == 2, "cc0").when(k % 7 == 3, "by-nd")
        .when(k % 7 == 4, "PDM").when(k % 7 == 5, "junklicense")
        .otherwise(" By-Sa ").alias("license"),
        F.when(k % 7 == 0, "2.0").when(k % 7 == 1, "4")
        .when(k % 7 == 2, F.lit(None).cast("string"))
        .when(k % 7 == 3, "5.0").when(k % 7 == 4, "1.00")
        .when(k % 7 == 5, "1.0").otherwise("3.0")
        .alias("license_version"),
    ]
    raw1 = o.filter(k % 4 != 3).select(
        *common,
        title1.alias("title_raw"),
        F.col("o_totalprice").cast("double").alias("metric"),
    )
    raw2 = o.filter((k % 4 == 3) | (k % 10 == 1)).select(
        *common,
        F.when(k % 10 == 1, title2).otherwise(title1).alias("title_raw"),
        F.when(k % 10 == 1, F.col("o_totalprice").cast("double") + 50)
        .otherwise(F.col("o_totalprice").cast("double")).alias("metric"),
    )

    def clean(raw):
        # P2/P11 pair validation nulls invalid licenses, P1 drops
        # records missing required fields, P3 sanitizes strings
        out = normalize_license(raw, spark)
        return out.filter(
            F.col("license").isNotNull() & F.col("fid").isNotNull()
        ).select(
            "media_id", "provider", "fid", "url",
            "license", "license_version", "license_url",
            clean_string_expr(F.col("title_raw"), None, False)
            .alias("title"),
            "metric",
        )

    c1, c2 = clean(raw1), clean(raw2)
    root = os.path.join(tempfile.gettempdir(), "spark_graft_e2e")
    shutil.rmtree(root, ignore_errors=True)
    cat = LakeCatalog.create(spark, os.path.join(root, "lake"))
    media = CowTable.create(
        spark, os.path.join(root, "media"), c1,
        keys=("media_id",), target_files=4,
        # c1 is the whole clean pipeline (license join + regex
        # sanitize) — expensive lineage the range sample must not run
        # a second time (cowtable checkpoint note; measured 4.1->2.8 s)
        checkpoint=True,
    )
    cat.register("media", media)
    pin1 = cat._entry("media")["version"]
    idx = SearchIndex.create(
        spark, os.path.join(root, "idx"), media,
        id_col="media_id", text_col="title", version=pin1,
    )
    cat.register_index(
        "idx", "search", idx.root, "media",
        {"id": "media_id", "text": "title"},
    )
    from openverse_catalog_spark.plans.timing import mark_fixture_done

    mark_fixture_done()
    cols = [
        ColumnSpec("media_id", Datatype.int, required=True,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("provider", Datatype.char,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("fid", Datatype.char,
                   upsert_strategy=UpsertStrategy.no_change),
        ColumnSpec("url", Datatype.char),
        ColumnSpec("license", Datatype.char),
        ColumnSpec("license_version", Datatype.char),
        ColumnSpec("license_url", Datatype.char),
        ColumnSpec("title", Datatype.char),
        ColumnSpec("metric", Datatype.double),
    ]
    with cat.transaction() as txn:
        txn.table("media").merge(c2, cols)
    pin2 = cat._entry("media")["version"]
    tick = cat.maintain_tables(target_rows=1, retention_seconds=3600.0)
    assert tick["index:idx"]["applied"] == pin2, tick["index:idx"]
    assert not tick["index:idx"].get("resync"), tick["index:idx"]
    snap = media.read(pin2)
    p = percentile_disc_by_group(snap, ["provider"], "metric", 0.85)
    pc = popularity_constants(p, 0.85)
    scored = standardized_popularity(snap, pc, ["provider"], "metric")
    hits = idx.bm25(["landscape", "portrait", "macro"], 20) \
        .withColumnRenamed("doc_id", "media_id")
    return hits.join(scored, "media_id").select(
        "media_id", "title", "score", "provider",
        F.round("standardized_popularity", 6).alias("popularity"),
    )
