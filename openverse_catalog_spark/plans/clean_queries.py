"""Cleaning/enrichment operators as oracle-checked queries: license
normalization (SURVEY P2/P11), URL scheme upgrade (P7), and type
coercion (P5/P6 + the PG int4 guard).

Inputs are synthesized deterministically from the driver's tables so the
detectors exercise every edge case (invalid pairs, garbage ints,
overflow, missing schemes) while both engines see identical data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openverse_catalog_spark.session import literal_df

from openverse_catalog_spark.functions.licenses import license_pairs, normalize_license
from openverse_catalog_spark.functions.urls import upgrade_url
from openverse_catalog_spark.plans.analytics import _t, register
from openverse_catalog_spark.schemas.columns import (
    clean_bool_expr,
    clean_int_expr,
    pg_int4_guard,
)

# --- P2/P11: license normalization ----------------------------------------
# Raw (license, version) pairs per o_orderkey % 7 — covers lower/trim,
# version canonicalization str(float(v)), cc0/pdm version defaulting,
# invalid pairs and unknown licenses (both null out -> P2 drop filter).

_LIC_RAW_SQL = """
  SELECT o_orderkey,
         CASE o_orderkey % 7
           WHEN 0 THEN 'BY'       WHEN 1 THEN 'by-nc-sa'
           WHEN 2 THEN 'cc0'      WHEN 3 THEN 'by-nd'
           WHEN 4 THEN 'PDM'      WHEN 5 THEN 'junklicense'
           ELSE ' By-Sa ' END AS lic_raw,
         CASE o_orderkey % 7
           WHEN 0 THEN '2.0' WHEN 1 THEN '4' WHEN 2 THEN CAST(NULL AS VARCHAR)
           WHEN 3 THEN '5.0' WHEN 4 THEN '1.00' WHEN 5 THEN '1.0'
           ELSE '3.0' END AS ver_raw
  FROM orders
"""


def _license_oracle() -> str:
    dim_rows = ",\n      ".join(
        f"('{lic}', '{ver}', '{url}')" for lic, ver, url in license_pairs()
    )
    return f"""
    WITH raw AS ({_LIC_RAW_SQL}),
    norm AS (
      SELECT o_orderkey, lower(trim(lic_raw)) AS lic,
             COALESCE(
               CASE WHEN try_cast(ver_raw AS DOUBLE) IS NOT NULL THEN
                 CAST(CAST(floor(try_cast(ver_raw AS DOUBLE)) AS BIGINT) AS VARCHAR)
                 || '.' ||
                 CAST(CAST((try_cast(ver_raw AS DOUBLE)
                            - floor(try_cast(ver_raw AS DOUBLE))) * 10 AS INT) AS VARCHAR)
               END,
               CASE WHEN lower(trim(lic_raw)) IN ('cc0', 'pdm') THEN '1.0'
                    WHEN lower(trim(lic_raw)) = 'publicdomain' THEN 'N/A' END) AS ver
      FROM raw),
    dim AS (SELECT * FROM (VALUES
      {dim_rows}) AS v(license, license_version, license_url))
    SELECT o_orderkey, d.license, d.license_version, d.license_url
    FROM norm LEFT JOIN dim d
      ON d.license = norm.lic AND d.license_version = norm.ver
    """


@register("clean_license_normalize", _license_oracle())
def clean_license_normalize(spark, sf_dir):
    """License (pair) validation against the canonical CC dimension —
    invalid pairs null out (the P2 drop filter keys on that). One
    broadcast hash join; the fact side never shuffles."""
    o = _t(spark, sf_dir, "orders")["orders"]
    k = F.col("o_orderkey")
    raw = o.select(
        "o_orderkey",
        F.when(k % 7 == 0, "BY").when(k % 7 == 1, "by-nc-sa")
        .when(k % 7 == 2, "cc0").when(k % 7 == 3, "by-nd")
        .when(k % 7 == 4, "PDM").when(k % 7 == 5, "junklicense")
        .otherwise(" By-Sa ").alias("license"),
        F.when(k % 7 == 0, "2.0").when(k % 7 == 1, "4")
        .when(k % 7 == 2, F.lit(None).cast("string"))
        .when(k % 7 == 3, "5.0").when(k % 7 == 4, "1.00")
        .when(k % 7 == 5, "1.0").otherwise("3.0").alias("license_version"),
    )
    out = normalize_license(raw, spark)
    return out.select("o_orderkey", "license", "license_version", "license_url")


# --- P7: URL scheme upgrade ------------------------------------------------
# Six shapes per c_custkey % 6: upgradeable http, schemeless TLS,
# already-https, non-TLS http, schemeless non-TLS, invalid (no tld).

_URL_RAW_SQL = """
  SELECT c_custkey,
         CASE c_custkey % 6
           WHEN 0 THEN 'http://example.com/img/' || CAST(c_custkey AS VARCHAR) || '.jpg'
           WHEN 1 THEN 'example.org/page/' || CAST(c_custkey AS VARCHAR)
           WHEN 2 THEN 'https://secure.net/a/' || CAST(c_custkey AS VARCHAR)
           WHEN 3 THEN 'http://plain-site.org/' || CAST(c_custkey AS VARCHAR)
           WHEN 4 THEN 'noscheme.info/x'
           ELSE 'not a url' END AS url_raw
  FROM customer
"""


@register(
    "clean_url_upgrade",
    f"""
    WITH raw AS ({_URL_RAW_SQL})
    SELECT c_custkey,
           CASE c_custkey % 6
             WHEN 0 THEN 'https://example.com/img/' || CAST(c_custkey AS VARCHAR) || '.jpg'
             WHEN 1 THEN 'https://example.org/page/' || CAST(c_custkey AS VARCHAR)
             WHEN 2 THEN 'https://secure.net/a/' || CAST(c_custkey AS VARCHAR)
             WHEN 3 THEN 'http://plain-site.org/' || CAST(c_custkey AS VARCHAR)
             WHEN 4 THEN 'http://noscheme.info/x'
             ELSE CAST(NULL AS VARCHAR) END AS url
    FROM raw
    """,
)
def clean_url_upgrade(spark, sf_dir):
    """Scheme addition/repair + https upgrade via the broadcast TLS
    dimension (the reference's live probe, precomputed — urls.py:20-136).
    The oracle pins the expected output per input shape."""
    c = _t(spark, sf_dir, "customer")["customer"]
    k = F.col("c_custkey")
    ks = k.cast("string")
    raw = c.select(
        "c_custkey",
        F.when(k % 6 == 0, F.concat(F.lit("http://example.com/img/"), ks, F.lit(".jpg")))
        .when(k % 6 == 1, F.concat(F.lit("example.org/page/"), ks))
        .when(k % 6 == 2, F.concat(F.lit("https://secure.net/a/"), ks))
        .when(k % 6 == 3, F.concat(F.lit("http://plain-site.org/"), ks))
        .when(k % 6 == 4, F.lit("noscheme.info/x"))
        .otherwise(F.lit("not a url")).alias("url"),
    )
    return upgrade_url(raw, spark, "url").select("c_custkey", "url")


# --- P5/P6: int/bool coercion + int4 guard ---------------------------------

_COERCE_RAW_SQL = """
  SELECT l_orderkey, l_linenumber,
         CASE (l_orderkey + l_linenumber) % 6
           WHEN 0 THEN CAST(l_orderkey AS VARCHAR) || '.7'
           WHEN 1 THEN ' ' || CAST(l_orderkey AS VARCHAR) || ' '
           WHEN 2 THEN 'abc'
           WHEN 3 THEN '3000000000'
           WHEN 4 THEN ''
           ELSE '-12.9' END AS int_raw,
         CASE (l_orderkey + l_linenumber) % 7
           WHEN 0 THEN 't'     WHEN 1 THEN 'FALSE' WHEN 2 THEN '1'
           WHEN 3 THEN 'no'    WHEN 4 THEN 'maybe' WHEN 5 THEN ''
           ELSE ' True ' END AS bool_raw
  FROM lineitem
"""


@register(
    "clean_coerce_types",
    f"""
    WITH raw AS ({_COERCE_RAW_SQL}),
    c AS (
      SELECT l_orderkey, l_linenumber,
             CAST(trunc(try_cast(int_raw AS DOUBLE)) AS BIGINT) AS i,
             lower(trim(bool_raw)) AS b
      FROM raw)
    SELECT l_orderkey, l_linenumber,
           CASE WHEN abs(i) > 2147483647 THEN NULL ELSE i END AS int_clean,
           CASE WHEN b IN ('t', 'true', '1', 'yes') THEN TRUE
                WHEN b IN ('f', 'false', '0', 'no') THEN FALSE
                ELSE NULL END AS bool_clean
    FROM c
    """,
)
def clean_coerce_types(spark, sf_dir):
    """``int(float(x))``-else-NULL coercion with the PG int4 overflow
    guard (media.py:327-340) and truthy bool mapping — pure expressions,
    zero shuffles."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    m6 = (F.col("l_orderkey") + F.col("l_linenumber")) % 6
    m7 = (F.col("l_orderkey") + F.col("l_linenumber")) % 7
    ks = F.col("l_orderkey").cast("string")
    raw = li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(m6 == 0, F.concat(ks, F.lit(".7")))
        .when(m6 == 1, F.concat(F.lit(" "), ks, F.lit(" ")))
        .when(m6 == 2, F.lit("abc"))
        .when(m6 == 3, F.lit("3000000000"))
        .when(m6 == 4, F.lit(""))
        .otherwise(F.lit("-12.9")).alias("int_raw"),
        F.when(m7 == 0, "t").when(m7 == 1, "FALSE").when(m7 == 2, "1")
        .when(m7 == 3, "no").when(m7 == 4, "maybe").when(m7 == 5, "")
        .otherwise(" True ").alias("bool_raw"),
    )
    return raw.select(
        "l_orderkey",
        "l_linenumber",
        pg_int4_guard(clean_int_expr(F.col("int_raw"))).alias("int_clean"),
        clean_bool_expr(F.col("bool_raw")).alias("bool_clean"),
    )


# --- P13/P14/P21: provider parse (tag split, size coalesce, title regex) ---

_PARSE_RAW_SQL = """
  SELECT p_partkey,
         p_name || CASE WHEN p_partkey % 3 = 0
                        THEN ' | Free Photo - stocksite' ELSE '' END AS title_raw,
         p_name || ' ' || p_type AS tag_blob,
         CASE WHEN p_partkey % 5 = 0 THEN NULL
              ELSE 'http://img.test/l/' || CAST(p_partkey AS VARCHAR) END AS url_l,
         CASE WHEN p_partkey % 3 = 0 THEN NULL
              ELSE 'http://img.test/m/' || CAST(p_partkey AS VARCHAR) END AS url_m,
         'http://img.test/s/' || CAST(p_partkey AS VARCHAR) ||
         CASE WHEN p_partkey % 2 = 0
              THEN '?trackid=' || CAST(p_partkey AS VARCHAR) ELSE '' END AS url_s,
         p_brand
  FROM part
"""


@register(
    "clean_provider_parse",
    f"""
    WITH raw AS ({_PARSE_RAW_SQL})
    SELECT p_partkey,
           regexp_replace(title_raw, ' \\| Free Photo.*$', '') AS title,
           array_to_string(
             list_sort(list_distinct(
               list_filter(string_split_regex(lower(tag_blob), '\\s+'), t -> t <> '')
             ))[1:3], ',') AS tags,
           regexp_replace(COALESCE(url_l, url_m, url_s),
                          '[?&]trackid=[^&]*', '') AS image_url,
           CASE p_brand WHEN 'Brand#2' THEN 'museumx'
                        WHEN 'Brand#17' THEN 'artcollective'
                        ELSE 'stocksite' END AS source
    FROM raw
    """,
)
def clean_provider_parse(spark, sf_dir):
    """Provider-parser record functions as one narrow projection:
    marketing-suffix strip (P21, rawpixel.py:182-220), whitespace tag
    split -> sorted distinct -> cap (P13, flickr.py:313-324),
    largest-image coalesce (P14, flickr.py:274-282), tracking-param strip
    (P19, jamendo.py:69-106), and sub-provider source mapping via an
    in-expression literal map (P15, flickr.py:250-253). Zero shuffles."""
    p = _t(spark, sf_dir, "part")["part"]
    k = F.col("p_partkey")
    ks = k.cast("string")
    raw = p.select(
        "p_partkey",
        F.concat(
            F.col("p_name"),
            F.when(k % 3 == 0, F.lit(" | Free Photo - stocksite")).otherwise(F.lit("")),
        ).alias("title_raw"),
        F.concat_ws(" ", "p_name", "p_type").alias("tag_blob"),
        F.when(k % 5 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("http://img.test/l/"), ks)
        ).alias("url_l"),
        F.when(k % 3 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("http://img.test/m/"), ks)
        ).alias("url_m"),
        F.concat(
            F.lit("http://img.test/s/"),
            ks,
            F.when(k % 2 == 0, F.concat(F.lit("?trackid="), ks)).otherwise(F.lit("")),
        ).alias("url_s"),
        "p_brand",
    )
    tags = F.slice(
        F.array_sort(
            F.array_distinct(
                F.filter(F.split(F.lower("tag_blob"), r"\s+"), lambda t: t != "")
            )
        ),
        1,
        3,
    )
    sub_provider = F.create_map(
        F.lit("Brand#2"), F.lit("museumx"), F.lit("Brand#17"), F.lit("artcollective")
    )
    return raw.select(
        "p_partkey",
        F.regexp_replace("title_raw", r" \| Free Photo.*$", "").alias("title"),
        F.array_join(tags, ",").alias("tags"),
        F.regexp_replace(
            F.coalesce("url_l", "url_m", "url_s"), r"[?&]trackid=[^&]*", ""
        ).alias("image_url"),
        F.coalesce(
            F.element_at(sub_provider, F.col("p_brand")), F.lit("stocksite")
        ).alias("source"),
    )


# --- P12/P16: HTML text extraction + key-value list lookup -----------------

_HTML_RAW_SQL = """
  SELECT p_partkey,
         '<p>' || p_name || ' <b>' || p_brand || '</b> &amp; more</p>' AS html_raw,
         [struct_pack(name := 'type', value := p_type),
          struct_pack(name := 'brand', value := p_brand)] AS kv
  FROM part
"""


@register(
    "clean_html_kv_extract",
    f"""
    WITH raw AS ({_HTML_RAW_SQL})
    SELECT p_partkey,
           trim(regexp_replace(
             replace(regexp_replace(html_raw, '<[^>]+>', ' ', 'g'), '&amp;', '&'),
             '\\s+', ' ', 'g')) AS description,
           (list_filter(kv, x -> x.name = 'brand')[1]).value AS brand,
           (list_filter(kv, x -> x.name = 'artist')[1]).value AS artist
    FROM raw
    """,
)
def clean_html_kv_extract(spark, sf_dir):
    """HTML -> text description (P12, flickr.py:294-311 — tag strip +
    entity decode + whitespace collapse as expressions, no per-row
    parser) and first-value-by-name extraction from [{name, value}]
    lists (P16, wikimedia_commons.py:432-453); missing names yield NULL
    via the null-safe element get."""
    p = _t(spark, sf_dir, "part")["part"]
    raw = p.select(
        "p_partkey",
        F.concat(
            F.lit("<p>"), F.col("p_name"), F.lit(" <b>"), F.col("p_brand"),
            F.lit("</b> &amp; more</p>"),
        ).alias("html_raw"),
        F.array(
            F.struct(F.lit("type").alias("name"), F.col("p_type").alias("value")),
            F.struct(F.lit("brand").alias("name"), F.col("p_brand").alias("value")),
        ).alias("kv"),
    )

    def kv_value(name):
        return F.get(
            F.filter(F.col("kv"), lambda x: x.getField("name") == name), 0
        ).getField("value")

    desc = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("html_raw", "<[^>]+>", " "), "&amp;", "&"
            ),
            r"\s+",
            " ",
        )
    )
    return raw.select(
        "p_partkey",
        desc.alias("description"),
        kv_value("brand").alias("brand"),
        kv_value("artist").alias("artist"),
    )


# --- S4: malformed-row-tolerant TSV parse ----------------------------------

_TSV_LINE_SQL = """
  SELECT o_orderkey,
         CAST(o_orderkey AS VARCHAR) || chr(9) || o_orderstatus || chr(9) ||
         CASE WHEN o_orderkey % 97 = 0 THEN 'xx'
              ELSE CAST(round(o_totalprice, 2) AS VARCHAR) END AS line
  FROM orders
"""


@register(
    "source_tsv_tolerant",
    f"""
    WITH raw AS ({_TSV_LINE_SQL})
    SELECT o_orderkey AS fid,
           string_split(line, chr(9))[2] AS status,
           round(try_cast(string_split(line, chr(9))[3] AS DOUBLE), 2) AS total
    FROM raw WHERE o_orderkey % 97 <> 0
    """,
)
def source_tsv_tolerant(spark, sf_dir):
    """S4: tolerant TSV ingestion — PERMISSIVE ``from_csv`` with a
    corrupt-record column; malformed rows (bad numeric field) are
    isolated instead of failing the load (the reference rewrote the file
    and retried COPY, loader/sql.py:109-141 — here it's one pass). The
    surviving-row set is the oracle contract; the <=10-corrupt-rows cap
    is a driver-side count check (sources/tsv.py)."""
    o = _t(spark, sf_dir, "orders")["orders"]
    k = F.col("o_orderkey")
    lines = o.select(
        F.concat_ws(
            "\t",
            k.cast("string"),
            F.col("o_orderstatus"),
            F.when(k % 97 == 0, F.lit("xx")).otherwise(
                F.round("o_totalprice", 2).cast("string")
            ),
        ).alias("line")
    )
    parsed = lines.select(
        F.from_csv(
            "line",
            "fid BIGINT, status STRING, total DOUBLE, _corrupt STRING",
            {"sep": "\t", "mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("r")
    ).select("r.*")
    return parsed.filter(F.col("_corrupt").isNull()).select(
        "fid", "status", F.round("total", 2).alias("total")
    )


# --- maintenance backfill + URL domain stats -------------------------------


def _backfill_oracle() -> str:
    dim_rows = ",\n      ".join(
        f"('{lic}', '{ver}', '{url}')" for lic, ver, url in license_pairs()
    )
    return f"""
    WITH raw AS (
      SELECT o_orderkey,
             CASE o_orderkey % 6
               WHEN 0 THEN 'by'   WHEN 1 THEN 'by-nc' WHEN 2 THEN 'cc0'
               WHEN 3 THEN 'BY-SA' WHEN 4 THEN 'pdm'  ELSE 'by-nd' END AS license,
             CASE o_orderkey % 6
               WHEN 0 THEN '2.0' WHEN 1 THEN '4.0' WHEN 2 THEN '1.0'
               WHEN 3 THEN '3.0' WHEN 4 THEN '1.0' ELSE '9.9' END AS license_version,
             CASE WHEN o_orderkey % 3 = 0
                  THEN 'https://existing.example/' || CAST(o_orderkey AS VARCHAR)
             END AS license_url
      FROM orders),
    dim AS (SELECT * FROM (VALUES
      {dim_rows}) AS v(license, license_version, license_url))
    SELECT r.o_orderkey, r.license, r.license_version,
           COALESCE(r.license_url, d.license_url) AS license_url,
           (r.license_url IS NULL AND d.license_url IS NOT NULL) AS backfilled
    FROM raw r LEFT JOIN dim d
      ON d.license = lower(trim(r.license))
     AND d.license_version = r.license_version
    """


@register("merge_license_backfill", _backfill_oracle())
def merge_license_backfill(spark, sf_dir):
    """Maintenance backfill job (reference add_license_url.py:59-132):
    fill missing license_url from the canonical pair dimension, leave
    existing values untouched, report a backfilled flag. Broadcast dim
    join — the canonical table is one map-side pass, no shuffle. The
    by-nd/9.9 shape is an invalid pair that stays NULL (unfixable rows
    are reported, not guessed)."""
    from openverse_catalog_spark.functions.licenses import backfill_license_url

    o = _t(spark, sf_dir, "orders")["orders"]
    k = F.col("o_orderkey")
    raw = o.select(
        "o_orderkey",
        F.when(k % 6 == 0, "by").when(k % 6 == 1, "by-nc").when(k % 6 == 2, "cc0")
        .when(k % 6 == 3, "BY-SA").when(k % 6 == 4, "pdm")
        .otherwise("by-nd").alias("license"),
        F.when(k % 6 == 0, "2.0").when(k % 6 == 1, "4.0").when(k % 6 == 2, "1.0")
        .when(k % 6 == 3, "3.0").when(k % 6 == 4, "1.0")
        .otherwise("9.9").alias("license_version"),
        F.when(
            k % 3 == 0,
            F.concat(F.lit("https://existing.example/"), k.cast("string")),
        ).alias("license_url"),
    )
    out = backfill_license_url(raw, spark)
    return out.select(
        "o_orderkey", "license", "license_version", "license_url", "backfilled"
    )


_DOMAIN_RE = "^(?:https?://)?([^/]+)"


@register(
    "clean_url_domain_stats",
    f"""
    WITH raw AS ({_URL_RAW_SQL}),
    d AS (SELECT c_custkey,
                 regexp_extract(lower(url_raw), '{_DOMAIN_RE}', 1) AS domain
          FROM raw)
    SELECT domain, count(*) AS n_urls,
           count(DISTINCT c_custkey) AS n_keys,
           min(c_custkey) AS first_key
    FROM d WHERE domain LIKE '%.%'
    GROUP BY domain
    """,
)
def clean_url_domain_stats(spark, sf_dir):
    """Source-mix accounting: host extracted from each URL (pure regexp,
    no UDF), tld-sanity filter (domain must contain a dot — urls.py:44-52),
    then one grouped count/distinct per domain. At 100 TB this is a single
    scan + one shuffle on a low-cardinality key with map-side partials."""
    c = _t(spark, sf_dir, "customer")["customer"]
    k = F.col("c_custkey")
    ks = k.cast("string")
    raw = c.select(
        "c_custkey",
        F.when(k % 6 == 0, F.concat(F.lit("http://example.com/img/"), ks, F.lit(".jpg")))
        .when(k % 6 == 1, F.concat(F.lit("example.org/page/"), ks))
        .when(k % 6 == 2, F.concat(F.lit("https://secure.net/a/"), ks))
        .when(k % 6 == 3, F.concat(F.lit("http://plain-site.org/"), ks))
        .when(k % 6 == 4, F.lit("noscheme.info/x"))
        .otherwise(F.lit("not a url")).alias("url_raw"),
    )
    d = raw.select(
        "c_custkey",
        F.regexp_extract(F.lower("url_raw"), _DOMAIN_RE, 1).alias("domain"),
    )
    return (
        d.filter(F.col("domain").contains("."))
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("c_custkey").alias("n_keys"),
            F.min("c_custkey").alias("first_key"),
        )
    )


# --- URL canonicalization + exact URL dedup --------------------------------

_CANON_URL_SQL = """
  SELECT o_orderkey AS k,
         CASE o_orderkey % 5
           WHEN 0 THEN 'http://www.shop.example/item/' || CAST(o_orderkey % 3000 AS VARCHAR) || '?utm_source=feed'
           WHEN 1 THEN 'https://shop.example/item/' || CAST(o_orderkey % 3000 AS VARCHAR)
           WHEN 2 THEN 'https://Shop.Example/item/' || CAST(o_orderkey % 3000 AS VARCHAR) || '/'
           WHEN 3 THEN 'http://cdn.example/a/' || CAST(o_orderkey % 4000 AS VARCHAR) || '?ref=x&utm_campaign=y'
           ELSE 'https://cdn.example/a/' || CAST(o_orderkey % 4000 AS VARCHAR)
         END AS url_raw
  FROM orders
"""


@register(
    "dedup_url_canonical",
    f"""
    WITH raw AS ({_CANON_URL_SQL}),
    canon AS (
      SELECT k,
             regexp_replace(
               regexp_replace(
                 regexp_replace(lower(url_raw), '^https?://(www\\.)?', ''),
                 '[?&](utm_[a-z]+|ref)=[^&]*', '', 'g'),
               '[/?]+$', '') AS url_canon
      FROM raw
    )
    SELECT url_canon, count(*) AS n_dups, min(k) AS keeper
    FROM canon GROUP BY url_canon HAVING count(*) > 1
    """,
)
def dedup_url_canonical(spark, sf_dir):
    """Crawl-style URL dedup: canonicalize (case-fold host+path, drop
    scheme and www, strip tracking params utm_*/ref, trim trailing
    slashes — the P19/jamendo trackid-strip family generalized), then
    exact-dup groups with a pinned keeper. Pure regexp expressions in
    one codegen span; the only shuffle is the final groupBy on the
    canonical key. The first dedup stage every web corpus runs — at
    100 TB it collapses the ~30-50% trivial URL aliasing before any
    content hashing is paid."""
    o = _t(spark, sf_dir, "orders")["orders"]
    k = F.col("o_orderkey")
    ks3 = (k % 3000).cast("string")
    ks4 = (k % 4000).cast("string")
    raw = o.select(
        k.alias("k"),
        F.when(k % 5 == 0, F.concat(F.lit("http://www.shop.example/item/"), ks3, F.lit("?utm_source=feed")))
        .when(k % 5 == 1, F.concat(F.lit("https://shop.example/item/"), ks3))
        .when(k % 5 == 2, F.concat(F.lit("https://Shop.Example/item/"), ks3, F.lit("/")))
        .when(k % 5 == 3, F.concat(F.lit("http://cdn.example/a/"), ks4, F.lit("?ref=x&utm_campaign=y")))
        .otherwise(F.concat(F.lit("https://cdn.example/a/"), ks4))
        .alias("url_raw"),
    )
    canon = raw.select(
        "k",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower("url_raw"), r"^https?://(www\.)?", ""),
                r"[?&](utm_[a-z]+|ref)=[^&]*", ""),
            r"[/?]+$", "").alias("url_canon"),
    )
    return (
        canon.groupBy("url_canon")
        .agg(F.count("*").alias("n_dups"), F.min("k").alias("keeper"))
        .filter(F.col("n_dups") > 1)
    )


# --- domain blocklist filtering (broadcast anti-join) ----------------------


@register(
    "clean_domain_blocklist",
    f"""
    WITH raw AS ({_CANON_URL_SQL}),
    d AS (SELECT k, regexp_extract(lower(url_raw), '^(?:https?://)?(?:www\\.)?([^/?]+)', 1) AS domain
          FROM raw),
    blocked AS (SELECT 'cdn.example' AS domain)
    SELECT d.domain, count(*) AS n_kept, min(d.k) AS first_key
    FROM d ANTI JOIN blocked b ON d.domain = b.domain
    GROUP BY d.domain
    """,
)
def clean_domain_blocklist(spark, sf_dir):
    """Blocklist filtering as a broadcast ANTI join: the domain
    blocklist (spam/adult/boilerplate hosts — kilobytes to megabytes in
    practice) broadcasts to every task and the fact table never
    shuffles for the filter; survivors aggregate per domain. The P9
    tag-blacklist shape lifted to the URL/domain level every crawl
    pipeline needs."""
    o = _t(spark, sf_dir, "orders")["orders"]
    k = F.col("o_orderkey")
    ks3 = (k % 3000).cast("string")
    ks4 = (k % 4000).cast("string")
    raw = o.select(
        k.alias("k"),
        F.when(k % 5 == 0, F.concat(F.lit("http://www.shop.example/item/"), ks3, F.lit("?utm_source=feed")))
        .when(k % 5 == 1, F.concat(F.lit("https://shop.example/item/"), ks3))
        .when(k % 5 == 2, F.concat(F.lit("https://Shop.Example/item/"), ks3, F.lit("/")))
        .when(k % 5 == 3, F.concat(F.lit("http://cdn.example/a/"), ks4, F.lit("?ref=x&utm_campaign=y")))
        .otherwise(F.concat(F.lit("https://cdn.example/a/"), ks4))
        .alias("url_raw"),
    )
    d = raw.select(
        "k",
        F.regexp_extract(
            F.lower("url_raw"), r"^(?:https?://)?(?:www\.)?([^/?]+)", 1
        ).alias("domain"),
    )
    from openverse_catalog_spark.functions.dims import values_dim

    blocked = values_dim(
        o.sparkSession, [("cdn.example",)], "domain string"
    )
    return (
        d.join(F.broadcast(blocked), "domain", "left_anti")
        .groupBy("domain")
        .agg(F.count("*").alias("n_kept"), F.min("k").alias("first_key"))
    )


# --- P11 URL direction: license pair FROM a license URL --------------------


def _license_from_url_oracle() -> str:
    from openverse_catalog_spark.functions.licenses import (
        _FRAG_RE,
        license_path_entries,
    )

    path_rows = ",\n      ".join(
        f"('{p}', '{lic}', '{ver}')" for p, lic, ver in license_path_entries()
    )
    frag_re = _FRAG_RE.replace("'", "''")
    return f"""
    WITH raw AS (
      SELECT o_orderkey,
             CASE o_orderkey % 8
               WHEN 0 THEN 'https://creativecommons.org/licenses/by/4.0/'
               WHEN 1 THEN 'http://creativecommons.org/licenses/by-nc/2.0'
               WHEN 2 THEN 'creativecommons.org/publicdomain/zero/1.0/'
               WHEN 3 THEN 'HTTPS://CREATIVECOMMONS.ORG/licenses/by-sa/3.0/legalcode'
               WHEN 4 THEN 'https://creativecommons.org/licenses/by-nd-nc/1.0/'
               WHEN 5 THEN 'https://creativecommons.org/licenses/by-nc/2.1/jp/'
               WHEN 6 THEN 'https://example.com/licenses/by/4.0/'
               ELSE 'not a url' END AS url_raw
      FROM orders
    ),
    fixed AS (
      SELECT o_orderkey,
             CASE WHEN regexp_matches(lower(trim(url_raw)), '^[a-z][a-z0-9+.\\-]*://')
                  THEN regexp_replace(lower(trim(url_raw)), '^[a-z][a-z0-9+.\\-]*://', 'https://')
                  ELSE 'https://' || lower(trim(url_raw)) END AS u0
      FROM raw
    ),
    slashed AS (
      SELECT o_orderkey,
             CASE WHEN u0 LIKE '%/' THEN u0 ELSE u0 || '/' END AS u
      FROM fixed
    ),
    frag AS (
      SELECT o_orderkey, regexp_extract(u, '{frag_re}', 1) AS f FROM slashed
    ),
    pm AS (SELECT * FROM (VALUES
      {path_rows}) AS v(path, license, license_version))
    SELECT fr.o_orderkey, pm.license, pm.license_version
    FROM frag fr LEFT JOIN pm ON pm.path = fr.f
    """


@register("clean_license_from_url", _license_from_url_oracle())
def clean_license_from_url(spark, sf_dir):
    """P11, URL direction (licenses.py:87-134): scheme force, slash
    repair, creativecommons.org host check, recognized-path match (extra
    deed/legalcode suffixes tolerated), literal path->pair map lookup —
    including the historical by-nd-nc 1.0 naming and jurisdiction 2.1
    paths. One codegen projection, no join, no UDF; the non-CC and
    garbage URLs fall out as NULL pairs (P2 then drops them)."""
    from openverse_catalog_spark.functions.licenses import license_from_url_expr

    o = _t(spark, sf_dir, "orders")["orders"]
    k = F.col("o_orderkey")
    raw = o.select(
        "o_orderkey",
        F.when(k % 8 == 0, "https://creativecommons.org/licenses/by/4.0/")
        .when(k % 8 == 1, "http://creativecommons.org/licenses/by-nc/2.0")
        .when(k % 8 == 2, "creativecommons.org/publicdomain/zero/1.0/")
        .when(k % 8 == 3, "HTTPS://CREATIVECOMMONS.ORG/licenses/by-sa/3.0/legalcode")
        .when(k % 8 == 4, "https://creativecommons.org/licenses/by-nd-nc/1.0/")
        .when(k % 8 == 5, "https://creativecommons.org/licenses/by-nc/2.1/jp/")
        .when(k % 8 == 6, "https://example.com/licenses/by/4.0/")
        .otherwise("not a url")
        .alias("url_raw"),
    )
    pair = license_from_url_expr(F.col("url_raw"))
    return raw.select(
        "o_orderkey",
        pair["license"].alias("license"),
        pair["license_version"].alias("license_version"),
    )


# --- stored-TSV re-clean (maintenance job) ---------------------------------
# The reference's tsv_cleaner (catalog/dags/common/tsv_cleaner.py:30-62)
# re-runs every stored TSV row through the ImageStore cleaning path. Here:
# serialize dirty rows to TSV lines (\N null sentinel), parse them back
# with the tolerant reader, and push the batch through clean_media_batch —
# one DataFrame job, no per-row Python.


def _stored_tsv_oracle() -> str:
    dim_rows = ",\n      ".join(
        f"('{lic}', '{ver}', '{url}')" for lic, ver, url in license_pairs()
    )
    return f"""
    WITH ks AS (SELECT o_orderkey AS k FROM orders),
    fields AS (
      SELECT k,
        CASE WHEN k % 31 = 0 THEN NULL ELSE 'f' || CAST(k AS VARCHAR) END AS fid,
        'http://site/p/' || CAST(k AS VARCHAR) AS landing,
        CASE WHEN k % 29 = 0 THEN NULL
             ELSE 'http://img.site/i' || CAST(k AS VARCHAR) ||
                  CASE k % 5 WHEN 0 THEN '.JPG' WHEN 1 THEN '.jpeg'
                             WHEN 2 THEN '.png' WHEN 3 THEN '.svg'
                             ELSE '.txt' END END AS url,
        CASE k % 7 WHEN 0 THEN 'BY' WHEN 1 THEN 'by-nc-sa' WHEN 2 THEN 'cc0'
                   WHEN 3 THEN 'by-nd' WHEN 4 THEN 'PDM' WHEN 5 THEN 'junklicense'
                   ELSE ' By-Sa ' END AS lic_raw,
        CASE k % 7 WHEN 0 THEN '2.0' WHEN 1 THEN '4' WHEN 2 THEN CAST(NULL AS VARCHAR)
                   WHEN 3 THEN '5.0' WHEN 4 THEN '1.00' WHEN 5 THEN '1.0'
                   ELSE '3.0' END AS ver_raw,
        '  T' || CAST(k AS VARCHAR) || '  "x"  q  ' AS title_raw,
        'prov' || CAST(k % 4 AS VARCHAR) AS provider
      FROM ks),
    norm AS (
      SELECT *, lower(trim(lic_raw)) AS lic,
             COALESCE(
               CASE WHEN try_cast(ver_raw AS DOUBLE) IS NOT NULL THEN
                 CAST(CAST(floor(try_cast(ver_raw AS DOUBLE)) AS BIGINT) AS VARCHAR)
                 || '.' ||
                 CAST(CAST((try_cast(ver_raw AS DOUBLE)
                            - floor(try_cast(ver_raw AS DOUBLE))) * 10 AS INT) AS VARCHAR)
               END,
               CASE WHEN lower(trim(lic_raw)) IN ('cc0', 'pdm') THEN '1.0'
                    WHEN lower(trim(lic_raw)) = 'publicdomain' THEN 'N/A' END) AS ver
      FROM fields),
    dim(lic_d, ver_d, url_d) AS (VALUES {dim_rows}),
    valid AS (SELECT norm.*, url_d AS license_url FROM norm
              JOIN dim ON lic = lic_d AND ver = ver_d),
    ft AS (
      SELECT *,
        CASE WHEN lower(regexp_extract(url, '\\.(\\w{{1,5}})([?#].*)?$', 1)) = 'jpeg' THEN 'jpg'
             WHEN lower(regexp_extract(url, '\\.(\\w{{1,5}})([?#].*)?$', 1)) = 'tif' THEN 'tiff'
             ELSE lower(regexp_extract(url, '\\.(\\w{{1,5}})([?#].*)?$', 1)) END AS ext
      FROM valid)
    SELECT fid AS foreign_identifier, provider, lic AS license,
           ver AS license_version,
           replace(trim(regexp_replace(title_raw, '\\s+', ' ', 'g')), '"', '''') AS title,
           provider AS source,
           CASE WHEN ext IN ('jpg', 'png', 'gif', 'svg', 'tiff', 'webp', 'bmp')
                THEN ext END AS filetype,
           license_url
    FROM ft WHERE fid IS NOT NULL AND url IS NOT NULL
    """


@register("clean_stored_tsv", _stored_tsv_oracle())
def clean_stored_tsv(spark, sf_dir):
    """Stored-TSV re-clean (reference tsv_cleaner.py:30-62): dirty rows
    are serialized to TSV lines with the \\N null sentinel, read back via
    the same from_csv path the S4 loader uses, widened to the full
    staging schema, and re-cleaned by clean_media_batch (sanitize ->
    license normalize -> source/filetype defaults -> required drop).
    One Arrow-free codegen pass over the lines; the only non-projection
    work is the required-row filter."""
    from openverse_catalog_spark.plans.media_pipeline import clean_media_batch
    from openverse_catalog_spark.schemas.columns import IMAGE_TSV_COLUMNS

    o = _t(spark, sf_dir, "orders")["orders"]
    k = F.col("o_orderkey")
    null_s = F.lit(r"\N")
    line = F.concat_ws(
        "\t",
        F.coalesce(
            F.when(k % 31 != 0, F.concat(F.lit("f"), k.cast("string"))), null_s
        ),
        F.concat(F.lit("http://site/p/"), k.cast("string")),
        F.coalesce(
            F.when(
                k % 29 != 0,
                F.concat(
                    F.lit("http://img.site/i"),
                    k.cast("string"),
                    F.when(k % 5 == 0, ".JPG")
                    .when(k % 5 == 1, ".jpeg")
                    .when(k % 5 == 2, ".png")
                    .when(k % 5 == 3, ".svg")
                    .otherwise(".txt"),
                ),
            ),
            null_s,
        ),
        F.when(k % 7 == 0, "BY")
        .when(k % 7 == 1, "by-nc-sa")
        .when(k % 7 == 2, "cc0")
        .when(k % 7 == 3, "by-nd")
        .when(k % 7 == 4, "PDM")
        .when(k % 7 == 5, "junklicense")
        .otherwise(" By-Sa "),
        F.coalesce(
            F.when(k % 7 == 0, "2.0")
            .when(k % 7 == 1, "4")
            .when(k % 7 == 3, "5.0")
            .when(k % 7 == 4, "1.00")
            .when(k % 7 == 5, "1.0")
            .when(k % 7 == 6, "3.0"),
            null_s,
        ),
        F.concat(F.lit("  T"), k.cast("string"), F.lit('  "x"  q  ')),
        F.concat(F.lit("prov"), (k % 4).cast("string")),
    )
    # The stored-TSV lines arrive as one small blob locally (a single
    # parquet row-group -> 1 partition), but the per-row work downstream
    # (from_csv + the full sanitize/normalize expression chain) is the
    # expensive part — spread it across the cluster before parsing, the
    # way the reference's real TSVs arrive pre-split in S3 parts. The
    # checkpoint is REQUIRED, not just nice — it cuts lineage AFTER the
    # from_csv parse, which fixes two measured pathologies at once:
    # (1) a plain repartition lets Catalyst push the parse+required-
    # filter back into the single-partition scan (12 s -> 26 s), and
    # (2) projection collapse inlines from_csv(line) into EVERY leaf of
    # the sanitize expression tree, so the CSV parse re-runs dozens of
    # times per row. With the parsed 7-column frame pinned, downstream
    # clean expressions reference materialized columns (12 s -> ~1 s).
    lines = o.select(line.alias("line")).repartition(
        spark.sparkContext.defaultParallelism
    )
    parsed = lines.select(
        F.from_csv(
            "line",
            "foreign_identifier STRING, foreign_landing_url STRING, url STRING, "
            "license STRING, license_version STRING, title STRING, provider STRING",
            {"sep": "\t", "nullValue": r"\N"},
        ).alias("r")
    ).select("r.*").localCheckpoint(eager=False)
    staging = parsed.select(
        *[
            F.col(c.name) if c.name in parsed.columns
            else F.lit(None).cast(c.spark_type).alias(c.name)
            for c in IMAGE_TSV_COLUMNS
        ]
    )
    cleaned = clean_media_batch(staging, spark, "image")
    return cleaned.select(
        "foreign_identifier",
        "provider",
        "license",
        "license_version",
        "title",
        "source",
        "filetype",
        F.element_at(F.col("meta_data"), "license_url").alias("license_url"),
    )


# --- pending-media report (media x reports join) ---------------------------
# Reference report_pending_reported_media.py:72-80 counts DISTINCT urls of
# pending reports per reason. The two-table form: reports reference media
# by identifier; the url lives on the media table, so the report joins
# media (big) to reports (small) — broadcast the reports side.

_REPORTS_SQL = """
  SELECT o_orderkey AS report_id,
         o_custkey AS media_key,
         CASE o_orderkey % 4 WHEN 0 THEN 'mature' WHEN 1 THEN 'dmca'
                             WHEN 2 THEN 'other' ELSE 'illegal' END AS reason,
         CASE WHEN o_orderkey % 3 = 0 THEN 'pending_review' ELSE 'reviewed' END AS status
  FROM orders WHERE o_orderkey % 11 = 0
"""

_MEDIA_URL_SQL = """
  SELECT c_custkey AS media_key,
         'http://m/' || CAST(c_custkey % 1100 AS VARCHAR) AS url
  FROM customer
"""


@register(
    "agg_pending_reports",
    f"""
    WITH reports AS ({_REPORTS_SQL}),
    media AS ({_MEDIA_URL_SQL})
    SELECT r.reason, CAST(COUNT(DISTINCT m.url) AS BIGINT) AS pending_url_count
    FROM reports r JOIN media m USING (media_key)
    WHERE r.status = 'pending_review'
    GROUP BY r.reason
    """,
)
def agg_pending_reports(spark, sf_dir):
    """Pending-media report (report_pending_reported_media.py:72-80) in
    two-table join form: the (small) reports table is filtered to
    pending_review, broadcast, and joined to the media table to fetch
    urls; COUNT(DISTINCT url) per reason. The media side never shuffles
    for the join — only the distinct-url aggregate moves data, and it
    moves (reason, url) pairs, not media rows."""
    t = _t(spark, sf_dir, "orders", "customer")
    o, c = t["orders"], t["customer"]
    k = F.col("o_orderkey")
    reports = o.filter(k % 11 == 0).select(
        F.col("o_custkey").alias("media_key"),
        F.when(k % 4 == 0, "mature")
        .when(k % 4 == 1, "dmca")
        .when(k % 4 == 2, "other")
        .otherwise("illegal")
        .alias("reason"),
        F.when(k % 3 == 0, "pending_review").otherwise("reviewed").alias("status"),
    )
    media = c.select(
        F.col("c_custkey").alias("media_key"),
        F.concat(F.lit("http://m/"), (F.col("c_custkey") % 1100).cast("string")).alias(
            "url"
        ),
    )
    pending = F.broadcast(reports.filter(F.col("status") == "pending_review"))
    return (
        media.join(pending, "media_key")
        .groupBy("reason")
        .agg(F.count_distinct("url").alias("pending_url_count"))
    )


# --- sub-provider retro-attribution + audit --------------------------------
#
# The reference attributes Flickr Commons institutions as sub-providers
# two ways: at parse time (flickr.py:249-253, owner nsid looked up in
# prov.FLICKR_SUB_PROVIDERS) and retroactively over the already-loaded
# catalog (retired/update_workflows/update_sql.py: a temp
# (creator_url, sub_provider) table joined into an UPDATE ... SET source).
# A maintenance audit (flickr_audit_sub_provider_workflow.py:45-153)
# counts each institution's CC-licensed images and suggests new
# sub-providers above a minimum count.

_SUB_PROV_DIM = [
    (3, "nasa"),
    (7, "bio_diversity"),
    (11, "spacex"),
    (19, "woc_tech"),
]

_SUB_PROV_DIM_SQL = "SELECT * FROM (VALUES " + ", ".join(
    f"('https://www.flickr.com/photos/u{n}', '{s}')" for n, s in _SUB_PROV_DIM
) + ") AS v(creator_url, sub_provider)"


@register(
    "clean_sub_provider_update",
    f"""
    WITH catalog AS (
      SELECT o_orderkey,
             CASE WHEN o_custkey % 3 = 0 THEN 'flickr' ELSE 'wikimedia' END
               AS provider,
             'https://www.flickr.com/photos/u' || CAST(o_custkey % 50 AS VARCHAR)
               AS creator_url,
             CASE WHEN o_custkey % 3 = 0 THEN 'flickr' ELSE 'wikimedia' END
               AS source
      FROM orders),
    dim AS ({_SUB_PROV_DIM_SQL})
    SELECT c.o_orderkey, c.provider, c.creator_url,
           CASE WHEN c.provider = 'flickr' AND d.sub_provider IS NOT NULL
                THEN d.sub_provider ELSE c.source END AS source,
           (c.provider = 'flickr' AND d.sub_provider IS NOT NULL) AS updated
    FROM catalog c LEFT JOIN dim d ON c.creator_url = d.creator_url
    """,
)
def clean_sub_provider_update(spark, sf_dir):
    """Retroactive sub-provider migration (retired update_sql.py): build
    the (creator_url, sub_provider) dimension from the configured nsid
    sets, broadcast it against the catalog, and rewrite source for
    matching provider='flickr' rows — the reference runs one UPDATE per
    sub-provider through a temp table; here it is a single broadcast
    left join + conditional overwrite, one map-side pass over the
    catalog with zero shuffles at any scale."""
    o = _t(spark, sf_dir, "orders")["orders"]
    provider = F.when(F.col("o_custkey") % 3 == 0, "flickr").otherwise("wikimedia")
    catalog = o.select(
        "o_orderkey",
        provider.alias("provider"),
        F.concat(
            F.lit("https://www.flickr.com/photos/u"),
            (F.col("o_custkey") % 50).cast("string"),
        ).alias("creator_url"),
        provider.alias("source"),
    )
    # the dim is a literal VALUES relation, not createDataFrame: a
    # python-RDD-backed 4-row frame costs a Python worker round-trip
    # (Scan ExistingRDD) on EVERY invocation, ~0.3s of pure overhead on
    # a query whose real work is one map-side pass (r7 A/B finding)
    dim = spark.sql(_SUB_PROV_DIM_SQL)
    hit = (F.col("provider") == "flickr") & F.col("sub_provider").isNotNull()
    return (
        catalog.join(F.broadcast(dim), "creator_url", "left")
        .select(
            "o_orderkey",
            "provider",
            "creator_url",
            F.when(hit, F.col("sub_provider")).otherwise(F.col("source")).alias(
                "source"
            ),
            hit.alias("updated"),
        )
    )


@register(
    "agg_sub_provider_audit",
    f"""
    WITH dim AS ({_SUB_PROV_DIM_SQL}),
    cc AS (
      SELECT user_id % 50 AS nsid, count(*) AS cc_count
      FROM events
      WHERE value >= 1 AND user_id % 50 <> 13
      GROUP BY user_id % 50
    )
    SELECT cc.nsid, 'institution_' || CAST(cc.nsid AS VARCHAR) AS name, cc.cc_count
    FROM cc
    LEFT JOIN dim d
      ON d.creator_url = 'https://www.flickr.com/photos/u' || CAST(cc.nsid AS VARCHAR)
    WHERE d.sub_provider IS NULL AND cc.cc_count >= 190
    """,
)
def agg_sub_provider_audit(spark, sf_dir):
    """Sub-provider audit (flickr_audit_sub_provider_workflow.py:119-153):
    count CC-licensed images per institution nsid, drop the skip-list,
    drop institutions already configured as sub-providers (anti
    semantics via broadcast left join + NULL filter), and suggest those
    above minimum_image_count (the reference uses 300; scaled to 190
    for the synthetic distribution so the gate discriminates). One
    shuffle on a small key space with map-side partials; the configured
    dimension broadcasts."""
    e = _t(spark, sf_dir, "events")["events"]
    nsid = (F.col("user_id") % 50).alias("nsid")
    cc = (
        e.filter((F.col("value") >= 1) & (F.col("user_id") % 50 != 13))
        .groupBy(nsid)
        .agg(F.count(F.lit(1)).alias("cc_count"))
    )
    dim = spark.sql(_SUB_PROV_DIM_SQL)  # literal VALUES: LocalTableScan,
    # no per-call Python-RDD round-trip (see clean_sub_provider_update)
    return (
        cc.join(
            F.broadcast(dim),
            F.concat(
                F.lit("https://www.flickr.com/photos/u"),
                F.col("nsid").cast("string"),
            )
            == dim.creator_url,
            "left",
        )
        .filter(F.col("sub_provider").isNull() & (F.col("cc_count") >= 190))
        .select(
            "nsid",
            F.concat(F.lit("institution_"), F.col("nsid").cast("string")).alias(
                "name"
            ),
            "cc_count",
        )
    )


# --- orchestration surface: workflow DAG specs -----------------------------


def _dag_spec_rows():
    """(dag_id, schedule, dated, media_types, n_tasks, task_chain) per
    registered workflow — flat projection of workflow_dag_specs()."""
    from openverse_catalog_spark.sources.workflows import workflow_dag_specs

    rows = []
    for s in workflow_dag_specs():
        rows.append(
            (
                s["dag_id"],
                s["schedule"],
                s["dated"],
                ",".join(s["media_types"]),
                len(s["tasks"]),
                ">".join(t["task_id"] for t in s["tasks"]),
            )
        )
    return rows


def _dag_spec_oracle() -> str:
    """The oracle is the registry itself rendered as literal VALUES: the
    gate then pins that the EMITTER (workflow_dag_spec's task-graph
    construction) reproduces the registry's configuration facts
    faithfully through a Spark roundtrip."""
    from openverse_catalog_spark.sources.workflows import (
        PROVIDER_WORKFLOWS,
    )

    vals = []
    for wf in sorted(PROVIDER_WORKFLOWS, key=lambda w: w.dag_id):
        mts = ",".join(wf.media_types)
        if wf.adapter_cls is None:
            chain, n = "ingest_bulk>report", 2
        else:
            mids = [(f"clean_{m}", f"merge_{m}") for m in wf.media_types]
            chain = ">".join(
                ["pull_data"] + [t for pair in mids for t in pair] + ["report"]
            )
            n = 2 + 2 * len(wf.media_types)
        vals.append(
            f"('{wf.dag_id}', '{wf.schedule}', {str(wf.dated).upper()}, "
            f"'{mts}', {n}, '{chain}')"
        )
    return (
        "SELECT * FROM (VALUES " + ", ".join(vals) + ") AS t(dag_id, "
        "schedule, dated, media_types, n_tasks, task_chain)"
    )


@register("workflow_dag_specs", _dag_spec_oracle())
def workflow_dag_specs_query(spark, sf_dir):
    """The orchestration surface as data: one row per provider workflow
    with its schedule facts and emitted task chain (provider_dag_factory
    analog; structural pins in tests/test_providers_ext.py). Driver-side
    literal frame — config metadata, not table compute."""
    return literal_df(spark, 
        _dag_spec_rows(),
        "dag_id string, schedule string, dated boolean, media_types string, "
        "n_tasks int, task_chain string",
    )
