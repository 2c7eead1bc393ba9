"""Column-spec cleaning semantics — re-expression of the reference's
``test_columns.py`` (prepare_string per type) and ``test_media.py``
(tag enrichment, meta_data injection) unit coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from openverse_catalog_spark.functions.cleaning import (
    clean_tags_expr,
    default_source_expr,
    enrich_meta_data_expr,
    extract_filetype_expr,
    unify_filetype_expr,
)
from openverse_catalog_spark.functions.licenses import (
    canonical_version_expr,
    license_url_from_pair,
    normalize_license,
)
from openverse_catalog_spark.schemas.columns import (
    PG_INT_MAX,
    clean_bool_expr,
    clean_int_expr,
    clean_string_expr,
    pg_int4_guard,
)


def one(spark, expr, value, typ="string"):
    df = spark.createDataFrame([(value,)], f"v {typ}")
    return df.select(expr(F.col("v")).alias("out")).first()["out"]


def test_string_whitespace_collapse(spark):
    got = one(spark, lambda c: clean_string_expr(c, None, False), "a \t\n b  c")
    assert got == "a b c"


def test_string_quote_swap_and_empty_null(spark):
    assert one(spark, lambda c: clean_string_expr(c, None, False), 'say "hi"') == "say 'hi'"
    assert one(spark, lambda c: clean_string_expr(c, None, False), "   ") is None


def test_char_limit_truncate_vs_nullout(spark):
    long = "x" * 100
    assert one(spark, lambda c: clean_string_expr(c, 10, True), long) == "x" * 10
    assert one(spark, lambda c: clean_string_expr(c, 10, False), long) is None


def test_int_coercion(spark):
    assert one(spark, clean_int_expr, "42.9") == 42
    assert one(spark, clean_int_expr, "-3.7") == -3
    assert one(spark, clean_int_expr, "garbage") is None


def test_pg_int4_guard(spark):
    assert one(spark, lambda c: pg_int4_guard(c.cast("long")), str(PG_INT_MAX + 1)) is None
    assert one(spark, lambda c: pg_int4_guard(c.cast("long")), "100") == 100


def test_bool_coercion(spark):
    assert one(spark, clean_bool_expr, "t") is True
    assert one(spark, clean_bool_expr, "FALSE") is False
    assert one(spark, clean_bool_expr, "maybe") is None


def test_filetype_extract_and_unify(spark):
    valid = ("jpg", "png", "tiff")
    assert one(spark, lambda c: extract_filetype_expr(c, valid), "http://x/a.JPEG?q=1") == "jpg"
    assert one(spark, lambda c: extract_filetype_expr(c, valid), "http://x/a.TIF") == "tiff"
    assert one(spark, lambda c: extract_filetype_expr(c, valid), "http://x/a.exe") is None
    assert one(spark, unify_filetype_expr, "JPEG") == "jpg"


def test_tag_blacklist_and_enrichment(spark):
    df = spark.createDataFrame(
        [(["Nature", "no person", "uploaded:by=flickr", "cc0", "Nature", " sky "],)],
        "tags array<string>",
    )
    out = df.select(
        clean_tags_expr(F.col("tags"), F.lit("flickr")).alias("t")
    ).first()["t"]
    assert [(t["name"], t["provider"]) for t in out] == [
        ("Nature", "flickr"),
        ("sky", "flickr"),
    ]


def test_meta_data_enrichment(spark):
    df = spark.createDataFrame(
        [({"views": "10", "license_url": "stale"},)], "m map<string,string>"
    )
    out = df.select(
        enrich_meta_data_expr(
            F.col("m"), F.lit("https://cc/by/4.0/"), F.lit(None).cast("string")
        ).alias("o")
    ).first()["o"]
    assert out == {
        "views": "10",
        "license_url": "https://cc/by/4.0/",
        "raw_license_url": "https://cc/by/4.0/",
    }


def test_default_source(spark):
    df = spark.createDataFrame([("", "flickr"), ("sub", "flickr")], "s string, p string")
    out = df.select(default_source_expr(F.col("s"), F.col("p")).alias("o")).collect()
    assert [r["o"] for r in out] == ["flickr", "sub"]


def test_license_version_canonicalization(spark):
    assert one(spark, canonical_version_expr, "2") == "2.0"
    assert one(spark, canonical_version_expr, "4.00") == "4.0"
    assert one(spark, canonical_version_expr, "junk") is None


def test_license_url_from_pair(spark):
    df = spark.createDataFrame([("by", "4.0"), ("cc0", "1.0")], "l string, v string")
    out = df.select(license_url_from_pair(F.col("l"), F.col("v")).alias("u")).collect()
    assert out[0]["u"] == "https://creativecommons.org/licenses/by/4.0/"
    assert out[1]["u"] == "https://creativecommons.org/publicdomain/zero/1.0/"


def test_normalize_license_validates_pairs(spark):
    df = spark.createDataFrame(
        [("BY", "4.0"), ("by-nc", "2"), ("bogus", "1.0"), ("CC0", None)],
        "license string, license_version string",
    )
    out = normalize_license(df, spark).collect()
    got = [(r["license"], r["license_version"]) for r in out]
    assert ("by", "4.0") in got
    assert ("by-nc", "2.0") in got
    assert ("cc0", "1.0") in got
    assert (None, None) in got  # bogus license nulled out -> dropped later


def test_url_upgrade_semantics(spark):
    from openverse_catalog_spark.functions.urls import upgrade_url

    rows = [
        (1, "http://example.com/a"),     # TLS-capable -> https
        (2, "example.org/b"),            # schemeless TLS -> https://
        (3, "http://unknown-site.org/c"),  # not in table -> unchanged
        (4, "bare.info/d"),              # schemeless non-TLS -> http://
        (5, "not a url"),                # no tld -> NULL
        (6, "ftp://example.com/e"),      # non-http scheme untouched
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r["id"]: r["url"] for r in upgrade_url(df, spark, "url").collect()}
    assert got[1] == "https://example.com/a"
    assert got[2] == "https://example.org/b"
    assert got[3] == "http://unknown-site.org/c"
    assert got[4] == "http://bare.info/d"
    assert got[5] is None
    assert got[6] == "ftp://example.com/e"


def test_license_normalize_pairs(spark):
    from openverse_catalog_spark.functions.licenses import normalize_license

    rows = [
        (1, " By ", "2"),        # trim/lower + version canonicalization
        (2, "cc0", None),        # special default version
        (3, "by-nd", "5.0"),     # invalid pair -> nulls
        (4, "nonsense", "1.0"),  # unknown license -> nulls
    ]
    df = spark.createDataFrame(rows, "id long, license string, license_version string")
    out = {r["id"]: r for r in normalize_license(df, spark).collect()}
    assert (out[1]["license"], out[1]["license_version"]) == ("by", "2.0")
    assert out[1]["license_url"] == "https://creativecommons.org/licenses/by/2.0/"
    assert (out[2]["license"], out[2]["license_version"]) == ("cc0", "1.0")
    assert out[3]["license"] is None and out[3]["license_version"] is None
    assert out[4]["license"] is None


def test_values_dim_literal_relation(spark):
    """values_dim plans as a LocalTableScan (no python-RDD scan: the
    whole point is skipping the per-call Python worker round-trip) and
    round-trips types/NULLs/quotes exactly like createDataFrame."""
    from openverse_catalog_spark.functions.dims import values_dim

    rows = [
        ("o'brien", 1, 2.5, True, None),
        ("plain", -3, 0.0, False, "x"),
    ]
    schema = "name string, n int, v double, flag boolean, note string"
    df = values_dim(spark, rows, schema)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan and "ExistingRDD" not in plan
    ref = spark.createDataFrame(rows, schema)
    # names and types match createDataFrame; nullability may be TIGHTER
    # (VALUES proves a column never-null — strictly more planner info)
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in ref.schema.fields
    ]
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, ref.collect())
    )
    # zero rows: an empty relation with the right schema (an empty
    # blocklist is a valid dimension — createDataFrame contract)
    empty = values_dim(spark, [], schema)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        f.name for f in ref.schema.fields
    ]
    # parameterized types survive the DDL split (cells stay in the
    # supported scalar set; complex-typed columns can carry NULL)
    dec = values_dim(
        spark, [(1.5, None)],
        "amt decimal(10,2), kv map<string,int>",
    )
    row = dec.collect()[0]
    assert str(row["amt"]) == "1.50" and row["kv"] is None
    assert dict(dec.dtypes) == {
        "amt": "decimal(10,2)", "kv": "map<string,int>",
    }
    # backslashes survive Spark's string-literal unescaping, and
    # non-finite floats round-trip (repr would render bare identifiers)
    import math

    tricky = values_dim(
        spark,
        [("a\\b", float("nan")), ("c:\\tmp\\x", float("-inf"))],
        "s string, f double",
    ).collect()
    assert tricky[0]["s"] == "a\\b" and math.isnan(tricky[0]["f"])
    assert tricky[1]["s"] == "c:\\tmp\\x"
    assert tricky[1]["f"] == float("-inf")
