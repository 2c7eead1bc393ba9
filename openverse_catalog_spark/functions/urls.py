"""URL validation / scheme upgrade as pure expressions + a broadcast
domain table.

Reference: ``catalog/dags/common/urls.py:20-59`` (scheme addition + tld
sanity check), ``:87-123`` (scheme repair), ``:109-136`` (per-domain live
TLS probe). The probe is re-designed for scale: network calls inside
executors are a non-starter at 100 TB, so https-support is a precomputed
``domain -> supports_tls`` dimension built offline (driver-side probes,
cached), broadcast-joined here. Everything row-level is a Catalyst
expression — the clean stage stays narrow and codegen'd.

Pinned semantics (deterministic, oracle-checkable):
  1. trim; empty -> NULL.
  2. extract domain = authority before the first ``/`` (after any scheme).
  3. tld sanity: domain must match ``name.tld`` with an alphabetic tld of
     >= 2 chars, else the URL is invalid -> NULL (urls.py:44-52).
  4. missing scheme -> ``https://`` if the domain is in the TLS table,
     else ``http://`` (urls.py:20-41 + probe).
  5. ``http://`` -> ``https://`` when the domain is in the TLS table
     (urls.py:87-123); any other scheme is left untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Demo TLS-capable domains; in production this dimension is the cached
# output of the offline probe job (reference urls.py:126-136).
TLS_DOMAINS = (
    "example.com",
    "example.org",
    "secure.net",
    "www.flickr.com",
    "commons.wikimedia.org",
)

_DOMAIN_RE = r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?([^/?#]+)"
_TLD_RE = r"\.[A-Za-z]{2,}$"


def tls_dim(spark: SparkSession, domains: tuple[str, ...] = TLS_DOMAINS) -> DataFrame:
    from openverse_catalog_spark.functions.dims import values_dim

    return values_dim(
        spark, [(d,) for d in domains], "__tls_domain string"
    )


def domain_expr(url: Column) -> Column:
    """Authority component (host[:port]) of a URL-ish string."""
    return F.regexp_extract(F.trim(url), _DOMAIN_RE, 1)


def upgrade_url(
    df: DataFrame,
    spark: SparkSession,
    url_col: str,
    out_col: str | None = None,
    domains: tuple[str, ...] = TLS_DOMAINS,
) -> DataFrame:
    """Add/repair the scheme of ``url_col`` per the pinned semantics.

    One broadcast hash join against the TLS dimension (no shuffle of the
    fact side), then pure expressions.
    """
    out_col = out_col or url_col
    u = F.trim(F.col(url_col))
    dom = domain_expr(F.col(url_col))
    joined = df.withColumn("__dom", dom).join(
        F.broadcast(tls_dim(spark, domains)),
        F.col("__dom") == F.col("__tls_domain"),
        "left",
    )
    tls = F.col("__tls_domain").isNotNull()
    has_scheme = u.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    valid = (u != "") & F.col("__dom").rlike(_TLD_RE)
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    upgraded = (
        F.when(~valid, F.lit(None).cast("string"))
        .when(~has_scheme & tls, F.concat(F.lit("https://"), u))
        .when(~has_scheme, F.concat(F.lit("http://"), u))
        .when(u.startswith("http://") & tls, F.concat(F.lit("https://"), rest))
        .otherwise(u)
    )
    return joined.withColumn(out_col, upgraded).drop("__dom", "__tls_domain")
