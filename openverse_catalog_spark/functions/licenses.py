"""License normalization as broadcast-lookup + expressions.

Reference: ``catalog/dags/common/licenses/licenses.py`` — a
``LicenseInfo(license, version, url, raw_url)`` namedtuple derived either
from a license URL matched against the canonical creativecommons.org path
map (``licenses.py:87-134``, with scheme/trailing-slash repair
``:137-188``) or from a (license, version) pair (``:191-209``), with the
version canonicalized via ``str(float(v))`` (``:212-226``).

Spark design: the license pair/path data is a tiny dimension — we build it
driver-side, broadcast-join it, and keep all matching logic in Catalyst
expressions. No network, no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from openverse_catalog_spark.schemas.columns import let_

# Canonical CC license pairs, mirroring the reference's full recognized
# set (catalog/dags/common/licenses/constants.py): the live grid
# (_SIMPLE_LICENSE_PATHS :3-50), the 2.1 jurisdiction versions whose
# pair->URL falls back to unported 2.0 (_SPECIAL_REVERSE_ONLY_PATHS
# :96-102), the retired/unported families (nc, nc-sa, nd, nd-nc, sa,
# sampling, devnations...), and the special cases (:78-94 — by-nc-nd 1.0
# lives at the historical by-nd-nc path; publicdomain has version N/A).
_CC_LICENSES = ["by", "by-sa", "by-nc", "by-nd", "by-nc-sa", "by-nc-nd"]
_CC_VERSIONS = ["1.0", "2.0", "2.5", "3.0", "4.0"]
_RETIRED_PATHS = [
    ("devnations", "2.0", "licenses/devnations/2.0"),
    ("nc", "1.0", "licenses/nc/1.0"),
    ("nc", "2.0", "licenses/nc/2.0/jp"),
    ("nc-sa", "1.0", "licenses/nc-sa/1.0"),
    ("nc-sa", "2.0", "licenses/nc-sa/2.0/jp"),
    ("nc-sampling+", "1.0", "licenses/nc-sampling+/1.0"),
    ("nd", "1.0", "licenses/nd/1.0"),
    ("nd", "2.0", "licenses/nd/2.0/jp"),
    ("nd-nc", "1.0", "licenses/nd-nc/1.0"),
    ("nd-nc", "2.0", "licenses/nd-nc/2.0/jp"),
    ("sa", "1.0", "licenses/sa/1.0"),
    ("sa", "2.0", "licenses/sa/2.0/jp"),
    ("sampling+", "1.0", "licenses/sampling+/1.0"),
    ("sampling", "1.0", "licenses/sampling/1.0"),
    ("publicdomain", "N/A", "licenses/publicdomain"),
]
_SPECIAL = {
    # license -> fixed version when the version is absent
    "cc0": "1.0",
    "pdm": "1.0",
    "publicdomain": "N/A",
}
_BASE = "https://creativecommons.org/"


def license_pairs() -> list[tuple[str, str, str]]:
    """(license, version, canonical_url) for every valid pair the
    reference recognizes (constants.py get_reverse_license_path_map)."""
    rows = []
    for lic in _CC_LICENSES:
        for ver in _CC_VERSIONS:
            if (lic, ver) == ("by-nc-nd", "1.0"):
                # historical naming: 1.0-era path is by-nd-nc
                rows.append((lic, ver, f"{_BASE}licenses/by-nd-nc/1.0/"))
            elif (lic, ver) == ("by-nc-nd", "2.0"):
                # _SPECIAL_CASE_LICENSE_PATHS is dict.update()'d AFTER the
                # simple paths in get_reverse_license_path_map
                # (constants.py:119-126), so the special entry wins: the
                # canonical pair->URL for (by-nc-nd, 2.0) is the historical
                # jp-jurisdiction by-nd-nc path, not licenses/by-nc-nd/2.0/.
                rows.append((lic, ver, f"{_BASE}licenses/by-nd-nc/2.0/jp/"))
            else:
                rows.append((lic, ver, f"{_BASE}licenses/{lic}/{ver}/"))
        # 2.1 releases were jurisdiction-only; pair URL falls back to 2.0
        rows.append((lic, "2.1", f"{_BASE}licenses/{lic}/2.0/"))
    for lic, ver, path in _RETIRED_PATHS:
        rows.append((lic, ver, f"{_BASE}{path}/"))
    rows.append(("cc0", "1.0", f"{_BASE}publicdomain/zero/1.0/"))
    rows.append(("pdm", "1.0", f"{_BASE}publicdomain/mark/1.0/"))
    return rows


def license_dim(spark: SparkSession) -> DataFrame:
    """Tiny broadcastable dimension of valid (license, version, url) —
    a literal VALUES relation (LocalTableScan), not createDataFrame, so
    every clean query that joins it skips the per-call python-RDD
    round-trip."""
    from openverse_catalog_spark.functions.dims import values_dim

    return values_dim(
        spark, license_pairs(),
        "license string, license_version string, license_url string",
    )


def canonical_version_expr(version: Column) -> Column:
    """``str(float(v))`` canonicalization (licenses.py:212-226): '2' -> '2.0',
    '4.00' -> '4.0'; non-numeric -> NULL."""
    return let_(
        version.cast("string").try_cast("double"),
        lambda d: F.when(d.isNull(), F.lit(None).cast("string")).otherwise(
            F.concat(
                F.floor(d).cast("string"),
                F.lit("."),
                ((d - F.floor(d)) * 10).cast("int").cast("string"),
            )
        ),
    )


def normalize_license(
    df: DataFrame,
    spark: SparkSession | None = None,
    license_col: str = "license",
    version_col: str = "license_version",
) -> DataFrame:
    """Validate (license, version) against the canonical pair set; invalid
    pairs null out both columns (the required-field filter then drops the
    record — reference media.py:117-121, licenses.py:238-248). Adds
    ``license_url``.

    The pair set is the full reference-recognized list (license_pairs),
    compiled into a literal pair->URL map, so validity AND the canonical
    URL are one map lookup — no join operator at all, the row stays
    inside one whole-stage-codegen span. (``spark`` is accepted for
    signature compatibility; nothing driver-side is needed.)
    """
    # Nested let-bindings: lic, ver and the map lookup are each evaluated
    # once per row and reused as lambda-variable leaves — without this,
    # CollapseProject re-inlines the upstream sanitize chain into every
    # one of the ~10 references below and the stage falls out of codegen
    # (see let_'s docstring).
    packed = let_(
        F.lower(F.trim(F.col(license_col))),
        lambda lic: let_(
            F.coalesce(
                canonical_version_expr(F.col(version_col)),
                # cc0/pdm tolerate a missing version (fixed 1.0); the
                # retired publicdomain license is versionless (N/A) —
                # constants.py:84
                *[F.when(lic == l, F.lit(v)) for l, v in _SPECIAL.items()],
            ),
            lambda ver: let_(
                F.element_at(_pair_url_map(), F.concat_ws("|", lic, ver)),
                lambda url: F.struct(
                    F.when(url.isNotNull(), lic).alias("lic"),
                    F.when(url.isNotNull(), ver).alias("ver"),
                    url.alias("url"),
                ),
            ),
        ),
    )
    cols = []
    for c in df.columns:
        if c == license_col:
            cols.append(packed["lic"].alias(license_col))
        elif c == version_col:
            cols.append(packed["ver"].alias(version_col))
        else:
            cols.append(F.col(c))
    cols.append(packed["url"].alias("license_url"))
    return df.select(*cols)


def backfill_license_url(
    df: DataFrame,
    spark: SparkSession,
    license_col: str = "license",
    version_col: str = "license_version",
    url_col: str = "license_url",
) -> DataFrame:
    """Maintenance backfill (reference
    ``catalog/dags/maintenance/add_license_url.py:59-132``): rows whose
    ``license_url`` is missing get the canonical URL for their
    (license, version) pair; rows that already carry one are untouched
    (the reference's ``WHERE meta_data->>'license_url' IS NULL`` guard).
    Adds a ``backfilled`` flag so the job can report update counts.

    One broadcast hash join against the ~32-row pair dimension — the
    canonical table never shuffles, so the backfill is a single
    map-side pass at any scale."""
    dim = F.broadcast(
        license_dim(spark)
        .withColumnRenamed("license", "__lic")
        .withColumnRenamed("license_version", "__ver")
        .withColumnRenamed("license_url", "__canon_url")
    )
    joined = df.join(
        dim,
        (F.lower(F.trim(F.col(license_col))) == F.col("__lic"))
        & (F.col(version_col) == F.col("__ver")),
        "left",
    )
    return (
        joined.withColumn(
            "backfilled",
            F.col(url_col).isNull() & F.col("__canon_url").isNotNull(),
        )
        .withColumn(url_col, F.coalesce(F.col(url_col), F.col("__canon_url")))
        .drop("__lic", "__ver", "__canon_url")
    )


def _pair_url_map() -> Column:
    """Literal map pair-key -> canonical URL (reverse path map,
    constants.py:119-130). A compile-time literal: the whole lookup stays
    inside one codegen span, no join, no broadcast variable."""
    entries = []
    for lic, ver, url in license_pairs():
        entries.append(F.lit(f"{lic}|{ver}"))
        entries.append(F.lit(url))
    return F.create_map(*entries)


def license_url_from_pair(lic: Column, ver: Column) -> Column:
    """Derive the canonical URL from a valid (license, version) pair
    (licenses.py:191-209) as a pure map-literal lookup — exact for the
    special paths too (by-nd-nc 1.0, jurisdiction 2.0 variants, 2.1
    fallbacks), which a string-concat formula gets wrong."""
    return F.element_at(_pair_url_map(), F.concat_ws("|", lic, ver))


def license_path_entries() -> list[tuple[str, str, str]]:
    """(path_fragment, license, version) for every URL path the reference
    recognizes (constants.py get_license_path_map: simple :3-50,
    irreversible 2.1 jurisdiction :52-76, special cases :78-94)."""
    rows = []
    for lic in _CC_LICENSES:
        for ver in _CC_VERSIONS:
            if (lic, ver) == ("by-nc-nd", "1.0"):
                rows.append(("licenses/by-nd-nc/1.0", lic, ver))
            else:
                rows.append((f"licenses/{lic}/{ver}", lic, ver))
        for j in ("au", "es", "jp"):
            rows.append((f"licenses/{lic}/2.1/{j}", lic, "2.1"))
    for lic, ver, path in _RETIRED_PATHS:
        rows.append((path, lic, ver))
    rows.append(("licenses/by-nd-nc/2.0/jp", "by-nc-nd", "2.0"))
    rows.append(("licenses/mark/1.0", "pdm", "1.0"))
    rows.append(("publicdomain/zero/1.0", "cc0", "1.0"))
    rows.append(("publicdomain/mark/1.0", "pdm", "1.0"))
    return rows


_FRAG_RE = (
    # Anchored: the reference rejects any URL whose netloc is not
    # creativecommons.org (_get_valid_cc_url, licenses.py:170-175), so a
    # CC path embedded mid-string (e.g. in a redirect query param) must
    # NOT match.
    r"^https://creativecommons\.org/"
    r"((?:licenses/[a-z+\-]+/[0-9]\.[0-9](?:/(?:jp|au|es))?)"
    r"|publicdomain/(?:zero|mark)/1\.0"
    r"|licenses/publicdomain)"
)


def license_from_url_expr(url: Column) -> Column:
    """Derive struct(license, license_version) from a license URL — the
    reference's URL direction (licenses.py:87-134) minus the live
    redirect probe (urls.py rewrite — a network call; SURVEY §1.4 rules
    those out of executors): lowercase, force https scheme, ensure a
    trailing slash, require the creativecommons.org host, then match the
    recognized path fragment and look the pair up in the literal path
    map. Extra path suffixes (deed.xx, legalcode) are tolerated exactly
    like the reference's substring match."""
    u = F.lower(F.trim(url))
    u = F.when(
        u.rlike(r"^[a-z][a-z0-9+.\-]*://"),
        F.regexp_replace(u, r"^[a-z][a-z0-9+.\-]*://", "https://"),
    ).otherwise(F.concat(F.lit("https://"), u))
    u = F.when(u.endswith("/"), u).otherwise(F.concat(u, F.lit("/")))
    frag = F.regexp_extract(u, _FRAG_RE, 1)
    entries = []
    for path, lic, ver in license_path_entries():
        entries.append(F.lit(path))
        entries.append(F.lit(f"{lic}|{ver}"))
    pair = F.element_at(F.create_map(*entries), frag)
    return F.struct(
        F.split(pair, r"\|").getItem(0).alias("license"),
        F.split(pair, r"\|").getItem(1).alias("license_version"),
    )
