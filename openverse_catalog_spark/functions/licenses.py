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

# Canonical CC license pairs (public creativecommons.org structure; the
# reference's equivalents live in catalog/dags/common/licenses/constants.py).
# path fragment -> (license, version); "N/A" versions resolve via special-case.
_CC_LICENSES = ["by", "by-sa", "by-nc", "by-nd", "by-nc-sa", "by-nc-nd"]
_CC_VERSIONS = ["1.0", "2.0", "2.5", "3.0", "4.0"]
_SPECIAL = {
    # license -> fixed version (cc0/pdm have single versions)
    "cc0": "1.0",
    "pdm": "1.0",
    "publicdomain": "1.0",
}


def license_pairs() -> list[tuple[str, str, str]]:
    """(license, version, canonical_url) for every valid pair."""
    rows = []
    for lic in _CC_LICENSES:
        for ver in _CC_VERSIONS:
            rows.append((lic, ver, f"https://creativecommons.org/licenses/{lic}/{ver}/"))
    rows.append(("cc0", "1.0", "https://creativecommons.org/publicdomain/zero/1.0/"))
    rows.append(("pdm", "1.0", "https://creativecommons.org/publicdomain/mark/1.0/"))
    return rows


def license_dim(spark: SparkSession) -> DataFrame:
    """Tiny broadcastable dimension of valid (license, version, url)."""
    return spark.createDataFrame(
        license_pairs(), "license string, license_version string, license_url string"
    )


def canonical_version_expr(version: Column) -> Column:
    """``str(float(v))`` canonicalization (licenses.py:212-226): '2' -> '2.0',
    '4.00' -> '4.0'; non-numeric -> NULL."""
    d = version.cast("string").try_cast("double")
    return F.when(d.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(F.floor(d).cast("string"), F.lit("."), ((d - F.floor(d)) * 10).cast("int").cast("string"))
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

    The pair set is the static cross product ``_CC_LICENSES x _CC_VERSIONS``
    plus the two fixed public-domain pairs, so validity compiles to pure
    ``isin`` expressions — no join operator at all, the row stays inside one
    whole-stage-codegen span. (``spark`` is accepted for signature
    compatibility; nothing driver-side is needed.)
    """
    lic = F.lower(F.trim(F.col(license_col)))
    ver = F.coalesce(
        canonical_version_expr(F.col(version_col)),
        # cc0/pdm tolerate missing version -> fixed 1.0
        F.when(lic.isin(*_SPECIAL.keys()), F.lit("1.0")),
    )
    valid = (lic.isin(_CC_LICENSES) & ver.isin(_CC_VERSIONS)) | (
        lic.isin("cc0", "pdm") & (ver == "1.0")
    )
    out_lic = F.when(valid, lic)
    out_ver = F.when(valid, ver)
    url = F.when(valid, license_url_from_pair(lic, ver))
    cols = []
    for c in df.columns:
        if c == license_col:
            cols.append(out_lic.alias(license_col))
        elif c == version_col:
            cols.append(out_ver.alias(version_col))
        else:
            cols.append(F.col(c))
    cols.append(url.alias("license_url"))
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


def license_url_from_pair(lic: Column, ver: Column) -> Column:
    """Derive the canonical URL from a valid (license, version) pair
    (licenses.py:191-209) as a pure expression."""
    return (
        F.when(lic == "cc0", F.lit("https://creativecommons.org/publicdomain/zero/1.0/"))
        .when(lic == "pdm", F.lit("https://creativecommons.org/publicdomain/mark/1.0/"))
        .when(
            lic.isNotNull() & ver.isNotNull(),
            F.concat(F.lit("https://creativecommons.org/licenses/"), lic, F.lit("/"), ver, F.lit("/")),
        )
    )
