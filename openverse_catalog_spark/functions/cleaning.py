"""Record-level cleaning/enrichment expressions (the MediaStore layer).

Reference: ``catalog/dags/common/storage/media.py:94-171``
(``clean_media_metadata``) — license filter, required fields, url
upgrade, source defaulting, filetype extraction/unification, int4 guard,
tag blacklist + enrichment, meta_data enrichment. Every step here is a
Catalyst expression or broadcast join; the whole clean stage is one
narrow (shuffle-free) projection over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openverse_catalog_spark.schemas.columns import (
    ColumnSpec,
    Datatype,
    pg_int4_guard,
)

# Tag blacklist — reference media.py:17 (exact) and :21-34 (substring).
EXACT_BLACKLISTED_TAGS = {"no person", "squareformat"}
SUBSTRING_BLACKLISTED_TAGS = (
    "flickriosapp",
    "uploaded",
    ":",
    "=",
    "cc0",
    "by",
    "by-nc",
    "by-nd",
    "by-sa",
    "by-nc-nd",
    "by-nc-sa",
    "pdm",
)

# Default image category per provider — reference media.py:168-170 +
# provider_details.py:142-162 (category = record value OR this default).
DEFAULT_IMAGE_CATEGORY = {
    "stocksnap": "photograph",
    "animaldiversity": "photograph",
    "brooklynmuseum": "digitized_artwork",
    "capl": "photograph",
    "clevelandmuseum": "digitized_artwork",
    "deviantart": "digitized_artwork",
    "digitaltmuseum": "digitized_artwork",
    "floraon": "photograph",
    "inaturalist": "photograph",
    "mccordmuseum": "digitized_artwork",
    "met": "digitized_artwork",
    "museumsvictoria": "digitized_artwork",
    "nappy": "photograph",
    "phylopic": "illustration",
    "rijksmuseum": "digitized_artwork",
    "sciencemuseum": "photograph",
    "svgsilh": "illustration",
    "thorvaldsenmuseum": "digitized_artwork",
    "worms": "photograph",
}


def default_category_expr(category, provider):
    """category OR the per-provider default (media.py:168-170); literal
    map lookup, providers without a default stay NULL."""
    entries = []
    for prov, cat in DEFAULT_IMAGE_CATEGORY.items():
        entries.append(F.lit(prov))
        entries.append(F.lit(cat))
    return F.coalesce(category, F.element_at(F.create_map(*entries), provider))


# Filetype unification — reference media.py:39,313-325.
FILETYPE_EQUIVALENTS = {"jpeg": "jpg", "tif": "tiff"}


def extract_filetype_expr(url: Column, valid: tuple[str, ...]) -> Column:
    """Filetype from URL extension (reference extensions.py:7-12): last
    dot-suffix of the path, lowercased, kept only if in the valid set."""
    # tolerate a query string OR a fragment after the extension — the
    # reference parses urlparse(url).path, which strips both
    ext = F.lower(F.regexp_extract(url, r"\.(\w{1,5})(?:[?#].*)?$", 1))
    unified = ext
    for frm, to in FILETYPE_EQUIVALENTS.items():
        unified = F.when(unified == frm, F.lit(to)).otherwise(unified)
    return F.when(unified.isin(*valid), unified)


def unify_filetype_expr(filetype: Column) -> Column:
    out = F.lower(filetype)
    for frm, to in FILETYPE_EQUIVALENTS.items():
        out = F.when(out == frm, F.lit(to)).otherwise(out)
    return out


def clean_tags_expr(tags: Column, provider: Column) -> Column:
    """Drop blacklisted tags, wrap as {name, provider} structs
    (reference media.py:252-311). Input: array<string> or array<struct>;
    output: array<struct<name,provider>> with pinned sort order."""

    def keep(name: Column) -> Column:
        lowered = F.lower(F.trim(name))
        cond = ~lowered.isin(*EXACT_BLACKLISTED_TAGS)
        for sub in SUBSTRING_BLACKLISTED_TAGS:
            cond = cond & ~lowered.contains(sub)
        return name.isNotNull() & (F.trim(name) != "") & cond

    filtered = F.filter(tags, keep)
    wrapped = F.transform(
        filtered,
        lambda t: F.struct(F.trim(t).alias("name"), provider.alias("provider")),
    )
    return F.array_sort(F.array_distinct(wrapped))


def enrich_meta_data_expr(meta: Column, license_url: Column, raw_url: Column) -> Column:
    """Force-map + inject license_url / raw_license_url
    (reference media.py:268-282). meta is MapType(string,string)."""
    base = F.map_filter(
        F.coalesce(meta, F.expr("map()")),
        lambda k, v: ~k.isin("license_url", "raw_license_url"),
    )
    inject = F.map_from_arrays(
        F.array(F.lit("license_url"), F.lit("raw_license_url")),
        F.array(license_url, F.coalesce(raw_url, license_url)),
    )
    return F.map_concat(base, F.map_filter(inject, lambda k, v: v.isNotNull()))


def default_source_expr(source: Column, provider: Column) -> Column:
    """source defaults to provider (media.py:143,342-348)."""
    return F.coalesce(F.when(F.trim(source) != "", source), provider)


def clean_columns(df: DataFrame, columns: list[ColumnSpec]) -> DataFrame:
    """Apply per-column sanitization expressions for every spec present."""
    exprs = []
    for c in df.columns:
        spec = next((s for s in columns if s.name == c), None)
        if spec is None:
            exprs.append(F.col(c))
        else:
            e = spec.clean_expr()
            if spec.datatype == Datatype.int:
                e = pg_int4_guard(e)
            exprs.append(e.alias(c))
    return df.select(exprs)


def drop_missing_required(df: DataFrame, columns: list[ColumnSpec]) -> DataFrame:
    """Whole-row drop when any required column is null after cleaning
    (reference media.py:227-230; SQL twin loader/sql.py:214-219)."""
    required = [c.name for c in columns if c.required and c.name in df.columns]
    return df.na.drop(subset=required)
