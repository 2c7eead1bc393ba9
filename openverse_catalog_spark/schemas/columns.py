"""Typed column-spec registry.

Re-expresses the reference's column system (see reference
``catalog/dags/common/storage/columns.py:85-198`` — a ``Column`` ABC whose
subclasses know datatype, required-ness, upsert strategy, and per-value
sanitization) as declarative metadata driving three artifacts:

  1. the Spark ``StructType`` schema per media type / TSV version
     (reference ``tsv_columns.py:7-88``, ``db_columns.py:19-78``)
  2. a Catalyst *cleaning expression* per column (replacing the per-row
     Python ``prepare_string`` at ``columns.py:145-198`` with vectorized
     JVM-side expressions — no Python in the hot path)
  3. a *merge expression* per column implementing the reference's upsert
     strategies (``columns.py:24-82``) for the MERGE compiler in
     ``operators/merge.py``.

At 100 TB scale this design matters: cleaning is pure whole-stage-codegen
expression work (no UDFs), and schema/merge metadata lives driver-side.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import Column as SparkCol
from pyspark.sql import functions as F
from pyspark.sql import types as T


class Datatype(Enum):
    """Reference ``columns.py:15-21`` Datatype enum → Spark types."""

    bool = "boolean"
    char = "string"
    int = "int"
    jsonb_map = "jsonb_map"  # meta_data: object of scalars
    jsonb_tags = "jsonb_tags"  # tags: array of {name, provider}
    jsonb_struct = "jsonb_struct"  # audio_set: single object, fixed keys
    jsonb_structs = "jsonb_structs"  # alt_files: array of fixed-key objects
    array_str = "array_str"  # varchar[] (genres)
    array_double = "array_double"  # embedding vectors (beyond-reference)
    double = "double"  # numeric/double precision (iNaturalist DDL)
    timestamp = "timestamp"
    uuid = "uuid"


class UpsertStrategy(Enum):
    """Reference ``columns.py:24-31``; SQL each generates at ``:38-78``."""

    now = "now"
    false = "false"
    newest_non_null = "newest_non_null"
    merge_jsonb_objects = "merge_jsonb_objects"
    merge_jsonb_arrays = "merge_jsonb_arrays"
    merge_array = "merge_array"
    no_change = "no_change"


TAG_STRUCT = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("provider", T.StringType()),
    ]
)

AUDIO_SET_STRUCT = T.StructType(
    [
        T.StructField("foreign_identifier", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("foreign_landing_url", T.StringType()),
        T.StructField("creator", T.StringType()),
        T.StructField("creator_url", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("filesize", T.LongType()),
        T.StructField("filetype", T.StringType()),
        T.StructField("thumbnail", T.StringType()),
    ]
)

ALT_FILE_STRUCT = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("filesize", T.LongType()),
        T.StructField("bit_rate", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
    ]
)

# Postgres int4 max — reference nulls out larger filesizes (media.py:40,327-340).
PG_INT_MAX = 2_147_483_647


def _spark_type(dt: Datatype) -> T.DataType:
    return {
        Datatype.bool: T.BooleanType(),
        Datatype.char: T.StringType(),
        # Keep LongType internally; the PG int4 guard is applied explicitly.
        Datatype.int: T.LongType(),
        Datatype.jsonb_map: T.MapType(T.StringType(), T.StringType()),
        Datatype.jsonb_tags: T.ArrayType(TAG_STRUCT),
        Datatype.jsonb_struct: AUDIO_SET_STRUCT,
        Datatype.jsonb_structs: T.ArrayType(ALT_FILE_STRUCT),
        Datatype.array_str: T.ArrayType(T.StringType()),
        Datatype.array_double: T.ArrayType(T.DoubleType()),
        Datatype.double: T.DoubleType(),
        Datatype.timestamp: T.TimestampType(),
        Datatype.uuid: T.StringType(),
    }[dt]


@dataclass(frozen=True)
class ColumnSpec:
    """One canonical column: schema + clean + merge metadata.

    Mirrors reference ``columns.py:85-198`` Column ABC fields:
    ``name``, ``required``, ``datatype``, ``upsert_strategy``, plus the
    StringColumn SIZE/TRUNCATE knobs (``columns.py:361-401``).
    """

    name: str
    datatype: Datatype
    required: bool = False
    upsert_strategy: UpsertStrategy = UpsertStrategy.newest_non_null
    size: int | None = None  # char limit (StringColumn SIZE)
    truncate: bool = False  # over-limit: truncate if True else null-out
    db_only: bool = False  # not present in TSVs (identifier, created_on...)

    @property
    def spark_type(self) -> T.DataType:
        return _spark_type(self.datatype)

    def struct_field(self) -> T.StructField:
        return T.StructField(self.name, self.spark_type, nullable=True)

    # ---- cleaning expressions (replaces prepare_string, columns.py:145-198)

    def clean_expr(self, col: SparkCol | None = None) -> SparkCol:
        """Catalyst expression implementing this column's sanitization."""
        c = col if col is not None else F.col(self.name)
        if self.datatype == Datatype.char:
            return clean_string_expr(c, self.size, self.truncate)
        if self.datatype == Datatype.int:
            return clean_int_expr(c)
        if self.datatype == Datatype.bool:
            return clean_bool_expr(c)
        return c

    # ---- merge expressions (upsert strategies, columns.py:38-78)

    def merge_expr(self, tgt: SparkCol, src: SparkCol) -> SparkCol:
        """Expression for the merged value when a key exists in BOTH the
        target (old) and source (new) side. See operators/merge.py for the
        insert-only / matched-only handling."""
        s = self.upsert_strategy
        if s == UpsertStrategy.newest_non_null:
            # COALESCE(EXCLUDED.col, old.col) — columns.py:38-39
            return F.coalesce(src, tgt)
        if s == UpsertStrategy.now:
            return F.current_timestamp()
        if s == UpsertStrategy.false:
            return F.lit(False)
        if s == UpsertStrategy.no_change:
            return tgt
        if s == UpsertStrategy.merge_jsonb_objects:
            # jsonb_strip_nulls(old) || jsonb_strip_nulls(new): new keys win,
            # null-valued keys stripped first — columns.py:42-52.
            if self.datatype == Datatype.jsonb_struct:
                # fixed-key object (audio_set): the key-wise merge reduces
                # to field-wise coalesce(new, old); whole-side NULLs fall
                # back to the other side
                fields = self.spark_type.fieldNames()
                merged = F.struct(
                    *[
                        F.coalesce(src[f], tgt[f]).alias(f)
                        for f in fields
                    ]
                )
                return (
                    F.when(src.isNull(), tgt)
                    .when(tgt.isNull(), src)
                    .otherwise(merged)
                )
            return merge_map_expr(tgt, src)
        if s in (UpsertStrategy.merge_jsonb_arrays, UpsertStrategy.merge_array):
            # distinct(old || new) with null fallbacks — columns.py:55-74.
            return merge_array_expr(tgt, src)
        raise ValueError(f"unknown strategy {s}")


# ---------------------------------------------------------------------------
# Cleaning expression builders (pure Catalyst; whole-stage-codegen friendly)
# ---------------------------------------------------------------------------


def let_(expr: SparkCol, body) -> SparkCol:
    """Let-binding for Catalyst expressions: evaluate ``expr`` once, make
    it available to ``body`` as a lambda variable.

    Catalyst's CollapseProject substitutes a derived column's FULL
    expression tree into every downstream reference — stacked cleaning
    stages (sanitize -> license normalize -> filetype -> required filter)
    multiply into trees large enough that Janino refuses to compile the
    generated code and the whole stage silently falls back to interpreted
    evaluation (measured ~10x slower on clean_media_batch). Wrapping the
    shared subtree as the element of a 1-element array and rebinding via
    ``transform`` turns every reuse into a lambda-variable leaf, so the
    tree stays linear in the number of stages and codegen succeeds."""
    return F.element_at(F.transform(F.array(expr), body), 1)


def clean_string_expr(c: SparkCol, size: int | None, truncate: bool) -> SparkCol:
    """Sanitize a string column per reference ``columns.py:145-170``:
    collapse whitespace runs to one space, ``"`` → ``'``, strip backspace,
    escape backslashes; then enforce the char limit (truncate vs null-out).

    Note: Python ``str.split()`` splits on all Unicode whitespace; ``\\s``
    in Java regex covers ASCII whitespace only. We use the Unicode-aware
    character class to match Python semantics.
    """
    base = F.translate(
        F.regexp_replace(F.trim(F.regexp_replace(c, r"(?U)\s+", " ")), "\\x08", ""),
        '"',
        "'",
    )

    def body(v: SparkCol) -> SparkCol:
        out = v
        if size is not None:
            if truncate:
                out = F.when(F.length(v) > size, F.substring(v, 1, size)).otherwise(v)
            else:
                out = F.when(F.length(v) > size, F.lit(None).cast("string")).otherwise(v)
        # empty string → null (prepare_string returns None for falsy input)
        return F.when(out == "", F.lit(None).cast("string")).otherwise(out)

    # let-bound: the 4-regex sanitize chain is evaluated ONCE however many
    # times downstream stages reference the cleaned column
    return let_(base, body)


def clean_int_expr(c: SparkCol) -> SparkCol:
    """``int(float(x))`` else NULL (reference ``columns.py:227-241``).

    Non-ANSI double cast yields NULL on garbage; the truncation toward zero
    of float→int matches Python ``int()``.
    """
    # try_cast: null-on-garbage regardless of the session's ANSI setting
    d = c.cast("string").try_cast("double")
    return F.when(d.isNull(), F.lit(None).cast("long")).otherwise(
        d.cast("long")
    )


def pg_int4_guard(c: SparkCol) -> SparkCol:
    """NULL out values exceeding Postgres int4 max (media.py:327-340)."""
    return F.when(F.abs(c) > PG_INT_MAX, F.lit(None).cast("long")).otherwise(c)


def clean_bool_expr(c: SparkCol) -> SparkCol:
    """Truthy mapping per reference ``columns.py:272-289``."""
    s = F.lower(F.trim(c.cast("string")))
    return (
        F.when(s.isin("t", "true", "1", "yes"), F.lit(True))
        .when(s.isin("f", "false", "0", "no"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


# ---------------------------------------------------------------------------
# Merge expression builders (upsert strategies)
# ---------------------------------------------------------------------------


def merge_map_expr(tgt: SparkCol, src: SparkCol) -> SparkCol:
    """``jsonb_strip_nulls(old) || jsonb_strip_nulls(new)`` (new wins),
    with COALESCE fallbacks when either side is NULL — columns.py:42-52.

    On MapType columns: strip null-valued keys from both sides, then union
    with source-side precedence via map_zip_with.
    """
    t = F.map_filter(F.coalesce(tgt, F.expr("map()")), lambda k, v: v.isNotNull())
    s = F.map_filter(F.coalesce(src, F.expr("map()")), lambda k, v: v.isNotNull())
    merged = F.map_zip_with(t, s, lambda k, ov, nv: F.coalesce(nv, ov))
    # both sides NULL → NULL (not empty map), matching jsonb semantics
    return F.when(tgt.isNull() & src.isNull(), F.lit(None)).otherwise(merged)


def merge_array_expr(tgt: SparkCol, src: SparkCol) -> SparkCol:
    """``distinct(old || new)`` with null fallbacks — columns.py:55-74.

    The reference's jsonb_agg(DISTINCT) has no deterministic order; we pin
    ascending sort so results are reproducible (SURVEY §7.3). Works on any
    element type (strings, tag structs, alt_file structs).
    """
    both = F.array_sort(F.array_distinct(F.concat(tgt, src)))
    return F.when(tgt.isNull(), src).when(src.isNull(), tgt).otherwise(both)


# ---------------------------------------------------------------------------
# Canonical column registry (reference columns.py:559-661)
# ---------------------------------------------------------------------------

NNN = UpsertStrategy.newest_non_null

FOREIGN_ID = ColumnSpec("foreign_identifier", Datatype.char, required=True, size=3000, truncate=False)
LANDING_URL = ColumnSpec("foreign_landing_url", Datatype.char, required=True, size=1000, truncate=False)
DIRECT_URL = ColumnSpec("url", Datatype.char, required=True, size=3000, truncate=False)
THUMBNAIL = ColumnSpec("thumbnail", Datatype.char, size=3000, truncate=False)
FILETYPE = ColumnSpec("filetype", Datatype.char, size=5, truncate=False)
FILESIZE = ColumnSpec("filesize", Datatype.int)
LICENSE = ColumnSpec("license", Datatype.char, required=True, size=50, truncate=False)
LICENSE_VERSION = ColumnSpec("license_version", Datatype.char, required=True, size=25, truncate=False)
CREATOR = ColumnSpec("creator", Datatype.char, size=2000, truncate=True)
CREATOR_URL = ColumnSpec("creator_url", Datatype.char, size=2000, truncate=False)
TITLE = ColumnSpec("title", Datatype.char, size=5000, truncate=True)
META_DATA = ColumnSpec("meta_data", Datatype.jsonb_map, upsert_strategy=UpsertStrategy.merge_jsonb_objects)
TAGS = ColumnSpec("tags", Datatype.jsonb_tags, upsert_strategy=UpsertStrategy.merge_jsonb_arrays)
CATEGORY = ColumnSpec("category", Datatype.char, size=80, truncate=False)
WATERMARKED = ColumnSpec("watermarked", Datatype.bool)
PROVIDER = ColumnSpec("provider", Datatype.char, size=80, truncate=False)
SOURCE = ColumnSpec("source", Datatype.char, size=80, truncate=False)
INGESTION_TYPE = ColumnSpec("ingestion_type", Datatype.char, size=80, truncate=False)
WIDTH = ColumnSpec("width", Datatype.int)
HEIGHT = ColumnSpec("height", Datatype.int)
DURATION = ColumnSpec("duration", Datatype.int)
BIT_RATE = ColumnSpec("bit_rate", Datatype.int)
SAMPLE_RATE = ColumnSpec("sample_rate", Datatype.int)
GENRES = ColumnSpec("genres", Datatype.array_str, size=80, upsert_strategy=UpsertStrategy.merge_array)
AUDIO_SET = ColumnSpec("audio_set", Datatype.jsonb_struct, upsert_strategy=UpsertStrategy.merge_jsonb_objects)
SET_POSITION = ColumnSpec("set_position", Datatype.int)
ALT_FILES = ColumnSpec("alt_files", Datatype.jsonb_structs, upsert_strategy=UpsertStrategy.merge_jsonb_arrays)

# DB-only columns (reference db_columns.py:10-16)
IDENTIFIER = ColumnSpec("identifier", Datatype.uuid, upsert_strategy=UpsertStrategy.no_change, db_only=True)
CREATED_ON = ColumnSpec("created_on", Datatype.timestamp, upsert_strategy=UpsertStrategy.no_change, db_only=True)
UPDATED_ON = ColumnSpec("updated_on", Datatype.timestamp, upsert_strategy=UpsertStrategy.now, db_only=True)
LAST_SYNCED = ColumnSpec(
    "last_synced_with_source", Datatype.timestamp, upsert_strategy=UpsertStrategy.now, db_only=True
)
REMOVED = ColumnSpec("removed_from_source", Datatype.bool, upsert_strategy=UpsertStrategy.false, db_only=True)

DB_ONLY_COLUMNS = [IDENTIFIER, CREATED_ON, UPDATED_ON, LAST_SYNCED, REMOVED]

# TSV v001 column orders (reference tsv_columns.py:13-88 — order IS the TSV order)
IMAGE_TSV_COLUMNS: list[ColumnSpec] = [
    FOREIGN_ID,
    LANDING_URL,
    DIRECT_URL,
    THUMBNAIL,
    FILETYPE,
    FILESIZE,
    LICENSE,
    LICENSE_VERSION,
    CREATOR,
    CREATOR_URL,
    TITLE,
    META_DATA,
    TAGS,
    CATEGORY,
    WATERMARKED,
    PROVIDER,
    SOURCE,
    INGESTION_TYPE,
    WIDTH,
    HEIGHT,
]

AUDIO_TSV_COLUMNS: list[ColumnSpec] = [
    FOREIGN_ID,
    LANDING_URL,
    DIRECT_URL,
    THUMBNAIL,
    FILETYPE,
    FILESIZE,
    LICENSE,
    LICENSE_VERSION,
    CREATOR,
    CREATOR_URL,
    TITLE,
    META_DATA,
    TAGS,
    CATEGORY,
    WATERMARKED,
    PROVIDER,
    SOURCE,
    INGESTION_TYPE,
    DURATION,
    BIT_RATE,
    SAMPLE_RATE,
    GENRES,
    AUDIO_SET,
    SET_POSITION,
    ALT_FILES,
]


# Legacy image TSV v000 (reference tsv_columns.py:45-65): no filetype /
# category, width+height between thumbnail and filesize.
IMAGE_TSV_COLUMNS_V000: list[ColumnSpec] = [
    FOREIGN_ID,
    LANDING_URL,
    DIRECT_URL,
    THUMBNAIL,
    WIDTH,
    HEIGHT,
    FILESIZE,
    LICENSE,
    LICENSE_VERSION,
    CREATOR,
    CREATOR_URL,
    TITLE,
    META_DATA,
    TAGS,
    WATERMARKED,
    PROVIDER,
    SOURCE,
    INGESTION_TYPE,
]

# Versioned registry (reference tsv_columns.py:7-11 CURRENT_VERSION +
# COLUMNS): order in each list IS the TSV column order for that version.
TSV_COLUMNS: dict[tuple[str, str], list[ColumnSpec]] = {
    ("image", "000"): IMAGE_TSV_COLUMNS_V000,
    ("image", "001"): IMAGE_TSV_COLUMNS,
    ("audio", "001"): AUDIO_TSV_COLUMNS,
}

CURRENT_TSV_VERSION = {"image": "001", "audio": "001"}


def tsv_columns(media_type: str, version: str | None = None) -> list[ColumnSpec]:
    """Column list for a media type + TSV version (default: current).
    Rows read under an older version merge with NULLs for the missing
    columns (loader/sql.py:240-261 semantics — merge_upsert aligns
    version-missing columns automatically)."""
    v = version or CURRENT_TSV_VERSION[media_type]
    try:
        return TSV_COLUMNS[(media_type, v)]
    except KeyError:
        raise ValueError(f"unknown TSV schema {media_type!r} v{v!r}") from None


def spark_schema(columns: list[ColumnSpec]) -> T.StructType:
    return T.StructType([c.struct_field() for c in columns])


def image_db_schema() -> list[ColumnSpec]:
    """Canonical image table columns (db_columns.py:19-45)."""
    return IMAGE_TSV_COLUMNS + DB_ONLY_COLUMNS


def audio_db_schema() -> list[ColumnSpec]:
    """Canonical audio table columns (db_columns.py:47-78)."""
    return AUDIO_TSV_COLUMNS + DB_ONLY_COLUMNS


def required_columns(columns: list[ColumnSpec]) -> list[str]:
    return [c.name for c in columns if c.required]
