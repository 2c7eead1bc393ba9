"""TSV source/sink with the reference's conventions.

Reference: MediaStore buffers TSV rows with ``\\N`` nulls
(``media.py:221-249``, S3 sink), loaded into Postgres via COPY with up to
10 malformed rows skipped by rewriting the file
(``loader/sql.py:109-141``, S4).

Spark mapping: the CSV reader/writer natively handles the ``\\N``
convention; malformed-row tolerance is PERMISSIVE mode + a corrupt-record
column — a single pass instead of the reference's parse-error/rewrite
retry loop, with the same cap-10 accounting applied as a post-check.
Complex (jsonb) columns travel as JSON text, exactly like the reference's
TSV cells, and are parsed to typed columns on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openverse_catalog_spark.schemas.columns import ColumnSpec, Datatype

MALFORMED_ROW_CAP = 10  # reference loader/sql.py:113

_COMPLEX = {
    Datatype.jsonb_map,
    Datatype.jsonb_tags,
    Datatype.jsonb_struct,
    Datatype.jsonb_structs,
    Datatype.array_str,
}


def write_tsv(df: DataFrame, path: str, columns: list[ColumnSpec]) -> None:
    """Write in TSV-v001 column order; complex columns as JSON text."""
    out_cols = []
    for c in columns:
        if c.datatype in _COMPLEX:
            out_cols.append(F.to_json(F.col(c.name)).alias(c.name))
        elif c.datatype == Datatype.bool:
            # reference encodes booleans as 't'/'f' in TSV (columns.py:272-289)
            out_cols.append(
                F.when(F.col(c.name), "t").when(~F.col(c.name), "f").alias(c.name)
            )
        else:
            out_cols.append(F.col(c.name).cast("string").alias(c.name))
    (
        df.select(out_cols)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("nullValue", "\\N")
        .option("emptyValue", "")
        .option("escape", "")
        .option("quote", "")
        .csv(path)
    )


def read_tsv(
    spark: SparkSession, path: str, columns: list[ColumnSpec]
) -> tuple[DataFrame, DataFrame]:
    """Read a TSV batch; returns (good_rows_typed, corrupt_rows).

    PERMISSIVE mode routes unparseable lines into ``_corrupt``; callers
    enforce the reference's <=10 tolerance via ``enforce_malformed_cap``.
    """
    string_fields = [T.StructField(c.name, T.StringType()) for c in columns]
    schema = T.StructType(string_fields + [T.StructField("_corrupt", T.StringType())])
    raw = (
        spark.read.option("sep", "\t")
        .option("nullValue", "\\N")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("quote", "")
        .option("escape", "")
        .schema(schema)
        .csv(path)
    )
    raw = raw.cache()
    # A row is malformed if the CSV line itself is unparseable OR any
    # jsonb column holds non-NULL text that is not valid JSON — the
    # latter is exactly what raises InvalidTextRepresentation in the
    # reference's COPY loop (loader/sql.py:124-141; its malformed-row
    # fixtures are all broken-JSON rows, test_sql.py:240-301).
    bad_json = F.lit(False)
    for c in columns:
        if c.datatype in _COMPLEX:
            col = F.col(c.name)
            bad_json = bad_json | (
                col.isNotNull() & F.from_json(col, c.spark_type).isNull()
            )
    corrupt = raw.filter(F.col("_corrupt").isNotNull() | bad_json).select(
        F.coalesce(
            F.col("_corrupt"),
            F.concat_ws("\t", *[F.col(c.name) for c in columns]),
        ).alias("_corrupt")
    )
    good = raw.filter(F.col("_corrupt").isNull() & ~bad_json).drop("_corrupt")
    typed_cols = []
    for c in columns:
        col = F.col(c.name)
        if c.datatype in _COMPLEX:
            typed_cols.append(F.from_json(col, c.spark_type).alias(c.name))
        elif c.datatype == Datatype.bool:
            typed_cols.append(
                F.when(col == "t", True).when(col == "f", False).alias(c.name)
            )
        elif c.datatype == Datatype.int:
            typed_cols.append(col.try_cast("long").alias(c.name))
        elif c.datatype == Datatype.double:
            typed_cols.append(col.try_cast("double").alias(c.name))
        elif c.datatype == Datatype.timestamp:
            typed_cols.append(col.try_cast("timestamp").alias(c.name))
        else:
            typed_cols.append(col.alias(c.name))
    return good.select(typed_cols), corrupt


def enforce_malformed_cap(corrupt: DataFrame, cap: int = MALFORMED_ROW_CAP) -> int:
    """Raise if more than ``cap`` malformed rows (reference behavior:
    delete up to 10, then fail — loader/sql.py:124-141). Returns count."""
    n = corrupt.count()
    if n > cap:
        raise ValueError(f"{n} malformed rows exceeds cap {cap}")
    return n
