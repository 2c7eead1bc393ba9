"""Physical-layout operators: z-order (Morton) clustering for multi-column
data skipping.

A 100 TB table sorted by one column skips scans only for that column's
predicates. Interleaving the bits of several bucketized columns into one
Morton key and range-partitioning + sorting by it gives every
participating column LOCALITY within each output file — parquet min/max
footers then prune files/row-groups for predicates on ANY of the z
columns (the Delta/Iceberg OPTIMIZE ZORDER idea, done with plain Spark
primitives: repartitionByRange + sortWithinPartitions + write).

The z-value is pure integer arithmetic (shift/mask/or) — whole-stage
codegen, no UDF — and identical in DuckDB, so clustering keys are
oracle-verifiable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minmax_bucket(
    col: Column, lo: float, hi: float, bits: int
) -> Column:
    """Map a [lo, hi] value to an integer bucket in [0, 2^bits), clamped.

    The scale factor is a Python-computed double literal, so Spark and
    DuckDB evaluate the identical expression."""
    n = (1 << bits) - 1
    scale = n / (hi - lo)
    raw = F.floor((col.cast("double") - F.lit(float(lo))) * F.lit(scale))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n)).cast("bigint")


def minmax_bucket_sql(expr: str, lo: float, hi: float, bits: int) -> str:
    n = (1 << bits) - 1
    scale = n / (hi - lo)
    raw = f"floor((CAST({expr} AS DOUBLE) - {float(lo)!r}) * {scale!r})"
    return f"CAST(least(greatest({raw}, 0), {n}) AS BIGINT)"


def zvalue(buckets: Sequence[Column], bits: int) -> Column:
    """Morton-interleave N bucket columns of ``bits`` bits each.

    Bit i of column j lands at position i*N + j; disjoint positions, so
    the combination is a plain sum of shifted masked bits — codegen'd
    integer ops end to end."""
    ncols = len(buckets)
    z = F.lit(0).cast("bigint")
    for j, b in enumerate(buckets):
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), i * ncols + j
            )
    return z


def zvalue_sql(bucket_exprs: Sequence[str], bits: int) -> str:
    ncols = len(bucket_exprs)
    terms = []
    for j, e in enumerate(bucket_exprs):
        for i in range(bits):
            terms.append(f"((({e} >> {i}) & 1) << {i * ncols + j})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    z: Column,
    n_files: int,
) -> None:
    """Cluster by z-value and write: range-partition into n_files (a
    sampled-boundary shuffle — balanced regardless of key distribution),
    sort each partition by z, one parquet file per partition. Readers
    prune on every z column's min/max."""
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Persist a table hash-bucketed (and sorted) on the join key —
    Spark's storage-level co-location primitive. Two tables bucketed the
    same way join WITHOUT any shuffle exchange: each scan task reads one
    bucket pair and sort-merge joins it directly, which at 100 TB removes
    the dominant cost of every recurring fact-to-fact join (e.g. the
    reference's photos ⋈ observations, re-run on every ingest).

    Bucketing requires the table catalog (``saveAsTable``); the files
    land at ``path`` as an external table, so no warehouse directory is
    polluted and the catalog entry is session-scoped."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: Sequence[str]
) -> None:
    """Dynamic partition overwrite: replace ONLY the hive-style
    partitions present in ``df``, leaving every other partition's files
    untouched — the native-Spark form of `replaceWhere` and the
    standard correction/backfill pattern for date-partitioned lakes
    (re-run one day without rewriting the year). Requires the INSERT
    to run under dynamic overwrite mode; the conf is set per-call and
    restored, so a session-level static default is not disturbed."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        (
            df.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    finally:
        spark.conf.set(key, prev)
