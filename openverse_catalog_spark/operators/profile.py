"""Table profiling (the ANALYZE-TABLE analog) and small-file compaction
planning — the two metadata jobs a 100 TB table needs between writes.

``profile_table`` computes per-column stats (nulls, NDV, min/max) for all
requested columns in ONE aggregation over one scan. NDV defaults to
``approx_count_distinct`` (HLL): a single-pass, no-shuffle-amplification
estimate, which is what ANALYZE actually wants at scale. ``exact=True``
switches to COUNT(DISTINCT) — Catalyst plans multi-distinct via Expand
(input replicated once per distinct aggregate), fine for verification
scales and used by the oracle-gated query so the profiler itself is
value-checked.

``list_files`` walks a table directory through the Hadoop FileSystem API
(works on file://, hdfs://, s3a:// alike — never driver-side os.walk);
``compaction_plan`` greedily bins files into target-size output groups
per directory by reusing the shard-local packing operator — the rewrite
job then reads each bin and writes one file, fixing the small-file
problem incremental ingestion creates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openverse_catalog_spark.session import literal_df

from openverse_catalog_spark.operators.packing import pack_offsets


def profile_table(
    df: DataFrame, cols: Sequence[str], exact: bool = False
) -> DataFrame:
    """Per-column (column, n_rows, n_nulls, ndv, min_s, max_s) — one agg."""
    aggs: list = [F.count(F.lit(1)).alias("_rows")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"_n{i}")
        )
        ndv = (
            F.countDistinct(col) if exact else F.approx_count_distinct(col)
        )
        aggs.append(ndv.cast("bigint").alias(f"_d{i}"))
        aggs.append(F.min(col).cast("string").alias(f"_mn{i}"))
        aggs.append(F.max(col).cast("string").alias(f"_mx{i}"))
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _rows, _n{i}, _d{i}, _mn{i}, _mx{i}" for i, c in enumerate(cols)
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack})"
            " AS (column, n_rows, n_nulls, ndv, min_s, max_s)"
        )
    )


def list_files(spark: SparkSession, path: str) -> DataFrame:
    """(dir, path, bytes) for every data file under ``path`` — via the
    Hadoop FileSystem so the same call works against any supported
    scheme. The listing itself is metadata-sized; it becomes a DataFrame
    so planning stays in the engine."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    rows = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        name = p.rsplit("/", 1)[-1]
        if name.startswith(("_", ".")):
            continue
        rows.append((p.rsplit("/", 1)[0], p, int(st.getLen())))
    return literal_df(spark, rows, "dir string, path string, bytes long")


def compaction_plan(
    files: DataFrame, target_bytes: int, small_only: bool = True
) -> DataFrame:
    """Group files into output bins of ~target_bytes per directory.

    Files at/above the target are already right-sized and excluded by
    default. Reuses the shard-local packing window (directories pack in
    parallel), so the plan is deterministic and engine-independent.
    Returns (dir, path, bytes, bin) — the rewrite job coalesces each
    (dir, bin) group into one output file."""
    cand = files.filter(F.col("bytes") < target_bytes) if small_only else files
    packed = pack_offsets(cand, "dir", "path", "bytes", target_bytes)
    return packed.select(
        "dir", "path", "bytes", F.col("_bin").alias("bin")
    )


def profile_drift(
    a: DataFrame, b: DataFrame, cols: Sequence[str], exact: bool = False
) -> DataFrame:
    """Column-level drift between two slices (yesterday vs today, train
    vs serving): both sides run the one-agg profiler and join on the
    column name — two scans + a tiny stats join, regardless of width.
    Emits per-column row counts, null-rate delta and NDV on each side;
    the report a pipeline gates on to catch schema rot and distribution
    shift before the model does."""
    pa = profile_table(a, cols, exact).select(
        "column",
        F.col("n_rows").alias("rows_a"),
        (F.col("n_nulls") / F.col("n_rows")).alias("null_rate_a"),
        F.col("ndv").alias("ndv_a"),
    )
    pb = profile_table(b, cols, exact).select(
        "column",
        F.col("n_rows").alias("rows_b"),
        (F.col("n_nulls") / F.col("n_rows")).alias("null_rate_b"),
        F.col("ndv").alias("ndv_b"),
    )
    return pa.join(pb, "column").select(
        "column",
        "rows_a",
        "rows_b",
        F.round(F.col("null_rate_b") - F.col("null_rate_a"), 6).alias(
            "null_rate_delta"
        ),
        "ndv_a",
        "ndv_b",
    )
