"""Sequence assembly operators: length bucketing, shard-local sequence
packing, and fixed-window document chunking — the steps that turn a
cleaned corpus into training sequences.

Scale shapes:

  * ``length_bucket`` — a pure expression (sum of boundary comparisons),
    no shuffle; bucketing feeds batch-shape grouping so padding waste is
    bounded by the bucket width.
  * ``pack_offsets`` — first-fit-by-order packing WITHIN a shard column:
    a running token sum per shard assigns each doc the bin containing its
    start offset. One shuffle on the shard key; each shard's window sorts
    locally. Shards are the unit of parallelism — size them like output
    files (10^5-10^6 docs), not like the whole corpus. A global (non-
    sharded) pack would serialize into one partition; at 100 TB you
    always pack per shard, which is also what downstream data loaders
    consume. Bins may straddle a doc boundary (a doc is not split);
    bin fill therefore lands in (budget-max_doc, budget+max_doc).
  * ``chunk_spans`` — split each doc into fixed-length token windows
    with stride (overlap = window - stride). Row-local explode: no
    shuffle, output rows ≈ tokens/stride.

All token accounting uses functions/text.py:token_count so the DuckDB
oracle reproduces counts exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openverse_catalog_spark.functions import text as tx


def length_bucket(len_col: Column, boundaries: Sequence[int]) -> Column:
    """Bucket index = #boundaries <= value (0 .. len(boundaries))."""
    out = F.lit(0)
    for b in boundaries:
        out = out + (len_col >= F.lit(b)).cast("int")
    return out


def length_bucket_sql(len_expr: str, boundaries: Sequence[int]) -> str:
    parts = " + ".join(
        f"CAST({len_expr} >= {b} AS INT)" for b in boundaries
    )
    return f"({parts})"


def pack_offsets(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Assign each row a pack bin: floor(running-start / budget) per shard.

    Deterministic given (shard, order) — independent of partitioning and
    engine. Adds ``_start`` (token offset within the shard) and ``_bin``.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return df.withColumn("_start", start).withColumn(
        "_bin", F.floor(F.col("_start") / F.lit(budget))
    )


def chunk_spans(
    df: DataFrame,
    id_cols: Sequence[str],
    text_col: str,
    window: int,
    stride: int,
) -> DataFrame:
    """One row per (doc, token-window): chunk_idx, start, len.

    Emits ceil(max(n,1)/stride) windows per doc (always at least one, so
    empty docs surface rather than vanish); the final window is
    truncated to the doc end. Pure row-local explode — no shuffle, and
    the output count is linear in corpus tokens / stride.
    """
    n = tx.token_count(F.col(text_col))
    starts = F.sequence(
        F.lit(0), F.greatest(n - F.lit(1), F.lit(0)), F.lit(stride)
    )
    return df.select(
        *id_cols,
        n.alias("_n_tokens"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    ).select(
        *id_cols,
        "chunk_idx",
        "start",
        F.least(F.lit(window), F.col("_n_tokens") - F.col("start")).alias(
            "chunk_len"
        ),
    )


def pack_segments(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Trainer-facing packing output: one row per packed SEGMENT —
    (shard, bin, seg_idx, order key, within-bin offset, length). This
    is the attention-mask spec a packed-sequence loader actually
    consumes (segment boundaries tell it where cross-document attention
    must be masked). Same single shard-keyed window as ``pack_offsets``
    plus a per-bin row_number; nothing re-sorts."""
    packed = pack_offsets(df, shard_col, order_col, tokens_col, budget)
    ws = Window.partitionBy(shard_col, "_bin").orderBy(order_col)
    return packed.select(
        shard_col,
        F.col("_bin").alias("bin"),
        (F.row_number().over(ws) - 1).alias("seg_idx"),
        order_col,
        (F.col("_start") - F.col("_bin") * budget).alias("seg_start"),
        F.col(tokens_col).alias("seg_len"),
    )
