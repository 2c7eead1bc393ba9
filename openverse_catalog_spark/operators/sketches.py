"""Mergeable frequency sketches: count-min with md5-derived hash rows.

A count-min sketch is the scale answer to "top talkers" questions the
reference answers with exact GROUP BY (duplicate counting, provider
volume reports): the sketch is a fixed depth x width counter grid,
counters are ADDITIVE — partials combine map-side, across partitions,
across streaming batches, across days — and estimate error is bounded
by N·e/width with probability 1-e^-depth, independent of cardinality.

Hash rows use hash60 (md5, functions/hashing.py), so a DuckDB oracle
reproduces the grid and the estimates bit-exactly — the rare sketch
whose correctness gate can be value-exact rather than tolerance-based.

Estimation needs a candidate set (CMS answers point queries, it does not
enumerate). Here candidates come from `distinct` of the queried column;
at 100 TB you'd feed the candidate stream from a hash_sample
(operators/sampling.py) — any true heavy hitter survives a uniform
sample, and the sketch then scores the survivors exactly as here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openverse_catalog_spark.functions.hashing import hash60, hash60_sql


def _cell(value: Column, row: int, width: int, salt: str) -> Column:
    return hash60(
        F.concat(F.lit(f"cms{salt}|{row}|"), value.cast("string"))
    ) % F.lit(width)


def cell_sql(value_expr: str, row: int, width: int, salt: str) -> str:
    h = hash60_sql(f"'cms{salt}|{row}|' || CAST({value_expr} AS VARCHAR)")
    return f"({h} % {width})"


def cms_build(
    df: DataFrame, col: str, width: int, depth: int, salt: str = ""
) -> DataFrame:
    """Build the (row, cell, cnt) counter grid — depth*width rows total.

    One explode (depth rows per input) then a partial-aggregating
    groupBy; the shuffled data is the GRID (tiny, bounded), not the
    input. Grids from disjoint inputs merge by summing cnt.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cell(F.col(col), i, width, salt).alias("cell"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    candidates: DataFrame,
    col: str,
    sketch: DataFrame,
    width: int,
    depth: int,
    salt: str = "",
) -> DataFrame:
    """Point-estimate each candidate: min over rows of its cell counter.

    The sketch is depth*width rows — always broadcast; candidates are
    never shuffled. Missing cells count 0 (value never seen)."""
    probes = candidates.select(
        col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cell(F.col(col), i, width, salt).alias("cell"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(col, F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
    return (
        probes.join(F.broadcast(sketch), ["row", "cell"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
