"""Temporal join operators: as-of join and bounded range join.

The reference has no as-of/interval joins (SURVEY §2.3 note) — these are
engine capabilities a training-data/event pipeline needs that plain Spark
also lacks as primitives. Both are built so they scale:

  * ``asof_join`` — for each left row, the latest right row with
    ``right_ts <= left_ts`` (optionally strict / within a tolerance) per
    key. Implemented as union → single window pass: tag both inputs,
    union them, sort each key partition by (ts, side) and carry the last
    non-null right payload forward. ONE shuffle on the key columns, no
    range-condition join, no per-key explosion — the standard scalable
    shape (a naive ``l.ts >= r.ts`` join is O(|L|·|R|) per key and
    becomes a broadcast-nested-loop plan).

  * ``range_join_bucketed`` — match right rows with
    ``right_ts ∈ (left_ts + lower, left_ts + upper]`` per key. A raw
    inequality join degenerates to nested-loop; instead both sides are
    assigned coarse time buckets at least as wide as the window, the
    left side duplicated into the (≤2 when ``bucket >= upper-lower``)
    buckets its window can touch, then a plain equi-join on
    (keys, bucket) + exact-bound filter. Equi-join ⇒ hash join ⇒
    shuffle-bounded, AQE-skew-splittable, broadcast-able.

Ties: rows are ordered by (ts, side) within a key; among right rows
with identical ts the match is the last under Spark's sort (callers
needing total determinism should ensure (key, ts) uniqueness — the
driver's events table satisfies this at every SF).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_SEC = 1_000_000


def salted_count_distinct(
    df: DataFrame,
    key_cols: Sequence[str],
    val_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact COUNT(DISTINCT val) per key, skew-proof via value-salting.

    A plain grouped countDistinct must co-locate every row of a hot key
    on one task. Salting by hash(value) % R splits each key's DISTINCT
    state across R tasks — correct because a given value always lands in
    the same salt bucket, so bucket-local distinct counts sum to the
    exact global one. Two shuffles, but the second moves only
    |keys| x R rows. Returns (key_cols..., n_distinct).
    """
    from openverse_catalog_spark.functions.hashing import hash60

    salt = (hash60(F.col(val_col).cast("string")) % F.lit(n_salts)).alias(
        "_salt"
    )
    partial = (
        df.select(*key_cols, val_col, salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.countDistinct(val_col).alias("_nd"))
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_nd").alias("n_distinct")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    salt_src: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with the fact side salted and the dim replicated.

    For a dim too big to broadcast joined on a skewed key: a sort-merge
    join puts every row of a hot key in one task. Salting the fact by
    hash(salt_src) % R and exploding the dim into all R salt values
    spreads each key over R tasks at the cost of an R x dim-size
    replica (choose R so R·|dim| ≪ |fact|). Result set is identical to
    the unsalted join. AQE's skew-join split handles moderate skew
    automatically; this is the explicit form for the extreme tail.
    """
    from openverse_catalog_spark.functions.hashing import hash60

    on = list(on)
    # NULL-safe salt: a NULL salt_src must land in SOME bucket (0), not
    # produce a NULL salt that matches no dim replica and silently drops
    # the fact row — the result must stay identical to the unsalted join
    f = fact.withColumn(
        "_salt",
        F.coalesce(
            hash60(F.col(salt_src).cast("string")) % F.lit(n_salts), F.lit(0)
        ),
    )
    d = dim.withColumn(
        "_salt",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"), F.lit(n_salts - 1).cast("bigint")
            )
        ),
    )
    return f.join(d, [*on, "_salt"]).drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    strict: bool = False,
    tolerance_s: float | None = None,
) -> DataFrame:
    """Backward as-of join: latest right row at-or-before each left row.

    Returns every ``left`` column, plus each name in ``right_cols`` and
    ``_asof_gap_us`` (microseconds between left_ts and the matched
    right_ts) — all null when no right row qualifies (none before, or
    nearest one older than ``tolerance_s``; pandas ``merge_asof``
    tolerance semantics).
    """
    on = list(on)
    right_cols = [c for c in right_cols if c not in on]

    rpay = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_cols]
    ).alias("_r")
    rpay_type = right.select(rpay).schema[0].dataType
    lpay = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    lpay_type = left.select(lpay).schema[0].dataType

    # Side ordering at equal ts decides inclusivity: the right row sorts
    # first (visible to the left row's running `last`) iff not strict.
    left_side, right_side = (1, 0) if not strict else (0, 1)
    lu = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(left_side).alias("_side"),
        lpay,
        F.lit(None).cast(rpay_type).alias("_r"),
    )
    ru = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(right_side).alias("_side"),
        F.lit(None).cast(lpay_type).alias("_l"),
        rpay,
    )

    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lu.unionByName(ru)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_l").isNotNull())
    )

    gap = F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_m._rts"))
    if tolerance_s is not None:
        ok = gap <= F.lit(int(tolerance_s * US_PER_SEC))
    else:
        ok = F.lit(True)
    keep = F.col("_m").isNotNull() & ok
    return matched.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.when(keep, F.col(f"_m.{c}")).alias(c) for c in right_cols],
        F.when(keep, gap).alias("_asof_gap_us"),
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: float = 0.0,
    upper_s: float = 86_400.0,
    bucket_s: float | None = None,
    right_cols: Sequence[str] = (),
    prefix: str = "r_",
) -> DataFrame:
    """Inner range join: right rows with ts in (left_ts+lower, left_ts+upper].

    Emits one row per qualifying (left, right) pair: all left columns +
    ``prefix``-renamed ``right_cols``. Callers aggregate / left-join the
    result back to keep unmatched left rows (see join_range query).

    ``bucket_s`` defaults to the window width, giving each left row at
    most 2 bucket replicas regardless of data volume.
    """
    on = list(on)
    if bucket_s is None:
        bucket_s = upper_s - lower_s
    bucket_us = int(bucket_s * US_PER_SEC)
    lo_us = int(lower_s * US_PER_SEC)
    hi_us = int(upper_s * US_PER_SEC)

    lus = F.unix_micros(F.col(left_ts))
    lb = left.select(
        "*",
        F.explode(
            F.sequence(
                F.floor((lus + lo_us) / bucket_us),
                F.floor((lus + hi_us) / bucket_us),
            )
        ).alias("_bucket"),
    )
    rus = F.unix_micros(F.col(right_ts))
    rb = right.select(
        *on,
        F.floor(rus / bucket_us).alias("_bucket"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(prefix + c) for c in right_cols if c not in on],
    )
    gap = F.unix_micros(F.col("_rts")) - F.unix_micros(F.col(left_ts))
    return (
        lb.join(rb, [*on, "_bucket"])
        .filter((gap > lo_us) & (gap <= hi_us))
        .drop("_bucket", "_rts")
    )
