"""Popularity scoring pipeline (percentile constants + standardized score).

Reference: ``catalog/dags/common/popularity/sql.py`` —
  * per-provider discrete percentile of a metric read from ``meta_data``
    (``percentile_disc($3) WITHIN GROUP (ORDER BY (meta_data->>metric)::float)``,
    ``sql.py:214-229``)
  * constants matview: ``val==0 -> 1`` guard then
    ``constant = ((1-percentile)/percentile) * val`` (``sql.py:249-283``)
  * standardized popularity ``m / (m + constant)`` applied per row via an
    implicit broadcast join (``sql.py:301-326``)

Scale: percentile_disc is exact. The group count is tiny (one row per
provider) but the per-group value sets are huge at 100 TB, so we compute
it with a sort-based window rather than collecting values: rank each value
within its provider, pick the row at ceil(p * n). One shuffle on provider
(AQE splits skewed providers). ``approx=True`` swaps in
``percentile_approx`` for cluster-scale runs where exactness isn't
required by an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def percentile_disc_by_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentile: float,
    out_col: str = "percentile_value",
    approx: bool = False,
) -> DataFrame:
    """Exact discrete percentile per group: the smallest value v in the
    group such that cume_dist(v) >= p — identical to Postgres
    ``percentile_disc`` and DuckDB ``quantile_disc``."""
    clean = df.filter(F.col(value_col).isNotNull())
    if approx:
        return clean.groupBy(*group_cols).agg(
            F.percentile_approx(value_col, percentile, 100_000).alias(out_col)
        )
    w = Window.partitionBy(*group_cols).orderBy(F.col(value_col))
    ranked = clean.select(
        *group_cols,
        F.col(value_col),
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(Window.partitionBy(*group_cols)).alias("__n"),
    )
    # percentile_disc(p) = value at row ceil(p * n) of the ascending order
    picked = ranked.filter(F.col("__rn") == F.ceil(F.lit(percentile) * F.col("__n")))
    return picked.select(*group_cols, F.col(value_col).alias(out_col))


def percentile_disc_multi(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentiles: dict[str, float],
    count_col: str | None = None,
) -> DataFrame:
    """Several exact discrete percentiles in ONE pass: rank once, then a
    single grouped aggregation picks every requested quantile row
    (``min(when(rn == ceil(p*n), value))``). One shuffle + one sort total,
    where per-percentile calls would rescan and re-sort the fact for each
    p and join the results."""
    clean = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(F.col(value_col))
    ranked = clean.select(
        *group_cols,
        F.col(value_col),
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(Window.partitionBy(*group_cols)).alias("__n"),
    )
    aggs = [
        F.min(
            F.when(
                F.col("__rn") == F.ceil(F.lit(p) * F.col("__n")), F.col(value_col)
            )
        ).alias(out)
        for out, p in percentiles.items()
    ]
    if count_col is not None:
        # __n is already the per-group size from the ranking pass — no
        # extra scan or shuffle to report group cardinality alongside.
        aggs.append(F.max("__n").alias(count_col))
    return ranked.groupBy(*group_cols).agg(*aggs)


def popularity_constants(
    percentiles_df: DataFrame,
    percentile: float,
    value_col: str = "percentile_value",
) -> DataFrame:
    """``CASE WHEN val = 0 THEN 1 ELSE val END`` zero guard then
    ``constant = ((1 - p) / p) * val`` (reference sql.py:249-283)."""
    guarded = F.when(F.col(value_col) == 0, F.lit(1.0)).otherwise(F.col(value_col))
    return percentiles_df.withColumn("raw_value", F.col(value_col)).withColumn(
        "constant", ((1 - F.lit(percentile)) / F.lit(percentile)) * guarded
    )


def standardized_popularity(
    facts: DataFrame,
    constants: DataFrame,
    group_cols: list[str],
    metric_col: str,
    out_col: str = "standardized_popularity",
) -> DataFrame:
    """``metric / (metric + constant)`` per row. Constants table is one row
    per provider — broadcast join, no shuffle of the fact side."""
    joined = facts.join(
        F.broadcast(constants.select(*group_cols, "constant")), group_cols, "left"
    )
    return joined.withColumn(
        out_col,
        F.when(
            F.col(metric_col).isNotNull() & F.col("constant").isNotNull(),
            F.col(metric_col) / (F.col(metric_col) + F.col("constant")),
        ),
    )


def popularity_refresh_pruned(
    spark,
    scored_path: str,
    new_rows: DataFrame,
    group_col: str,
    id_col: str,
    metric_col: str,
    percentile: float = 0.85,
    score_col: str = "standardized_popularity",
    deleted_keys: DataFrame | None = None,
) -> dict:
    """Incremental popularity refresh that touches ONLY the providers
    present in ``new_rows``.

    The reference refreshes popularity per media type on a schedule,
    recomputing every provider's constant and the whole matview
    (``popularity/sql.py:139-421``); at 100 TB the scored table is
    provider-partitioned and a refresh for one provider's new data must
    not read or rewrite the other providers' partitions. This operator:

      1. derives the changed-provider set from the batch (a bounded
         collect — one row per provider),
      2. reads ONLY those providers' partitions from the scored table
         (partition pruning; ``files_read`` in the returned report
         proves untouched partitions never enter the scan),
      3. recomputes percentile -> constant -> score over prior + new
         rows for those providers, and
      4. dynamic-partition-OVERWRITES exactly those partitions
         (``overwrite_partitions``); every other partition's files are
         untouched.

    ``deleted_keys`` (optional, columns ``group_col``/``id_col``) drops
    those ids from their partitions during the rescore — the delete
    half of a change-data-feed consumer (``popularity_refresh_cdf``).

    Returns {changed, files_read, rows_rescored}."""
    from openverse_catalog_spark.operators.layout import overwrite_partitions

    import os

    MAX_CHANGED = 65536  # providers, not rows — a misuse guard
    key_sources = new_rows.select(group_col)
    if deleted_keys is not None:
        key_sources = key_sources.unionByName(deleted_keys.select(group_col))
    rows = (
        key_sources.distinct().limit(MAX_CHANGED + 1).collect()
    )
    if len(rows) > MAX_CHANGED:
        raise ValueError(
            f"popularity_refresh_pruned: > {MAX_CHANGED} distinct "
            f"{group_col!r} values in the batch — the changed set must be "
            "provider-grained, not row-grained; for a full recompute use "
            "the recreate pipeline"
        )
    changed = sorted(r[0] for r in rows)
    # list-time pruning (stronger than plan-time): enumerate ONLY the
    # changed providers' partition directories — untouched partitions
    # never even enter the scan's file index. A changed provider with
    # no existing partition (first batch ever) simply contributes no
    # prior rows.
    part_dirs = [
        d
        for v in changed
        if os.path.isdir(d := os.path.join(scored_path, f"{group_col}={v}"))
    ]
    if part_dirs:
        existing = spark.read.option("basePath", scored_path).parquet(*part_dirs)
    else:
        existing = new_rows.limit(0)
    files_read = list(existing.inputFiles())
    base_cols = [group_col, id_col, metric_col]
    # UPSERT, not blind union: a batch normally RE-DELIVERS updated
    # metrics for existing ids (popularity counts are mutable), so
    # prior rows whose (group, id) reappears in the batch are dropped
    # — new rows win — or the stale metric would both duplicate the id
    # in the overwritten partition and skew the percentile/constant.
    # Anti-join keys are bounded by the batch; one shuffle, AQE
    # broadcasts when the batch is small.
    prior = existing.select(*base_cols).join(
        new_rows.select(group_col, id_col).distinct(),
        [group_col, id_col],
        "left_anti",
    )
    if deleted_keys is not None:
        prior = prior.join(
            deleted_keys.select(group_col, id_col).distinct(),
            [group_col, id_col],
            "left_anti",
        )
    combined = prior.unionByName(new_rows.select(*base_cols))
    p = percentile_disc_by_group(combined, [group_col], metric_col, percentile)
    c = popularity_constants(p, percentile)
    scored = (
        standardized_popularity(
            combined, c, [group_col], metric_col, out_col=score_col
        )
        .join(F.broadcast(c.select(group_col, "raw_value")), [group_col], "left")
        .select(id_col, metric_col, "raw_value", "constant", score_col, group_col)
    )
    scored = scored.localCheckpoint(eager=True)  # sever lineage from the
    # partitions being overwritten (Spark cannot overwrite its own input)
    overwrite_partitions(scored, scored_path, [group_col])
    # a provider whose every id was deleted writes NO rows, and dynamic
    # overwrite only replaces partitions present in the output — drop
    # the now-empty partition directories explicitly (bounded by the
    # changed set, one tiny distinct)
    per_group = scored.groupBy(group_col).count().collect()
    still_present = {r[0] for r in per_group}
    for v in changed:
        if v not in still_present:
            import shutil

            d = os.path.join(scored_path, f"{group_col}={v}")
            if os.path.isdir(d):
                shutil.rmtree(d)
    return {
        "changed": changed,
        "files_read": files_read,
        # the per-group counts sum to the rescored total, so the former
        # separate count() job rides the still-present aggregation
        "rows_rescored": sum(r["count"] for r in per_group),
    }


def popularity_refresh_cdf(
    spark,
    scored_path: str,
    table,
    from_version: int,
    to_version: int | None = None,
    group_col: str = "provider",
    id_col: str = "foreign_identifier",
    metric_col: str = "metric",
    percentile: float = 0.85,
    score_col: str = "standardized_popularity",
) -> dict:
    """Incremental popularity refresh driven by the CowTable CHANGE DATA
    FEED instead of a caller-supplied batch: consume
    ``table.read_changes(from_version, to_version)`` and apply exactly
    the logical delta —

      * ``insert`` / ``update_postimage`` rows upsert their metric,
      * ``delete`` rows leave the scored table,
      * ``update_preimage`` rows are ignored (superseded by the post
        image of the same commit).

    This is the reference's scheduled popularity refresh
    (``popularity/sql.py:286-298`` recomputes the whole matview) turned
    into an O(changed-rows) maintenance step: the feed reads only the
    files the commits rewrote, the refresh reads only the changed
    providers' scored partitions. An id updated across several commits
    appears once per commit in the feed; keeping the LAST post-image is
    the correct net effect, picked with one max(_commit_version) window
    over the (small) delta.

    Returns the underlying refresh report plus the consumed version
    span."""
    from pyspark.sql import Window

    to_version = table.version if to_version is None else to_version
    # the O(churn) feed (a keyed full-outer diff of the rewritten
    # files) feeds TWO window derivations consumed by two separate
    # actions (the changed-provider collect, the rescore checkpoint);
    # cache it lazily so the diff computes once, not per action
    ch = table.read_changes(from_version, to_version).localCheckpoint(
        eager=False
    )
    upserts = ch.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    )
    # last post-image per id wins across multi-commit spans
    w = Window.partitionBy(group_col, id_col).orderBy(
        F.col("_commit_version").desc()
    )
    upserts = (
        upserts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(group_col, id_col, metric_col)
    )
    # a delete only counts if no later commit re-inserted the id
    last_type = ch.withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy(group_col, id_col).orderBy(
                F.col("_commit_version").desc(),
                # within one commit, post/insert outranks the delete of
                # a different change pair (cannot co-occur for one id)
                F.col("_change_type"),
            )
        ),
    ).filter(F.col("__rn") == 1)
    deletes = last_type.filter(F.col("_change_type") == "delete").select(
        group_col, id_col
    )
    report = popularity_refresh_pruned(
        spark,
        scored_path,
        upserts,
        group_col,
        id_col,
        metric_col,
        percentile=percentile,
        score_col=score_col,
        deleted_keys=deletes,
    )
    report["from_version"] = from_version
    report["to_version"] = to_version
    return report
