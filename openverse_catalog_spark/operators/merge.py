"""Upsert MERGE compiler.

Re-expresses the reference's ``INSERT ... ON CONFLICT (provider,
md5(foreign_identifier)) DO UPDATE SET <per-column strategies>`` (reference
``catalog/dags/common/loader/sql.py:264-332``, strategy SQL at
``columns.py:38-78``) as a distributed full-outer-join merge:

    target ⟗ source ON merge keys
      matched      → per-column strategy expression (ColumnSpec.merge_expr)
      not matched  → insert with defaults (uuid identifier, NOW() stamps)
      target-only  → unchanged

Preprocessing mirrors the reference's upsert statement exactly:
  * DISTINCT ON (url): one row per direct URL within the batch
    (``loader/sql.py:319``) — implemented as a deterministic row_number
    window (the reference is arbitrary-winner; we pin an order, SURVEY §7.3)
  * url-conflict anti-join: skip new rows whose url already exists in the
    target under a DIFFERENT (provider, foreign_identifier)
    (``loader/sql.py:322-326``)

Scale posture: the join shuffles both sides on the merge key — exactly the
plan Delta's MERGE would produce without a file-pruning pass. For 100 TB
canonical tables the target should be bucketed/partitioned by provider so
only touched partitions are rewritten; AQE handles skewed providers. No
Python runs per-row: every strategy is a Catalyst expression.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openverse_catalog_spark.schemas.columns import ColumnSpec, UpsertStrategy


DEFAULT_MERGE_KEYS = ("provider", "foreign_identifier")


def is_orderable_type(dt) -> bool:
    """True iff a column of this datatype can appear in ORDER BY. Spark
    rejects MapType at ANY nesting depth (array<map<...>>, struct with a
    map field), not just top-level maps — so walk the type tree instead
    of a string-prefix test."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return is_orderable_type(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(is_orderable_type(f.dataType) for f in dt.fields)
    return True


def orderable_columns(df: DataFrame, exclude: Sequence[str] = ()) -> list[str]:
    """Names of df's columns usable as deterministic ORDER BY
    tiebreakers: everything not excluded whose type is orderable at
    every nesting level."""
    return [
        f.name
        for f in df.schema.fields
        if f.name not in exclude and is_orderable_type(f.dataType)
    ]


def distinct_on(
    df: DataFrame, partition_cols: list[str], order_cols: list, keep: str = "first"
) -> DataFrame:
    """Postgres ``DISTINCT ON`` as a ranking window (SURVEY W2/W3).

    ``order_cols`` are Column expressions (e.g. ``F.col("updated_on").desc()``).
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def url_conflict_filter(
    source: DataFrame, target: DataFrame, keys: tuple[str, ...] = DEFAULT_MERGE_KEYS
) -> DataFrame:
    """Drop source rows whose ``url`` exists in target under a different
    natural key (reference ``loader/sql.py:322-326``).

    left_anti join on url with a key-mismatch condition; target side is
    projected to (url, keys) before the join so only those columns shuffle.
    """
    tgt_urls = target.select(
        F.col("url").alias("__t_url"), *[F.col(k).alias(f"__t_{k}") for k in keys]
    )
    cond = source["url"] == tgt_urls["__t_url"]
    key_mismatch = None
    for k in keys:
        ne = ~(source[k].eqNullSafe(tgt_urls[f"__t_{k}"]))
        key_mismatch = ne if key_mismatch is None else (key_mismatch | ne)
    return source.join(tgt_urls, cond & key_mismatch, "left_anti")


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    columns: list[ColumnSpec],
    keys: tuple[str, ...] = DEFAULT_MERGE_KEYS,
    dedupe_source_on_url: bool = True,
    guard_url_conflicts: bool = True,
    deterministic: bool = False,
    status_col: str | None = None,
    validate_unique: bool = False,
) -> DataFrame:
    """Compile and execute the upsert merge; returns the new target state.

    ``columns`` must cover every column of ``target``; ``source`` may lack
    db-only columns (they are inserted with defaults). ``deterministic``
    replaces NOW()/uuid() with fixed values so results hash stably in
    oracle tests (reference tests inject timestamps the same way,
    SURVEY §7.3). ``validate_unique`` applies ``enforce_unique`` to the
    merged state, so the output satisfies the reference's unique-index
    invariants even when the INCOMING target was already dirty (the
    merge itself never creates a new violation: the join is keyed and
    the source is url-deduped + url-guarded).
    """
    key_list = list(keys)

    if dedupe_source_on_url and "url" in source.columns:
        # DISTINCT ON (url) — pin lexicographic key order as the winner.
        source = distinct_on(source, ["url"], [F.col(k) for k in key_list])
    if guard_url_conflicts and "url" in source.columns:
        source = url_conflict_filter(source, target, keys)

    # Align source to the full column set (version-missing cols → NULL,
    # reference loader/sql.py:240-261).
    for c in columns:
        if c.name not in source.columns:
            source = source.withColumn(c.name, F.lit(None).cast(c.spark_type))

    now = F.lit("2024-01-01 00:00:00").cast("timestamp") if deterministic else F.current_timestamp()

    def new_uuid():
        if deterministic:
            # stable surrogate from the natural key
            return F.md5(F.concat_ws("|", *[F.coalesce(F.col(f"__s_{k}").cast("string"), F.lit("")) for k in key_list]))
        return F.expr("uuid()")

    # literal presence markers, NOT key-column null checks: the join is
    # eqNullSafe, so a NULL-key row is a legitimate participant — testing
    # the first key's nullness would fabricate an all-NULL output row for
    # a NULL-key source insert and skip the merge strategy on a NULL-key
    # match
    t = target.select(
        [F.col(c.name).alias(f"__t_{c.name}") for c in columns]
        + [F.lit(True).alias("__t_present")]
    )
    s = source.select(
        [F.col(c.name).alias(f"__s_{c.name}") for c in columns]
        + [F.lit(True).alias("__s_present")]
    )

    cond = None
    for k in key_list:
        eq = F.col(f"__t_{k}").eqNullSafe(F.col(f"__s_{k}"))
        cond = eq if cond is None else (cond & eq)

    joined = t.join(s, cond, "full_outer")

    in_src = F.col("__s_present").isNotNull()
    in_tgt = F.col("__t_present").isNotNull()

    out_cols = []
    for c in columns:
        tcol = F.col(f"__t_{c.name}")
        scol = F.col(f"__s_{c.name}")
        # matched: per-column strategy
        if c.upsert_strategy == UpsertStrategy.now:
            matched = now
            inserted = now
        elif c.upsert_strategy == UpsertStrategy.false:
            matched = F.lit(False)
            inserted = F.lit(False)
        elif c.upsert_strategy == UpsertStrategy.no_change:
            matched = tcol
            inserted = now if c.datatype.name == "timestamp" else (
                new_uuid() if c.name == "identifier" else scol
            )
        else:
            matched = c.merge_expr(tcol, scol)
            inserted = scol
        out = (
            F.when(in_src & in_tgt, matched)
            .when(in_src, inserted)
            .otherwise(tcol)
        )
        out_cols.append(out.alias(c.name))

    if status_col:
        out_cols.append(
            F.when(in_src & in_tgt, F.lit("updated"))
            .when(in_src, F.lit("inserted"))
            .otherwise(F.lit("kept"))
            .alias(status_col)
        )
    result = joined.select(out_cols)
    if validate_unique:
        result = enforce_unique(result, keys=keys)
    return result


def uniqueness_report(
    df: DataFrame,
    keys: tuple[str, ...] = DEFAULT_MERGE_KEYS,
    url_col: str = "url",
) -> DataFrame:
    """Violations of the reference's canonical-table unique indexes
    (``docker/local_postgres/0003_openledger_image_schema.sql:46-54``:
    UNIQUE (provider, md5(foreign_identifier)) and UNIQUE (url)) as a
    report DataFrame (constraint, key, n) — one row per key value that
    appears more than once. NULL urls are exempt (a Postgres unique
    index admits any number of NULLs).

    Two map-side-combined groupBys on narrow projections; no join.
    """
    key_expr = F.concat_ws(
        "|", F.col(keys[0]), F.md5(F.col(keys[1]).cast("string"))
    )
    by_key = (
        # NULL key components are exempt: a Postgres unique index entry
        # containing a NULL never conflicts, and concat_ws would
        # otherwise collapse ('flickr', NULL) rows onto the bare
        # provider string and report phantom violations
        df.filter(F.col(keys[0]).isNotNull() & F.col(keys[1]).isNotNull())
        .groupBy(key_expr.alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select(F.lit("provider_md5_fid").alias("constraint"), "key", "n")
    )
    by_url = (
        df.filter(F.col(url_col).isNotNull())
        .groupBy(F.col(url_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select(F.lit("url").alias("constraint"), "key", "n")
    )
    return by_key.unionByName(by_url)


def enforce_unique(
    df: DataFrame,
    keys: tuple[str, ...] = DEFAULT_MERGE_KEYS,
    url_col: str = "url",
) -> DataFrame:
    """Enforce both canonical-table uniqueness invariants on a table
    state, keeping a deterministic winner per violated key — the
    DataFrame analog of the reference's unique indexes, which REJECT
    the violating insert (here: the lexicographically-first row wins,
    so the operation is idempotent and order-independent).

    Pass 1: one row per natural key (ordered by url, with every
    remaining ORDERABLE column as a tiebreaker so the keeper is total
    even on a dirty input where the key does NOT determine the row —
    map-typed columns like meta_data are not orderable in Spark and are
    excluded; on the canonical schema the orderable columns already
    determine the row). Pass 2: one row per non-NULL url (ordered by the
    natural key + tiebreakers); NULL-url rows pass through untouched.
    Each pass is a single keyed window — two shuffles total on narrow
    keys."""
    rest = orderable_columns(df, exclude=(*keys, url_col))
    has_url = url_col in df.columns
    first_order = (
        [F.col(url_col).asc_nulls_last()] if has_url else []
    ) + [F.col(c) for c in rest]
    df = distinct_on(df, list(keys), first_order or [F.lit(1)])
    if not has_url:
        # no url column -> only the natural-key invariant applies
        return df
    with_url = df.filter(F.col(url_col).isNotNull())
    without_url = df.filter(F.col(url_col).isNull())
    kept = distinct_on(
        with_url, [url_col], [F.col(k) for k in keys] + [F.col(c) for c in rest]
    )
    return kept.unionByName(without_url)


def merge_metrics(
    loaded: int, cleaned: int, upserted: int, missing: int, fid_dups: int
) -> dict[str, int]:
    """Post-upsert accounting (reference ``loader/loader.py:44-67``):
    url_dup = loaded - missing - foreign_id_dup - upserted."""
    return {
        "loaded": loaded,
        "missing_columns": missing,
        "foreign_id_dup": fid_dups,
        "upserted": upserted,
        "url_dup": loaded - missing - fid_dups - upserted,
    }


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Change-data capture between two keyed snapshots: one row per key
    that was added, removed, or changed (unchanged keys are dropped).

    Each side is reduced to (keys, row_hash) BEFORE the join — the
    md5-of-concatenated-columns collapses arbitrarily wide rows to one
    64-char value, so the full-outer join shuffles keys + a hash, not
    the payload. The join is a plain equi-join on the keys (bucketable /
    AQE-splittable); diffing two 100 TB snapshots moves only key+hash.
    NULLs hash distinctly from empty strings via a sentinel.
    """
    def hashed(df: DataFrame, alias: str) -> DataFrame:
        parts = []
        for c in compare_cols:
            parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00null")))
            parts.append(F.lit("\x1f"))
        return df.select(
            *keys, F.md5(F.concat(*parts)).alias(alias)
        )

    o = hashed(old, "_oh")
    n = hashed(new, "_nh")
    joined = o.join(n, list(keys), "full_outer")
    change = (
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("changed"))
    )
    return (
        joined.select(*keys, change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )


def merge_upsert_pruned(
    target: DataFrame,
    source: DataFrame,
    columns: list[ColumnSpec],
    keys: tuple[str, ...] = DEFAULT_MERGE_KEYS,
    partition_col: str = "provider",
    **kwargs,
) -> DataFrame:
    """Partition-pruned upsert: only target slices whose ``partition_col``
    value appears in the batch enter the merge join; every other slice
    passes through UNTOUCHED (and with the canonical table partitioned by
    provider on disk, the anti side is metadata-only pruning — those
    files are never read, let alone rewritten). A typical provider batch
    touches one provider of dozens, so the full-outer merge join runs
    against a small fraction of the 100 TB table instead of all of it —
    the DataFrame analog of Delta MERGE's file-pruning on a partitioned
    key. Results are row-identical to ``merge_upsert`` because rows of
    untouched partitions can only ever classify as 'kept' (the merge
    keys include the partition column)."""
    if partition_col not in [k for k in keys]:
        raise ValueError(
            f"partition_col {partition_col!r} must be a merge key for "
            "pruning to preserve semantics"
        )
    # Source preprocessing must happen against the FULL target, not the
    # pruned slice: the url-conflict guard (reference loader/sql.py:322-326)
    # skips a new row whose url exists under a different natural key in ANY
    # partition, including ones this batch doesn't touch. url_conflict_filter
    # projects the target to (url, keys) before joining, so the "full target"
    # side of this guard is a narrow column scan, not a full-width read.
    dedupe = kwargs.pop("dedupe_source_on_url", True)
    guard = kwargs.pop("guard_url_conflicts", True)
    if dedupe and "url" in source.columns:
        source = distinct_on(source, ["url"], [F.col(k) for k in keys])
    if guard and "url" in source.columns:
        source = url_conflict_filter(source, target, keys)
    kwargs["dedupe_source_on_url"] = False
    kwargs["guard_url_conflicts"] = False
    # uniqueness repair must see the WHOLE table (a url dup can span an
    # untouched partition) — run it after the union, not inside the
    # pruned merge, to keep row-identity with merge_upsert
    validate = kwargs.pop("validate_unique", False)
    batch_parts = F.broadcast(source.select(partition_col).distinct())
    affected = target.join(batch_parts, partition_col, "left_semi")
    untouched = target.join(batch_parts, partition_col, "left_anti")
    merged = merge_upsert(affected, source, columns, keys=keys, **kwargs)
    status_col = kwargs.get("status_col")
    if status_col:
        untouched = untouched.withColumn(status_col, F.lit("kept"))
    out = merged.unionByName(
        untouched.select(merged.columns), allowMissingColumns=False
    )
    if validate:
        out = enforce_unique(out, keys=keys)
    return out
