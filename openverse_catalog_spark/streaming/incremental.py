"""Incremental / streaming patterns (SURVEY §2.10).

The reference is batch-only, but its dated ingestion (I1), reingestion
re-merge (I3), and matview refresh (I5) are incremental-batch shapes that
map onto Structured Streaming:

  * ``stream_windowed_counts`` — Trigger.AvailableNow file stream over the
    events table with event-time tumbling windows: the Spark-native form
    of the reference's daily-dated DAG runs (provider_dag_factory.py:96-99).
  * ``stream_merge_foreach_batch`` — foreachBatch incremental MERGE of
    each micro-batch into a canonical aggregate (the I5 'refresh
    materialized view' done incrementally instead of full recompute).
  * ``watermarked_late_counts`` — watermark + append mode: the streaming
    analog of reingestion's late/re-arriving data handling (I3).

At scale: AvailableNow gives exactly-once incremental batches over a
landing zone with checkpoint tracking — the direct replacement for the
reference's Airflow catchup machinery.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openverse_catalog_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    # file streams require an explicit schema; take it from a batch read so
    # the stream tracks however the generator wrote `ts` (plain TIMESTAMP
    # vs TIMESTAMP(NANOS), which Spark surfaces as long nanos)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(schema["ts"].dataType, T.TimestampNTZType):
        # watermarks require TIMESTAMP (LTZ); session TZ is pinned UTC so
        # the cast is a pure type change, not a wall-clock shift
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def stream_windowed_counts(
    spark: SparkSession, sf_dir: str, window: str = "1 day"
) -> DataFrame:
    """Run an AvailableNow streaming aggregation to completion and return
    the result as a (batch) DataFrame: per (event-time window, event_type)
    counts + sums. Complete output mode -> memory sink."""
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n",
            "total",
        )
    )
    name = "stream_windowed_counts_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_click_purchase_join(
    spark: SparkSession, sf_dir: str, within: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join: purchases matched to the same user's
    clicks in the hour before (strict). Both sides carry watermarks and
    the join condition pairs the user_id equi-key with an event-time
    range, so Spark plans a symmetric hash join partitioned on user_id
    whose per-key state is bounded by watermark + range — the form that
    runs indefinitely on unbounded streams (a condition without the
    time bound would accrete state forever). AvailableNow to a memory
    sink; the emitted matches equal the batch interval join, which is
    the oracle."""
    ev = _events_stream(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", within)
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", within)
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"p_user = c_user AND c_ts >= p_ts - INTERVAL {within}"
            " AND c_ts < p_ts"
        ),
    ).select(
        "purchase_id",
        "click_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )
    name = "stream_click_purchase_join_sink"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_static_enrich(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-static join: the event stream enriched against a static
    dimension (customer market segment). The static side is a plain
    batch DataFrame re-resolved per micro-batch and hash-joined
    (broadcast when small) WITHOUT any streaming state — the standard
    shape for reference-data enrichment in a pipeline, and the one join
    kind that needs no watermark at all. AvailableNow to a memory sink;
    equals the batch left join, which is the oracle."""
    from openverse_catalog_spark.session import load_tables

    dim = load_tables(spark, sf_dir, ("customer",))["customer"].select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    enriched = (
        _events_stream(spark, sf_dir)
        .select("event_id", "user_id", "event_type")
        .join(F.broadcast(dim), "user_id", "left")
        .select("event_id", "user_id", "event_type", "segment")
    )
    name = "stream_static_enrich_sink"
    q = (
        enriched.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def watermarked_late_counts(
    spark: SparkSession, sf_dir: str, window: str = "1 day", watermark: str = "2 hours"
) -> DataFrame:
    """Watermark + append-mode windowed counts: only windows the watermark
    has passed are emitted — the late-data contract the reference handles
    by re-running old dates (I3)."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n",
        )
    )
    name = "stream_late_counts_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_merge_foreach_batch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """foreachBatch incremental rollup: each micro-batch's partial per-user
    aggregate is merged (full-outer coalesce-sum) into an accumulating
    state table — the incremental 'REFRESH MATERIALIZED VIEW'
    (popularity/sql.py:286-298) without full recompute."""
    state: dict[str, DataFrame] = {}

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        part = batch_df.groupBy("user_id").agg(
            F.count("*").alias("n"), F.sum("value").alias("total")
        )
        if "agg" not in state:
            state["agg"] = part
        else:
            old = state["agg"].select(
                F.col("user_id"),
                F.col("n").alias("o_n"),
                F.col("total").alias("o_total"),
            )
            state["agg"] = (
                old.join(part, "user_id", "full_outer")
                .select(
                    "user_id",
                    (F.coalesce("o_n", F.lit(0)) + F.coalesce("n", F.lit(0))).alias("n"),
                    (
                        F.coalesce("o_total", F.lit(0.0))
                        + F.coalesce("total", F.lit(0.0))
                    ).alias("total"),
                )
            )
        state["agg"] = state["agg"].localCheckpoint()

    q = (
        _events_stream(spark, sf_dir)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    q.awaitTermination()
    return state["agg"].select(
        "user_id", "n", F.round("total", 2).alias("total")
    )


def stream_dedup_first_seen(
    spark: SparkSession, sf_dir: str, key_cols: tuple[str, ...] = ("user_id", "event_type")
) -> DataFrame:
    """Streaming exact dedup: ``dropDuplicates`` on the natural key with a
    watermark bounding the dedup state — the streaming form of the
    reference's (provider, md5(foreign_id)) staging dedup (J6,
    loader/sql.py:220-232). Emits each key once, on first arrival; only
    the key columns are returned (which physical row wins first-arrival
    is stream-order-dependent, the key set is not)."""
    dedup = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 day")
        .dropDuplicates([*key_cols])
        .select(*key_cols)
    )
    name = "stream_dedup_sink"
    q = (
        dedup.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_sessionize(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stateful sessionization with built-in session windows: per-user
    event sessions that close after ``gap`` of inactivity; append mode
    emits a session once the watermark passes its end (last event + gap).
    The custom-stateful-operator slot — expressed with
    ``session_window`` so state management, merge and eviction stay in
    Tungsten rather than a hand-rolled applyInPandasWithState."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )
    name = "stream_sessionize_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_stateful_quota(
    spark: SparkSession, sf_dir: str, quota: int = 300
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    a per-key running (count, value-sum) with a quota flag — the
    reference's overfetch/cutoff detection (I4,
    time_delineated_provider_data_ingester.py:221-259) as streaming
    state instead of an ingestion-side accumulator.

    Each micro-batch updates the group's GroupState and emits the new
    cumulative row; because cumulative counts are monotone per key, the
    final state is recovered batch-count-independently with one
    ``max_by`` pass over the sink — so the operator stays deterministic
    (and oracle-checkable) however the stream is micro-batched.

    State is one small tuple per key: bounded by key cardinality, not
    stream length — the shape that survives unbounded streams."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "cum_n": [n],
                "cum_total": [total],
                "over_quota": [n > quota],
            }
        )

    out = (
        _events_stream(spark, sf_dir)
        .groupBy("event_type")
        .applyInPandasWithState(
            fn,
            outputStructType="event_type string, cum_n long, cum_total double, over_quota boolean",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = "stream_stateful_quota_sink"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    q.awaitTermination()
    # final state per key = the emission with the largest cumulative count
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(
            F.max("cum_n").alias("cum_n"),
            F.round(F.max_by("cum_total", "cum_n"), 2).alias("cum_total"),
            F.max_by("over_quota", "cum_n").alias("over_quota"),
        )
    )


def publish_swap(
    df: DataFrame,
    base_dir: str,
    name: str,
    spark: SparkSession | None = None,
) -> str:
    """S13 analog: atomic publish of a recomputed table — write the new
    snapshot to a versioned path, then swap the readable view to it.
    Readers of ``name`` see either the old snapshot or the new one,
    never a partial write (the reference's Elasticsearch alias-promote,
    data_refresh_task_factory.py:183-240, done with paths + a view).

    Returns the snapshot path. Old snapshots are left for time-travel /
    rollback; ``rotate_snapshots`` is the retention job that prunes
    them.
    """
    import time as _time

    spark = spark or df.sparkSession
    version = int(_time.time() * 1000)
    path = f"{base_dir}/{name}/v={version}"
    df.write.mode("overwrite").parquet(path)
    # the swap: re-pointing a view is a metadata-only operation
    spark.read.parquet(path).createOrReplaceTempView(name)
    return path


def publish_swap_incremental(
    table,
    from_version: int,
    base_dir: str,
    name: str,
    keys: tuple[str, ...] | None = None,
    spark: SparkSession | None = None,
    to_version: int | None = None,
) -> dict:
    """Incremental publish: maintain the published snapshot of ``name``
    by APPLYING the CowTable change feed to the previously published
    snapshot instead of re-exporting the whole table — the incremental
    half of the reference's Elasticsearch handoff (its data refresh
    re-ships the entire table through an ingestion server and
    alias-swaps, ``data_refresh_task_factory.py:183-240``; at 100 TB
    only the delta can move).

      new snapshot = (previous snapshot ANTI-JOIN touched keys)
                     UNION (last post-image of upserted keys)

    where touched keys = every key in the feed (insert / update /
    delete — deletes simply contribute nothing to the union). The write
    cost is O(previous snapshot) locally because parquet files are
    immutable, but the LOGIC shipped to an external index is exactly
    the delta — ``export_changes`` below writes that delta for an
    indexer to consume. The swap itself stays atomic via
    ``publish_swap``. Falls back to a FULL publish when no previous
    snapshot exists (first run). Returns {path, upserts, deletes,
    from_version, to_version, mode}."""
    import os

    spark = spark or table.spark
    keys = tuple(keys or table.keys)
    to_version = table.version if to_version is None else to_version
    root = os.path.join(base_dir, name)
    versions = (
        sorted(
            (d for d in os.listdir(root) if d.startswith("v=")),
            key=lambda d: int(d.removeprefix("v=")),
        )
        if os.path.isdir(root)
        else []
    )
    if not versions:
        df = table.read(version=to_version)
        path = publish_swap(df, base_dir, name, spark)
        return {
            "path": path, "upserts": df.count(), "deletes": 0,
            "from_version": from_version, "to_version": to_version,
            "mode": "full",
        }
    prev = spark.read.parquet(os.path.join(root, versions[-1]))
    ch = table.read_changes(from_version, to_version)
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col("_commit_version").desc())
    last = (
        ch.filter(F.col("_change_type") != "update_preimage")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .localCheckpoint(eager=False)  # three consumers: counts,
        # anti-join keys, upsert rows — without the pin the netting
        # window over the whole feed span would run three times
    )
    upserts = last.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).drop("_change_type", "_commit_version", "__rn")
    touched = last.select(*keys)
    # one aggregate for both counters (upserts + deletes)
    cnt = last.agg(
        F.sum(
            F.col("_change_type").isin("insert", "update_postimage")
            .cast("long")
        ).alias("up"),
        F.sum((F.col("_change_type") == "delete").cast("long")).alias("de"),
    ).head()
    n_up = int(cnt["up"] or 0)
    n_del = int(cnt["de"] or 0)
    merged = prev.join(touched, list(keys), "left_anti").unionByName(
        upserts, allowMissingColumns=True
    )
    path = publish_swap(merged, base_dir, name, spark)
    return {
        "path": path, "upserts": n_up, "deletes": n_del,
        "from_version": from_version, "to_version": to_version,
        "mode": "incremental",
    }


def export_changes(
    table,
    from_version: int,
    out_dir: str,
    to_version: int | None = None,
) -> dict:
    """Write the raw change feed for an EXTERNAL consumer (the search
    indexer): one parquet dataset partitioned by ``_change_type``, plus
    a tiny JSON descriptor recording the version span — the handoff
    artifact an ingestion server would tail instead of re-receiving the
    full table. Idempotent per (from, to) span: the output directory is
    keyed by the span, so a retried export overwrites its own span and
    never duplicates another's."""
    import json
    import os

    to_version = table.version if to_version is None else to_version
    ch = table.read_changes(from_version, to_version).filter(
        F.col("_change_type") != "update_preimage"
    )
    span_dir = os.path.join(
        out_dir, f"delta_v{from_version}_v{to_version}"
    )
    ch.write.mode("overwrite").partitionBy("_change_type").parquet(span_dir)
    counts = {
        r["_change_type"]: r["n"]
        for r in spark_count_by_type(ch).collect()
    }
    desc = {
        "from_version": from_version,
        "to_version": to_version,
        "counts": counts,
    }
    with open(os.path.join(span_dir, "_delta_span.json"), "w") as f:
        json.dump(desc, f)
    return {**desc, "path": span_dir}


def spark_count_by_type(ch: DataFrame) -> DataFrame:
    return ch.groupBy("_change_type").agg(F.count(F.lit(1)).alias("n"))


def rotate_snapshots(base_dir: str, name: str, keep: int = 2) -> list[str]:
    """Retention for the publish_swap snapshot chain: keep the newest
    ``keep`` versioned snapshots of ``name``, delete the rest — the
    reference's rotate_db_snapshots maintenance DAG
    (``catalog/dags/maintenance/rotate_db_snapshots.py``: list
    snapshots newest-first, delete beyond the horizon), applied to
    published parquet snapshots instead of RDS. Never deletes the
    newest snapshot (the live view's backing files). Returns the
    deleted snapshot paths, oldest first."""
    import os
    import shutil

    root = os.path.join(base_dir, name)
    if not os.path.isdir(root):
        return []
    versions = sorted(
        (d for d in os.listdir(root) if d.startswith("v=")),
        key=lambda d: int(d.removeprefix("v=")),
    )
    doomed = versions[: -keep] if keep > 0 else versions[:-1]
    deleted = []
    for d in doomed:
        shutil.rmtree(os.path.join(root, d))
        deleted.append(os.path.join(root, d))
    return deleted


def stream_landing_to_cow(
    spark: SparkSession,
    landing_dir: str,
    table_root: str,
    columns,
    media_type: str = "image",
    deterministic: bool = True,
    checkpoint_dir: str | None = None,
    compact_target_rows: int | None = None,
):
    """Streaming ingestion end to end: the provider landing zone
    (JSONL files as they arrive) is a file-source STREAM; each
    micro-batch runs the standard clean (clean_media_batch) + exact
    dedupe and MERGEs into the copy-on-write lake table via
    foreachBatch — the continuous version of the reference's
    pull -> load -> clean -> upsert DAG chain, with the CoW manifest
    giving every micro-batch commit snapshot isolation and file
    skipping.

    availableNow trigger: drains whatever landing files exist and stops
    — the same call is both the backfill and the incremental tick. The
    checkpoint lives INSIDE the table root by default, so successive
    ticks share it and each landing file is processed exactly once
    across calls (pass ``checkpoint_dir`` to place it elsewhere).

    ``compact_target_rows`` runs the table's bin-packing OPTIMIZE after
    the drain: per-micro-batch MERGEs are exactly the workload that
    accumulates small files, so ingest-then-compact in one call is the
    steady-state maintenance loop. Returns the CowTable handle."""
    import os as _os

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.dedupe import exact_dedupe
    from openverse_catalog_spark.plans.media_pipeline import clean_media_batch
    from openverse_catalog_spark.sources.providers import staging_schema

    table = CowTable(spark, table_root)
    if checkpoint_dir is None:
        checkpoint_dir = _os.path.join(table_root, "_checkpoint")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        cleaned = clean_media_batch(batch_df, spark, media_type)
        deduped = exact_dedupe(
            cleaned, ["provider", "foreign_identifier"], [F.col("url")]
        )
        # txn token (Delta's txnAppId/txnVersion): the checkpoint makes
        # replay at-least-once; the recorded (app, batch_id) makes the
        # MERGE itself exactly-once even when the crash landed BETWEEN
        # manifest link and checkpoint advance
        table.merge(
            deduped.select([c.name for c in columns if c.name in deduped.columns]),
            columns,
            deterministic=deterministic,
            txn_app=f"landing:{checkpoint_dir}",
            txn_version=batch_id,
        )

    stream = (
        spark.readStream.schema(staging_schema())
        .option("recursiveFileLookup", "true")
        .json(landing_dir)
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.awaitTermination()
    if compact_target_rows is not None:
        table.compact(target_rows=compact_target_rows)
    return table


def _tombstone_root(table) -> str:
    return f"{table.root}/_tombstones"


#: a _tombstones directory with no committed manifest is a crashed
#: first create — but only once it is OLDER than this (a younger one
#: may be a live writer's in-flight attempt; deleting it would corrupt
#: the store it is about to link — the same written-but-not-yet-linked
#: ambiguity CowTable.vacuum age-gates)
_TOMBSTONE_HUSK_RETENTION = 3600.0

#: tombstone-store hygiene cadence: expiry purge + vacuum run only
#: once the store's on-disk manifest chain exceeds this many commits
#: (one listdir per batch decides), so a CDC micro-batch pays O(1)
#: metadata instead of an O(manifests) walk every trigger
_TOMBSTONE_VACUUM_EVERY = 12


def tombstone_retention_of(ts_root: str) -> float | None:
    """The retention window the store's fences are evaluated under —
    persisted by ``apply_changes`` (latest apply wins, matching the
    fence, which uses the caller's current retention). None for stores
    written before the sidecar existed: observability then reports the
    raw stored fences."""
    import json as _json

    try:
        with open(f"{ts_root}/retention.json") as fh:
            return float(_json.load(fh)["retention"])
    except (OSError, ValueError, KeyError, TypeError):
        # TypeError included: a malformed sidecar ({"retention": null},
        # a bare list) must degrade to the legacy raw-fence report, not
        # crash DESCRIBE DETAIL
        return None


def _save_tombstone_retention(ts_root: str, retention: float) -> None:
    import json as _json
    import os as _os
    import uuid as _uuid

    tmp = f"{ts_root}/.retention.{_uuid.uuid4().hex}.json"
    with open(tmp, "w") as fh:
        _json.dump({"retention": float(retention)}, fh)
    _os.replace(tmp, f"{ts_root}/retention.json")


def _tombstone_store(table, keys):
    """The tombstone side table if it EXISTS (any committed manifest —
    vacuum legitimately drops v1.json once the store passes the keep
    window, so probing v1 specifically would misread a live store as
    debris), else None. A manifest-less husk older than the retention
    is cleared as debris; a young husk is left alone and is HARMLESS
    to the caller's create — create writes each attempt into a unique
    data dir and claims v1 by exclusive manifest link, so a replay
    after a crash mid-first-create succeeds immediately (the husk's
    orphan dir ages out under vacuum's never-referenced sweep)."""
    import os as _os
    import re as _re
    import shutil as _shutil
    import time as _time

    from openverse_catalog_spark.operators.cowtable import CowTable

    root = _tombstone_root(table)
    mdir = f"{root}/manifests"
    if _os.path.isdir(mdir) and any(
        _re.fullmatch(r"v\d+\.json", n) for n in _os.listdir(mdir)
    ):
        return CowTable(table.spark, root, keys=keys)
    if _os.path.isdir(root):
        newest = _os.path.getmtime(root)
        for dp, _, fns in _os.walk(root):
            for fn in fns:
                newest = max(
                    newest, _os.path.getmtime(_os.path.join(dp, fn))
                )
        if _time.time() - newest >= _TOMBSTONE_HUSK_RETENTION:
            _shutil.rmtree(root, ignore_errors=True)
    return None


def apply_changes(
    table,
    changes: DataFrame,
    sequence_by: str,
    op_col: str = "op",
    delete_op: str = "D",
    txn_app: str | None = None,
    txn_version: int | None = None,
    tombstone_retention: float | None = None,
) -> dict:
    """APPLY CHANGES INTO (DLT-style SCD1 CDC apply): a batch of
    row-change events — each row an upsert or a delete (``op_col``)
    carrying an ordering column (``sequence_by``) — lands on the lake
    table as ONE snapshot-isolated commit.

    Semantics:
      * latest-wins within the batch: only each key's highest-sequence
        change applies (ties break on op descending, so a same-sequence
        delete beats an upsert — deterministic, documented, and a tie
        is a source-data smell either way);
      * out-of-order protection ACROSS batches: the table stores the
        sequence column, and a change older than the stored value is
        ignored (stale update/delete arriving after a newer image);
      * a delete for an absent key is a no-op;
      * ``tombstone_retention=None`` (legacy): a delete's fence dies
        with the row, so a STALE upsert arriving in a LATER batch
        re-inserts a deleted key. ``tombstone_retention=<seconds>``
        keeps each winning delete's (key, sequence) in a side CoW
        table (``<root>/_tombstones``, DLT's tombstone store): an
        upsert at-or-below the tombstone sequence is fenced (dropped —
        same tie rule as in-batch, delete wins), a genuinely newer
        upsert clears the tombstone and re-inserts. Expiry is enforced
        in the FENCE itself (a tombstone older than the window never
        fences), so the physical purge + store vacuum run periodically
        (every ``_TOMBSTONE_VACUUM_EVERY`` store commits), not per
        micro-batch. Retention bounds the store exactly like DLT: a
        source that can deliver an event more than ``retention`` late
        needs a longer window.

    CRASH SAFETY with tombstones: the tombstone commit lands BEFORE
    the main merge, both fenced by the same txn token, so a replayed
    batch (foreachBatch at-least-once) skips whichever halves already
    landed. Fencing against tombstones that already include this
    batch's own deletes is benign: a key's fenced upsert lost to that
    same delete in latest-wins anyway.

    The apply itself is ``merge_when``: delete/update/insert in one
    commit, file skipping and optimistic concurrency included. The
    reference has no CDC consumer at all (each provider re-pulls
    source data); this is the piece that lets an external OLTP feed
    drive the lake table. The table schema must contain ``sequence_by``
    (it is the fence); ``op_col`` rides only on the batch."""
    import os as _os
    import time as _time

    from pyspark.sql import Window

    from openverse_catalog_spark.operators.cowtable import CowTable

    keys = table.keys
    if op_col not in changes.columns:
        raise ValueError(f"changes lacks op column {op_col!r}")
    if sequence_by not in changes.columns:
        raise ValueError(f"changes lacks sequence column {sequence_by!r}")
    if changes.filter(F.col(sequence_by).isNull()).head(1):
        # a NULL sequence sorts last in latest-wins AND compares false
        # against every fence — the row would silently lose all
        # ordering decisions; that is source corruption, not a change
        raise ValueError(
            f"changes carry NULL {sequence_by!r} values; the sequence "
            "column is the ordering fence and must be non-NULL"
        )
    w = Window.partitionBy(*keys).orderBy(
        F.col(sequence_by).desc(),
        F.col(op_col).eqNullSafe(delete_op).desc(),
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    if tombstone_retention is not None:
        now = _time.time()
        ts_root = _tombstone_root(table)
        ts = _tombstone_store(table, keys)
        if ts is not None:
            # fence: a non-delete change at-or-below a live tombstone's
            # sequence is a late echo of a deleted image — drop it.
            # Expired tombstones never fence (the retention contract is
            # enforced HERE, in the read), so the physical purge below
            # is pure hygiene and can run lazily.
            tomb = ts.read().filter(
                F.col("__ts_at") >= now - tombstone_retention
            ).select(*keys, "__ts_seq")
            latest = (
                latest.join(tomb, on=list(keys), how="left")
                .filter(
                    (F.col(op_col) == delete_op)
                    | F.col("__ts_seq").isNull()
                    | (F.col(sequence_by) > F.col("__ts_seq"))
                )
                .drop("__ts_seq")
            )
        latest = latest.localCheckpoint(eager=False)
        ts_src = latest.select(
            *keys,
            F.col(sequence_by).alias("__ts_seq"),  # native type: the
            # fence compares it against the live sequence column
            F.lit(now).alias("__ts_at"),
            F.when(F.col(op_col) == delete_op, F.lit("D"))
            .otherwise(F.lit("U")).alias("__op"),
        )
        ts_txn = (f"{txn_app}:tombstones", txn_version) if (
            txn_app is not None
        ) else (None, None)
        created = False
        if ts is None and ts_src.filter(
            F.col("__op") == "D"
        ).head(1):
            # first tombstones: ONE clustered write carrying the same
            # txn token the merge below would have recorded (Delta's
            # txnAppId on the creating commit), so a replayed batch's
            # merge fence skips what the create already landed. A
            # fresh store has no fences for upserts to clear, so
            # inserting the winning deletes IS the full first merge —
            # r7 ran create-empty + merge_when here for the fence, and
            # the extra merge cost ~3.3 s/stream (SCALING.md r8 A/B).
            ts = CowTable.create(
                table.spark, ts_root,
                ts_src.filter(F.col("__op") == "D").drop("__op"),
                keys=keys, target_files=2,
                txn=(ts_txn if ts_txn[0] is not None else None),
            )
            created = True
        if ts is not None:
            # record the window the fences are judged under, so
            # DESCRIBE DETAIL / TABLE_TOMBSTONES can report LIVE fences
            # (a stored-but-expired tombstone no longer fences anything)
            _save_tombstone_retention(ts_root, tombstone_retention)
        if ts is not None and not created:
            # winning deletes upsert their tombstone (never lowering a
            # newer one); surviving upserts clear theirs (key re-lives)
            ts.merge_when(
                ts_src,
                delete_cond="s.__op <> 'D'",
                update_set="*",
                update_cond="s.__op = 'D' AND s.__ts_seq >= t.__ts_seq",
                insert_cond="s.__op = 'D'",
                check_duplicate_keys=False,  # latest-wins made keys unique
                txn_app=ts_txn[0],
                txn_version=ts_txn[1],
            )
            # hygiene is PERIODIC, not per batch: the side table has no
            # user maintenance loop (a long CDC stream would grow its
            # manifest chain forever), but expiry purge + vacuum walk
            # the store's manifests/filesystem — O(manifests) work that
            # must not tax every micro-batch. One listdir gates it;
            # tombstones already purge "opportunistically" by contract,
            # so fencing a hair past retention until the next sweep is
            # within semantics.
            if len(ts._manifest_names()) > _TOMBSTONE_VACUUM_EVERY:
                expired = F.col("__ts_at") < (now - tombstone_retention)
                if ts.read().filter(expired).head(1):
                    ts.delete(expired)
                ts.vacuum(keep_versions=3)

    is_del = f"s.{op_col} = '{delete_op}'"
    fresh = f"s.{sequence_by} >= t.{sequence_by}"
    return table.merge_when(
        latest,
        delete_cond=f"{is_del} AND {fresh}",
        update_set="*",
        update_cond=f"NOT {is_del} AND {fresh}",
        insert_cond=f"NOT {is_del}",
        # latest-wins row_number already made keys unique — the merge's
        # duplicate-key aggregation would re-shuffle the batch to prove
        # what the window above guarantees
        check_duplicate_keys=False,
        txn_app=txn_app,
        txn_version=txn_version,
    )


def stream_cdc_apply(
    spark: SparkSession,
    cdc_dir: str,
    table,
    sequence_by: str,
    op_col: str = "op",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    tombstone_retention: float | None = None,
):
    """The streaming form of ``apply_changes``: a file-source stream
    over a CDC landing directory (parquet change events), each
    micro-batch applied as one commit via foreachBatch under
    AvailableNow — exactly-once per landing file across calls, the
    same drain-and-stop contract as ``stream_landing_to_cow``. The
    per-batch latest-wins collapse plus the stored-sequence fence make
    the result independent of how the log was chopped into batches —
    that is what the oracle-checked query pins."""
    import os as _os

    if checkpoint_dir is None:
        checkpoint_dir = _os.path.join(table.root, "_cdc_checkpoint")
    schema = spark.read.parquet(cdc_dir).schema

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_changes(
            table, batch_df, sequence_by, op_col=op_col,
            txn_app=f"cdc:{checkpoint_dir}", txn_version=batch_id,
            tombstone_retention=tombstone_retention,
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(cdc_dir)
        .writeStream.foreachBatch(_apply)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.awaitTermination()
    return table


def stream_quality_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous data-quality monitoring: each micro-batch of the event
    stream runs the declarative rule suite (operators/quality.py, one
    scan per batch) inside foreachBatch, and per-rule violation counts
    ACCUMULATE — the counters are additive row sums, so the totals are
    independent of batch boundaries and equal the one-shot batch report
    the oracle computes. Only row-local rules belong here (not_null /
    in_range / in_set / regex); cross-row rules (unique, FK) need the
    batch gate or a stateful dedup stage, because per-batch uniqueness
    does not compose into global uniqueness. AvailableNow to completion;
    returns (check, violations, passed)."""
    from openverse_catalog_spark.operators.quality import (
        in_range,
        in_set,
        matches,
        not_null,
        quality_report,
    )

    rules = [
        not_null("user_id"),
        in_range("value", 0, 300),
        in_set("event_type", ["click", "view", "purchase", "signup"]),
        matches("props", r'^\{"k": [0-9]\}$'),
    ]
    totals: dict[str, int] = {}

    def score_batch(batch_df: DataFrame, batch_id: int) -> None:
        for r in quality_report(batch_df, rules).collect():
            totals[r["check"]] = totals.get(r["check"], 0) + r["violations"]

    q = (
        _events_stream(spark, sf_dir)
        .writeStream.foreachBatch(score_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_qm_"))
        .start()
    )
    q.awaitTermination()
    rows = [(r.name, int(totals.get(r.name, 0))) for r in rules]
    from openverse_catalog_spark.session import literal_df

    out = literal_df(spark, rows, "check string, violations long")
    return out.select(
        "check", "violations", (F.col("violations") == 0).alias("passed")
    )


def stream_cow_changes(
    table,
    checkpoint_dir: str,
    apply_fn,
    start_version: int = 1,
    spark: SparkSession | None = None,
) -> dict:
    """Follow a CowTable's commit log AS A STREAM: the manifests
    directory is already an append-only log of immutable ``v<N>.json``
    files (one per commit — the exclusive-create link IS the commit
    point), so a Structured Streaming file source over it turns every
    new commit into a micro-batch. Each batch advances a persisted
    HIGH-WATER version and hands ``apply_fn(changes_df, lo, hi)`` the
    row-level change feed ``read_changes(lo, hi)`` for the newly seen
    span — the Delta "CDF as a streaming source" pattern on this
    table's own log.

    Exactly-once across restarts: the file-source checkpoint makes
    manifest-file delivery at-least-once; the high-water mark (written
    atomically AFTER apply_fn returns) makes the apply idempotent —
    a replayed batch whose versions are all <= the mark is a no-op,
    and ``v<N>.checkpoint.json`` side files vacuum writes parse to
    already-seen versions and are ignored the same way. Use
    Trigger.AvailableNow for the tick-style run (drain everything new,
    then stop) a scheduler invokes after ingest waves.

    Returns {high_water, batches_applied}."""
    import json as _json
    import os as _os
    import uuid as _uuid

    spark = spark or table.spark
    _os.makedirs(checkpoint_dir, exist_ok=True)
    hwm_path = _os.path.join(checkpoint_dir, "_cdf_high_water.json")

    def read_hwm() -> int:
        try:
            with open(hwm_path) as f:
                return int(_json.load(f)["version"])
        except FileNotFoundError:
            return start_version

    applied = {"n": 0}

    def on_batch(bdf: DataFrame, batch_id: int) -> None:
        vs = [
            r["version"]
            for r in bdf.select("version").distinct().collect()
            if r["version"] is not None
        ]
        if not vs:
            return
        hwm = read_hwm()
        hi = max(vs)
        if hi <= hwm:
            return  # replay of already-applied commits: idempotent no-op
        apply_fn(table.read_changes(hwm, hi), hwm, hi)
        tmp = f"{hwm_path}.{_uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            _json.dump({"version": hi}, f)
        _os.replace(tmp, hwm_path)
        applied["n"] += 1

    _drain_commit_log(spark, f"{table.root}/manifests",
                      checkpoint_dir, on_batch)
    return {"high_water": read_hwm(), "batches_applied": applied["n"]}


def _drain_commit_log(spark, manifests_dir, checkpoint_dir, on_batch):
    """ONE AvailableNow drain of a table's commit log (the append-only
    ``v<N>.json`` manifests directory) into ``on_batch`` — the shared
    scaffold under the CDF streaming source, MV maintenance, and
    search-index maintenance triggers, so the glob/schema/parse rules
    exist once."""
    import os as _os

    stream = (
        spark.readStream.schema("version long, operation string")
        .option("pathGlobFilter", "v*.json")
        # manifests are pretty-printed (multi-line) JSON documents, not
        # JSON-lines — without this every line fails to parse to NULL
        .option("multiLine", "true")
        .json(manifests_dir)
    )
    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", _os.path.join(checkpoint_dir, "files"))
        .foreachBatch(on_batch)
        .start()
    )
    q.awaitTermination()


def stream_mv_maintenance(
    mv,
    checkpoint_dir: str,
    spark: SparkSession | None = None,
    pin_fn=None,
    allow_unpinned: bool = False,
) -> dict:
    """CONTINUOUS materialized-view maintenance: follow the MV's base
    table's commit log as a stream (the manifests directory is an
    append-only log of immutable ``v<N>.json`` files) and run an
    incremental :meth:`~..operators.matview.MaterializedView.refresh`
    whenever new commits land — the scheduler-less version of the
    reference's cron'd ``REFRESH MATERIALIZED VIEW`` DAG
    (``popularity/sql.py:286-298``, ``recreate_popularity_calculation``
    workflows): instead of a timer re-aggregating O(table), the view
    chases the table's own commit points at O(churn) per tick.

    Exactly-once composes from two INDEPENDENT idempotence layers:

    * the file-source checkpoint makes manifest delivery at-least-once
      across restarts (a wiped checkpoint just redelivers);
    * the MV's own WAL makes ``refresh()`` idempotent — it advances
      from ``applied_base`` (its durable state, not the stream's) to
      the base's CURRENT version, no-ops when already caught up, and
      finalizes-or-replays a half-applied span after a crash.

    So the stream is purely a TRIGGER: it never hands data to the
    refresh, which re-reads the feed span from its own high-water
    mark. Redundant ticks (replays, vacuum's ``v<N>.checkpoint.json``
    side files matching the glob) cost one metadata version check.

    AvailableNow trigger: drains all new commits and stops — call it
    after ingest waves, or in a loop for continuous maintenance.
    Returns {ticks, refreshes, applied_base}.

    CATALOG-MANAGED bases must pass ``pin_fn`` (the catalog's CURRENT
    pinned version, evaluated per tick) — ENFORCED via the base's
    ``.catalog.json`` marker exactly like the index maintenance
    streams (one shared ticker, ``_stream_pinned_ticks``): an unpinned
    refresh would aggregate unpublished/aborted raw-head versions into
    the view. ``allow_unpinned=True`` is the explicit opt-out."""
    spark = spark or mv.spark
    counts = _stream_pinned_ticks(
        mv.base.root, checkpoint_dir, spark, pin_fn, allow_unpinned,
        "view", lambda pin: mv.refresh(to_version=pin),
    )
    return {**counts, "applied_base": mv._load_state()["applied_base"]}


def stream_index_maintenance(
    idx,
    checkpoint_dir: str,
    spark: SparkSession | None = None,
    pin_fn=None,
    allow_unpinned: bool = False,
) -> dict:
    """CONTINUOUS search-index maintenance: follow the index's base
    table's commit log as a stream (the manifests directory is an
    append-only log of immutable ``v<N>.json`` files) and run an
    incremental :meth:`~..operators.searchindex.SearchIndex.refresh`
    whenever new commits land — the scheduler-less version of the
    reference's per-data-refresh Elasticsearch reindex
    (``data_refresh_task_factory.py:183-240``), at O(changed docs) per
    tick instead of a full-table re-ship.

    Exactly-once composes the same way as ``stream_mv_maintenance``:
    the file-source checkpoint makes manifest delivery at-least-once,
    and the index's pending-span WAL + txn-fenced merges make
    ``refresh()`` idempotent — the stream is purely a TRIGGER; the
    refresh re-reads the feed span from its own durable high-water
    mark. AvailableNow: drains all new commits and stops.

    CATALOG-MANAGED bases must pass ``pin_fn`` (a callable returning
    the catalog's CURRENT pinned version, evaluated per tick —
    ``lambda: facade._catalog_pin('docs')``): an uncapped refresh on
    such a base would index unpublished/aborted raw-head versions that
    no catalog reader sees, exactly what the facade's own REFRESH
    refuses to do. This is ENFORCED, not just documented: a base
    carrying the catalog's ``.catalog.json`` marker with no ``pin_fn``
    raises unless the caller opts out explicitly with
    ``allow_unpinned=True`` (only correct when every head version is
    known published). Plain tables omit it. Returns
    {ticks, refreshes, applied}."""
    return _stream_index_ticks(
        idx, checkpoint_dir, spark, pin_fn, allow_unpinned
    )


def stream_vector_maintenance(
    idx,
    checkpoint_dir: str,
    spark: SparkSession | None = None,
    pin_fn=None,
    allow_unpinned: bool = False,
) -> dict:
    """CONTINUOUS vector-index maintenance — the ANN twin of
    :func:`stream_index_maintenance`: the base embeddings table's
    commit log, followed as a file stream, triggers each incremental
    :meth:`~..operators.vectorindex.VectorIndex.refresh` (O(changed
    vectors): feed pre-images re-assign against the frozen centroids,
    one txn-fenced merge reconciles the lists). Same exactly-once
    composition (file-source checkpoint x pending-span WAL), same
    catalog-pin enforcement. Returns {ticks, refreshes, applied}."""
    return _stream_index_ticks(
        idx, checkpoint_dir, spark, pin_fn, allow_unpinned
    )


def _stream_pinned_ticks(
    base_root, checkpoint_dir, spark, pin_fn, allow_unpinned,
    noun, do_refresh,
) -> dict:
    """Shared commit-log-driven refresh loop for any pinned derived
    structure (search/vector index, materialized view): the stream is
    purely a TRIGGER — each refresh re-reads its feed span from its
    own durable high-water mark. Enforces the catalog-pin discipline
    once: a base carrying the catalog's ``.catalog.json`` marker
    refuses unpinned maintenance (its raw head can hold unpublished/
    aborted versions no catalog reader sees) unless the caller opts
    out explicitly."""
    import os as _os

    if (
        pin_fn is None
        and not allow_unpinned
        and _os.path.exists(f"{base_root}/.catalog.json")
    ):
        raise ValueError(
            f"base table {base_root!r} is catalog-managed (it "
            "carries a .catalog.json marker): its raw head can hold "
            "unpublished/aborted versions no catalog reader sees, so "
            f"unpinned maintenance would leak them into the {noun}. "
            "Pass pin_fn=lambda: <catalog pinned version>, or "
            "allow_unpinned=True ONLY if every head version is "
            "published"
        )
    counts = {"ticks": 0, "refreshes": 0}

    def on_batch(bdf: DataFrame, batch_id: int) -> None:
        if not bdf.select("version").head(1):
            return
        counts["ticks"] += 1
        res = do_refresh(pin_fn() if pin_fn is not None else None)
        if res.get("refreshed"):
            counts["refreshes"] += 1

    _drain_commit_log(spark, f"{base_root}/manifests",
                      checkpoint_dir, on_batch)
    return counts


def _stream_index_ticks(
    idx, checkpoint_dir, spark, pin_fn, allow_unpinned
) -> dict:
    spark = spark or idx.spark
    counts = _stream_pinned_ticks(
        idx.base.root, checkpoint_dir, spark, pin_fn, allow_unpinned,
        "index", lambda pin: idx.refresh(to_version=pin),
    )
    return {**counts, "applied": idx.applied_version}
