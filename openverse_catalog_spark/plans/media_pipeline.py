"""The end-to-end media ingestion pipeline — the reference's main path
(SURVEY §3.1: pull -> TSV -> staging load -> clean -> dedupe -> upsert ->
metrics) collapsed into one declarative Spark program.

Reference chain: ``provider_dag_factory.py:141-313`` (7 Airflow tasks,
state through XCom/disk/S3/Postgres). Here: one DataFrame lineage —
every stage is a narrow projection or a single keyed shuffle, and the
whole thing optimizes as one Catalyst plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openverse_catalog_spark.functions.cleaning import (
    clean_columns,
    clean_tags_expr,
    default_category_expr,
    default_source_expr,
    drop_missing_required,
    enrich_meta_data_expr,
    extract_filetype_expr,
)
from openverse_catalog_spark.functions.licenses import (
    license_url_from_pair,
    normalize_license,
)
from openverse_catalog_spark.operators.merge import merge_upsert, merge_metrics
from openverse_catalog_spark.operators.dedupe import exact_dedupe
from openverse_catalog_spark.schemas.columns import (
    AUDIO_TSV_COLUMNS,
    IMAGE_TSV_COLUMNS,
    ColumnSpec,
    audio_db_schema,
    image_db_schema,
)

# reference extensions.py:1-4 image set (jpeg/tif arrive unified to jpg/tiff
# by extract_filetype_expr before the validity check)
VALID_IMAGE_FILETYPES = ("jpg", "png", "gif", "svg", "tiff", "webp", "bmp")
# reference extensions.py:1-4 audio set
VALID_AUDIO_FILETYPES = ("mp3", "ogg", "wav", "aiff", "flac", "wma", "mp4", "aac", "m4a", "m4b")


@dataclass
class MediaPipelineResult:
    merged: DataFrame
    metrics: dict[str, int]


def clean_media_batch(
    staging: DataFrame, spark: SparkSession, media_type: str = "image"
) -> DataFrame:
    """The MediaStore.clean_media_metadata equivalent (media.py:94-171):

    1. per-column sanitization (whitespace/quotes/limits/coercions)
    2. license validation against the canonical pair set (invalid -> null
       -> dropped by the required filter), license_url into meta_data
    3. source default, filetype extraction/unification, tag enrichment
    4. required-field row drop

    Pure expressions + one broadcast join — no shuffle until the caller's
    dedup stage.
    """
    columns = IMAGE_TSV_COLUMNS if media_type == "image" else AUDIO_TSV_COLUMNS
    valid_ft = VALID_IMAGE_FILETYPES if media_type == "image" else VALID_AUDIO_FILETYPES

    df = clean_columns(staging, columns)
    df = normalize_license(df, spark)

    lic_url = license_url_from_pair(F.col("license"), F.col("license_version"))
    df = (
        df.withColumn("source", default_source_expr(F.col("source"), F.col("provider")))
        .withColumn(
            "filetype",
            F.coalesce(
                F.col("filetype"), extract_filetype_expr(F.col("url"), valid_ft)
            ),
        )
        .withColumn(
            "meta_data",
            enrich_meta_data_expr(F.col("meta_data"), lic_url, F.lit(None).cast("string")),
        )
        .withColumn(
            "ingestion_type",
            F.coalesce(F.col("ingestion_type"), F.lit("provider_api")),
        )
    )
    if media_type == "image":
        df = df.withColumn(
            "category",
            default_category_expr(F.col("category"), F.col("provider")),
        )
    if "tags" in df.columns:
        # staging tags may arrive as plain strings or structs; enrichment
        # normalizes struct form {name, provider}
        tags_type = dict(df.dtypes)["tags"]
        if tags_type.startswith("array<string>"):
            df = df.withColumn(
                "tags", clean_tags_expr(F.col("tags"), F.col("provider"))
            )
    return drop_missing_required(df, columns)


def ingest_media_batch(
    staging: DataFrame,
    target: DataFrame,
    spark: SparkSession,
    media_type: str = "image",
    deterministic: bool = False,
) -> MediaPipelineResult:
    """clean -> dedupe (provider, fid) -> MERGE into the canonical table.

    Replaces the reference's create_loading_table / copy_to_s3 /
    load_from_s3 / clean_data / upsert_data task chain
    (provider_dag_factory.py:203-279). Metrics mirror
    loader/loader.py:44-67.
    """
    from pyspark.sql import Observation

    db_cols = image_db_schema() if media_type == "image" else audio_db_schema()
    # Stage counts ride the plan as Observations instead of separate
    # count() actions: the WHOLE pipeline (clean -> dedupe -> merge ->
    # per-status counts) executes in ONE pass — at 100 TB the previous
    # form paid four extra full-lineage passes just for metrics.
    obs_load, obs_clean, obs_dedup = Observation(), Observation(), Observation()
    n = F.count(F.lit(1)).alias("n")
    staged = staging.observe(obs_load, n)
    cleaned = clean_media_batch(staged, spark, media_type).observe(obs_clean, n)
    deduped = exact_dedupe(
        cleaned, ["provider", "foreign_identifier"], [F.col("url")]
    ).observe(obs_dedup, n)
    merged = merge_upsert(
        target, deduped, db_cols, deterministic=deterministic,
        status_col="__merge_status",
    ).cache()
    by_status = {
        r["__merge_status"]: r["cnt"]
        for r in merged.groupBy("__merge_status")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    loaded = obs_load.get["n"]
    n_cleaned = obs_clean.get["n"]
    n_clean = obs_dedup.get["n"]
    merged = merged.drop("__merge_status")
    metrics = merge_metrics(
        loaded=loaded,
        cleaned=n_clean,
        # net-new rows, identical to the old after-minus-before accounting
        upserted=by_status.get("inserted", 0),
        missing=loaded - n_cleaned if loaded else 0,
        fid_dups=n_cleaned - n_clean,
    )
    return MediaPipelineResult(merged=merged, metrics=metrics)


def empty_canonical(spark: SparkSession, media_type: str = "image") -> DataFrame:
    from openverse_catalog_spark.schemas.columns import spark_schema

    cols = image_db_schema() if media_type == "image" else audio_db_schema()
    return spark.createDataFrame([], spark_schema(cols))
