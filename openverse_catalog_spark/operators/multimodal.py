"""Multimodal column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_stub=True`` derives deterministic fake metadata from
an md5 of the payload, so the Spark-side plumbing — schema, partition
preservation, UDF signature, Arrow batch shape — is real and testable,
and the fake values are reproducible enough to oracle-check. Swap
``_decode_one`` for a real PIL/ffmpeg call when available.

Scale notes: mapInPandas streams Arrow batches — payloads never
materialize row-at-a-time in Python; partition sizing should target
~64-128MB of binary per task (spark.sql.files.maxPartitionBytes) so a
1000-executor cluster decodes 100 TB without OOM or stragglers.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a binary media column (utf-8 payload of the text) plus
    format metadata — the schema shape a real image table would have."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "png").otherwise("jpg").alias("format"),
    )


def _decode_one(payload: bytes, fmt: str, decode_stub: bool) -> tuple[int, int]:
    if not decode_stub:
        # Real path: PIL.Image.open(io.BytesIO(payload)).size — library
        # not present in this environment.
        raise NotImplementedError("real image decode requires PIL/ffmpeg")
    h = hashlib.md5(payload).hexdigest()
    width = int(h[:15], 16) % 1920 + 1
    height = int(h[15:30], 16) % 1080 + 1
    return width, height


def extract_image_metadata(
    df: DataFrame, decode_stub: bool = True, batch_hint: int | None = None
) -> DataFrame:
    """mapInPandas over (doc_id, payload, format) -> typed metadata rows.

    One Arrow batch in, one out; no shuffle — the operator is a narrow
    map over whatever partitioning the payload table already has."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                _decode_one(p, f, decode_stub)
                for p, f in zip(pdf["payload"], pdf["format"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "format": pdf["format"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return df.mapInPandas(decode, IMAGE_META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: explode a (stubbed) frame-index list
    per payload — the partition/shape pattern for per-frame feature
    extraction (real decoder would emit actual frames)."""
    n_frames = (F.length(F.col("payload")) % 300 + 1).alias("n_frames")
    return (
        df.withColumn("n_frames", n_frames)
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
        )
        .select("doc_id", "n_frames", "frame_idx")
    )


def resize_plan(meta: DataFrame, max_edge: int = 512) -> DataFrame:
    """Image-resize planning: aspect-preserving shrink-to-fit target
    dimensions (never upscale) as pure expressions over the decoded
    metadata — the real resize kernel slots into the same mapInPandas
    stage as the decoder; dimension math stays JVM-side and testable."""
    w, h = F.col("width"), F.col("height")
    scale = F.least(F.lit(1.0), F.lit(max_edge) / F.greatest(w, h))
    return meta.select(
        "doc_id",
        "width",
        "height",
        F.greatest(F.lit(1), F.floor(w * scale)).cast("long").alias("target_w"),
        F.greatest(F.lit(1), F.floor(h * scale)).cast("long").alias("target_h"),
        F.round(scale, 6).alias("scale"),
    )


def audio_chunk_plan(df: DataFrame, chunk_ms: int = 1000) -> DataFrame:
    """Audio chunking plumbing: derive a (stubbed) duration per payload,
    explode fixed-width chunk windows, and attach a deterministic
    per-chunk feature stub (md5-derived pseudo-energy) — the shape a real
    spectrogram/feature extractor runs over, one row per chunk."""
    duration = (F.length(F.col("payload")) % 5000 + 1000).alias("duration_ms")
    chunked = (
        df.withColumn("duration_ms", duration)
        .withColumn(
            "chunk_idx",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.col("duration_ms") - 1) / chunk_ms).cast("long"),
                )
            ),
        )
    )
    energy_h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("doc_id"), F.col("chunk_idx"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return chunked.select(
        "doc_id",
        "duration_ms",
        "chunk_idx",
        F.round((energy_h % 1000) / 1000.0, 3).alias("energy_stub"),
    )
