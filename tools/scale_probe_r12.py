"""Round-12 decode-path scaling probe (r11 verdict item 7): drive the
full-pixel JPEG decode chain (synth mapInPandas -> decode mapInPandas,
behind the r11 partition floor) at 1x / 3x / 10x the sf0.1 document
count with the noop sink, and measure the Arrow batch-size knob's
interaction at the larger inputs. Writes nothing; numbers go to
SCALING.md by hand.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from openverse_catalog_spark.session import get_spark, load_tables  # noqa: E402


def main() -> None:
    spark = get_spark("scale_probe_r12")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"

    from openverse_catalog_spark.operators.multimodal import (
        attach_decodable_jpeg_payload,
        extract_image_pixels,
    )

    def _ident(b):
        yield from b

    spark.range(64, numPartitions=32).mapInPandas(_ident, "id long").count()

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    n_docs = docs.count()
    print(f"documents rows at sf0.1: {n_docs}")

    def run(df, label: str) -> float:
        spark.sparkContext.setJobDescription(f"jpeg decode {label}")
        t0 = time.time()
        (
            extract_image_pixels(attach_decodable_jpeg_payload(df))
            .write.format("noop").mode("overwrite").save()
        )
        dt = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        print(f"{label:28s} {dt:7.2f}s")
        return dt

    # single-partition inputs (the testdata shape: one row-group file)
    # at 1x/3x/10x — the floor must spread each onto all 32 cores and
    # the decode must scale ~linearly in rows
    for mult in (1, 3, 10):
        df = (
            spark.range(mult * n_docs, numPartitions=1)
            .select(F.col("id").alias("doc_id"))
        )
        run(df, f"{mult}x single-partition")
        run(df, f"{mult}x single-partition (rep)")

    # well-partitioned 10x input: the floor must pass through (no
    # added Exchange) and land the same wall time
    df32 = (
        spark.range(10 * n_docs, numPartitions=32)
        .select(F.col("id").alias("doc_id"))
    )
    run(df32, "10x 32-partition")

    # Arrow batch-size interaction at 10x: default 10000 rows/batch vs
    # small batches. Payload rows here are ~0.2-1 KB, so the default
    # is one batch per task either way at this scale; the knob matters
    # in production where image payloads are MB-sized (bound batch
    # BYTES, not rows — Spark 4's maxBytesPerBatch is the direct knob)
    for batch in ("10000", "512", "64"):
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", batch
        )
        df1 = (
            spark.range(10 * n_docs, numPartitions=1)
            .select(F.col("id").alias("doc_id"))
        )
        run(df1, f"10x floor, maxRecordsPerBatch={batch}")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.stop()


if __name__ == "__main__":
    main()
