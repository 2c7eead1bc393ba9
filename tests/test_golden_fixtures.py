"""Golden-file tests: the reference's OWN loader TSV fixtures
(catalog/tests/dags/common/loader/test_resources/*.tsv) run through our
tolerant read -> required-field clean -> dedupe pipeline, asserting the
exact surviving-row counts the reference's live-Postgres suite pins
(test_sql.py:240-301 malformed skipping, :302-439 null-required deletes,
:440-475 duplicate-fid dedup). This is SURVEY §5's level-1 oracle ported
verbatim — same inputs, same expected survivors.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from openverse_catalog_spark.functions.cleaning import drop_missing_required
from openverse_catalog_spark.operators.dedupe import exact_dedupe
from openverse_catalog_spark.schemas.columns import IMAGE_TSV_COLUMNS
from openverse_catalog_spark.sources.tsv import enforce_malformed_cap, read_tsv

FIXTURES = "/root/reference/catalog/tests/dags/common/loader/test_resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not present"
)


def _read(spark, name):
    return read_tsv(spark, os.path.join(FIXTURES, name), IMAGE_TSV_COLUMNS)


def test_malformed_less_than_max_rows_skipped(spark):
    good, corrupt = _read(spark, "malformed_less_than_max_rows.tsv")
    # reference: 10 lines, 4 broken-JSON rows deleted by the COPY retry
    # loop, 6 load (test_sql.py:240-260)
    assert enforce_malformed_cap(corrupt) == 4
    assert good.count() == 6


def test_malformed_exactly_max_rows_skipped(spark):
    good, corrupt = _read(spark, "malformed_max_rows.tsv")
    # 13 lines, 10 malformed = exactly the cap (test_sql.py:263-279)
    assert enforce_malformed_cap(corrupt) == 10
    assert good.count() == 3


def test_malformed_more_than_max_rows_fails(spark):
    good, corrupt = _read(spark, "malformed_more_than_max_rows.tsv")
    # 11 malformed exceeds the 10-row tolerance -> hard error
    # (test_sql.py:282-298)
    with pytest.raises(ValueError, match="malformed"):
        enforce_malformed_cap(corrupt)


@pytest.mark.parametrize(
    ("fixture", "survivors"),
    [
        ("url_missing.tsv", 2),  # test_sql.py:302-331
        ("license_missing.tsv", 2),  # test_sql.py:334-362
        ("foreign_landing_url_missing.tsv", 3),  # test_sql.py:365-400
        ("foreign_identifier_missing.tsv", 1),  # test_sql.py:403-439
    ],
)
def test_null_required_rows_dropped(spark, fixture, survivors):
    good, corrupt = _read(spark, fixture)
    assert enforce_malformed_cap(corrupt) == 0
    kept = drop_missing_required(good, IMAGE_TSV_COLUMNS)
    assert kept.count() == survivors
    for col in ("url", "license", "foreign_landing_url", "foreign_identifier"):
        assert kept.filter(F.col(col).isNull()).count() == 0


def test_duplicate_foreign_identifier_deduped(spark):
    good, _ = _read(spark, "foreign_identifier_duplicate.tsv")
    deduped = exact_dedupe(
        good, ["provider", "foreign_identifier"], [F.col("url")]
    )
    # reference: 4 rows, fid 135257 twice -> 3 remain, 135257 once
    # (test_sql.py:440-475)
    assert deduped.count() == 3
    assert deduped.filter(F.col("foreign_identifier") == "135257").count() == 1


def test_v000_tsv_reads_and_merges_into_current_schema(spark, tmp_path):
    """Schema-version evolution (tsv_columns.py:45-65, loader/sql.py:
    240-261): a legacy v000 TSV (no filetype/category, width+height
    early) loads under the v000 column order and merges into the
    current canonical table with NULLs for the version-missing columns."""
    from openverse_catalog_spark.operators.merge import merge_upsert
    from openverse_catalog_spark.schemas.columns import (
        image_db_schema,
        tsv_columns,
    )
    from openverse_catalog_spark.sources.tsv import read_tsv

    v000 = tsv_columns("image", "000")
    assert [c.name for c in v000][:7] == [
        "foreign_identifier", "foreign_landing_url", "url", "thumbnail",
        "width", "height", "filesize",
    ]
    line = "\t".join(
        ["fidA", "https://l.test/a", "https://i.test/a.jpg", "\\N",
         "640", "480", "\\N", "cc0", "1.0", "Cr", "\\N", "T",
         "\\N", "\\N", "f", "provA", "provA", "provider_api"]
    )
    p = tmp_path / "v000.tsv"
    p.write_text(line + "\n")
    good, corrupt = read_tsv(spark, str(p), v000)
    assert corrupt.count() == 0
    row = good.first()
    assert row.width == 640 and row.license == "cc0"

    from openverse_catalog_spark.plans.media_pipeline import empty_canonical

    merged = merge_upsert(
        empty_canonical(spark), good, image_db_schema(), deterministic=True
    )
    out = merged.first()
    assert out.foreign_identifier == "fidA" and out.width == 640
    assert out.filetype is None and out.category is None  # version-missing
