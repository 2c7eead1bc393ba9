"""Provider adapters end to end: fake API transport -> paged fetch with
driver-side parse -> JSONL landing -> schema'd Spark read -> shared
clean/dedupe/merge pipeline. The switch-over contract: once a record is
in the landing zone, nothing downstream is provider-specific."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from openverse_catalog_spark.plans.media_pipeline import (
    empty_canonical,
    ingest_media_batch,
)
from openverse_catalog_spark.sources.landing import (
    read_json_landing,
    write_landing,
)
from openverse_catalog_spark.sources.providers import (
    FlickrStyleAdapter,
    WikimediaStyleAdapter,
    provider_fetcher,
    staging_schema,
)


def _flickr_photo(i: int, **over) -> dict:
    d = {
        "id": str(1000 + i),
        "owner": f"user{i % 3}",
        "ownername": f"User {i % 3}",
        "license": str((i % 8) + 1),
        "title": f"Photo {i}",
        "tags": "nature stock nature photo",
        "url_l": f"https://live.test/l/{i}.jpg",
        "width_l": 1024,
        "height_l": 768,
    }
    d.update(over)
    return d


def _flickr_fetch(pages: list[list[dict]]):
    def fetch(params: dict) -> dict:
        p = params["page"]
        photos = pages[p - 1] if p <= len(pages) else []
        return {"photos": {"page": p, "pages": len(pages), "photo": photos}}

    return fetch


def test_flickr_style_end_to_end(spark):
    pages = [
        [_flickr_photo(i) for i in range(4)],
        [
            _flickr_photo(4),
            _flickr_photo(5, url_l=None, url_m=None, url_s=None),  # dropped
            _flickr_photo(6, license="7"),  # unmapped license -> dropped
            _flickr_photo(0),  # duplicate fid -> deduped downstream
        ],
    ]
    fetcher = provider_fetcher(FlickrStyleAdapter(), _flickr_fetch(pages))
    with tempfile.TemporaryDirectory() as tmp:
        n = write_landing(fetcher, tmp, "2024-01-01", "flickr")
        assert n == 6  # 8 raw - 2 invalid, parsed before landing
        staging = read_json_landing(spark, tmp, staging_schema()).drop(
            "ingest_date"
        )
        res = ingest_media_batch(
            staging, empty_canonical(spark), spark, deterministic=True
        )
        rows = {r.foreign_identifier: r for r in res.merged.collect()}
    assert len(rows) == 5  # duplicate photo 1000 collapsed
    r = rows["1000"]
    assert r.provider == "flickr" and r.license in {"by-nc-sa", "by-nc", "by"}
    assert r.foreign_landing_url == "https://www.flickr.com/photos/user0/1000"
    assert [t["name"] for t in r.tags] == ["nature", "photo", "stock"]
    assert res.metrics["foreign_id_dup"] == 1


def _wiki_fetch(batches: list[dict], tokens: list[str]):
    def fetch(params: dict) -> dict | None:
        tok = params.get("gcmcontinue", "")
        idx = 0 if tok in ("", None) else tokens.index(tok) + 1
        if idx >= len(batches):
            return {"query": {"pages": {}}}
        resp = {"query": {"pages": batches[idx]}}
        if idx < len(tokens):
            resp["continue"] = {"gcmcontinue": tokens[idx]}
        return resp

    return fetch


def _wiki_page(i: int, license="CC BY-SA 4.0") -> dict:
    return {
        "pageid": 5000 + i,
        "title": f"File:Img {i}.jpg",
        "imageinfo": [
            {
                "url": f"https://upload.test/{i}.jpg",
                "descriptionurl": f"https://commons.test/wiki/File:Img_{i}.jpg",
                "width": 640,
                "height": 480,
                "extmetadata": {
                    "LicenseShortName": {"value": license},
                    "Artist": {"value": f"Artist {i}"},
                },
            }
        ],
    }


def test_wikimedia_style_continue_tokens(spark):
    batches = [
        {str(i): _wiki_page(i) for i in range(3)},
        {str(i): _wiki_page(i, license="CC0" if i == 4 else "All rights reserved")
         for i in (3, 4)},
    ]
    adapter = WikimediaStyleAdapter()
    # continue-token paging must visit both batches then stop
    fetcher = provider_fetcher(adapter, _wiki_fetch(batches, ["tok1"]))
    with tempfile.TemporaryDirectory() as tmp:
        n = write_landing(fetcher, tmp, "2024-01-02", "wikimedia")
        assert n == 4  # 5 raw - 1 non-CC license
        staging = read_json_landing(spark, tmp, staging_schema()).drop(
            "ingest_date"
        )
        got = {r.foreign_identifier: r for r in staging.collect()}
    assert got["5004"].license == "cc0"
    assert got["5000"].license == "by-sa" and got["5000"].license_version == "4.0"
    assert got["5000"].title == "Img 0.jpg"  # File: prefix stripped


def test_adapters_share_downstream_pipeline(spark):
    """Records from BOTH providers merge into one canonical table."""
    f = provider_fetcher(
        FlickrStyleAdapter(), _flickr_fetch([[_flickr_photo(1)]])
    )
    w = provider_fetcher(
        WikimediaStyleAdapter(), _wiki_fetch([{"1": _wiki_page(1)}], [])
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_landing(f, tmp, "2024-01-01", "flickr")
        write_landing(w, tmp, "2024-01-01", "wikimedia")
        staging = read_json_landing(spark, tmp, staging_schema()).drop(
            "ingest_date"
        )
        res = ingest_media_batch(
            staging, empty_canonical(spark), spark, deterministic=True
        )
        provs = sorted(
            r.provider for r in res.merged.select("provider").collect()
        )
    assert provs == ["flickr", "wikimedia"]


def test_all_invalid_page_does_not_end_ingestion(spark):
    pages = [
        [_flickr_photo(1)],
        [_flickr_photo(2, url_l=None, url_m=None, url_s=None)],  # all invalid
        [_flickr_photo(3)],  # must still be fetched
    ]
    fetcher = provider_fetcher(FlickrStyleAdapter(), _flickr_fetch(pages))
    got = [len(b) for b in fetcher.batches()]
    assert got == [1, 1]  # page 2 skipped, page 3 reached
