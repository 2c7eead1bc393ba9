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
    JamendoStyleAdapter,
    StockSnapStyleAdapter,
    WikimediaStyleAdapter,
    audio_staging_schema,
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
    """Fake of the allimages generator API: one sub-response per batch,
    batchcomplete set, gaicontinue tokens between batches."""

    def fetch(params: dict) -> dict | None:
        tok = params.get("gaicontinue")
        idx = 0 if not tok else tokens.index(tok) + 1
        if idx >= len(batches):
            return {"query": {"pages": {}}, "batchcomplete": ""}
        resp = {"query": {"pages": batches[idx]}, "batchcomplete": ""}
        if idx < len(tokens):
            resp["continue"] = {
                "gaicontinue": tokens[idx],
                "continue": "gaicontinue||",
            }
        return resp

    return fetch


def _wiki_page(i: int, license_url="https://creativecommons.org/licenses/by-sa/4.0/",
               mediatype="BITMAP", n_usage=0, **info_over) -> dict:
    info = {
        "url": f"https://upload.test/{i}.jpg",
        "descriptionshorturl": f"https://commons.test/wiki/File:Img_{i}.jpg",
        "mediatype": mediatype,
        "width": 640,
        "height": 480,
        "size": 1024 + i,
        "extmetadata": {
            "LicenseUrl": {"value": license_url},
            "Artist": {"value": f'<a href="https://a.test/{i}">Artist {i}</a>'},
            "ObjectName": {"value": f"Img {i}.jpg"},
            "Categories": {"value": "Art|Nature"},
        },
    }
    info.update(info_over)
    page = {
        "pageid": 5000 + i,
        "title": f"File:Img {i}.jpg",
        "imageinfo": [info],
    }
    if n_usage:
        page["globalusage"] = [{"wiki": f"w{j}"} for j in range(n_usage)]
    return page


def test_wikimedia_style_continue_tokens(spark):
    batches = [
        {str(i): _wiki_page(i) for i in range(3)},
        {str(i): _wiki_page(i, license_url="https://creativecommons.org/publicdomain/zero/1.0/"
                            if i == 4 else "https://example.com/all-rights-reserved")
         for i in (3, 4)},
    ]
    adapter = WikimediaStyleAdapter()
    # gaicontinue paging must visit both batches then stop
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
    # File: prefix AND known extension stripped (wikimedia_commons.py:487-500)
    assert got["5000"].title == "Img 0"
    assert got["5000"].creator == "Artist 0"
    assert got["5000"].creator_url == "https://a.test/0"


def test_wikimedia_batchcomplete_merge_and_popularity():
    """A batch served in TWO sub-responses (no batchcomplete on the
    first) must merge: globalusage lists concatenate, and the popularity
    cache keeps the max across re-served pages
    (wikimedia_commons.py:223-278, 575-592, 614-653)."""
    sub1 = {
        "query": {"pages": {"1": _wiki_page(1, n_usage=2)}},
        "continue": {"gucontinue": "g1", "continue": "||globalusage"},
    }
    sub2 = {
        "query": {"pages": {"1": _wiki_page(1, n_usage=3)}},
        "batchcomplete": "",
    }
    responses = [sub1, sub2]

    def fetch(params):
        return responses.pop(0)

    adapter = WikimediaStyleAdapter()
    merged = adapter.fetch_response(fetch, adapter.get_next_query_params(None))
    batch = adapter.get_batch_data(merged)
    rec = adapter.parse_record(batch[0])
    assert rec["meta_data"]["global_usage_count"] == "5"  # 2 + 3 merged
    assert adapter.popularity_cache[5001] == 5
    assert adapter._exhausted  # no continue token on the final response


def test_wikimedia_audio_record():
    """AUDIO mediatype routes to the audio staging shape: duration
    s->ms, pronunciation category, sample/bit rate from the streams
    metadata walk (wikimedia_commons.py:358-400)."""
    page = _wiki_page(
        7,
        mediatype="AUDIO",
        duration=2.5,
        metadata=[
            {"name": "streams",
             "value": [{"value": [
                 {"name": "header", "value": [
                     {"name": "sample_rate", "value": 44100},
                     {"name": "bitrate_nominal", "value": 96000},
                     {"name": "audio_channels", "value": 2},
                 ]}]}]},
        ],
    )
    page["imageinfo"][0]["extmetadata"]["Categories"] = {
        "value": "English pronunciation|Audio"
    }
    adapter = WikimediaStyleAdapter()
    rec = adapter.parse_record(page)
    assert rec["media_type"] == "audio"
    assert rec["provider"] == "wikimedia_audio"
    assert rec["duration"] == 2500
    assert rec["category"] == "pronunciation"
    assert rec["sample_rate"] == 44100 and rec["bit_rate"] == 96000
    assert rec["meta_data"]["channels"] == "2"


def test_wikimedia_give_up_degrades_props():
    """Stuck on one gaicontinue for max_page_iteration_before_give_up
    sub-requests -> drop the overflowing property and reset the
    secondary iterator (wikimedia_commons.py:404-427)."""
    adapter = WikimediaStyleAdapter()
    adapter.max_page_iteration_before_give_up = 3

    def fetch(params):
        return {
            "query": {"pages": {"1": _wiki_page(1, n_usage=1)}},
            "continue": {"gaicontinue": "STUCK", "gucontinue": f"g",
                         "continue": "gaicontinue||globalusage"},
        }

    adapter.fetch_response(fetch, adapter.get_next_query_params(None))
    assert adapter.current_props["prop"] == "imageinfo"  # popularity dropped
    assert adapter.continue_token == {
        "gaicontinue": "STUCK", "continue": "gaicontinue||",
    }


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


def _jamendo_track(i: int, **over) -> dict:
    d = {
        "id": 7000 + i,
        "name": f"Track {i}",
        "duration": 120 + i,
        "shareurl": f"https://www.jamendo.com/track/{7000 + i}",
        "audio": f"https://prod-1.storage.jamendo.com/?trackid={7000 + i}&format=mp32&from=app-devsite",
        "image": f"https://usercontent.jamendo.com?type=album&id={i}&width=200",
        "license_ccurl": "https://creativecommons.org/licenses/by-nc/2.0/",
        "artist_id": 42,
        "artist_idstr": "the_band",
        "artist_name": "The Band ",
        "album_id": 900 + (i % 2),
        "album_name": f"Album {i % 2}",
        "album_image": f"https://usercontent.jamendo.com?type=album&id={900 + (i % 2)}&width=200&trackid={7000 + i}",
        "position": i + 1,
        "releasedate": "2014-05-01",
        "stats": {"rate_download_total": 10 * i, "rate_listened_total": 100 * i},
        "musicinfo": {
            "vocalinstrumental": "instrumental",
            "speed": "medium",
            "tags": {"genres": ["electronic", "ambient"]},
        },
    }
    d.update(over)
    return d


def _jamendo_fetch(pages: list[list[dict]]):
    def fetch(params: dict) -> dict:
        idx = params["offset"] // JamendoStyleAdapter.batch_limit
        return {"results": pages[idx] if idx < len(pages) else []}

    return fetch


def test_jamendo_style_audio_end_to_end(spark):
    pages = [
        [_jamendo_track(i) for i in range(3)],
        [
            _jamendo_track(3),
            _jamendo_track(4, license_ccurl="https://example.com/none"),  # dropped
            _jamendo_track(5, audio=None),  # dropped
        ],
    ]
    fetcher = provider_fetcher(JamendoStyleAdapter(), _jamendo_fetch(pages))
    with tempfile.TemporaryDirectory() as tmp:
        n = write_landing(fetcher, tmp, "2024-02-01", "jamendo")
        assert n == 4
        staging = read_json_landing(spark, tmp, audio_staging_schema()).drop(
            "ingest_date"
        )
        res = ingest_media_batch(
            staging,
            empty_canonical(spark, "audio"),
            spark,
            media_type="audio",
            deterministic=True,
        )
        rows = {r.foreign_identifier: r for r in res.merged.collect()}
    assert len(rows) == 4
    r = rows["7000"]
    assert r.license == "by-nc" and r.license_version == "2.0"
    assert r.duration == 120_000  # seconds -> milliseconds
    assert r.category == "music" and r.genres == ["electronic", "ambient"]
    # 'from' param stripped, trackid preserved on the audio url
    assert "from=" not in r.url and "trackid=7000" in r.url
    assert r.creator == "The Band"  # stripped
    # audio_set: trackid stripped from album thumbnail + slash added, so
    # every track of one album carries IDENTICAL set data (jamendo.py:80-92)
    sets = {
        rows[f].audio_set["foreign_identifier"]: rows[f].audio_set["thumbnail"]
        for f in ("7000", "7002")
    }
    assert sets["900"] == "https://usercontent.jamendo.com/?type=album&id=900&width=200"
    assert rows["7000"].audio_set == rows["7002"].audio_set
    assert rows["7000"].set_position == 1


def test_stocksnap_style_static_single_page(spark):
    results = [
        {
            "img_id": f"IMG{i}",
            "title": f"Snap {i}",
            "author_name": "Someone",
            "author_profile": "https://stocksnap.io/author/1",
            "keywords": ["Sky", "CLOUD"],
            "camera": {"model": "X100", "iso": 200},
            "sizes": {"original": {"url": f"https://cdn.test/{i}.jpg", "width": 4000, "height": 3000}},
        }
        for i in range(3)
    ] + [{"img_id": "IMGBAD", "sizes": {}}]
    adapter = StockSnapStyleAdapter()
    fetcher = provider_fetcher(adapter, lambda p: {"results": results})
    with tempfile.TemporaryDirectory() as tmp:
        n = write_landing(fetcher, tmp, "2024-02-02", "stocksnap")
        assert n == 3  # single page consumed exactly once; bad record dropped
        staging = read_json_landing(spark, tmp, staging_schema()).drop(
            "ingest_date"
        )
        res = ingest_media_batch(
            staging, empty_canonical(spark), spark, deterministic=True
        )
        rows = {r.foreign_identifier: r for r in res.merged.collect()}
    assert set(rows) == {"IMG0", "IMG1", "IMG2"}
    r = rows["IMG0"]
    assert r.license == "cc0" and r.license_version == "1.0"
    assert [t["name"] for t in r.tags] == ["sky", "cloud"]
    assert r.meta_data["iso"] == "200"
    assert r.width == 4000
    # per-provider category default (media.py:168-170, provider_details
    # DEFAULT_IMAGE_CATEGORY): stocksnap -> photograph
    assert r.category == "photograph"


def test_flickr_sub_provider_attribution():
    """Owner nsid in a configured sub-provider set -> source is the
    institution; anyone else -> source falls back to the provider
    (flickr.py:249-253, provider_details FLICKR_SUB_PROVIDERS)."""
    a = FlickrStyleAdapter()
    nasa = a.parse_record(_flickr_photo(1, owner="24662369@N07"))
    assert nasa["source"] == "nasa" and nasa["provider"] == "flickr"
    spacex = a.parse_record(_flickr_photo(2, owner="130608600@N05"))
    assert spacex["source"] == "spacex"
    plain = a.parse_record(_flickr_photo(3))
    assert plain["source"] == "flickr"


def test_provider_workflow_registry_matches_reference():
    """The workflow registry mirrors provider_workflows.py:193-296: 20
    entries, unique dag_ids, the same dated set and schedule overrides,
    every adapter family referenced exactly once."""
    from openverse_catalog_spark.sources.workflows import (
        PROVIDER_WORKFLOWS,
        build_fetcher,
        get_workflow,
    )

    assert len(PROVIDER_WORKFLOWS) == 20
    ids = [w.dag_id for w in PROVIDER_WORKFLOWS]
    assert len(set(ids)) == 20
    dated = {w.dag_id for w in PROVIDER_WORKFLOWS if w.dated}
    assert dated == {
        "europeana_workflow", "finnish_museums_workflow", "flickr_workflow",
        "metropolitan_museum_workflow", "wikimedia_commons_workflow",
    }
    assert get_workflow("freesound_workflow").schedule == "@quarterly"
    assert get_workflow("inaturalist_workflow").bulk_pipeline == (
        "pipeline_inaturalist_bulk"
    )
    assert get_workflow("wikimedia_commons_workflow").media_types == (
        "image", "audio",
    )
    adapters = [w.adapter_cls for w in PROVIDER_WORKFLOWS if w.adapter_cls]
    assert len(set(adapters)) == 19  # every family exactly once

    # dated adapter gets the ingestion date when its ctor accepts one
    wf = get_workflow("wikimedia_commons_workflow")
    fetcher = build_fetcher(wf, lambda p: None, date="2023-05-05")
    assert fetcher.adapter.start_timestamp == "1683244800"

    import pytest as _pytest

    with _pytest.raises(ValueError):
        build_fetcher(get_workflow("inaturalist_workflow"), lambda p: None)


def test_build_fetcher_constructs_every_adapter_workflow():
    """Every registry entry with an adapter must be constructible with
    only the primary transport: secondary transports (detail/probe/HEAD
    fetches) default to the primary callable, matching the reference's
    single shared DelayedRequester."""
    from openverse_catalog_spark.sources.workflows import (
        PROVIDER_WORKFLOWS,
        build_fetcher,
    )

    for wf in PROVIDER_WORKFLOWS:
        if wf.adapter_cls is None:
            continue
        fetcher = build_fetcher(wf, lambda p: None, date="2024-01-01")
        assert fetcher.adapter.__class__ is wf.adapter_cls


def test_ingestion_limit_is_global_across_sweeps():
    """The ingestion limit budgets RAW records over ALL sweeps, like the
    reference's shared record_count — not per sweep (a 6-sweep provider
    must not fetch 6x the cap)."""
    from openverse_catalog_spark.sources.providers_museums import (
        VictoriaStyleAdapter,
    )

    served = {"n": 0}

    def fetch(params):
        served["n"] += 1
        return [
            {
                "id": f"media-{served['n']}-{j}",
                "licence": {"shortName": "CC BY", "version": "4.0"},
                "media": [
                    {
                        "type": "image",
                        "large": {
                            "uri": f"http://mv.test/{served['n']}/{j}.jpg",
                            "width": 10,
                            "height": 10,
                        },
                    }
                ],
                "title": "t",
            }
            for j in range(2)
        ]

    adapter = VictoriaStyleAdapter()
    fetcher = provider_fetcher(adapter, fetch, ingestion_limit=3)
    total = sum(len(b) for b in fetcher.batches())
    assert total <= 3


def test_wikimedia_audio_string_numerics_coerced():
    """API-supplied streams metadata can carry STRING bitrate /
    sample_rate values; the int4 guard must coerce (like the
    reference's explicit int conversion) instead of TypeError-ing on
    the comparison, and unparseable garbage is dropped."""
    page = _wiki_page(
        8,
        mediatype="AUDIO",
        duration=1.0,
        metadata=[
            {"name": "streams",
             "value": [{"value": [
                 {"name": "header", "value": [
                     {"name": "sample_rate", "value": "48000"},
                     {"name": "bitrate_nominal", "value": "128000.0"},
                 ]}]}]},
        ],
    )
    adapter = WikimediaStyleAdapter()
    rec = adapter.parse_record(page)
    assert rec["sample_rate"] == 48000
    assert rec["bit_rate"] == 128000

    page2 = _wiki_page(
        9,
        mediatype="AUDIO",
        duration=1.0,
        metadata=[
            {"name": "streams",
             "value": [{"value": [
                 {"name": "header", "value": [
                     {"name": "sample_rate", "value": "n/a"},
                     {"name": "bitrate_nominal", "value": "9999999999"},
                 ]}]}]},
        ],
    )
    rec2 = WikimediaStyleAdapter().parse_record(page2)
    assert rec2.get("sample_rate") is None
    assert rec2.get("bit_rate") is None  # over int4 bound -> None


def test_fetch_response_subrequests_share_politeness_clock():
    """An adapter that drives the transport itself (fetch_response)
    must receive a delay-wrapped fetch sharing the outer politeness
    clock — rapid-fire sub-requests would otherwise bypass min_delay,
    unlike the reference's single DelayedRequester."""
    import time as _time

    from openverse_catalog_spark.sources.providers import provider_fetcher

    stamps: list[float] = []

    def transport(params):
        stamps.append(_time.monotonic())
        if len(stamps) >= 4:
            return {"rows": []}
        return {"rows": [{"id": len(stamps)}]}

    class Adapter:
        def get_next_query_params(self, prev):
            return {"page": 0 if prev is None else prev["page"] + 1}

        def get_batch_data(self, response):
            return response["rows"]

        def parse_record(self, raw):
            return raw

        def fetch_response(self, fetch_fn, params):
            # two sub-requests per batch (batchcomplete-merge shape)
            first = fetch_fn(params)
            if first["rows"]:
                fetch_fn({**params, "cont": 1})
            return first

    fetcher = provider_fetcher(Adapter(), transport, min_delay=0.05)
    list(fetcher.batches())
    assert len(stamps) >= 3
    gaps = [b - a for a, b in zip(stamps, stamps[1:])]
    # EVERY inter-request gap honors the clock, including sub-requests
    assert all(g >= 0.045 for g in gaps), gaps
