"""Fixture tests for the round-2 provider adapters, mirroring the
semantics of the reference's per-provider test suites
(``catalog/tests/dags/providers/provider_api_scripts/test_<p>.py``):
fake API transports drive the shared fetch loop; assertions pin the
distinctive mechanism of each provider (pagination contract, license
extraction, image preference, sub-provider attribution, record drops).
Driver-side only — no Spark needed for parse semantics."""

from __future__ import annotations

import pytest

from openverse_catalog_spark.sources.oauth import (
    FREESOUND_OAUTH,
    MissingTokenError,
    OAuth2TokenStore,
    OAuthProvider,
    oauth_fetch_fn,
)
from openverse_catalog_spark.sources.providers import provider_fetcher
from openverse_catalog_spark.sources.providers_museums import (
    BrooklynStyleAdapter,
    ClevelandStyleAdapter,
    MetStyleAdapter,
    NyplStyleAdapter,
    PhylopicStyleAdapter,
    ScienceMuseumStyleAdapter,
    SmithsonianStyleAdapter,
    SmkStyleAdapter,
    VictoriaStyleAdapter,
)
from openverse_catalog_spark.sources.providers_web import (
    EuropeanaStyleAdapter,
    FinnishStyleAdapter,
    FreesoundStyleAdapter,
    NappyStyleAdapter,
    RawpixelStyleAdapter,
    WordPressStyleAdapter,
)


def drain(fetcher) -> list[dict]:
    return [rec for batch in fetcher.batches() for rec in batch]


# --- Cleveland -------------------------------------------------------------


def _cleveland_record(i, **over):
    d = {
        "id": i,
        "share_license_status": "CC0",
        "url": f"https://clevelandart.org/art/{i}",
        "title": f"Art {i}",
        "creators": [{"description": f"Artist {i}"}],
        "accession_number": f"acc{i}",
        "images": {"web": {"url": f"https://img/{i}.jpg", "width": "800", "height": 600}},
        "culture": ["American", None],
    }
    d.update(over)
    return d


def test_cleveland_offset_pagination_and_cc0_gate():
    pages = {0: [_cleveland_record(1), _cleveland_record(2, share_license_status="copyrighted")],
             1000: [_cleveland_record(3, images={"print": {"url": "https://img/3p.jpg"}})],
             2000: []}

    def fetch(params):
        assert params["cc"] == "1"
        return {"data": pages[params["skip"]]}

    recs = drain(provider_fetcher(ClevelandStyleAdapter(), fetch))
    assert [r["foreign_identifier"] for r in recs] == ["1", "3"]
    assert recs[0]["width"] == 800 and recs[0]["height"] == 600  # digit guard
    assert recs[1]["url"] == "https://img/3p.jpg"  # web>print>full fallback
    assert recs[0]["meta_data"]["culture"] == "American"


# --- Brooklyn --------------------------------------------------------------


def test_brooklyn_envelope_license_scrape_and_detail_fetch():
    rights = {"description": 'See <a href="https://creativecommons.org/licenses/by/3.0/">terms</a>'}
    search = [{"id": 7, "rights_type": rights},
              {"id": 8, "rights_type": {"description": "no links"}}]
    details = {
        7: {"message": "Success.", "data": {
            "id": 7, "title": "Obj", "accession_number": "a7",
            "artists": [{"name": "B. Artist", "rank": 1}],
            "images": [
                {"id": 71, "largest_derivative_url": "https://bk/71.jpg",
                 "largest_derivative": "large",
                 "derivatives": [{"size": "large", "height": 10, "width": 20}]},
                {"id": None, "largest_derivative_url": "https://bk/xx.jpg"},
            ]}},
    }

    def fetch(params):
        if params["offset"] == 0:
            return {"message": "success.", "data": search}
        return {"message": "success.", "data": []}

    adapter = BrooklynStyleAdapter(detail_fetch=lambda oid: details.get(oid))
    recs = drain(provider_fetcher(adapter, fetch))
    assert len(recs) == 1  # rights without a CC link dropped; null image id skipped
    assert recs[0]["foreign_identifier"] == "71"
    assert recs[0]["license"] == "by" and recs[0]["license_version"] == "3.0"
    assert recs[0]["height"] == 10 and recs[0]["width"] == 20
    assert recs[0]["creator"] == "B. Artist"


# --- Met -------------------------------------------------------------------


def test_met_object_list_then_detail_multi_image():
    objects = {
        10: {"isPublicDomain": True, "objectURL": "https://met/10",
             "primaryImage": "https://img.met/10-main.jpg",
             "additionalImages": ["https://img.met/10-alt.jpg"],
             "accessionNumber": "x10", "title": "Vase",
             "artistDisplayName": "Potter", "medium": "Clay",
             "tags": [{"term": "Ancient"}]},
        11: {"isPublicDomain": False},
    }
    adapter = MetStyleAdapter(detail_fetch=lambda oid: objects.get(oid))
    recs = drain(provider_fetcher(adapter, lambda p: {"objectIDs": [10, 11], "total": 2}))
    assert [r["foreign_identifier"] for r in recs] == ["10-10-main", "10-10-alt"]
    assert all(r["license"] == "cc0" for r in recs)
    names = [t["name"] for t in recs[0]["tags"]]
    assert "Ancient" in names and "Potter" in names and "Clay" in names


# --- Victoria --------------------------------------------------------------


def test_victoria_license_sweeps_and_cross_sweep_dedup():
    item = {
        "id": "items/1", "displayTitle": "Rock", "keywords": ["geo"],
        "media": [
            {"id": "media/1", "type": "image",
             "large": {"uri": "https://mv/1.jpg", "height": 5, "width": 6},
             "licence": {"uri": "https://creativecommons.org/licenses/by/4.0/"},
             "creators": ["A", "B"]},
            {"id": "media/2", "type": "video"},
        ],
    }

    calls = []

    def fetch(params):
        calls.append(params["imagelicense"])
        return [item] if params["page"] == 0 else []

    recs = drain(provider_fetcher(VictoriaStyleAdapter(), fetch))
    # item appears in every license sweep but stages once
    assert len(recs) == 1
    assert recs[0]["foreign_identifier"] == "media/1"
    assert recs[0]["creator"] == "A,B"
    assert set(calls) == set(VictoriaStyleAdapter.LICENSES)


# --- Science Museum --------------------------------------------------------


def _science_record(uid, terms="CC BY-NC-SA 4.0", location="img/1.jpg"):
    return {
        "id": f"obj-{uid}",
        "links": {"self": f"https://sci/obj-{uid}"},
        "attributes": {
            "summary_title": "Engine",
            "lifecycle": {"creation": [{"maker": [{"summary_title": "Maker"}]}]},
            "identifier": [{"value": "A1"}],
            "multimedia": [
                {"admin": {"uid": uid},
                 "processed": {"large": {
                     "location": location, "format": "jpeg",
                     "measurements": {"dimensions": [
                         {"dimension": "height", "units": "pixels", "value": 30},
                         {"dimension": "width", "units": "cm", "value": 99},
                     ]}}},
                 "source": {"legal": {"rights": [{"usage_terms": terms}]}}},
            ],
        },
    }


def test_science_museum_year_sweeps_license_parse_url_prefix():
    def fetch(params):
        if params["page[number]"] > 0 or params["date[from]"] != 0:
            return {"data": [], "links": {}}
        return {
            "data": [
                _science_record("i1"),
                _science_record("i2", terms="Unknown terms"),
                _science_record("i3", terms="CC0 1.0",
                                location="https://abs.example/3.jpg"),
            ],
            "links": {"next": "page2"},
        }

    adapter = ScienceMuseumStyleAdapter(year_ranges=[(0, 200), (200, 1500)])
    recs = drain(provider_fetcher(adapter, fetch))
    assert [r["foreign_identifier"] for r in recs] == ["i1", "i3"]
    assert recs[0]["license"] == "by-nc-sa" and recs[0]["license_version"] == "4.0"
    # relative location gets the coimages prefix; absolute kept
    assert recs[0]["url"].startswith("https://coimages.sciencemuseumgroup.org.uk/")
    assert recs[1]["url"] == "https://abs.example/3.jpg"
    # only pixel-unit dimensions survive
    assert recs[0]["height"] == 30 and recs[0]["width"] is None


def test_science_museum_halts_at_page_50():
    adapter = ScienceMuseumStyleAdapter(year_ranges=[(1900, 1950)])
    seen = []

    def fetch(params):
        seen.append(params["page[number]"])
        return {"data": [_science_record(f"p{params['page[number]']}")],
                "links": {"next": "more", "self": "cur"}}

    drain(provider_fetcher(adapter, fetch))
    assert max(seen) == 50  # hard stop despite a next link


# --- SMK -------------------------------------------------------------------


def test_smk_iiif_and_legacy_urls():
    items = [
        {"rights": "https://creativecommons.org/publicdomain/zero/1.0/",
         "object_number": "KMS 42", "id": "1170000000",
         "image_iiif_id": "https://iip.smk.dk/iiif/jp2/kms42",
         "image_thumbnail": "https://iip.smk.dk/thumb/kms42",
         "titles": [{"title": "Maleri"}],
         "production": [{"creator": "Painter"}],
         "collection": ["Gamle"], "created": "1850",
         "image_width": 100, "image_height": 200},
        {"rights": "https://creativecommons.org/publicdomain/zero/1.0/",
         "object_number": "KMS7", "id": "legacy-7",
         "image_native": "https://smk.dk/native/7.jpg"},
        {"rights": "https://example.com/rights", "object_number": "X", "id": "x"},
    ]

    def fetch(params):
        return {"items": items} if params["offset"] == 0 else {"items": []}

    recs = drain(provider_fetcher(SmkStyleAdapter(), fetch))
    assert len(recs) == 2
    assert recs[0]["url"] == "https://iip.smk.dk/iiif/jp2/kms42/full/!2048,/0/default.jpg"
    assert recs[0]["foreign_landing_url"] == "https://open.smk.dk/en/artwork/image/KMS%2042"
    assert recs[0]["meta_data"]["collection"] == "Gamle"
    assert recs[1]["url"] == "https://smk.dk/native/7.jpg"  # legacy fallback
    assert recs[1]["foreign_identifier"] == "legacy-7"


# --- NYPL ------------------------------------------------------------------


def test_nypl_image_size_preference_and_download_strip():
    detail = {
        "nyplAPI": {"response": {
            "mods": {
                "titleInfo": [{"title": {"$": "Map"}}],
                "name": [{"usage": "primary", "namePart": {"$": "Cartographer"}}],
                "genre": {"$": "Photographs"},
            },
            "sibling_captures": {"capture": {
                "imageID": {"$": "img1"},
                "itemLink": {"$": "https://nypl/item"},
                "rightsStatementURI": {"$": "https://creativecommons.org/publicdomain/zero/1.0/"},
                "imageLinks": {"imageLink": [
                    {"$": "http://images.nypl.org/index.php?id=1&t=w&download=1",
                     "description": "Cropped .jpeg (760 pixels)"},
                    {"$": "http://images.nypl.org/index.php?id=1&t=g&download=1",
                     "description": "Full .gif (1600 pixels)"},
                ]},
            }},
        }}
    }

    def fetch(params):
        if params["page"] == 1:
            return {"nyplAPI": {"response": {"result": [{"uuid": "u1"}]}}}
        return {"nyplAPI": {"response": {"result": []}}}

    adapter = NyplStyleAdapter(detail_fetch=lambda uuid: detail)
    recs = drain(provider_fetcher(adapter, fetch))
    assert len(recs) == 1
    r = recs[0]
    assert "t=g" in r["url"] and "download" not in r["url"]  # largest, stripped
    assert r["filetype"] == "gif"
    assert r["creator"] == "Cartographer"
    assert r["category"] == "photograph"  # genre Photographs


# --- Phylopic --------------------------------------------------------------


def test_phylopic_build_probe_and_zero_indexed_pages():
    def item(uid):
        return {"uuid": uid, "_links": {
            "license": {"href": "https://creativecommons.org/licenses/by/4.0/"},
            "sourceFile": {"href": f"https://images.phylopic.org/{uid}.svg",
                           "sizes": "1536.24x1024"},
            "self": {"href": f"/image/{uid}", "title": f"Taxon {uid}"},
            "contributor": {"title": "Contributor", "href": "/contributors/1"},
        }}

    pages = {0: [item("a")], 1: [item("b")]}
    calls = []

    def fetch(params):
        assert params["build"] == 194
        calls.append(params["page"])
        return {"_embedded": {"items": pages.get(params["page"], [])}}

    adapter = PhylopicStyleAdapter(
        probe_fetch=lambda: {"build": 194, "totalPages": 2, "totalItems": 2}
    )
    recs = drain(provider_fetcher(adapter, fetch))
    assert calls == [0, 1]  # stops at totalPages without a third request
    assert [r["foreign_identifier"] for r in recs] == ["a", "b"]
    assert recs[0]["width"] == 1536 and recs[0]["height"] == 1024  # float-tolerant
    assert recs[0]["foreign_landing_url"] == "https://www.phylopic.org/image/a"
    assert recs[0]["creator_url"] == "https://www.phylopic.org/contributors/1"


# --- Smithsonian -----------------------------------------------------------


def _si_row(fid, unit_code="NPG", access="CC0"):
    return {
        "title": "Portrait",
        "content": {
            "descriptiveNonRepeating": {
                "record_link": "https://si.edu/object/1",
                "unit_code": unit_code,
                "data_source": "NPG",
                "online_media": {"media": [
                    {"type": "Images", "usage": {"access": access},
                     "content": f"https://ids.si.edu/{fid}", "idsId": fid},
                ]},
            },
            "freetext": {
                "notes": [{"label": "Description", "content": "A portrait"},
                          {"label": "Label Text", "content": "On view"}],
                "name": [{"label": "Painter", "content": "P. Painter"},
                         {"label": "Artist", "content": "A. Artist"}],
            },
            "indexedStructured": {"topic": ["Art"], "date": ["1800s"]},
        },
    }


def test_smithsonian_hash_sweeps_subprovider_and_creator_order():
    queries = []

    def fetch(params):
        queries.append(params["q"])
        if params["start"] > 0:
            return {"response": {"rows": []}}
        if "hash:00*" in params["q"]:
            return {"response": {"rows": [_si_row("si-1")]}}
        if "hash:01*" in params["q"]:
            return {"response": {"rows": [_si_row("si-2", access="Not CC0")]}}
        return {"response": {"rows": []}}

    adapter = SmithsonianStyleAdapter(hash_prefixes=["00", "01", "02"])
    recs = drain(provider_fetcher(adapter, fetch))
    assert len(recs) == 1  # non-CC0 media dropped
    r = recs[0]
    assert r["source"] == "smithsonian_portrait_gallery"  # NPG unit code
    assert r["creator"] == "A. Artist"  # artist (0) outranks painter (3)
    assert r["meta_data"]["description"] == "A portrait"
    assert r["meta_data"]["label_text"] == "On view"
    assert {t["name"] for t in r["tags"]} == {"Art", "1800s"}
    assert all("online_media_type:Images AND media_usage:CC0" in q for q in queries)


def test_smithsonian_default_prefixes_cover_256():
    assert len(list(SmithsonianStyleAdapter().sweeps())) == 256


# --- Nappy -----------------------------------------------------------------


def test_nappy_next_page_flag_and_filesize_units():
    pages = {
        1: {"images": [{"foreign_landing_url": "https://nappy.co/photo/1",
                        "url": "https://img.nappy.co/1.jpg",
                        "foreign_identifier": "1", "tags": "a,b",
                        "filesize": "187.8kB", "views": 10}],
            "next_page": 2},
        2: {"images": [{"foreign_landing_url": "https://nappy.co/photo/2",
                        "url": "https://img.nappy.co/2.jpg",
                        "foreign_identifier": "2", "tags": "",
                        "filesize": "2MB"}],
            "next_page": None},
        3: {"images": [{"foreign_landing_url": "https://x", "url": "https://y",
                        "foreign_identifier": "3", "tags": ""}]},
    }
    recs = drain(provider_fetcher(NappyStyleAdapter(), lambda p: pages[p["page"]]))
    assert [r["foreign_identifier"] for r in recs] == ["1", "2"]  # stops per flag
    assert recs[0]["filesize"] == 187800
    assert recs[1]["filesize"] == 2_000_000
    assert recs[0]["thumbnail"].endswith("?auto=format&w=600&q=75")
    assert [t["name"] for t in recs[0]["tags"]] == ["a", "b"]
    assert NappyStyleAdapter._filesize_bytes("boguskB") is None


# --- WordPress -------------------------------------------------------------


def test_wordpress_head_probe_sizes_and_author_fallbacks():
    photo = {
        "slug": "photo-1", "link": "https://wordpress.org/photos/photo-1/",
        "content": {"rendered": "<p>A <b>nice</b> shot</p>"},
        "_embedded": {
            "author": [{"name": "", "slug": "author-slug", "url": "",
                        "link": "https://profiles.wordpress.org/author-slug/"}],
            "wp:featuredmedia": [{"media_details": {
                "image_meta": {"aperture": "f/2", "iso": "100", "camera": ""},
                "filesize": 999,
                "sizes": {
                    "2048x2048": {"source_url": ""},
                    "large": {"source_url": "https://img.wp/1-large.jpg",
                              "height": 700, "width": 1024, "filesize": 123},
                    "full": {"source_url": "https://img.wp/1.jpg",
                             "height": 2000, "width": 3000},
                }}}],
            "wp:term": [[{"taxonomy": "photo_tag", "name": "sunset"},
                         {"taxonomy": "photo_orientation", "name": "landscape"},
                         {"taxonomy": "photo_color", "name": "orange"}]],
        },
    }

    def fetch(params):
        return [photo] if params["page"] == 1 else []

    adapter = WordPressStyleAdapter(head_fetch=lambda p: {"X-WP-TotalPages": "1"})
    recs = drain(provider_fetcher(adapter, fetch))
    assert len(recs) == 1
    r = recs[0]
    assert r["url"] == "https://img.wp/1-large.jpg"  # first non-empty preferred
    assert r["filesize"] == 123
    assert r["creator"] == "author-slug"  # name fell back to slug
    assert r["creator_url"] == "https://profiles.wordpress.org/author-slug/"
    assert r["title"] == "A nice shot"
    assert r["meta_data"]["orientation"] == "landscape"
    assert r["meta_data"]["colors"] == "orange"
    assert [t["name"] for t in r["tags"]] == ["sunset"]


def test_wordpress_zero_total_pages_fetches_one_page_max():
    adapter = WordPressStyleAdapter(head_fetch=lambda p: {})
    calls = []

    def fetch(params):
        calls.append(params["page"])
        return []

    assert drain(provider_fetcher(adapter, fetch)) == []
    assert calls == [1]


# --- Rawpixel --------------------------------------------------------------


def test_rawpixel_hmac_signature_and_title_cleanup():
    adapter = RawpixelStyleAdapter(api_key="secret")
    p1 = adapter.get_next_query_params(None)
    assert set(p1) == {"tags", "page", "pagesize", "s"}
    # signature is deterministic and excludes the previous signature
    p2 = adapter.get_next_query_params(p1)
    assert p2["page"] == 2 and p2["s"] != p1["s"]
    assert p2["s"] == adapter._signature(
        {"tags": "$publicdomain", "page": 2, "pagesize": 100}
    )
    assert "+" not in p1["s"] and "/" not in p1["s"] and "=" not in p1["s"]

    result = {
        "id": 33, "url": "https://www.rawpixel.com/image/33",
        "style_uri": "https://img.rawpixel.com/abc?s={}",
        "width": 0, "display_image_width": 1200,
        "height": 0, "display_image_height": 800,
        "artist_names": "Artist One (Source)",
        "download_count": 4,
        "metadata": {
            "licenseUrl": "https://creativecommons.org/publicdomain/zero/1.0/",
            "title": "Bull elk searches for food. Free public domain CC0 photo. | Free Photo - rawpixel",
            "description_text": "An elk. Digitally enhanced by rawpixel.",
            "popular_keywords": ["public domain art", "elk", "cc0 wildlife"],
        },
    }
    rec = adapter.parse_record(result)
    assert rec["title"] == "Bull elk searches for food"
    assert rec["url"] == "https://img.rawpixel.com/abc?s=image_1300"
    assert rec["width"] == 1200 and rec["height"] == 800
    assert rec["creator"] == "Artist One"
    assert rec["meta_data"]["description"] == "An elk."
    assert [t["name"] for t in rec["tags"]] == ["elk"]  # cc0 keyword excluded
    assert rec["category"] == "digitized_artwork"


# --- Europeana -------------------------------------------------------------


def _europeana_item(i, **over):
    d = {
        "id": f"/2020601/item_{i}",
        "title": [f"Item {i}"],
        "edmIsShownBy": [f"https://img.euro/{i}.jpg"],
        "edmIsShownAt": [f"https://provider.example/{i}"],
        "rights": ["http://creativecommons.org/licenses/by-nc-sa/3.0/"],
        "dataProvider": ["Some Library"],
        "country": ["France"],
        "dcDescriptionLangAware": {"en": ["An english description "]},
    }
    d.update(over)
    return d


def test_europeana_cursor_pagination_and_required_fields():
    responses = {
        "*": {"success": True, "items": [
            _europeana_item(1),
            _europeana_item(2, title=[]),          # required field empty -> drop
            _europeana_item(3, rights=["https://example.com/custom"]),  # no CC
        ], "nextCursor": "c2"},
        "c2": {"success": True, "items": [
            _europeana_item(4, dataProvider=["Wellcome Collection"]),
        ]},  # no nextCursor -> ends
    }
    recs = drain(provider_fetcher(EuropeanaStyleAdapter(), lambda p: responses[p["cursor"]]))
    assert [r["foreign_identifier"] for r in recs] == ["/2020601/item_1", "/2020601/item_4"]
    assert recs[0]["license"] == "by-nc-sa"
    assert recs[0]["source"] is None
    assert recs[0]["meta_data"]["description"] == "An english description"
    assert recs[1]["source"] == "wellcome_collection"  # sub-provider match


# --- Finnish Museums -------------------------------------------------------


def test_finnish_building_sweeps_deed_strip_and_subproviders():
    record = {
        "id": "musketti.M012:HK19670603:7026",
        "title": "Talvimaisema",
        "buildings": [{"value": "0/SA-kuva/"}],
        "imageRights": {"link": "https://creativecommons.org/licenses/by/4.0/deed.fi"},
        "images": ["/Cover/Show?id=1", "/Cover/Show?id=2"],
        "subjects": [["talvi"], ["lumi"]],
        "authors": {"primary": {"Kuvaaja A": ["pht"]}, "corporate": {"SA": []}},
    }

    def fetch(params):
        building = params["filter[]"][1]
        if params["page"] == 1 and building == 'building:"0/SA-kuva/"':
            return {"status": "OK", "records": [record]}
        return {"status": "OK", "records": []}

    recs = drain(provider_fetcher(FinnishStyleAdapter(), fetch))
    assert len(recs) == 2  # one per image
    r = recs[0]
    assert r["license"] == "by" and r["license_version"] == "4.0"  # deed.fi stripped
    assert r["source"] == "finnish_military_museum"  # SA-kuva building
    assert r["url"] == "https://api.finna.fi/Cover/Show?id=1"
    assert r["creator"] == "Kuvaaja A; SA"
    assert [t["name"] for t in r["tags"]] == ["talvi", "lumi"]


# --- OAuth2 + Freesound ----------------------------------------------------


def _token_transport(log):
    def transport(url, payload):
        log.append((url, payload))
        n = len(log)
        return {"access_token": f"acc{n}", "refresh_token": f"ref{n}"}

    return transport


def test_oauth_store_authorize_and_refresh_lifecycle():
    log = []
    store = OAuth2TokenStore(_token_transport(log))
    store.secrets["freesound"] = {"client_id": "cid", "client_secret": "cs"}
    store.auth_codes["freesound"] = "authcode"

    with pytest.raises(MissingTokenError):
        store.access_token("freesound")
    done = store.authorize_providers([FREESOUND_OAUTH])
    assert done == ["freesound"]
    assert store.access_token("freesound") == "acc1"
    assert "freesound" not in store.auth_codes  # consumed
    assert log[0][0] == FREESOUND_OAUTH.auth_url
    assert log[0][1]["code"] == "authcode"

    store.refresh(FREESOUND_OAUTH)
    assert store.access_token("freesound") == "acc2"
    assert log[1][1]["refresh_token"] == "ref1"

    # unknown provider: refresh is a skip (raises), authorize is a no-op
    other = OAuthProvider("jamendo", "https://j/auth", "https://j/refresh")
    with pytest.raises(MissingTokenError):
        store.refresh(other)
    assert store.authorize_providers([other]) == []


def test_oauth_fetch_refreshes_on_401():
    log = []
    store = OAuth2TokenStore(_token_transport(log))
    store.secrets["freesound"] = {"client_id": "cid"}
    store.tokens["freesound"] = {"access_token": "stale", "refresh_token": "r0"}

    seen_tokens = []

    def http_get(params, headers):
        token = headers["Authorization"].removeprefix("Bearer ")
        seen_tokens.append(token)
        if token == "stale":
            return {"unauthorized": True}
        return {"results": [None]}

    fetch = oauth_fetch_fn(store, FREESOUND_OAUTH, http_get)
    assert fetch({"page": 1}) == {"results": [None]}
    assert seen_tokens == ["stale", "acc1"]  # one refresh + retry


def test_freesound_previews_alt_files_and_sets():
    sound = {
        "id": 415362, "url": "https://freesound.org/people/owner/sounds/415362/",
        "name": "Ice howl", "username": "owner",
        "license": "http://creativecommons.org/licenses/by-nc/3.0/",
        "duration": 9.9, "type": "wav", "bitrate": 1381, "samplerate": 44100,
        "filesize": 1745686, "download": "https://freesound.org/dl/415362/",
        "pack": "https://freesound.org/apiv2/packs/23434/",
        "tags": ["ice", "howl"], "num_downloads": 3,
        "previews": {"preview-hq-mp3": "https://freesound.org/previews/415362-hq.mp3"},
    }
    no_preview = {**sound, "id": 2, "previews": {}}
    set_fetches = []

    def set_fetch(url):
        set_fetches.append(url)
        return {"id": 23434, "name": "Winter pack"}

    adapter = FreesoundStyleAdapter(
        set_fetch=set_fetch,
        head_fetch=lambda url: {"content-length": "160000"},
    )

    def fetch(params):
        return {"results": [sound, None, no_preview]} if params["page"] == 1 else {}

    recs = drain(provider_fetcher(adapter, fetch))
    assert len(recs) == 1  # None result and preview-less sound dropped
    r = recs[0]
    assert r["url"] == "https://freesound.org/previews/415362-hq.mp3"
    assert r["filetype"] == "mp3" and r["bit_rate"] == 128000
    assert r["filesize"] == 160000
    assert r["duration"] == 9900  # s -> ms
    assert r["alt_files"][0]["bit_rate"] == 1381000  # kbps -> bps
    assert r["alt_files"][0]["sample_rate"] == 44100
    assert r["audio_set"]["foreign_identifier"] == "23434"
    assert r["audio_set"]["title"] == "Winter pack"
    assert r["license"] == "by-nc" and r["license_version"] == "3.0"

    # memoized set fetch: a second record with the same pack hits the cache
    adapter.parse_record(sound)
    assert len(set_fetches) == 1


# --- end-to-end: new adapters through the shared Spark pipeline ------------


def test_new_adapters_share_downstream_pipeline(spark):
    """Museum + web adapters land real staging rows that survive the
    shared clean/dedupe/merge pipeline unchanged — the switch-over
    contract extended to the round-2 adapter families."""
    import tempfile

    from openverse_catalog_spark.plans.media_pipeline import (
        empty_canonical,
        ingest_media_batch,
    )
    from openverse_catalog_spark.sources.landing import (
        read_json_landing,
        write_landing,
    )
    from openverse_catalog_spark.sources.providers import staging_schema

    def cleveland_fetch(params):
        if params["skip"] == 0:
            return {"data": [_cleveland_record(1)]}
        return {"data": []}

    def nappy_fetch(params):
        return {
            "images": [
                {
                    "foreign_landing_url": "https://nappy.co/photo/9",
                    "url": "https://img.nappy.co/9.jpg",
                    "foreign_identifier": "9",
                    "tags": "portrait",
                    "filesize": "1.5MB",
                    "width": 640,
                    "height": 480,
                }
            ],
            "next_page": None,
        }

    c = provider_fetcher(ClevelandStyleAdapter(), cleveland_fetch)
    n = provider_fetcher(NappyStyleAdapter(), nappy_fetch)
    with tempfile.TemporaryDirectory() as tmp:
        assert write_landing(c, tmp, "2024-02-01", "clevelandmuseum") == 1
        assert write_landing(n, tmp, "2024-02-01", "nappy") == 1
        staging = read_json_landing(spark, tmp, staging_schema()).drop(
            "ingest_date"
        )
        res = ingest_media_batch(
            staging, empty_canonical(spark), spark, deterministic=True
        )
        rows = {r.provider: r for r in res.merged.collect()}
    assert set(rows) == {"clevelandmuseum", "nappy"}
    assert rows["clevelandmuseum"].license == "cc0"
    assert rows["nappy"].filesize == 1_500_000
    assert rows["nappy"].source == "nappy"  # defaulted to provider


def test_freesound_audio_staging_reads_into_audio_schema(spark):
    import tempfile

    from openverse_catalog_spark.sources.landing import (
        read_json_landing,
        write_landing,
    )
    from openverse_catalog_spark.sources.providers import audio_staging_schema

    sound = {
        "id": 1, "url": "https://freesound.org/people/o/sounds/1/",
        "name": "Chime", "username": "o",
        "license": "http://creativecommons.org/publicdomain/zero/1.0/",
        "duration": 2.5, "type": "wav", "bitrate": 1000, "samplerate": 48000,
        "filesize": 100, "download": "https://freesound.org/dl/1/",
        "tags": ["chime"],
        "previews": {"preview-hq-mp3": "https://freesound.org/previews/1-hq.mp3"},
    }
    adapter = FreesoundStyleAdapter(head_fetch=lambda url: {"content-length": "5"})

    def fetch(params):
        return {"results": [sound]} if params["page"] == 1 else {}

    with tempfile.TemporaryDirectory() as tmp:
        assert write_landing(provider_fetcher(adapter, fetch), tmp, "2024-02-01", "freesound") == 1
        staging = read_json_landing(spark, tmp, audio_staging_schema()).drop("ingest_date")
        row = staging.collect()[0]
    assert row.duration == 2500
    assert row.bit_rate == 128000
    assert row.alt_files[0]["sample_rate"] == 48000
    assert row.license == "cc0"


def test_workflow_dag_specs_structural():
    """The reference's test_dag_parsing contract re-expressed for the
    spec emitter: every registered workflow (20) yields a well-formed
    task graph — unique task ids, dependencies resolve, the chain runs
    pull -> clean_<mt> -> merge_<mt> -> report (one clean/merge branch
    per media type), timeouts carry the registry's configuration, and
    the bulk workflow (iNaturalist) runs its pipeline query instead."""
    from openverse_catalog_spark.sources.workflows import (
        PROVIDER_WORKFLOWS,
        get_workflow,
        workflow_dag_specs,
    )

    specs = workflow_dag_specs()
    assert len(specs) == len(PROVIDER_WORKFLOWS) == 20
    assert [s["dag_id"] for s in specs] == sorted(s["dag_id"] for s in specs)

    for s in specs:
        ids = [t["task_id"] for t in s["tasks"]]
        assert len(ids) == len(set(ids))
        known = set(ids)
        for t in s["tasks"]:
            assert set(t["depends_on"]) <= known
            assert t["timeout_hours"] >= 1
        wf = get_workflow(s["dag_id"])
        if wf.adapter_cls is None:
            assert ids == ["ingest_bulk", "report"]
            assert s["tasks"][0]["pipeline"] == "pipeline_inaturalist_bulk"
            continue
        assert ids[0] == "pull_data" and ids[-1] == "report"
        assert s["tasks"][0]["timeout_hours"] == wf.pull_timeout_hours
        for mt in wf.media_types:
            assert f"clean_{mt}" in ids and f"merge_{mt}" in ids
        # report joins every media branch
        assert set(s["tasks"][-1]["depends_on"]) == {
            f"merge_{mt}" for mt in wf.media_types
        }

    wiki = next(s for s in specs if s["dag_id"] == "wikimedia_commons_workflow")
    assert [t["task_id"] for t in wiki["tasks"]] == [
        "pull_data", "clean_image", "merge_image",
        "clean_audio", "merge_audio", "report",
    ]
    flickr = next(s for s in specs if s["dag_id"] == "flickr_workflow")
    assert flickr["dated"] and flickr["schedule"] == "@daily"


def test_run_workflow_spec_executes_flickr_end_to_end(spark, tmp_path):
    """The emitted DAG spec is RUNNABLE: the in-process shim executes
    pull -> clean -> merge -> report in dependency order against a
    fixture transport, landing rows in the CoW media table and
    reporting per-media counts — re-running the same spec is idempotent
    (exact dedupe + MERGE upsert)."""
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.sources.workflows import (
        get_workflow,
        run_workflow_spec,
        workflow_dag_spec,
    )
    from tests.test_providers import _flickr_fetch, _flickr_photo

    spec = workflow_dag_spec(get_workflow("flickr_workflow"))
    root = str(tmp_path / "wf")
    fetch = _flickr_fetch([[_flickr_photo(i) for i in range(4)]])
    res = run_workflow_spec(spark, spec, fetch, root, date="2024-02-01")
    assert res["pull_data"]["records"] == 4
    assert res["merge_image"]["version"] == 2
    assert res["report"]["rows"] == {"image": 4}
    t = CowTable(spark, f"{root}/table_image")
    fids = {r["foreign_identifier"] for r in t.read().collect()}
    assert fids == {"1000", "1001", "1002", "1003"}

    # re-run: same landing date directory is rewritten with the same
    # batch; the MERGE upserts idempotently — no duplicate rows
    res2 = run_workflow_spec(spark, spec, fetch, root, date="2024-02-01")
    assert res2["report"]["rows"] == {"image": 4}
    assert t.read().count() == 4


def test_run_workflow_spec_routes_dual_media(spark, tmp_path):
    """Wikimedia's dual-media spec routes image and audio records to
    their OWN CoW tables through the per-media clean/merge branches —
    audio rows never leak into the image table."""
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.sources.workflows import (
        get_workflow,
        run_workflow_spec,
        workflow_dag_spec,
    )
    from tests.test_providers import _wiki_fetch, _wiki_page

    audio = _wiki_page(7, mediatype="AUDIO", duration=2.0)
    batch = {"1": _wiki_page(1), "2": _wiki_page(2), "7": audio}
    spec = workflow_dag_spec(get_workflow("wikimedia_commons_workflow"))
    root = str(tmp_path / "wf")
    res = run_workflow_spec(
        spark, spec, _wiki_fetch([batch], []), root, date="2024-02-01"
    )
    assert res["pull_data"]["records"] == 3
    assert res["report"]["rows"] == {"image": 2, "audio": 1}
    img = CowTable(spark, f"{root}/table_image").read()
    aud = CowTable(spark, f"{root}/table_audio").read()
    assert img.count() == 2 and aud.count() == 1
    assert aud.first()["duration"] == 2000  # s -> ms through the clean


def test_format_load_report_message():
    from openverse_catalog_spark.sources.workflows import format_load_report

    msg = format_load_report(
        "wikimedia_commons_workflow", {"image": 12345, "audio": 0},
        duration_s=754, date="2024-02-01",
    )
    assert msg == ("wikimedia_commons_workflow: 0 audio, 12,345 image "
                   "upserted for 2024-02-01 in 12m34s")
    assert format_load_report("x", {}) == "x: no records upserted"
    assert format_load_report("x", {"image": 1}, duration_s=5).endswith("in 5s")


def test_run_workflow_backfill_five_days(spark, tmp_path):
    """Dated catchup executed as a real loop (the reference's
    catchup=conf.dated): 5 daily runs land 5 ingest_date partitions,
    each day MERGEs only its own partition, overlapping records across
    days upsert idempotently — final table = the union, not the sum."""
    import os

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.sources.workflows import (
        get_workflow,
        run_workflow_backfill,
        workflow_dag_spec,
    )
    from tests.test_providers import _flickr_fetch, _flickr_photo

    spec = workflow_dag_spec(get_workflow("flickr_workflow"))
    root = str(tmp_path / "wf")

    def fetch_for_date(d):
        k = int(d[-2:]) - 1  # day index 0..4
        # pin a mapped license: the default fixture cycles i%8+1 and
        # ids 6/7 would hit the unmapped 7/8 -> adapter-dropped
        return _flickr_fetch(
            [[_flickr_photo(2 * k + j, license="4") for j in range(4)]]
        )

    res = run_workflow_backfill(
        spark, spec, fetch_for_date, root, "2024-03-01", "2024-03-05"
    )
    assert res["summary"]["days"] == 5
    # one landing partition per day
    parts = sorted(os.listdir(os.path.join(root, "landing")))
    assert parts == [f"ingest_date=2024-03-0{i}" for i in range(1, 6)]
    # each day merged its 4 records; overlaps upserted, not duplicated
    assert all(res[d]["pull_data"]["records"] == 4 for d in
               ("2024-03-01", "2024-03-05"))
    t = CowTable(spark, f"{root}/table_image")
    fids = sorted(
        int(r["foreign_identifier"]) for r in t.read().collect()
    )
    assert fids == list(range(1000, 1012))  # ids 0..11 -> 12 distinct
    assert res["summary"]["rows"] == {"image": 12}
    # re-running one day is idempotent
    from openverse_catalog_spark.sources.workflows import run_workflow_spec

    run_workflow_spec(
        spark, spec, fetch_for_date("2024-03-03"), root, date="2024-03-03"
    )
    assert t.read().count() == 12


def test_run_workflow_reingestion_tiers(spark, tmp_path):
    """Tiered reingestion executed as a real loop: tiers [(1,2),(7,1)]
    -> day shifts [0, 1, 2, 9]; each shifted date re-lands its
    partition and re-MERGEs idempotently — drifted upstream metadata
    refreshes without duplicating rows."""
    import os

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.sources.workflows import (
        get_workflow,
        run_workflow_reingestion,
        workflow_dag_spec,
    )
    from tests.test_providers import _flickr_fetch, _flickr_photo

    spec = workflow_dag_spec(get_workflow("flickr_workflow"))
    root = str(tmp_path / "wf")

    def fetch_for_date(d):
        k = int(d[-2:])  # distinct ids per calendar day, overlap day+1
        return _flickr_fetch([[_flickr_photo(k + j) for j in range(3)]])

    res = run_workflow_reingestion(
        spark, spec, fetch_for_date, root, "2024-03-10", [(1, 2), (7, 1)]
    )
    assert res["summary"]["shifts"] == [0, 1, 2, 9]
    assert res["summary"]["dates"] == [
        "2024-03-10", "2024-03-09", "2024-03-08", "2024-03-01"
    ]
    parts = set(os.listdir(os.path.join(root, "landing")))
    assert parts == {
        "ingest_date=2024-03-10", "ingest_date=2024-03-09",
        "ingest_date=2024-03-08", "ingest_date=2024-03-01",
    }
    # days 10,9,8 -> ids 8..12 (overlapping); day 1 -> ids 1..3
    t = CowTable(spark, f"{root}/table_image")
    fids = sorted(int(r["foreign_identifier"]) for r in t.read().collect())
    assert fids == [1001, 1002, 1003] + list(range(1008, 1013))
    # re-running the whole schedule changes nothing (idempotent re-MERGE)
    res2 = run_workflow_reingestion(
        spark, spec, fetch_for_date, root, "2024-03-10", [(1, 2), (7, 1)]
    )
    assert res2["summary"]["rows"] == res["summary"]["rows"]
    assert t.read().count() == 8


def test_run_workflow_spec_executes_bulk_pipeline(spark, sf_dir, tmp_path):
    """The iNaturalist-style BULK workflow spec is runnable too: its
    ingest_bulk task executes the registered pipeline query through the
    injected runner (keeping the shim import-cycle-free of the
    registry), and the report carries the pipeline's row count."""
    import __spark_entry__ as em
    from openverse_catalog_spark.sources.workflows import (
        get_workflow,
        run_workflow_spec,
        workflow_dag_spec,
    )

    spec = workflow_dag_spec(get_workflow("inaturalist_workflow"))
    assert [t["task_id"] for t in spec["tasks"]] == ["ingest_bulk", "report"]
    res = run_workflow_spec(
        spark, spec, fetch_fn=None, root=str(tmp_path / "wf"),
        pipeline_runner=lambda name: em.queries()[name](spark, sf_dir),
    )
    assert res["ingest_bulk"]["pipeline"] == "pipeline_inaturalist_bulk"
    assert res["ingest_bulk"]["rows"] > 0
    assert res["report"]["rows"] == {"image": res["ingest_bulk"]["rows"]}

    # without a runner the bulk task refuses with guidance
    import pytest

    with pytest.raises(ValueError, match="pipeline_runner"):
        run_workflow_spec(
            spark, spec, fetch_fn=None, root=str(tmp_path / "wf2")
        )
