"""Concrete provider adapters: the reference's per-provider ingester
scripts re-expressed as small parse layers over the generic
PagedFetcher -> JSONL landing -> Spark staging path.

This module holds the shared wiring (staging builders, the driver-side
CC license parse, ``provider_fetcher``/``_ParsedFetcher`` with sweep
support and a global ingestion budget) plus four adapter families:

  * ``FlickrStyleAdapter`` — page-number pagination, flat photo records,
    sub-provider attribution (flickr.py:250-330, 45/249-253).
  * ``WikimediaStyleAdapter`` — the full Commons semantics: two-level
    continue tokens, batchcomplete sub-response merging, global-usage
    popularity cache, image/audio routing (wikimedia_commons.py).
  * ``JamendoStyleAdapter`` — offset-paged audio with audio_set/genres.
  * ``StockSnapStyleAdapter`` — static single-page source.

The other 15 reference providers live in ``providers_museums.py`` and
``providers_web.py``; ``workflows.py`` registers all 20 (incl. the
iNaturalist bulk pipeline) with their reference schedules.

Adapters parse records driver-side inside the fetch loop (exactly where
the reference's ingester classes run), so the landing zone already holds
normalized staging rows; Spark picks them up with an explicit schema and
the shared clean -> dedupe -> merge pipeline takes over. Everything
downstream of the landing file is identical across providers — that is
the switch-over contract.
"""

from __future__ import annotations

from collections.abc import Callable

from openverse_catalog_spark.schemas.columns import (
    AUDIO_TSV_COLUMNS,
    IMAGE_TSV_COLUMNS,
    spark_schema,
)
from openverse_catalog_spark.sources.landing import PagedFetcher

STAGING_FIELDS = [c.name for c in IMAGE_TSV_COLUMNS]
AUDIO_STAGING_FIELDS = [c.name for c in AUDIO_TSV_COLUMNS]


def _staging(**fields) -> dict:
    rec = {name: None for name in STAGING_FIELDS}
    rec.update(fields)
    return rec


def _audio_staging(**fields) -> dict:
    rec = {name: None for name in AUDIO_STAGING_FIELDS}
    rec.update(fields)
    return rec


def _int_or_none(v) -> int | None:
    """API numerics arrive as int, float or string (or garbage); the
    reference guards with an explicit int conversion (wikimedia
    record-building) — None on anything unconvertible."""
    try:
        return int(float(v))
    except (TypeError, ValueError):
        return None


def _license_path_map() -> dict[str, tuple[str, str]]:
    """path fragment -> (license, version), built once from the same
    table the Spark-side expression compiles (functions/licenses.py
    license_path_entries), so driver- and executor-side parses recognize
    exactly the same URL set (reference get_license_path_map,
    constants.py:109-116)."""
    global _PATH_MAP
    if _PATH_MAP is None:
        from openverse_catalog_spark.functions.licenses import license_path_entries

        _PATH_MAP = {path: (lic, ver) for path, lic, ver in license_path_entries()}
    return _PATH_MAP


_PATH_MAP: dict[str, tuple[str, str]] | None = None


def _cc_pair_from_url(url: str | None) -> tuple[str, str] | None:
    """Driver-side CC license-URL parse: the fetch-loop twin of the
    licenses.py:87-134 path map (the Spark-side form is the broadcast
    license dim in functions/licenses.py). Returns (license, version),
    or None for any URL whose path is not in the recognized set — the
    reference drops such records at ingest (get_license_info) rather
    than fabricating a version."""
    if not url:
        return None
    path = url.split("creativecommons.org/", 1)
    if len(path) != 2:
        return None
    parts = [p.lower() for p in path[1].split("/") if p]
    # tolerate deed.xx / legalcode suffixes like the reference's substring
    # match by probing the longest recognized prefixes (max depth 4:
    # licenses/<lic>/<ver>/<jur>)
    pmap = _license_path_map()
    for depth in (4, 3, 2):
        frag = "/".join(parts[:depth])
        if frag in pmap:
            return pmap[frag]
    return None


def _strip_query_param(url: str, param: str) -> str:
    """Remove one query parameter, preserving the rest (jamendo.py:70-76)."""
    from urllib.parse import parse_qs, urlencode, urlsplit

    parts = urlsplit(url)
    q = parse_qs(parts.query)
    q.pop(param, None)
    return parts._replace(query=urlencode(q, doseq=True)).geturl()


class FlickrStyleAdapter:
    """Page-number pagination; flat photo dicts (flickr.py)."""

    provider = "flickr"
    per_page = 500  # reference batch_limit (flickr.py:52-65)

    # license id -> (license, version): flickr.py LICENSE_INFO
    LICENSES = {
        "1": ("by-nc-sa", "2.0"),
        "2": ("by-nc", "2.0"),
        "3": ("by-nc-nd", "2.0"),
        "4": ("by", "2.0"),
        "5": ("by-sa", "2.0"),
        "6": ("by-nd", "2.0"),
        "9": ("cc0", "1.0"),
        "10": ("pdm", "1.0"),
    }

    # sub-provider name -> owner nsid set (provider_details.py
    # FLICKR_SUB_PROVIDERS; attribution at flickr.py:249-253): records
    # from these Flickr Commons accounts carry the institution as their
    # `source` while `provider` stays 'flickr'.
    SUB_PROVIDERS = {
        "nasa": {
            "24662369@N07",
            "35067687@N04",
            "29988733@N04",
            "28634332@N05",
            "108488366@N07",
            "136485307@N06",
        },
        "bio_diversity": {"61021753@N02"},
        "spacex": {"130608600@N05"},
        "woc_tech": {"136629440@N06"},
    }

    def _source(self, owner: str) -> str:
        return next(
            (s for s, nsids in self.SUB_PROVIDERS.items() if owner in nsids),
            self.provider,
        )

    def get_next_query_params(self, prev: dict | None) -> dict:
        page = 1 if prev is None else prev["page"] + 1
        return {"page": page, "per_page": self.per_page}

    def get_batch_data(self, response: dict) -> list[dict] | None:
        photos = response.get("photos") or {}
        if photos.get("page", 0) > photos.get("pages", 0):
            return None
        return photos.get("photo") or None

    def parse_record(self, raw: dict) -> dict | None:
        fid = raw.get("id")
        owner = (raw.get("owner") or "").strip()
        lic = self.LICENSES.get(str(raw.get("license")))
        url = raw.get("url_l") or raw.get("url_m") or raw.get("url_s")
        if not (fid and owner and lic and url):
            return None  # required fields (flickr.py:286-298)
        return _staging(
            foreign_identifier=str(fid),
            foreign_landing_url=f"https://www.flickr.com/photos/{owner}/{fid}",
            url=url,
            license=lic[0],
            license_version=lic[1],
            creator=raw.get("ownername"),
            creator_url=f"https://www.flickr.com/photos/{owner}",
            title=raw.get("title") or None,
            tags=[
                {"name": t, "provider": self.provider}
                for t in sorted({t for t in (raw.get("tags") or "").split() if t})[:20]
            ]
            or None,
            provider=self.provider,
            source=self._source(owner),
            width=raw.get("width_l"),
            height=raw.get("height_l"),
        )


def _html_text_and_first_link(html_str: str) -> tuple[str, str | None]:
    """All text content + the first href of an HTML fragment (stdlib
    HTMLParser — the reference uses lxml, wikimedia_commons.py:519-526,
    which is not in this container; semantics match: concatenated text
    nodes, first link of the fragment)."""
    from html.parser import HTMLParser

    class _P(HTMLParser):
        def __init__(self) -> None:
            super().__init__()
            self.texts: list[str] = []
            self.first_link: str | None = None

        def handle_data(self, data: str) -> None:
            self.texts.append(data)

        def handle_starttag(self, tag: str, attrs) -> None:
            if self.first_link is None:
                for k, v in attrs:
                    if k == "href":
                        self.first_link = v
                        break

    p = _P()
    p.feed(html_str)
    return "".join(p.texts).strip(), p.first_link


class WikimediaStyleAdapter:
    """Wikimedia Commons, full reference semantics
    (wikimedia_commons.py):

    * two-level continue pagination (``gaicontinue`` primary iterator,
      ``gucontinue``/``iicontinue`` secondary) with the batch assembled
      by REPEATED requests merged until ``batchcomplete`` — globalusage
      lists concatenate across sub-responses (:614-653);
    * give-up heuristics (:286-263, :404-427): after
      ``max_page_iteration_before_give_up`` sub-requests stuck on the
      same ``gaicontinue``, drop the overflowing property (globalusage
      -> no popularity; iicontinue -> no metadata) and reset the
      secondary iterator;
    * per-day timestamp-pair windows (:645-655);
    * media-type routing (BITMAP/DRAWING -> image, AUDIO -> audio,
      everything else skipped, :625-640);
    * popularity = global usage count, max-cached per foreign id across
      re-served pages (:575-592);
    * record building: LicenseUrl ext-value -> validated CC pair,
      Artist HTML -> creator text + first link, ObjectName/File: title
      cleanup with known-extension strip, categories split, geo data,
      audio duration s->ms / pronunciation category / sample+bit rate
      from the streams metadata walk with the int4 guard (:300-470).
    """

    provider = "wikimedia"
    audio_provider = "wikimedia_audio"
    batch_limit = 250
    image_mediatypes = {"BITMAP", "DRAWING"}
    audio_mediatypes = {"AUDIO"}
    mean_global_usage_limit = 10_000
    max_page_iteration_before_give_up = 100
    _PROPS_ALL = "imageinfo|globalusage"
    _PROPS_NO_POPULARITY = "imageinfo"
    _MEDIA_ALL = "url|user|dimensions|extmetadata|mediatype|size|metadata"
    _MEDIA_NO_METADATA = "url|user|dimensions|extmetadata|mediatype|size"
    _TITLE_EXTS = {".png", ".jpg", ".jpeg", ".ogg", ".wav"}

    def __init__(self, date: str = "2024-01-01") -> None:
        from datetime import datetime, timedelta, timezone

        d = datetime.strptime(date, "%Y-%m-%d").replace(tzinfo=timezone.utc)
        self.start_timestamp = str(int(d.timestamp()))
        self.end_timestamp = str(int((d + timedelta(days=1)).timestamp()))
        self.continue_token: dict = {}
        self.current_props = {
            "prop": self._PROPS_ALL,
            "iiprop": self._MEDIA_ALL,
        }
        self.popularity_cache: dict[int, int] = {}
        self._exhausted = False

    # -- pagination ---------------------------------------------------------

    def get_next_query_params(self, prev: dict | None) -> dict:
        return {
            "action": "query",
            "generator": "allimages",
            "gaisort": "timestamp",
            "gaidir": "newer",
            "gailimit": self.batch_limit,
            "gulimit": self.batch_limit,
            "gunamespace": 0,
            "format": "json",
            "gaistart": self.start_timestamp,
            "gaiend": self.end_timestamp,
            **self.current_props,
            **self.continue_token,
        }

    def fetch_response(self, fetch_fn, params: dict) -> dict | None:
        """The reference's get_response_json override (:223-278): pull
        sub-responses until ``batchcomplete``, merging pages as we go;
        bail to degraded props when stuck on one gaicontinue."""
        batch_json = None
        gaicontinue = None
        iteration_count = 0
        for _ in range(self.mean_global_usage_limit):
            response = fetch_fn(params) or {}
            self.continue_token = response.pop("continue", {})
            params = {**params, **self.continue_token}
            current = self.continue_token.get("gaicontinue")
            if current == gaicontinue:
                iteration_count += 1
            else:
                iteration_count = 0
                gaicontinue = current
            if iteration_count >= self.max_page_iteration_before_give_up:
                self._adjust_parameters_for_next_iteration(gaicontinue)
                break
            batch_json = self._merge_response_jsons(batch_json, response)
            if "batchcomplete" in response:
                self.current_props = {
                    "prop": self._PROPS_ALL,
                    "iiprop": self._MEDIA_ALL,
                }
                break
        if not self.continue_token:
            self._exhausted = True  # get_should_continue (:279-281)
        return batch_json

    def _adjust_parameters_for_next_iteration(self, gaicontinue) -> None:
        if "gucontinue" in self.continue_token:
            self.current_props["prop"] = self._PROPS_NO_POPULARITY
        if "iicontinue" in self.continue_token:
            self.current_props["iiprop"] = self._MEDIA_NO_METADATA
        reset = self.continue_token.get("continue", "||").split("||")[0]
        self.continue_token = {
            "gaicontinue": gaicontinue,
            "continue": f"{reset}||",
        }

    @staticmethod
    def _pages(response: dict | None) -> dict | None:
        if response is not None:
            return (response.get("query") or {}).get("pages")
        return None

    def _merge_response_jsons(self, left: dict | None, right: dict) -> dict | None:
        from copy import deepcopy

        if left is None:
            return right
        lp, rp = self._pages(left), self._pages(right)
        if lp is None or rp is None or lp.keys() != rp.keys():
            return None  # reference logs "Cannot merge" and yields None
        merged = deepcopy(left)
        merged.update(right)
        self._pages(merged).update(
            {k: self._merge_media_pages(lp[k], rp[k]) for k in lp}
        )
        return merged

    @staticmethod
    def _merge_media_pages(left: dict, right: dict) -> dict:
        from copy import deepcopy

        merged = deepcopy(left)
        merged_gu = left.get("globalusage", []) + right.get("globalusage", [])
        merged.update(right)
        merged["globalusage"] = merged_gu
        return merged

    def get_batch_data(self, response: dict | None) -> list[dict] | None:
        pages = self._pages(response)
        return list(pages.values()) if pages else None

    # -- record building ----------------------------------------------------

    @staticmethod
    def _ext_value(info: dict, key: str):
        return ((info.get("extmetadata") or {}).get(key) or {}).get("value")

    @staticmethod
    def _value_by_name(kv_list, name):
        for kv in kv_list or []:
            if kv.get("name") == name:
                return kv.get("value")
        return None

    @classmethod
    def _value_by_names(cls, kv_list, names):
        for n in names:
            if v := cls._value_by_name(kv_list, n):
                return v
        return None

    def _extract_title(self, info: dict, raw: dict) -> str:
        title = self._ext_value(info, "ObjectName")
        if title is None:
            title = raw.get("title") or ""
        if title.startswith("File:"):
            title = title.replace("File:", "", 1)
        dot = title.rfind(".")
        if dot > 0 and title[dot:].lower() in self._TITLE_EXTS:
            title = title[:dot]
        return title

    def _global_usage(self, raw: dict) -> int:
        count = len(raw.get("globalusage") or [])
        fid = raw["pageid"]
        best = max(count, self.popularity_cache.get(fid, 0))
        if best > 0:
            self.popularity_cache[fid] = best
        return best

    def _audio_file_meta(self, info: dict) -> list:
        metadata = info.get("metadata") or []
        streams = self._value_by_name(metadata, "streams")
        if not streams:
            audio = self._value_by_name(metadata, "audio")
            streams = self._value_by_name(audio, "streams")
        if streams:
            streams_data = streams[0].get("value", [])
            return self._value_by_name(streams_data, "header") or streams_data
        return []

    def parse_record(self, raw: dict) -> dict | None:
        infos = raw.get("imageinfo") or []
        info = infos[0] if infos else {}
        mediatype = info.get("mediatype")
        if mediatype in self.image_mediatypes:
            media_type = "image"
        elif mediatype in self.audio_mediatypes:
            media_type = "audio"
        else:
            return None  # VIDEO/OFFICE etc. are skipped (:625-640)
        license_url = (self._ext_value(info, "LicenseUrl") or "").strip()
        pair = _cc_pair_from_url(license_url)
        if pair is None:
            return None
        url = info.get("url")
        fid = raw.get("pageid")
        if url is None or fid is None:
            return None

        creator, creator_url = None, None
        if artist := self._ext_value(info, "Artist"):
            creator, creator_url = _html_text_and_first_link(artist)
            creator = creator or None
        meta: dict = {"global_usage_count": str(self._global_usage(raw))}
        if d0 := self._ext_value(info, "DateTimeOriginal"):
            meta["date_originally_created"] = d0
        if d1 := self._ext_value(info, "DateTime"):
            meta["last_modified_at_source"] = d1
        categories = (self._ext_value(info, "Categories") or "").split("|")
        meta["categories"] = ",".join(categories)
        for mk, ek in (
            ("latitude", "GPSLatitude"),
            ("longitude", "GPSLongitude"),
            ("map_datum", "GPSMapDatum"),
        ):
            if gv := self._ext_value(info, ek):
                meta[mk] = gv
        if desc := self._ext_value(info, "ImageDescription"):
            text, _ = _html_text_and_first_link(desc)
            # reference joins lxml text nodes with spaces (:608-611)
            meta["description"] = " ".join(text.split())
        filetype = (url or "").split(".")[-1] or None
        common = dict(
            foreign_identifier=str(fid),
            foreign_landing_url=info.get("descriptionshorturl"),
            url=url,
            license=pair[0],
            license_version=pair[1],
            creator=creator,
            creator_url=creator_url,
            title=self._extract_title(info, raw),
            filetype=filetype,
            filesize=info.get("size", 0),
            meta_data=meta,
        )
        if media_type == "image":
            rec = _staging(
                **common,
                provider=self.provider,
                width=info.get("width"),
                height=info.get("height"),
            )
            if filetype == "svg":
                rec["category"] = "illustration"
        else:
            file_meta = self._audio_file_meta(info)
            rec = _audio_staging(
                **common,
                provider=self.audio_provider,
                duration=int(float(info.get("duration", 0)) * 1000),
            )
            if any("pronunciation" in c.lower() for c in categories):
                rec["category"] = "pronunciation"
            # streams metadata is API-supplied and may carry string
            # numerics — coerce like the reference's explicit int() guard
            # before the int4 bound check instead of TypeError-ing
            if (sr := _int_or_none(self._value_by_names(
                file_meta, ["audio_sample_rate", "sample_rate"]
            ))):
                rec["sample_rate"] = sr
            if (br := _int_or_none(
                self._value_by_names(file_meta, ["bitrate_nominal", "bitrate"])
            )):
                rec["bit_rate"] = br if br <= 2147483647 else None
            if ch := self._value_by_names(file_meta, ["audio_channels", "channels"]):
                rec["meta_data"]["channels"] = str(ch)
        rec["media_type"] = media_type
        return rec


class JamendoStyleAdapter:
    """Offset pagination; AUDIO media type with audio_set / genres /
    set_position (reference: jamendo.py:44-66 offset advance, :117-132
    'from'-param strip on the audio URL, :77-112 trackid strip + trailing
    slash on album thumbnails, :169-239 record assembly — duration s->ms,
    category 'music', license from CC URL)."""

    provider = "jamendo"
    media_type = "audio"
    batch_limit = 200  # jamendo.py:38

    def get_next_query_params(self, prev: dict | None) -> dict:
        if prev is None:
            return {"limit": self.batch_limit, "offset": 0}
        return {**prev, "offset": prev["offset"] + self.batch_limit}

    def get_batch_data(self, response: dict) -> list[dict] | None:
        return response.get("results") or None

    @staticmethod
    def _thumb(url: str | None) -> str | None:
        # trailing slash before query, then trackid strip (jamendo.py:77-112)
        if not url:
            return None
        if "/?" not in url:
            url = url.replace("?", "/?")
        return _strip_query_param(url, "trackid")

    def parse_record(self, raw: dict) -> dict | None:
        fid = raw.get("id")
        landing = raw.get("shareurl")
        audio_url = raw.get("audio")
        lic = _cc_pair_from_url(raw.get("license_ccurl"))
        if not (fid and landing and audio_url and lic):
            return None
        audio_url = _strip_query_param(audio_url, "from")
        duration = raw.get("duration")
        musicinfo = raw.get("musicinfo") or {}
        tags = []
        if musicinfo.get("vocalinstrumental"):
            tags.append(musicinfo["vocalinstrumental"])
        if musicinfo.get("speed"):
            tags.append(f"speed_{musicinfo['speed']}")
        set_id = raw.get("album_id")
        set_name = raw.get("album_name")
        audio_set = None
        if set_id and set_name:
            slug = set_name.lower().replace(" ", "-").replace("/", "-")
            audio_set = {
                "foreign_identifier": str(set_id),
                "title": set_name,
                "foreign_landing_url": f"https://www.jamendo.com/album/{set_id}/{slug}",
                "creator": raw.get("artist_name"),
                "creator_url": None,
                "url": None,
                "filesize": None,
                "filetype": None,
                "thumbnail": self._thumb(raw.get("album_image")),
            }
        return _audio_staging(
            foreign_identifier=str(fid),
            foreign_landing_url=landing,
            url=audio_url,
            thumbnail=self._thumb(raw.get("image")),
            license=lic[0],
            license_version=lic[1],
            creator=(raw.get("artist_name") or "").strip() or None,
            creator_url=(
                f"https://www.jamendo.com/artist/{raw['artist_id']}/{raw['artist_idstr']}"
                if raw.get("artist_id") and raw.get("artist_idstr")
                else None
            ),
            title=raw.get("name") or None,
            meta_data={
                k: str(v)
                for k, v in {
                    "release_date": raw.get("releasedate"),
                    "downloads": (raw.get("stats") or {}).get("rate_download_total"),
                    "listens": (raw.get("stats") or {}).get("rate_listened_total"),
                }.items()
                if v is not None
            }
            or None,
            tags=[{"name": t, "provider": self.provider} for t in tags] or None,
            category="music",
            provider=self.provider,
            duration=int(duration) * 1000 if duration else None,  # s -> ms
            genres=(musicinfo.get("tags") or {}).get("genres") or None,
            audio_set=audio_set,
            set_position=raw.get("position"),
            filetype="mp3",
        )


class StockSnapStyleAdapter:
    """Single static endpoint, fixed CC0 license, no pagination — the
    smallest provider surface (reference: stocksnap.py — one bulk page,
    every record CC0 1.0, camera EXIF into meta_data). The SURVEY §7.1
    step-5 'static ingest' shape."""

    provider = "stocksnap"

    def __init__(self) -> None:
        self._done = False

    def get_next_query_params(self, prev: dict | None) -> dict:
        return {}

    def get_batch_data(self, response: dict) -> list[dict] | None:
        if self._done:
            return None
        self._done = True
        return response.get("results") or None

    def parse_record(self, raw: dict) -> dict | None:
        fid = raw.get("img_id")
        if not fid:
            return None
        sizes = raw.get("sizes") or {}
        best = sizes.get("original") or sizes.get("large") or {}
        url = best.get("url")
        if not url:
            return None
        return _staging(
            foreign_identifier=str(fid),
            foreign_landing_url=f"https://stocksnap.io/photo/{fid}",
            url=url,
            license="cc0",
            license_version="1.0",
            creator=raw.get("author_name"),
            creator_url=raw.get("author_profile"),
            title=raw.get("title") or None,
            tags=[
                {"name": t.lower(), "provider": self.provider}
                for t in (raw.get("keywords") or [])
            ]
            or None,
            meta_data=(
                {k: str(v) for k, v in (raw.get("camera") or {}).items() if v}
                or None
            ),
            provider=self.provider,
            width=best.get("width"),
            height=best.get("height"),
        )


def provider_fetcher(
    adapter,
    fetch_fn: Callable[[dict], dict | None],
    ingestion_limit: int | None = None,
    min_delay: float = 0.0,
) -> "_ParsedFetcher":
    """Wire an adapter into the generic fetch loop: records are parsed
    (and invalid ones dropped) INSIDE the loop, so the landing zone
    holds normalized staging rows and every provider shares the exact
    same downstream pipeline.

    Adapters may expose ``sweeps() -> iterable`` to run the whole paged
    loop once per outer value (the reference's
    ``ingest_records(**kwargs)`` overrides: per-license for
    museum_victoria.py:45-48, per-building for finnish_museums.py:61-64,
    per-year-range for science_museum.py:74-79, per-hash-prefix for
    smithsonian.py:411-415); ``get_next_query_params`` then receives the
    sweep value as its second argument.

    ``ingestion_limit`` and ``min_delay`` are GLOBAL across sweeps, like
    the reference's shared ingester state (``record_count`` accumulates
    over every ``ingest_records`` call and the DelayedRequester is one
    instance): the limit is enforced by the sweep loop over raw records,
    and the politeness clock is shared between the per-sweep fetchers."""
    import time

    shared_clock: dict = {}

    def delayed_fetch(params: dict) -> dict | None:
        """fetch_fn behind the SAME politeness clock PagedFetcher uses.
        Adapters that drive the transport themselves (``fetch_response``
        multi-request batch assembly — wikimedia batchcomplete merging)
        get this wrapper, so their inner sub-requests honor min_delay
        like the reference's single DelayedRequester, which delays EVERY
        request — not just the one-per-batch outer call."""
        wait = min_delay - (time.monotonic() - shared_clock.get("last_request", 0.0))
        if wait > 0:
            time.sleep(wait)
        shared_clock["last_request"] = time.monotonic()
        return fetch_fn(params)

    def make_inner(sweep):
        def fetch(params: dict) -> dict | None:
            # response-carried cursors (continue tokens): the adapter
            # marks itself exhausted from the PREVIOUS response; the
            # current batch is still consumed, the NEXT fetch ends it
            if getattr(adapter, "_exhausted", False):
                return None
            if hasattr(adapter, "fetch_response"):
                # multi-request batch assembly (wikimedia batchcomplete
                # merging): the adapter drives the transport itself —
                # through the delay wrapper, so sub-requests share the
                # politeness clock with the outer loop
                return adapter.fetch_response(delayed_fetch, params)
            response = fetch_fn(params)
            if response is not None and hasattr(adapter, "observe_response"):
                adapter.observe_response(response)
            return response

        if sweep is _NO_SWEEP:
            next_params = adapter.get_next_query_params
        else:
            def next_params(prev):
                return adapter.get_next_query_params(prev, sweep)

        return PagedFetcher(
            fetch_fn=fetch,
            get_batch_data=adapter.get_batch_data,
            get_next_query_params=next_params,
            # the global cap lives in _ParsedFetcher; per-sweep fetchers
            # stay uncapped so sweep N doesn't restart the budget
            ingestion_limit=None,
            min_delay=min_delay,
            shared_state=shared_clock,
        )

    return _ParsedFetcher(make_inner, adapter, ingestion_limit=ingestion_limit)


_NO_SWEEP = object()


class _ParsedFetcher:
    """Maps parse_record over RAW batches, flattening list returns (one
    API object can stage several records: SMK alternative images,
    Brooklyn/Met/NYPL capture lists). Pagination is driven by raw batch
    emptiness (the reference's contract), so a page whose records are
    ALL invalid is skipped without ending ingestion."""

    def __init__(self, make_inner, adapter, ingestion_limit: int | None = None) -> None:
        self._make_inner = make_inner
        self.adapter = adapter
        self.ingestion_limit = ingestion_limit

    def batches(self):
        sweeps = (
            list(self.adapter.sweeps())
            if hasattr(self.adapter, "sweeps")
            else [_NO_SWEEP]
        )
        fetched = 0  # RAW records, across ALL sweeps (reference
        # provider_data_ingester.py record_count semantics)
        for sweep in sweeps:
            self.adapter._exhausted = False
            if hasattr(self.adapter, "start_sweep"):
                self.adapter.start_sweep(sweep)
            for raw in self._make_inner(sweep).batches():
                raw = list(raw)  # adapters may yield dict_values
                if self.ingestion_limit is not None:
                    raw = raw[: self.ingestion_limit - fetched]
                fetched += len(raw)
                parsed: list[dict] = []
                for rec in raw:
                    out = self.adapter.parse_record(rec)
                    if out is None:
                        continue
                    if isinstance(out, list):
                        parsed.extend(r for r in out if r is not None)
                    else:
                        parsed.append(out)
                if parsed:
                    yield parsed
                if self.ingestion_limit is not None and fetched >= self.ingestion_limit:
                    return


def staging_schema():
    """Schema for reading a provider landing zone into staging form
    (pass to read_json_landing — explicit schema skips inference and
    enables the PERMISSIVE corrupt-record column)."""
    return spark_schema(IMAGE_TSV_COLUMNS)


def audio_staging_schema():
    """Audio-media staging schema (25-col audio TSV: duration, bit_rate,
    sample_rate, genres, audio_set, set_position, alt_files)."""
    return spark_schema(AUDIO_TSV_COLUMNS)
