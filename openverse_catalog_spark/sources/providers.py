"""Concrete provider adapters: the reference's per-provider ingester
scripts re-expressed as small parse layers over the generic
PagedFetcher -> JSONL landing -> Spark staging path.

Two representative API shapes are implemented (they cover the two
pagination families the reference's ~40 providers use):

  * ``FlickrStyleAdapter`` — page-number pagination and flat photo
    records (reference: catalog/dags/providers/provider_api_scripts/
    flickr.py:250-330 — license-id map, owner URL assembly, size-coalesce
    url pick, space-separated tags).
  * ``WikimediaStyleAdapter`` — continue-token pagination and nested
    page maps (reference: wikimedia_commons.py:150-260 — gcmcontinue
    token, imageinfo extraction, "File:" title strip, extmetadata
    license parse).

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


class WikimediaStyleAdapter:
    """Continue-token pagination; nested page maps (wikimedia_commons.py)."""

    provider = "wikimedia"

    def __init__(self) -> None:
        self._token: str | None = None
        self._exhausted = False

    def get_next_query_params(self, prev: dict | None) -> dict:
        base = {"action": "query", "generator": "categorymembers"}
        if prev is None:
            return base
        return {**base, "gcmcontinue": self._token or ""}

    def observe_response(self, response: dict) -> None:
        # the reference stops when the response carries no continue token
        # (wikimedia_commons.py continue handling) — adapter state, since
        # the cursor lives in the RESPONSE, not the request params
        self._token = (response.get("continue") or {}).get("gcmcontinue")
        if self._token is None:
            self._exhausted = True

    def get_batch_data(self, response: dict) -> list[dict] | None:
        pages = (response.get("query") or {}).get("pages") or {}
        return list(pages.values()) or None

    @staticmethod
    def _license_pair(short_name: str) -> tuple[str, str] | None:
        # "CC BY-SA 4.0" -> ("by-sa", "4.0"); "CC0" -> ("cc0", "1.0")
        s = (short_name or "").strip()
        if s.lower() == "cc0":
            return ("cc0", "1.0")
        parts = s.split()
        if len(parts) >= 3 and parts[0].upper() == "CC":
            return ("-".join(parts[1:-1]).lower(), parts[-1])
        return None

    def parse_record(self, raw: dict) -> dict | None:
        infos = raw.get("imageinfo") or []
        info = infos[0] if infos else {}
        meta = info.get("extmetadata") or {}
        lic = self._license_pair(
            (meta.get("LicenseShortName") or {}).get("value", "")
        )
        fid = raw.get("pageid")
        url = info.get("url")
        if not (fid and url and lic):
            return None
        title = (raw.get("title") or "").removeprefix("File:").strip() or None
        return _staging(
            foreign_identifier=str(fid),
            foreign_landing_url=info.get("descriptionurl"),
            url=url,
            license=lic[0],
            license_version=lic[1],
            creator=(meta.get("Artist") or {}).get("value"),
            title=title,
            provider=self.provider,
            width=info.get("width"),
            height=info.get("height"),
        )


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
    sweep value as its second argument."""

    def make_inner(sweep):
        def fetch(params: dict) -> dict | None:
            # response-carried cursors (continue tokens): the adapter
            # marks itself exhausted from the PREVIOUS response; the
            # current batch is still consumed, the NEXT fetch ends it
            if getattr(adapter, "_exhausted", False):
                return None
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
            ingestion_limit=ingestion_limit,
            min_delay=min_delay,
        )

    return _ParsedFetcher(make_inner, adapter)


_NO_SWEEP = object()


class _ParsedFetcher:
    """Maps parse_record over RAW batches, flattening list returns (one
    API object can stage several records: SMK alternative images,
    Brooklyn/Met/NYPL capture lists). Pagination is driven by raw batch
    emptiness (the reference's contract), so a page whose records are
    ALL invalid is skipped without ending ingestion."""

    def __init__(self, make_inner, adapter) -> None:
        self._make_inner = make_inner
        self.adapter = adapter

    def batches(self):
        sweeps = (
            list(self.adapter.sweeps())
            if hasattr(self.adapter, "sweeps")
            else [_NO_SWEEP]
        )
        for sweep in sweeps:
            self.adapter._exhausted = False
            if hasattr(self.adapter, "start_sweep"):
                self.adapter.start_sweep(sweep)
            for raw in self._make_inner(sweep).batches():
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


def staging_schema():
    """Schema for reading a provider landing zone into staging form
    (pass to read_json_landing — explicit schema skips inference and
    enables the PERMISSIVE corrupt-record column)."""
    return spark_schema(IMAGE_TSV_COLUMNS)


def audio_staging_schema():
    """Audio-media staging schema (25-col audio TSV: duration, bit_rate,
    sample_rate, genres, audio_set, set_position, alt_files)."""
    return spark_schema(AUDIO_TSV_COLUMNS)
