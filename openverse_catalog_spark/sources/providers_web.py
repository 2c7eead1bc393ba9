"""Web-platform provider adapters: Nappy, WordPress Photo Directory,
Rawpixel, Europeana, Finnish Museums (Finna), and the OAuth2-backed
Freesound audio adapter (reference
``catalog/dags/providers/provider_api_scripts/{nappy,wordpress,rawpixel,
europeana,finnish_museums,freesound}.py``).

Mechanisms covered beyond the museum family: response-flag continuation
(nappy ``next_page``), HEAD-probed page totals (wordpress
``X-WP-TotalPages``), HMAC-signed query pagination (rawpixel), cursor
pagination with required-field short-circuits and sub-provider
attribution (europeana), time-delineated building sweeps (finnish), and
bearer-token audio ingestion with alt files / audio sets (freesound).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import re
from collections.abc import Callable
from urllib.parse import urlencode

from openverse_catalog_spark.sources.oauth import (
    FREESOUND_OAUTH,
    OAuth2TokenStore,
    oauth_fetch_fn,
)
from openverse_catalog_spark.sources.providers import (
    _audio_staging,
    _cc_pair_from_url,
    _staging,
)


class NappyStyleAdapter:
    """Page pagination continued by the response's ``next_page`` flag
    (nappy.py:50-52); fixed CC0; human filesize strings converted to
    bytes ('187.8kB' -> 187800, nappy.py:57-69); thumbnail is the image
    URL with resize params appended (:78)."""

    provider = "nappy"
    batch_limit = 100
    _MULTIPLIERS = {"kB": 1_000, "MB": 1_000_000, "GB": 1_000_000_000}

    def get_next_query_params(self, prev: dict | None) -> dict:
        if prev is None:
            return {"page": 1, "per_page": self.batch_limit}
        return {**prev, "page": prev["page"] + 1}

    def observe_response(self, response: dict) -> None:
        if not response.get("next_page"):
            self._exhausted = True

    def get_batch_data(self, response: dict) -> list | None:
        return (response or {}).get("images") or None

    @classmethod
    def _filesize_bytes(cls, raw) -> int | None:
        if isinstance(raw, str) and len(raw) > 2:
            stripped = raw.strip()
            if stripped[-2:] in cls._MULTIPLIERS:
                try:
                    units = float(stripped[:-2])
                except ValueError:
                    return None
                return round(units * cls._MULTIPLIERS[stripped[-2:]])
        return None

    def parse_record(self, raw: dict) -> dict | None:
        landing = raw.get("foreign_landing_url")
        url = raw.get("url")
        if landing is None or url is None:
            return None
        meta = {
            k: str(v)
            for k, v in {
                "views": raw.get("views"),
                "saves": raw.get("saves"),
                "downloads": raw.get("downloads"),
            }.items()
            if v is not None
        }
        return _staging(
            foreign_identifier=raw.get("foreign_identifier"),
            foreign_landing_url=landing,
            url=url,
            thumbnail=url + "?auto=format&w=600&q=75",
            license="cc0",
            license_version="1.0",
            filesize=self._filesize_bytes(raw.get("filesize")),
            filetype=raw.get("filetype"),
            creator=raw.get("creator"),
            creator_url=raw.get("creator_url"),
            title=raw.get("title"),
            meta_data=meta or None,
            tags=[
                {"name": t, "provider": self.provider}
                for t in (raw.get("tags") or "").split(",")
                if t
            ]
            or None,
            width=raw.get("width"),
            height=raw.get("height"),
            provider=self.provider,
        )


_TAG_RE = re.compile(r"<[^>]+>")


class WordPressStyleAdapter:
    """Page totals probed with a HEAD request before the first page
    (X-WP-TotalPages, wordpress.py:59-75); records are CC0; the image
    is the first non-empty preferred size of the embedded featured
    media (:136-155); author falls back name->slug and url->link
    (:163-174); EXIF extras plus taxonomy terms build meta/tags
    (:185-207)."""

    provider = "wordpress"
    batch_limit = 100
    METADATA_EXTRAS = [
        "aperture", "camera", "created_timestamp", "focal_length", "iso",
        "shutter_speed",
    ]
    RESOURCE_MAPPING = {
        "photo_category": "categories",
        "photo_color": "colors",
        "photo_orientation": "orientation",
        "photo_tag": "tags",
    }
    PREFERRED_SIZES = ["2048x2048", "1536x1536", "medium_large", "large", "full"]

    def __init__(self, head_fetch: Callable[[dict], dict]) -> None:
        # head_fetch(params) -> response headers dict (the HEAD probe)
        headers = head_fetch({"per_page": self.batch_limit, "_embed": "true"}) or {}
        self.total_pages = int(headers.get("X-WP-TotalPages", 0))
        self.current_page = 1

    def get_next_query_params(self, prev: dict | None) -> dict:
        if prev is not None:
            self.current_page = prev["page"] + 1
        return {
            "format": "json",
            "page": self.current_page,
            "per_page": self.batch_limit,
            "_embed": "true",
        }

    def observe_response(self, response) -> None:
        if self.current_page >= self.total_pages:
            self._exhausted = True

    def get_batch_data(self, response) -> list | None:
        if isinstance(response, list) and response:
            return response
        return None

    @classmethod
    def _file_info(cls, media_details: dict):
        for size in cls.PREFERRED_SIZES:
            details = (media_details.get("sizes") or {}).get(size) or {}
            url = details.get("source_url")
            if not url:
                continue
            filesize = (
                media_details.get("filesize", 0)
                if size == "full"
                else details.get("filesize", 0)
            )
            return url, details.get("height"), details.get("width"), (
                int(filesize) if filesize else None
            )
        return None, None, None, None

    @staticmethod
    def _author(raw: dict):
        authors = (raw.get("_embedded") or {}).get("author") or []
        if not authors:
            return None, None
        author = authors[0].get("name") or authors[0].get("slug")
        author_url = authors[0].get("url") or authors[0].get("link")
        return author, author_url

    def parse_record(self, raw: dict) -> dict | None:
        fid = raw.get("slug")
        landing = raw.get("link")
        if fid is None or landing is None:
            return None
        featured = (raw.get("_embedded") or {}).get("wp:featuredmedia") or []
        if not featured:
            return None
        media_details = featured[0].get("media_details") or {}
        url, height, width, filesize = self._file_info(media_details)
        if url is None:
            return None
        title = (raw.get("content") or {}).get("rendered")
        if title:
            title = _TAG_RE.sub("", title).strip()
        author, author_url = self._author(raw)
        meta, tags = {}, []
        image_meta = media_details.get("image_meta") or {}
        for key in self.METADATA_EXTRAS:
            if image_meta.get(key) not in (None, ""):
                meta[key] = str(image_meta[key])
        for resource_arr in (raw.get("_embedded") or {}).get("wp:term") or []:
            for resource in resource_arr:
                txy = resource.get("taxonomy")
                if txy not in self.RESOURCE_MAPPING:
                    continue
                val = resource.get("name")
                if txy == "photo_tag":
                    tags.append(val)
                elif txy == "photo_orientation":
                    meta["orientation"] = val
                else:
                    key = self.RESOURCE_MAPPING[txy]
                    meta[key] = f"{meta[key]},{val}" if key in meta else val
        return _staging(
            foreign_identifier=fid,
            foreign_landing_url=landing,
            url=url,
            license="cc0",
            license_version="1.0",
            creator=author,
            creator_url=author_url,
            title=title,
            meta_data=meta or None,
            tags=[{"name": t, "provider": self.provider} for t in tags] or None,
            width=width,
            height=height,
            filesize=filesize,
            provider=self.provider,
        )


class RawpixelStyleAdapter:
    """HMAC-SHA256-signed pagination: every request's ordered query
    string is signed with the API key and carried as the ``s`` param,
    recomputed per page (rawpixel.py:92-131); titles lose their
    marketing suffixes via the full- then partial-pattern regexes
    (:55-76, 170-199); tags drop CC boilerplate keywords; category is
    inferred from popular keywords (:221-246)."""

    provider = "rawpixel"
    batch_limit = 100
    api_path = "/api/v1/search"
    full_size_option = "image_1300"

    SUFFIX_PARTIAL = re.compile(
        r"(?:free ?|original ?)?(?:public(?: domain(?: CC0 (?:image|photo))?)?)?"
        r"[.,!?]?$",
        flags=re.IGNORECASE,
    )
    SUFFIX_FULL = re.compile(
        r"(?:Free public domain CC0 (?:image|photo)|Digitally enhanced by rawpixel)"
        r"[.,!?]?$",
        flags=re.IGNORECASE,
    )
    TAGS_EXCLUDE = {"cc0", "creative commons", "public domain"}

    def __init__(self, api_key: str = "test-key") -> None:
        self.api_key = api_key

    def _signature(self, params: dict) -> str:
        ordered = {k: v for k, v in sorted(params.items())}
        query = urlencode(ordered, doseq=True)
        digest = hmac.digest(
            key=self.api_key.encode("utf-8"),
            msg=f"{self.api_path}?{query}".encode("utf-8"),
            digest=hashlib.sha256,
        )
        b64 = base64.b64encode(digest)
        return (
            b64.replace(b"+", b"-").replace(b"/", b"_").replace(b"=", b"")
        ).decode("utf-8")

    def get_next_query_params(self, prev: dict | None) -> dict:
        if prev is None:
            params = {"tags": "$publicdomain", "page": 1, "pagesize": self.batch_limit}
        else:
            params = {**prev, "page": prev["page"] + 1}
            params.pop("s", None)
        return {**params, "s": self._signature(params)}

    def get_batch_data(self, response: dict) -> list | None:
        return (response or {}).get("results") or None

    @classmethod
    def _clean_text(cls, text: str) -> str:
        import html as html_mod

        text = text.strip()
        text = cls.SUFFIX_FULL.sub("", text)
        text = cls.SUFFIX_PARTIAL.sub("", text)
        text = html_mod.unescape(text)
        return text.strip().removesuffix(",")

    @classmethod
    def _title(cls, metadata: dict) -> str | None:
        title = metadata.get("title")
        if not title:
            return None
        title = title.split("|", maxsplit=1)[0].strip()
        title = cls._clean_text(title).removesuffix(".")
        return title or None

    @classmethod
    def _category(cls, metadata: dict) -> str | None:
        keywords = set(metadata.get("popular_keywords") or [])
        if "public domain art" in keywords:
            return "digitized_artwork"
        if "image" in keywords or "photo" in keywords:
            return "photograph"
        if "clipart" in keywords:
            return "illustration"
        return None

    def parse_record(self, raw: dict) -> dict | None:
        fid = raw.get("id")
        landing = raw.get("url")
        metadata = raw.get("metadata")
        if not fid or not landing or not metadata:
            return None
        pair = _cc_pair_from_url(metadata.get("licenseUrl"))
        if pair is None:
            return None
        style_uri = raw.get("style_uri")
        if not style_uri:
            return None
        url = style_uri.format(self.full_size_option)
        width = max(raw.get("width", 0), raw.get("display_image_width", 0)) or None
        height = max(raw.get("height", 0), raw.get("display_image_height", 0)) or None
        description = self._clean_text(metadata.get("description_text") or "")
        meta = {
            k: str(v)
            for k, v in {
                "description": description or None,
                "download_count": raw.get("download_count"),
            }.items()
            if v is not None
        }
        creator = (raw.get("artist_names") or "").removesuffix("(Source)").strip()
        tags = [
            kw
            for kw in (metadata.get("popular_keywords") or [])
            if not any(excl in kw for excl in self.TAGS_EXCLUDE)
        ]
        return _staging(
            foreign_identifier=str(fid),
            foreign_landing_url=landing,
            url=url,
            license=pair[0],
            license_version=pair[1],
            title=self._title(metadata),
            meta_data=meta or None,
            tags=[{"name": t, "provider": self.provider} for t in tags] or None,
            creator=creator or None,
            filetype=raw.get("name_ext"),
            category=self._category(metadata),
            width=width,
            height=height,
            provider=self.provider,
        )


EUROPEANA_SUB_PROVIDERS = {"wellcome_collection": "Wellcome Collection"}


class EuropeanaStyleAdapter:
    """Cursor pagination: each response's nextCursor becomes the next
    request's cursor, None ends ingestion (europeana.py:169-221); the
    record builder short-circuits on ANY empty required field (the
    raise_if_empty decorator, :28-51); the license must be a
    creativecommons entry of the rights list (:112-124); source is the
    sub-provider whose name appears in meta_data.dataProvider, with
    more-than-one a hard error (:75-93)."""

    provider = "europeana"
    batch_limit = 100

    class _Empty(Exception):
        pass

    def __init__(self) -> None:
        self.cursor = None

    def get_next_query_params(self, prev: dict | None) -> dict:
        if prev is None:
            return {
                "profile": "rich",
                "reusability": ["open", "restricted"],
                "sort": ["europeana_id+desc", "timestamp_created+desc"],
                "rows": str(self.batch_limit),
                "media": "true",
                "qf": ["TYPE:IMAGE", "provider_aggregation_edm_isShownBy:*"],
                "cursor": "*",
            }
        return {**prev, "cursor": self.cursor}

    def observe_response(self, response: dict) -> None:
        self.cursor = response.get("nextCursor")
        if self.cursor is None:
            self._exhausted = True

    def get_batch_data(self, response: dict) -> list | None:
        if not (response or {}).get("success"):
            return None
        return response.get("items") or None

    def _require(self, value):
        if not value:
            raise self._Empty()
        return value

    def _description(self, raw: dict) -> str:
        lang_aware = raw.get("dcDescriptionLangAware")
        description = None
        if lang_aware:
            description = lang_aware.get("en") or lang_aware.get("def")
        if not description:
            description = raw.get("dcDescription")
        return description[0].strip() if description else ""

    def parse_record(self, raw: dict) -> dict | None:
        try:
            rights = raw.get("rights") or []
            license_url = self._require(
                next((r for r in rights if "creativecommons" in r), None)
            )
            pair = self._require(_cc_pair_from_url(license_url))
            shown_by = raw.get("edmIsShownBy")
            url = self._require(shown_by[0] if shown_by else None)
            fid = self._require(raw.get("id"))
            titles = raw.get("title")
            title = self._require(titles[0] if titles else None)
            shown_at = raw.get("edmIsShownAt")
            landing = self._require(
                (shown_at[0] if shown_at else None) or raw.get("guid")
            )
        except self._Empty:
            return None
        data_providers = set(raw.get("dataProvider") or [])
        eligible = {
            s
            for s, name in EUROPEANA_SUB_PROVIDERS.items()
            if name in data_providers
        }
        if len(eligible) > 1:
            return None  # reference raises; the loop logs-and-skips
        meta = {
            "country": ",".join(raw.get("country") or []) or None,
            "dataProvider": ",".join(raw.get("dataProvider") or []) or None,
            # an empty-string description is KEPT (the reference's
            # meta_data filter drops only None — europeana.py:134-141,
            # _get_description returns "" for absent descriptions)
            "description": self._description(raw),
        }
        return _staging(
            foreign_identifier=fid,
            foreign_landing_url=landing,
            url=url,
            license=pair[0],
            license_version=pair[1],
            title=title,
            meta_data={k: v for k, v in meta.items() if v is not None} or None,
            source=eligible.pop() if eligible else None,
            provider=self.provider,
        )


FINNISH_SUB_PROVIDERS = {
    "national_museum_of_finland": "0/Suomen kansallismuseo/",
    "finnish_heritage_agency": "0/Museovirasto/",
    "finnish_satakunnan_museum": "0/SATMUSEO/",
    "finnish_military_museum": "0/SA-kuva/",
}


class FinnishStyleAdapter:
    """Sweeps one filtered search per building (finnish_museums.py:
    48-64); the license deed URL loses its 'deed.fi' suffix before
    parsing (:146-155); image paths are relative to the API host
    (:157-161); authors join primary/secondary/corporate name maps with
    semicolons (:163-173); building -> sub-provider source."""

    provider = "finnishmuseums"
    batch_limit = 100
    API_URL = "https://api.finna.fi"
    LANDING_URL = "https://www.finna.fi/Record/"
    BUILDINGS = list(FINNISH_SUB_PROVIDERS.values())

    def sweeps(self):
        return self.BUILDINGS

    def get_next_query_params(self, prev: dict | None, building: str) -> dict:
        if prev is None:
            return {
                "filter[]": [
                    'format:"0/Image/"',
                    f'building:"{building}"',
                ],
                "field[]": [
                    "authors", "buildings", "id", "imageRights", "images",
                    "subjects", "title",
                ],
                "limit": self.batch_limit,
                "page": 1,
            }
        return {**prev, "page": prev["page"] + 1}

    def get_batch_data(self, response: dict) -> list | None:
        if (
            response is None
            or str(response.get("status")).lower() != "ok"
            or not response.get("records")
        ):
            return None
        return response["records"]

    @staticmethod
    def _creator(authors_raw: dict) -> str | None:
        authors = []
        for author_type in ("primary", "secondary", "corporate"):
            author = authors_raw.get(author_type)
            if not isinstance(author, dict):
                continue
            authors.append("; ".join(author.keys()))
        return "; ".join(authors) or None

    def parse_record(self, raw: dict) -> list[dict] | None:
        license_url = (raw.get("imageRights") or {}).get("link")
        if license_url is None:
            return None
        pair = _cc_pair_from_url(license_url.removesuffix("deed.fi"))
        if pair is None:
            return None
        fid = raw.get("id")
        if fid is None:
            return None
        building = (raw.get("buildings") or [{}])[0].get("value")
        source = next(
            (
                s
                for s, b in FINNISH_SUB_PROVIDERS.items()
                if building is not None and building in b
            ),
            None,
        )
        tags = None
        if raw.get("subjects") is not None:
            tags = [t for tag_list in raw["subjects"] for t in tag_list]
        creator = self._creator(raw["authors"]) if raw.get("authors") else None
        return [
            _staging(
                foreign_identifier=fid,
                foreign_landing_url=self.LANDING_URL + fid,
                url=self.API_URL + img,
                license=pair[0],
                license_version=pair[1],
                title=raw.get("title"),
                source=source,
                creator=creator,
                tags=[{"name": t, "provider": self.provider} for t in tags]
                if tags
                else None,
                provider=self.provider,
            )
            for img in raw.get("images") or []
            if img is not None
        ] or None


class FreesoundStyleAdapter:
    """Audio ingestion over a bearer-authenticated transport
    (freesound.py:47-53 + requester.py:164-168): page pagination with
    None results filtered (:104-108); the hq-mp3 preview is the main
    file (fixed 128 kbps bitrate, filesize from a HEAD probe) and the
    original upload becomes an alt_file with kbps->bps conversion
    (:178-215); packs resolve to audio sets via a memoized secondary
    fetch (:139-153); duration seconds -> milliseconds."""

    provider = "freesound"
    media_type = "audio"
    batch_limit = 150
    preferred_preview = "preview-hq-mp3"
    PREVIEW_BITRATES = {
        "preview-hq-mp3": 128000,
        "preview-lq-mp3": 64000,
        "preview-hq-ogg": 192000,
        "preview-lq-ogg": 80000,
    }

    def __init__(
        self,
        set_fetch: Callable[[str], dict | None] | None = None,
        head_fetch: Callable[[str], dict | None] | None = None,
    ) -> None:
        self.set_fetch = set_fetch or (lambda url: None)
        self.head_fetch = head_fetch or (lambda url: {})
        self._set_cache: dict[str, tuple] = {}

    def get_next_query_params(self, prev: dict | None) -> dict:
        if prev is None:
            return {
                "format": "json",
                "query": "",
                "page_size": self.batch_limit,
                "filter": "created:[* TO NOW]",
                "page": 1,
            }
        return {**prev, "page": prev["page"] + 1}

    def get_batch_data(self, response: dict) -> list | None:
        results = (response or {}).get("results")
        if results:
            return [item for item in results if item is not None] or None
        return None

    def _set_info(self, set_url: str):
        if set_url not in self._set_cache:
            resp = self.set_fetch(set_url) or {}
            self._set_cache[set_url] = (resp.get("id"), resp.get("name"))
        return self._set_cache[set_url]

    def _audio_files(self, raw: dict):
        previews = raw.get("previews")
        if not previews:
            return None, None
        preview_url = previews.get(self.preferred_preview)
        if not preview_url:
            return None, None
        head = self.head_fetch(preview_url) or {}
        filesize = head.get("content-length")
        if filesize is None:
            return None, None
        main = {
            "url": preview_url,
            "filetype": self.preferred_preview.split("-")[-1],
            "bit_rate": self.PREVIEW_BITRATES[self.preferred_preview],
            "filesize": int(filesize),
        }
        alt = [
            {
                "url": raw.get("download"),
                "bit_rate": int(raw["bitrate"]) * 1000 if raw.get("bitrate") else None,
                "sample_rate": int(raw["samplerate"]) if raw.get("samplerate") else None,
                "filetype": raw.get("type"),
                "filesize": raw.get("filesize"),
            }
        ]
        return main, alt

    def parse_record(self, raw: dict) -> dict | None:
        landing = raw.get("url")
        fid = raw.get("id")
        if not landing or not fid:
            return None
        pair = _cc_pair_from_url(raw.get("license"))
        if pair is None:
            return None
        main, alt_files = self._audio_files(raw)
        if main is None:
            return None
        creator = (raw.get("username") or "").strip() or None
        creator_url = f"https://freesound.org/people/{creator}/" if creator else None
        duration = (
            int(raw["duration"] * 1000) if raw.get("duration") is not None else None
        )
        set_url = raw.get("pack")
        audio_set = None
        set_position = None
        if set_url is not None:
            set_id, set_name = self._set_info(set_url)
            if set_id is not None:
                audio_set = {
                    "foreign_identifier": str(set_id),
                    "title": set_name,
                    "foreign_landing_url": set_url,
                    "creator": creator,
                    "creator_url": creator_url,
                    "url": None,
                    "filesize": None,
                    "filetype": None,
                    "thumbnail": None,
                }
        meta = {
            k: str(v)
            for k, v in {
                "description": raw.get("description"),
                "num_downloads": raw.get("num_downloads"),
                "avg_rating": raw.get("avg_rating"),
                "num_ratings": raw.get("num_ratings"),
                "geotag": raw.get("geotag"),
                "download": raw.get("download"),
            }.items()
            if v
        }
        return _audio_staging(
            foreign_identifier=str(fid),
            foreign_landing_url=landing,
            url=main["url"],
            filetype=main["filetype"],
            bit_rate=main["bit_rate"],
            filesize=main["filesize"],
            license=pair[0],
            license_version=pair[1],
            creator=creator,
            creator_url=creator_url,
            title=raw.get("name"),
            meta_data=meta or None,
            tags=[{"name": t, "provider": self.provider} for t in raw.get("tags") or []]
            or None,
            duration=duration,
            audio_set=audio_set,
            set_position=set_position,
            alt_files=alt_files,
            provider=self.provider,
        )


def freesound_fetcher_transport(
    store: OAuth2TokenStore, http_get: Callable[[dict, dict], dict | None]
):
    """The freesound transport: bearer-token fetch with 401-refresh,
    using the registered freesound OAuth endpoints (oauth2.py:23-30)."""
    return oauth_fetch_fn(store, FREESOUND_OAUTH, http_get)
