"""Museum/GLAM provider adapters — the reference's largest parser family
(``catalog/dags/providers/provider_api_scripts/``: cleveland_museum.py,
brooklyn_museum.py, metropolitan_museum.py, museum_victoria.py,
science_museum.py, smk.py, nypl.py, phylopic.py, smithsonian.py).

Every adapter keeps the reference's record semantics (required-field
short-circuits, image preference orders, license extraction quirks,
sub-provider attribution) but plugs into the shared driver-side fetch
loop (sources/landing.py) + distributed landing-zone pipeline; nothing
downstream is provider-specific. Adapters with secondary per-object
fetches (Brooklyn, Met, NYPL) take the detail transport injected, same
as the page transport — tests drive both with fakes, mirroring
``catalog/tests/dags/providers/provider_api_scripts/resources/``.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from urllib.parse import parse_qs, quote, urlparse

from openverse_catalog_spark.functions.licenses import license_pairs
from openverse_catalog_spark.sources.providers import (
    _cc_pair_from_url,
    _staging,
)

# valid (license, version) pairs — the get_license_info gate every
# reference parser passes split pairs through
_VALID_PAIRS = {(lic, ver) for lic, ver, _ in license_pairs()}


class ClevelandStyleAdapter:
    """skip/limit offset pagination over openaccess artworks; CC0-only
    share_license_status gate, web>print>full image preference, digit
    guards on dimensions (cleveland_museum.py:19-121)."""

    provider = "clevelandmuseum"
    batch_limit = 1000

    def get_next_query_params(self, prev: dict | None) -> dict:
        if prev is None:
            return {"cc": "1", "has_image": "1", "limit": self.batch_limit, "skip": 0}
        return {**prev, "skip": prev["skip"] + self.batch_limit}

    def get_batch_data(self, response: dict) -> list | None:
        return (response or {}).get("data") or None

    @staticmethod
    def _best_image(images: dict | None) -> dict | None:
        if not images:
            return None
        for key in ("web", "print", "full"):
            if images.get(key):
                return images[key]
        return None

    @staticmethod
    def _int(data: dict, key: str):
        v = data.get(key)
        if isinstance(v, int) and v:
            return v
        if isinstance(v, str) and v.isdigit():
            return int(v)
        return None

    def parse_record(self, raw: dict) -> dict | None:
        if (raw.get("share_license_status") or "").lower() != "cc0":
            return None
        fid = raw.get("id")
        if fid is None:
            return None
        image = self._best_image(raw.get("images"))
        if not image or not image.get("url"):
            return None
        creators = raw.get("creators") or []
        meta = {
            "accession_number": raw.get("accession_number"),
            "technique": raw.get("technique"),
            "date": raw.get("creation_date"),
            "credit_line": raw.get("creditline"),
            "classification": raw.get("type"),
            "tombstone": raw.get("tombstone"),
            "culture": ",".join(c for c in raw.get("culture", []) if c) or None,
        }
        return _staging(
            foreign_identifier=str(fid),
            foreign_landing_url=raw.get("url"),
            url=image["url"],
            license="cc0",
            license_version="1.0",
            creator=(creators[0].get("description", "") if creators else ""),
            title=raw.get("title"),
            meta_data={k: str(v) for k, v in meta.items() if v is not None} or None,
            width=self._int(image, "width"),
            height=self._int(image, "height"),
            filesize=self._int(image, "filesize"),
            provider=self.provider,
        )


_CC_LINK_RE = re.compile(r"href=[\"'](https://creativecommons\.org/[^\"']+)[\"']")


class BrooklynStyleAdapter:
    """offset pagination with a message=='success.' envelope; license URL
    scraped from the rights-type HTML description (exactly one CC link,
    brooklyn_museum.py:53-61); a SECOND per-object fetch supplies the
    image list; size from the largest_derivative entry
    (brooklyn_museum.py:63-77, 139-158)."""

    provider = "brooklynmuseum"
    batch_limit = 35

    def __init__(self, detail_fetch: Callable[[int], dict | None]) -> None:
        # detail_fetch(object_id) plays GET /api/v2/object/<id>
        self.detail_fetch = detail_fetch

    def get_next_query_params(self, prev: dict | None) -> dict:
        if prev is None:
            return {
                "has_images": 1,
                "rights_type_permissive": 1,
                "limit": self.batch_limit,
                "offset": 0,
            }
        return {**prev, "offset": prev["offset"] + self.batch_limit}

    @staticmethod
    def _unwrap(response: dict | None) -> dict | list | None:
        if response and (response.get("message") or "").lower() == "success.":
            return response.get("data")
        return None

    def get_batch_data(self, response: dict) -> list | None:
        return self._unwrap(response) or None

    @staticmethod
    def _license_url(rights_info: dict | None) -> str | None:
        links = _CC_LINK_RE.findall((rights_info or {}).get("description", ""))
        return links[0] if len(links) == 1 else None

    @staticmethod
    def _sizes(image: dict):
        derivatives = image.get("derivatives")
        if not isinstance(derivatives, list):
            return None, None
        target = image.get("largest_derivative", "")
        for size in derivatives:
            if size.get("size", "") == target:
                return size.get("height"), size.get("width")
        return None, None

    def parse_record(self, raw: dict) -> list[dict] | None:
        oid = raw.get("id")
        if not oid:
            return None
        license_url = self._license_url(raw.get("rights_type"))
        pair = _cc_pair_from_url(license_url)
        if pair is None:
            return None
        obj = self._unwrap(self.detail_fetch(oid))
        if obj is None or obj.get("id") is None:
            return None
        images = obj.get("images")
        if images is None:
            return None
        meta = {
            k: str(v)
            for k, v in {
                "accession_number": obj.get("accession_number"),
                "date": obj.get("object_date"),
                "description": obj.get("description"),
                "medium": obj.get("medium"),
                "credit_line": obj.get("credit_line"),
                "classification": obj.get("classification"),
            }.items()
            if v is not None
        }
        artists = obj.get("artists")
        creator = None
        if isinstance(artists, list):
            creator = next(
                (a.get("name") for a in artists if a.get("rank") == 1), None
            )
        out = []
        for image in images:
            fid = image.get("id")
            url = image.get("largest_derivative_url")
            if fid is None or url is None:
                continue
            height, width = self._sizes(image)
            out.append(
                _staging(
                    foreign_identifier=str(fid),
                    foreign_landing_url=(
                        f"https://www.brooklynmuseum.org/opencollection/objects/{obj['id']}"
                    ),
                    url=url,
                    license=pair[0],
                    license_version=pair[1],
                    title=obj.get("title", ""),
                    creator=creator,
                    meta_data=meta or None,
                    width=width,
                    height=height,
                    provider=self.provider,
                )
            )
        return out or None


class MetStyleAdapter:
    """One unpaginated object-ID listing (metadataDate-scoped), then a
    per-object detail fetch; isPublicDomain gates CC0; every image of an
    object stages a record with fid '<object_id>-<url suffix>'
    (metropolitan_museum.py:63-128)."""

    provider = "met"

    def __init__(self, detail_fetch: Callable[[int], dict | None], date: str | None = None) -> None:
        self.detail_fetch = detail_fetch
        self.date = date
        self._served = False

    def get_next_query_params(self, prev: dict | None) -> dict:
        return {"metadataDate": self.date} if self.date else {}

    def get_batch_data(self, response: dict) -> list | None:
        # single page of object IDs; the next fetch ends the loop
        if self._served:
            return None
        self._served = True
        return (response or {}).get("objectIDs") or None

    @staticmethod
    def _fid(object_id, image_url: str) -> str:
        suffix = image_url.split("/")[-1].split(".")[0]
        return f"{object_id}-{suffix}"

    def parse_record(self, object_id) -> list[dict] | None:
        obj = self.detail_fetch(object_id) or {}
        if not obj.get("isPublicDomain"):
            return None
        landing = obj.get("objectURL")
        if not landing:
            return None
        image_list = [
            img
            for img in [obj.get("primaryImage"), *(obj.get("additionalImages") or [])]
            if img
        ]
        if not image_list:
            return None
        meta = (
            {"accession_number": str(obj["accessionNumber"])}
            if obj.get("accessionNumber")
            else None
        )
        tags = [
            t
            for t in [
                obj.get("department"),
                obj.get("medium"),
                obj.get("culture"),
                obj.get("objectName"),
                obj.get("artistDisplayName"),
                obj.get("classification"),
                obj.get("objectDate"),
                obj.get("creditLine"),
                obj.get("period"),
            ]
            if t
        ] + [t["term"] for t in (obj.get("tags") or [])]
        return [
            _staging(
                foreign_identifier=self._fid(object_id, img),
                foreign_landing_url=landing,
                url=img,
                license="cc0",
                license_version="1.0",
                creator=obj.get("artistDisplayName"),
                title=obj.get("title") or obj.get("objectName"),
                meta_data=meta,
                tags=[{"name": t, "provider": self.provider} for t in tags] or None,
                provider=self.provider,
            )
            for img in image_list
        ]


class VictoriaStyleAdapter:
    """Sweeps one paged search per license filter (museum_victoria.py:
    31-48); record ids deduped ACROSS sweeps; each item's media list
    stages one record per image with large>medium>small preference and
    a creativecommons-host uri gate (:120-175)."""

    provider = "museumsvictoria"
    batch_limit = 100
    LANDING = "https://collections.museumsvictoria.com.au/"
    LICENSES = [
        "public domain",
        "cc by",
        "cc by-nc",
        "cc by-nc-sa",
        "cc by-nc-nd",
        "cc by-sa",
    ]

    def __init__(self) -> None:
        self._seen: set = set()

    def sweeps(self):
        return self.LICENSES

    def get_next_query_params(self, prev: dict | None, license_: str) -> dict:
        if prev is None:
            return {
                "hasimages": "yes",
                "perpage": self.batch_limit,
                "imagelicense": license_,
                "page": 0,
            }
        return {**prev, "page": prev["page"] + 1}

    def get_batch_data(self, response) -> list | None:
        return response or None

    @staticmethod
    def _image_data(media: dict):
        for size in ("large", "medium", "small"):
            if size in media:
                d = media[size]
                return d.get("uri"), d.get("height"), d.get("width")
        return None, None, None

    def parse_record(self, raw: dict) -> list[dict] | None:
        oid = raw.get("id")
        if oid in self._seen:
            return None
        self._seen.add(oid)
        media = raw.get("media")
        if media is None:
            return None
        meta = {
            "datemodified": raw.get("dateModified"),
            "category": raw.get("category"),
            "description": raw.get("physicalDescription"),
            "keywords": ",".join(raw["keywords"])
            if isinstance(raw.get("keywords"), list)
            else None,
            "classifications": ",".join(raw["classifications"])
            if isinstance(raw.get("classifications"), list)
            else None,
        }
        meta = {k: str(v) for k, v in meta.items() if v is not None}
        out = []
        for m in media:
            if m.get("type") != "image":
                continue
            url, height, width = self._image_data(m)
            uri = (m.get("licence") or {}).get("uri") or ""
            pair = _cc_pair_from_url(uri) if "creativecommons" in uri else None
            if url is None or m.get("id") is None or pair is None:
                continue
            creators = m.get("creators")
            out.append(
                _staging(
                    foreign_identifier=str(m["id"]),
                    foreign_landing_url=f"{self.LANDING}{oid}",
                    url=url,
                    license=pair[0],
                    license_version=pair[1],
                    creator=",".join(creators) if isinstance(creators, list) else creators,
                    title=raw.get("displayTitle"),
                    meta_data=meta or None,
                    width=width,
                    height=height,
                    provider=self.provider,
                )
            )
        return out or None


class ScienceMuseumStyleAdapter:
    """Sweeps the collection per year range (the API 400s past page 50,
    so ranges keep batches under it — science_museum.py:46-79); license
    parsed from usage_terms ('CC BY-NC-SA 4.0' -> strip the 'cc ' prefix,
    exactly one space between license and version, :243-257); relative
    image locations get the coimages host prefix (:176-181); dimensions
    only from pixel-unit measurements (:183-198); ids deduped across
    sweeps."""

    provider = "sciencemuseum"
    batch_limit = 100
    YEAR_RANGES = [(0, 200), (200, 1500), (1500, 1750), (1750, 1775)]

    def __init__(self, year_ranges: list[tuple[int, int]] | None = None) -> None:
        self._seen: set = set()
        self.page_number = 0
        if year_ranges is not None:
            self.YEAR_RANGES = year_ranges

    def sweeps(self):
        return self.YEAR_RANGES

    def start_sweep(self, year_range) -> None:
        self.page_number = 0

    def get_next_query_params(self, prev: dict | None, year_range) -> dict:
        from_, to_ = year_range
        if prev is not None:
            self.page_number += 1
        return {
            "has_image": 1,
            "image_license": "CC",
            "page[size]": self.batch_limit,
            "page[number]": self.page_number,
            "date[from]": from_,
            "date[to]": to_,
        }

    def observe_response(self, response: dict) -> None:
        # halt on missing next link, or at the hard 50-page API limit
        if (response.get("links") or {}).get("next") is None or self.page_number >= 50:
            self._exhausted = True

    def get_batch_data(self, response: dict) -> list | None:
        return (response or {}).get("data") or None

    @staticmethod
    def _license_pair(image_data: dict) -> tuple[str, str] | None:
        rights = ((image_data.get("source") or {}).get("legal") or {}).get("rights")
        if not isinstance(rights, list):
            return None
        terms = (rights[0].get("usage_terms") or "").lower()
        if not terms:
            return None
        terms = re.sub("^cc[ -]", "", terms)
        if terms.count(" ") != 1:
            return None
        lic, version = terms.split(" ")
        # the reference hands the split pair to get_license_info, which
        # rejects unrecognized pairs (science_museum.py:157 + licenses.py)
        if (lic, version) not in _VALID_PAIRS:
            return None
        return lic, version

    @staticmethod
    def _check_url(url: str | None) -> str | None:
        if not url:
            return None
        if url.startswith("http"):
            return url
        return f"https://coimages.sciencemuseumgroup.org.uk/images/{url}"

    @staticmethod
    def _dimensions(image_data: dict):
        size = {}
        for dim in (image_data.get("measurements") or {}).get("dimensions") or []:
            size[dim.get("dimension")] = (
                dim.get("value") if dim.get("units") == "pixels" else None
            )
        return size.get("height"), size.get("width")

    @staticmethod
    def _first_value(key: str, attributes: dict):
        val = attributes.get(key)
        if isinstance(val, list):
            return val[0].get("value")
        return None

    def parse_record(self, raw: dict) -> list[dict] | None:
        oid = raw.get("id")
        if oid in self._seen:
            return None
        self._seen.add(oid)
        landing = (raw.get("links") or {}).get("self")
        attributes = raw.get("attributes")
        if landing is None or attributes is None:
            return None
        creator = None
        creation = (attributes.get("lifecycle") or {}).get("creation")
        if isinstance(creation, list):
            maker = creation[0].get("maker")
            if isinstance(maker, list):
                creator = maker[0].get("summary_title")
        meta = {}
        for attr_key, meta_key in [
            ("identifier", "accession number"),
            ("name", "name"),
            ("categories", "category"),
            ("description", "description"),
        ]:
            if (val := self._first_value(attr_key, attributes)) is not None:
                meta[meta_key] = str(val)
        legal = attributes.get("legal")
        if isinstance(legal, dict) and legal.get("credit_line") is not None:
            meta["creditline"] = str(legal["credit_line"])
        out = []
        for image_data in attributes.get("multimedia") or []:
            fid = (image_data.get("admin") or {}).get("uid")
            if fid is None:
                continue
            processed = image_data.get("processed") or {}
            chosen = processed.get("large") or processed.get("medium") or {}
            url = self._check_url(chosen.get("location"))
            if url is None:
                continue
            pair = self._license_pair(image_data)
            if pair is None:
                continue
            height, width = self._dimensions(chosen)
            out.append(
                _staging(
                    foreign_identifier=str(fid),
                    foreign_landing_url=landing,
                    url=url,
                    license=pair[0],
                    license_version=pair[1],
                    creator=creator,
                    title=attributes.get("summary_title"),
                    meta_data=meta or None,
                    filetype=chosen.get("format"),
                    width=width,
                    height=height,
                    provider=self.provider,
                )
            )
        return out or None


class SmkStyleAdapter:
    """offset/rows pagination over the SMK art search; IIIF url template
    for iiif-enabled images with image_native fallback for legacy ones
    (smk.py:66-125); english landing page from the url-quoted
    object_number (:49-63); list-typed metadata joined with commas."""

    provider = "smk"
    batch_limit = 2000
    IMAGE_SIZE = 2048

    def get_next_query_params(self, prev: dict | None) -> dict:
        if prev is None:
            return {
                "keys": "*",
                "filters": "[has_image:true],[public_domain:true]",
                "offset": 0,
                "rows": self.batch_limit,
                "lang": "en",
            }
        return {**prev, "offset": prev["offset"] + self.batch_limit}

    def get_batch_data(self, response: dict) -> list | None:
        return (response or {}).get("items") or None

    def parse_record(self, raw: dict) -> dict | None:
        pair = _cc_pair_from_url(raw.get("rights"))
        if pair is None:
            return None
        object_num = raw.get("object_number")
        if not object_num:
            return None
        iiif_id = raw.get("image_iiif_id")
        image_id = iiif_id or raw.get("id")
        if image_id is None:
            return None
        if iiif_id is None:
            url = raw.get("image_native")
        else:
            url = f"{iiif_id}/full/!{self.IMAGE_SIZE},/0/default.jpg"
        if not url:
            return None
        titles = raw.get("titles")
        title = (
            titles[0].get("title") if isinstance(titles, list) and titles else None
        )
        production = raw.get("production")
        creator = (
            production[0].get("creator")
            if isinstance(production, list) and production
            else None
        )
        meta = {}
        if raw.get("created"):
            meta["created_date"] = str(raw["created"])
        for key in ("collection", "techniques", "colors"):
            if isinstance(raw.get(key), list):
                meta[key] = ",".join(raw[key])
        return _staging(
            foreign_identifier=str(image_id),
            foreign_landing_url=(
                f"https://open.smk.dk/en/artwork/image/{quote(object_num)}"
            ),
            url=url,
            thumbnail=raw.get("image_thumbnail"),
            license=pair[0],
            license_version=pair[1],
            creator=creator,
            title=title,
            meta_data=meta or None,
            width=raw.get("image_width"),
            height=raw.get("image_height"),
            filesize=raw.get("image_size") or raw.get("size"),
            provider=self.provider,
        )


class NyplStyleAdapter:
    """CC_0 search + per-item detail fetch; the capture list stages one
    record per image; the largest derivative is chosen by the image
    URL's `t` query param against the g>v>q>w>r order and the
    `&download=1` suffix is stripped (nypl.py:52-55, 160-200); filetype
    comes from the description text, creator from the usage=primary name
    (:145-158, 202-209)."""

    provider = "nypl"
    batch_limit = 500
    DIMENSIONS = ["g", "v", "q", "w", "r"]
    _FILETYPE_RE = re.compile(r" .(jpeg|gif) ")

    def __init__(self, detail_fetch: Callable[[str], dict | None]) -> None:
        self.detail_fetch = detail_fetch

    def get_next_query_params(self, prev: dict | None) -> dict:
        if prev is None:
            return {
                "q": "CC_0",
                "field": "use_rtxt_s",
                "page": 1,
                "per_page": self.batch_limit,
            }
        return {**prev, "page": prev["page"] + 1}

    def get_batch_data(self, response: dict) -> list | None:
        return (
            ((response or {}).get("nyplAPI") or {}).get("response", {}).get("result")
        ) or None

    @classmethod
    def _image_data(cls, images: list):
        image_types = {
            parse_qs(urlparse(img["$"]).query)["t"][0]: i
            for i, img in enumerate(images)
        }
        for dimension in cls.DIMENSIONS:
            idx = image_types.get(dimension)
            if idx is not None:
                preferred = images[idx]
                url = preferred["$"].replace("&download=1", "")
                m = cls._FILETYPE_RE.search(preferred.get("description", ""))
                return url, (m.group(1) if m else None)
        return None, None

    @staticmethod
    def _creator(name_properties):
        if not isinstance(name_properties, list):
            name_properties = [name_properties]
        for info in name_properties:
            if info.get("usage") == "primary":
                return (info.get("namePart") or {}).get("$")
        return None

    def parse_record(self, raw: dict) -> list[dict] | None:
        uuid = raw.get("uuid")
        item = (self.detail_fetch(uuid) or {}).get("nyplAPI", {}).get("response")
        if not item:
            return None
        mods = item.get("mods") or {}
        title_info = mods.get("titleInfo")
        if isinstance(title_info, list) and title_info:
            title_info = title_info[0]
        title = (
            "" if title_info is None else (title_info.get("title") or {}).get("$")
        )
        names = mods.get("name")
        creator = self._creator(names) if names else None
        genre = (mods.get("genre") or {}).get("$") if isinstance(mods.get("genre"), dict) else None
        meta = {k: v for k, v in {"genre": genre}.items() if v}
        category = "photograph" if meta.get("genre") == "Photographs" else None
        captures = (item.get("sibling_captures") or {}).get("capture")
        if not captures:
            return None
        if not isinstance(captures, list):
            captures = [captures]
        out = []
        for capture in captures:
            image_id = (capture.get("imageID") or {}).get("$")
            if image_id is None:
                continue
            url, filetype = self._image_data(
                (capture.get("imageLinks") or {}).get("imageLink", [])
            )
            if not url:
                continue
            landing = (capture.get("itemLink") or {}).get("$")
            license_url = (capture.get("rightsStatementURI") or {}).get("$")
            pair = _cc_pair_from_url(license_url)
            if not landing or pair is None:
                continue
            out.append(
                _staging(
                    foreign_identifier=str(image_id),
                    foreign_landing_url=landing,
                    url=url,
                    license=pair[0],
                    license_version=pair[1],
                    title=title,
                    creator=creator,
                    filetype=filetype,
                    category=category,
                    meta_data=meta or None,
                    provider=self.provider,
                )
            )
        return out or None


class PhylopicStyleAdapter:
    """Two-phase pagination: an initial unparameterized probe supplies
    the API 'build' number and total page count, then 0-indexed pages
    carry build+embed params until total_pages is reached
    (phylopic.py:35-67); sizes parsed from the 'WxH' sourceFile string
    with float tolerance for SVGs (:76-84)."""

    provider = "phylopic"
    HOST = "https://www.phylopic.org"

    def __init__(self, probe_fetch: Callable[[], dict | None]) -> None:
        probe = probe_fetch() or {}
        self.build = probe.get("build")
        self.total_pages = probe.get("totalPages") or 0
        self.current_page = 0

    def get_next_query_params(self, prev: dict | None) -> dict:
        if prev is not None:
            self.current_page += 1
        return {
            "build": self.build,
            "page": self.current_page,  # 0-indexed
            "embed_items": "true",
        }

    def observe_response(self, response: dict) -> None:
        if self.current_page + 1 >= self.total_pages:
            self._exhausted = True

    def get_batch_data(self, response: dict) -> list | None:
        return ((response or {}).get("_embedded") or {}).get("items") or None

    @staticmethod
    def _sizes(links: dict):
        sizes = ((links.get("sourceFile") or {}).get("sizes")) or ""
        if "x" in sizes:
            w, h = sizes.split("x")
            return int(float(w)), int(float(h))
        return None, None

    def parse_record(self, raw: dict) -> dict | None:
        uid = raw.get("uuid")
        if not uid:
            return None
        links = raw.get("_links") or {}
        license_url = (links.get("license") or {}).get("href")
        img_url = (links.get("sourceFile") or {}).get("href")
        foreign_path = (links.get("self") or {}).get("href")
        pair = _cc_pair_from_url(license_url)
        if not license_url or not img_url or not foreign_path or pair is None:
            return None
        contributor = links.get("contributor") or {}
        creator_url = (
            self.HOST + contributor["href"] if contributor.get("href") else None
        )
        width, height = self._sizes(links)
        return _staging(
            foreign_identifier=uid,
            foreign_landing_url=self.HOST + foreign_path,
            url=img_url,
            license=pair[0],
            license_version=pair[1],
            title=(links.get("self") or {}).get("title"),
            creator=contributor.get("title"),
            creator_url=creator_url,
            width=width,
            height=height,
            provider=self.provider,
        )


# unit_code -> sub-provider source, flattened from the reference's
# SMITHSONIAN_SUB_PROVIDERS sets (provider_details.py:71-117)
SMITHSONIAN_UNIT_CODE_SOURCES = {
    **{
        code: "smithsonian_national_museum_of_natural_history"
        for code in (
            "NMNHANTHRO", "NMNHBIRDS", "NMNHBOTANY", "NMNHEDUCATION",
            "NMNHENTO", "NMNHFISHES", "NMNHHERPS", "NMNHINV",
            "NMNHMAMMALS", "NMNHMINSCI", "NMNHPALEO",
        )
    },
    "ACM": "smithsonian_anacostia_museum",
    "CHNDM": "smithsonian_cooper_hewitt_museum",
    "FBR": "smithsonian_field_book_project",
    "FSG": "smithsonian_freer_gallery_of_art",
    "HAC": "smithsonian_gardens",
    "OFEO-SG": "smithsonian_gardens",
    "HMSG": "smithsonian_hirshhorn_museum",
    "NASM": "smithsonian_air_and_space_museum",
    "NMAAHC": "smithsonian_african_american_history_museum",
    "NMAH": "smithsonian_american_history_museum",
    "NMAI": "smithsonian_american_indian_museum",
    "NMAfA": "smithsonian_african_art_museum",
    "NPG": "smithsonian_portrait_gallery",
    "NPM": "smithsonian_postal_museum",
    "NZP": "smithsonian_zoo_and_conservation",
    "SAAM": "smithsonian_american_art_museum",
    "SIA": "smithsonian_institution_archives",
    "SIL": "smithsonian_libraries",
}


class SmithsonianStyleAdapter:
    """Sweeps the open-access search once per md5-hash prefix — 256
    two-hex-digit sweeps partition an unpageable corpus into bounded
    row windows (smithsonian.py:121-139, 232-236, 411-415); records
    carry unit_code -> sub-provider source attribution (:317-353), a
    preference-ordered creator pick (:55-108, 386-408), description/
    label-text accumulation from typed notes (:317-341), and one staged
    record per CC0 image in the object's media list (:286-306)."""

    provider = "smithsonian"
    batch_limit = 1000
    hash_prefix_length = 2

    DESCRIPTION_TYPES = {
        "description", "summary", "caption", "notes", "description (brief)",
        "description (spanish)", "description (brief spanish)", "gallery label",
        "exhibition label", "luce center label", "publication label",
        "new acquisition label",
    }
    CREATOR_TYPES = {
        "artist": 0, "artist/maker": 0, "attributed to": 0, "author": 0,
        "created_by": 0, "creator": 0, "created by": 0, "model maker": 0,
        "modeler": 0, "photographer": 0, "photograph by": 0, "written by": 0,
        "architect": 1, "designer": 1, "designed by": 1, "illustrator": 1,
        "illustrated by": 1, "cartoonist": 1, "weaver": 1, "composer": 1,
        "composed by": 1, "embroiderer": 1, "landscape architect": 1,
        "calligrapher": 1, "sculptor": 1, "jeweler": 1, "potter": 1,
        "ceramist": 1, "compiled by": 2, "engraver": 2, "etcher": 2,
        "maker": 2, "silversmith": 2, "producer": 2, "produced by": 2,
        "metal worker": 2, "carver": 2, "cartographer": 2, "print maker": 3,
        "painter": 3, "after": 3, "inventor": 3, "lithographer": 3,
        "attribution": 3, "former attribution": 3, "manufactured by": 4,
        "manufacturer": 4, "published by": 4, "publisher": 4, "editor": 4,
        "patentee": 5, "collector": 6,
    }
    TAG_TYPES = ("date", "object_type", "topic", "place")

    def __init__(self, hash_prefixes: list[str] | None = None) -> None:
        self.hash_prefixes = hash_prefixes

    def sweeps(self):
        if self.hash_prefixes is not None:
            return self.hash_prefixes
        n = self.hash_prefix_length
        return [format(h, f"0{n}x") for h in range(16**n)]

    def get_next_query_params(self, prev: dict | None, hash_prefix: str) -> dict:
        q = "online_media_type:Images AND media_usage:CC0"
        if hash_prefix:
            q += f" AND hash:{hash_prefix}*"
        if prev is None:
            return {"q": q, "rows": self.batch_limit, "start": 0}
        return {**prev, "start": prev["start"] + self.batch_limit}

    def get_batch_data(self, response: dict) -> list | None:
        rows = ((response or {}).get("response") or {}).get("rows")
        return rows if isinstance(rows, list) else None

    @staticmethod
    def _content(row: dict, field: str) -> dict:
        content = row.get("content")
        content = content if isinstance(content, dict) else {}
        val = content.get(field)
        return val if isinstance(val, dict) else {}

    def _creator(self, row: dict) -> str | None:
        freetext = self._content(row, "freetext")
        names = freetext.get("name")
        names = names if isinstance(names, list) else []
        ordered = sorted(
            [
                i
                for i in names
                if isinstance(i, dict)
                and str(i.get("label", "")).lower() in self.CREATOR_TYPES
                and i.get("content")
                and "unknown" not in str(i["content"]).lower()
            ],
            key=lambda x: self.CREATOR_TYPES[x["label"].lower()],
        )
        if ordered:
            top = self.CREATOR_TYPES[ordered[0]["label"].lower()]
            picks = [
                c["content"]
                for c in ordered
                if self.CREATOR_TYPES[c["label"].lower()] == top
            ]
            return (
                "; ".join(picks[:-1]) + " and " + picks[-1]
                if len(picks) > 1
                else picks[0]
            )
        indexed = self._content(row, "indexedStructured")
        istruct = indexed.get("name")
        istruct = istruct if isinstance(istruct, list) else []
        return next(
            (
                i["content"]
                for i in istruct
                if isinstance(i, dict)
                and str(i.get("type", "")).lower() == "personal_main"
                and i.get("content")
            ),
            None,
        )

    def _meta(self, row: dict) -> dict:
        freetext = self._content(row, "freetext")
        dnr = self._content(row, "descriptiveNonRepeating")
        description, label_texts = "", ""
        notes = freetext.get("notes")
        for note in notes if isinstance(notes, list) else []:
            label = str(note.get("label", "")).lower().strip()
            if label in self.DESCRIPTION_TYPES:
                description += " " + str(note.get("content", ""))
            elif label == "label text":
                label_texts += " " + str(note.get("content", ""))
        meta = {
            "unit_code": dnr.get("unit_code"),
            "data_source": dnr.get("data_source"),
        }
        if description:
            meta["description"] = description.strip()
        if label_texts:
            meta["label_text"] = label_texts.strip()
        return {k: v for k, v in meta.items() if v is not None}

    def parse_record(self, raw: dict) -> list[dict] | None:
        dnr = self._content(raw, "descriptiveNonRepeating")
        media = (dnr.get("online_media") or {}).get("media")
        if not isinstance(media, list) or not media:
            return None
        landing = dnr.get("record_link") or dnr.get("guid")
        if landing is None:
            return None
        meta = self._meta(raw)
        unit_code = (meta.get("unit_code") or "").strip()
        source = SMITHSONIAN_UNIT_CODE_SOURCES.get(unit_code)
        indexed = self._content(raw, "indexedStructured")
        tags = [
            tag
            for key in self.TAG_TYPES
            for tag in (
                indexed.get(key) if isinstance(indexed.get(key), list) else []
            )
            if tag
        ]
        out = []
        for image_data in media:
            if image_data.get("type") != "Images":
                continue
            if (image_data.get("usage") or {}).get("access") != "CC0":
                continue
            url = image_data.get("content")
            fid = image_data.get("idsId")
            if url is None or fid is None:
                continue
            out.append(
                _staging(
                    foreign_identifier=str(fid),
                    foreign_landing_url=landing,
                    url=url,
                    license="cc0",
                    license_version="1.0",
                    title=raw.get("title"),
                    creator=self._creator(raw),
                    source=source,
                    meta_data={k: str(v) for k, v in meta.items()} or None,
                    tags=[{"name": str(t), "provider": self.provider} for t in tags]
                    or None,
                    provider=self.provider,
                )
            )
        return out or None
