"""End-to-end media pipeline + TSV source + streaming + multimodal tests.

The pipeline test is the Spark equivalent of the reference's
``test_sql.py`` end-to-end loader cases: reference-shaped staging rows ->
clean -> dedupe -> MERGE -> assert surviving rows and merged values.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from openverse_catalog_spark.operators.multimodal import (
    attach_binary_payload,
    extract_image_metadata,
)
from openverse_catalog_spark.plans.media_pipeline import (
    clean_media_batch,
    empty_canonical,
    ingest_media_batch,
)
from openverse_catalog_spark.schemas.columns import (
    IMAGE_TSV_COLUMNS,
    spark_schema,
)
from openverse_catalog_spark.sources.tsv import (
    enforce_malformed_cap,
    read_tsv,
    write_tsv,
)
from openverse_catalog_spark.streaming.incremental import stream_windowed_counts


def staging_row(
    fid="f1",
    landing="http://x.org/p/1",
    url="http://img.x.org/1.jpg",
    license="by",
    version="4.0",
    provider="flickr",
    title="A  Title",
    **over,
):
    base = {
        "foreign_identifier": fid,
        "foreign_landing_url": landing,
        "url": url,
        "thumbnail": None,
        "filetype": None,
        "filesize": None,
        "license": license,
        "license_version": version,
        "creator": None,
        "creator_url": None,
        "title": title,
        "meta_data": None,
        "tags": None,
        "category": None,
        "watermarked": None,
        "provider": provider,
        "source": None,
        "ingestion_type": None,
        "width": None,
        "height": None,
    }
    base.update(over)
    return tuple(base[c.name] for c in IMAGE_TSV_COLUMNS)


def mk_staging(spark, rows):
    return spark.createDataFrame(rows, spark_schema(IMAGE_TSV_COLUMNS))


def test_clean_media_batch_semantics(spark):
    rows = [
        staging_row(),  # valid
        staging_row(fid="f2", license="bogus"),  # invalid license -> dropped
        staging_row(fid=None),  # missing required -> dropped
        staging_row(fid="f4", url="http://img.x.org/4.JPEG"),  # filetype backfill
    ]
    out = clean_media_batch(mk_staging(spark, rows), spark)
    got = {r["foreign_identifier"]: r.asDict() for r in out.collect()}
    assert set(got) == {"f1", "f4"}
    assert got["f1"]["title"] == "A Title"  # whitespace collapsed
    assert got["f1"]["source"] == "flickr"  # defaulted to provider
    assert got["f1"]["meta_data"]["license_url"].endswith("/by/4.0/")
    assert got["f4"]["filetype"] == "jpg"  # from URL extension, unified


def test_ingest_media_batch_end_to_end(spark):
    target = empty_canonical(spark)
    batch1 = mk_staging(
        spark,
        [
            staging_row(),
            staging_row(fid="f1", url="http://img.x.org/1b.jpg"),  # dup fid -> dedup
            staging_row(fid="f2", url="http://img.x.org/2.jpg", title="two"),
        ],
    )
    r1 = ingest_media_batch(batch1, target, spark, deterministic=True)
    state = {r["foreign_identifier"]: r.asDict() for r in r1.merged.collect()}
    assert set(state) == {"f1", "f2"}
    assert r1.metrics["loaded"] == 3
    assert r1.metrics["foreign_id_dup"] == 1

    # second batch: update f2 with newer title, new f3, url conflict on f1's url
    batch2 = mk_staging(
        spark,
        [
            staging_row(fid="f2", url="http://img.x.org/2.jpg", title="two-v2"),
            staging_row(fid="f3", url="http://img.x.org/3.jpg", title="three"),
            staging_row(fid="intruder", url=state["f1"]["url"]),  # skipped
        ],
    )
    r2 = ingest_media_batch(batch2, r1.merged, spark, deterministic=True)
    state2 = {r["foreign_identifier"]: r.asDict() for r in r2.merged.collect()}
    assert set(state2) == {"f1", "f2", "f3"}
    assert state2["f2"]["title"] == "two-v2"
    assert state2["f2"]["created_on"] is not None
    assert state2["f2"]["removed_from_source"] is False


def test_tsv_roundtrip(spark):
    rows = [
        staging_row(
            meta_data={"views": "5"},
            tags=[{"name": "a", "provider": "flickr"}],
            watermarked=True,
            width=100,
        ),
        staging_row(fid="f2", url="http://img.x.org/2.png", title=None),
    ]
    df = mk_staging(spark, rows)
    with tempfile.TemporaryDirectory() as d:
        write_tsv(df, f"{d}/batch", IMAGE_TSV_COLUMNS)
        back, corrupt = read_tsv(spark, f"{d}/batch", IMAGE_TSV_COLUMNS)
        assert enforce_malformed_cap(corrupt) == 0
        got = {r["foreign_identifier"]: r.asDict() for r in back.collect()}
    assert set(got) == {"f1", "f2"}
    assert got["f1"]["meta_data"] == {"views": "5"}
    assert got["f1"]["tags"][0]["name"] == "a"
    assert got["f1"]["watermarked"] is True
    assert got["f1"]["width"] == 100
    assert got["f2"]["title"] is None


def test_streaming_windowed_counts_matches_batch(spark, sf_dir):
    stream = stream_windowed_counts(spark, sf_dir)
    from openverse_catalog_spark.session import load_tables

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    batch = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    assert sorted(map(tuple, stream.collect())) == sorted(map(tuple, batch.collect()))


def test_multimodal_metadata_stub(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    meta = extract_image_metadata(attach_binary_payload(docs))
    rows = meta.collect()
    assert len(rows) == docs.count()
    assert all(1 <= r["width"] <= 1920 and 1 <= r["height"] <= 1080 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)


def test_stream_dedup_first_seen_matches_distinct(spark, sf_dir):
    from openverse_catalog_spark.streaming.incremental import stream_dedup_first_seen

    got = stream_dedup_first_seen(spark, sf_dir)
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0


def test_stream_sessionize_emits_closed_sessions(spark, sf_dir):
    from openverse_catalog_spark.streaming.incremental import stream_sessionize

    got = stream_sessionize(spark, sf_dir)
    rows = got.collect()
    assert len(rows) > 0
    assert all(r["n_events"] >= 1 for r in rows)


def test_paged_fetch_to_landing_roundtrip(spark, tmp_path):
    from openverse_catalog_spark.sources.landing import (
        PagedFetcher,
        read_json_landing,
        write_landing,
    )

    pages = {
        0: [{"fid": "a", "n": 1}, {"fid": "b", "n": 2}],
        1: [{"fid": "c", "n": 3}],
        2: [],  # empty batch -> stop
    }

    fetcher = PagedFetcher(
        fetch_fn=lambda p: {"page": p["page"], "items": pages[p["page"]]},
        get_batch_data=lambda r: r["items"],
        get_next_query_params=lambda prev: {"page": 0} if prev is None else {"page": prev["page"] + 1},
    )
    n = write_landing(fetcher, str(tmp_path), "2024-01-02", "provtest")
    assert n == 3
    df = read_json_landing(spark, str(tmp_path), "fid string, n long, _corrupt string")
    rows = {r["fid"]: (r["n"], str(r["ingest_date"])) for r in df.collect()}
    assert rows == {"a": (1, "2024-01-02"), "b": (2, "2024-01-02"), "c": (3, "2024-01-02")}


def test_paged_fetch_ingestion_limit(spark):
    from openverse_catalog_spark.sources.landing import PagedFetcher

    fetcher = PagedFetcher(
        fetch_fn=lambda p: {"items": [{"i": k} for k in range(5)]},
        get_batch_data=lambda r: r["items"],
        get_next_query_params=lambda prev: {},
        ingestion_limit=7,
    )
    got = [len(b) for b in fetcher.batches()]
    assert got == [5, 2]  # cap applied mid-batch, then stop


def test_publish_swap_atomic_view(spark, sf_dir, tmp_path):
    from openverse_catalog_spark.streaming.incremental import publish_swap

    v1 = spark.range(5).withColumnRenamed("id", "k")
    p1 = publish_swap(v1, str(tmp_path), "scored_media")
    assert spark.table("scored_media").count() == 5
    v2 = spark.range(9).withColumnRenamed("id", "k")
    p2 = publish_swap(v2, str(tmp_path), "scored_media")
    assert spark.table("scored_media").count() == 9
    assert p1 != p2  # old snapshot retained for rollback
    assert spark.read.parquet(p1).count() == 5


def test_stream_stateful_quota_matches_batch(spark, sf_dir):
    from openverse_catalog_spark.session import load_tables
    from openverse_catalog_spark.streaming.incremental import stream_stateful_quota

    got = {r["event_type"]: r for r in stream_stateful_quota(spark, sf_dir).collect()}
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    want = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert set(got) == set(want)
    for k, w in want.items():
        assert got[k]["cum_n"] == w["n"]
        assert abs(got[k]["cum_total"] - w["total"]) < 1e-6
        assert got[k]["over_quota"] == (w["n"] > 300)


def test_reingestion_day_shifts_reference_example():
    """The reference helper's own doctest example (common/helpers.py):
    (1,2),(2,3),(3,2) -> [[1, 2], [4, 6, 8], [11, 14]]."""
    from openverse_catalog_spark.sources.landing import reingestion_day_shifts

    assert reingestion_day_shifts([(1, 2), (2, 3), (3, 2)]) == [
        [1, 2], [4, 6, 8], [11, 14],
    ]


def test_reingestion_flickr_tier_config():
    """Flickr's production tier config spans 128 reingestion days
    (provider_reingestion_workflows.py:69-77; zero-repeat tiers drop)."""
    from openverse_catalog_spark.sources.landing import (
        reingestion_day_shifts,
        reingestion_dates,
    )

    tiers = [(1, 7), (7, 12), (15, 20), (30, 24), (90, 24), (180, 40)]
    levels = reingestion_day_shifts(tiers)
    n_days = sum(len(lv) for lv in levels)
    assert n_days == 127  # + day 0 = the documented 128 reingestion days
    assert levels[0] == [1, 2, 3, 4, 5, 6, 7]
    assert levels[1][0] == 14  # weekly tier starts after the daily span
    dates = reingestion_dates("2020-01-01", [(1, 2), (2, 3)])
    assert dates[0] == ["2020-01-01"]
    assert dates[1] == ["2019-12-31", "2019-12-30"]
    assert dates[2] == ["2019-12-28", "2019-12-26", "2019-12-24"]


def test_hash_prefix_partitions():
    """smithsonian.py:232-236 parity: 16^n uniform slices, zero-padded."""
    from openverse_catalog_spark.sources.landing import hash_prefix_partitions

    p1 = hash_prefix_partitions(1)
    assert p1 == [format(h, "x") for h in range(16)]
    p2 = hash_prefix_partitions(2)
    assert len(p2) == 256 and p2[0] == "00" and p2[-1] == "ff"
    assert len(set(p2)) == 256


def test_adaptive_time_slices_reference_behavior():
    """I2 parity (time_delineated_provider_data_ingester.py:119-196):
    quiet day -> one slice; heavy day -> per-hour probes where empty
    hours drop, small hours stay whole, heavy hours split 4 ways and
    very heavy hours 12 ways (flickr.py constants)."""
    from openverse_catalog_spark.sources.landing import adaptive_time_slices

    # quiet day: single full-day slice, one probe
    probes = []

    def quiet(s, e):
        probes.append((s, e))
        return 100

    got = adaptive_time_slices("2024-03-01", quiet)
    assert got == [("2024-03-01T00:00:00+00:00", "2024-03-02T00:00:00+00:00")]
    assert len(probes) == 1

    # empty day: no slices
    assert adaptive_time_slices("2024-03-01", lambda s, e: 0) == []

    # heavy day: hour 0 empty, hour 1 small, hour 2 heavy (4 slices),
    # hour 3 very heavy (12 slices), rest empty -> 25 probes total
    def heavy(s, e):
        probes2.append((s, e))
        hour = int(s[11:13])
        if s[11:19] == "00:00:00" and e[11:13] == "00" and s[8:10] != e[8:10]:
            return 50_000  # the full-day probe
        return {1: 500, 2: 5_000, 3: 50_000}.get(hour, 0)

    probes2 = []
    got = adaptive_time_slices("2024-03-01", heavy)
    assert len(probes2) == 25  # 1 day probe + 24 hour probes
    hours = [s[11:13] for s, _ in got]
    assert hours.count("01") == 1  # whole hour
    assert hours.count("02") == 4  # min_divisions
    assert hours.count("03") == 12  # max_divisions
    assert len(got) == 17
    # sub-slices tile the hour exactly
    h2 = [(s, e) for s, e in got if s[11:13] == "02"]
    assert h2[0][0].endswith("02:00:00+00:00")
    assert h2[-1][0].endswith("02:45:00+00:00") and h2[-1][1].endswith("03:00:00+00:00")


def test_overfetch_guard():
    """I4: fetching past the API's reported total raises (or merely
    flags with raise_on_overfetch=False) — t_d_p_d_i.py:221-259."""
    import pytest as _pytest

    from openverse_catalog_spark.sources.landing import (
        OverfetchError,
        PagedFetcher,
    )

    def make(raise_on):
        pages = iter([[1, 2], [3, 4], [5, 6]])
        return PagedFetcher(
            fetch_fn=lambda p: {"total": 3},
            get_batch_data=lambda r: next(pages, None),
            get_next_query_params=lambda prev: {},
            expected_count_fn=lambda r: r["total"],
            raise_on_overfetch=raise_on,
        )

    f = make(True)
    with _pytest.raises(OverfetchError, match="Expected 3"):
        list(f.batches())
    assert f.fetched_count == 4

    f2 = make(False)
    assert [len(b) for b in f2.batches()] == [2, 2, 2]
    assert f2.overfetched


def test_parse_image_header_real_formats():
    """parse_image_header is a real container parser: PNG IHDR, GIF
    screen descriptor, BMP (incl. top-down negative height), JPEG marker
    walk past a COM segment; garbage/truncated input -> Nones."""
    from openverse_catalog_spark.operators.multimodal import (
        parse_image_header,
        synthesize_image_bytes,
    )

    assert parse_image_header(synthesize_image_bytes(0, "png", 800, 600)) == (
        "png", 800, 600,
    )
    assert parse_image_header(synthesize_image_bytes(2, "gif", 12, 7)) == (
        "gif", 12, 7,
    )
    # odd doc_id -> negative (top-down) BMP height, parser reports abs
    assert parse_image_header(synthesize_image_bytes(3, "bmp", 31, 9)) == (
        "bmp", 31, 9,
    )
    # jpeg with 5 bytes of COM filler before the SOF0
    assert parse_image_header(synthesize_image_bytes(5, "jpg", 1920, 1080)) == (
        "jpg", 1920, 1080,
    )
    # jpeg with a fill byte (0xFF padding) before the next marker
    import struct

    raw = (
        b"\xff\xd8\xff"  # SOI + fill byte
        + b"\xff\xc2"  # progressive SOF2
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", 10, 20)
        + b"\x01\x11\x00"
    )
    assert parse_image_header(raw) == ("jpg", 20, 10)
    assert parse_image_header(b"not an image") == (None, None, None)
    assert parse_image_header(b"\x89PNG\r\n\x1a\n\x00") == (None, None, None)


def test_stream_landing_to_cow_table(spark, tmp_path):
    """Streaming ingestion end to end: landing JSONL -> file-source
    stream -> clean+dedupe per micro-batch -> foreachBatch MERGE into
    the CoW lake table. Draining twice with new files in between gives
    two commits; the stream checkpoint makes each landing file
    exactly-once; the final state equals the batch pipeline's."""
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.schemas.columns import image_db_schema, spark_schema
    from openverse_catalog_spark.sources.landing import write_landing
    from openverse_catalog_spark.sources.providers import (
        FlickrStyleAdapter,
        provider_fetcher,
    )
    from openverse_catalog_spark.streaming.incremental import stream_landing_to_cow
    from tests.test_providers import _flickr_fetch, _flickr_photo

    landing = str(tmp_path / "landing")
    root = str(tmp_path / "cow")
    cols = image_db_schema()
    CowTable.create(
        spark, root, spark.createDataFrame([], spark_schema(cols)), target_files=2
    )

    f1 = provider_fetcher(
        FlickrStyleAdapter(), _flickr_fetch([[_flickr_photo(i) for i in range(4)]])
    )
    write_landing(f1, landing, "2024-01-01", "flickr")
    t = stream_landing_to_cow(spark, landing, root, cols)
    assert t.version == 2
    first = {r["foreign_identifier"] for r in t.read().collect()}
    assert first == {"1000", "1001", "1002", "1003"}

    # second tick: two new photos land; the shared in-root checkpoint
    # means ONLY the new landing files feed this drain
    f2 = provider_fetcher(
        FlickrStyleAdapter(), _flickr_fetch([[_flickr_photo(i) for i in (9, 12)]])
    )
    write_landing(f2, landing, "2024-01-02", "flickr")
    t = stream_landing_to_cow(spark, landing, root, cols)
    assert t.version == 3
    got = {r["foreign_identifier"]: r for r in t.read().collect()}
    assert set(got) == first | {"1009", "1012"}
    assert got["1000"].license in {"by-nc-sa", "by-nc", "by"}

    # no new files -> no micro-batch, no new version (exactly-once)
    t = stream_landing_to_cow(spark, landing, root, cols)
    assert t.version == 3

    # steady-state maintenance: drain + bin-pack OPTIMIZE in one call
    t = stream_landing_to_cow(spark, landing, root, cols,
                              compact_target_rows=10_000)
    assert t._manifest()["operation"] == "compact"
    assert {r["foreign_identifier"] for r in t.read().collect()} == set(got)


def test_stream_landing_to_cow_crash_recovery(spark, tmp_path):
    """Kill the writer between the micro-batch's parquet data write and
    its manifest commit: the stream checkpoint has NOT recorded the
    batch, so the re-run reprocesses it — the batch is neither lost nor
    duplicated (exactly-once across the crash), and the crashed
    attempt's orphan data files are swept by vacuum."""
    import os

    import pytest

    from openverse_catalog_spark.operators import cowtable as cowmod
    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.schemas.columns import image_db_schema, spark_schema
    from openverse_catalog_spark.sources.landing import write_landing
    from openverse_catalog_spark.sources.providers import (
        FlickrStyleAdapter,
        provider_fetcher,
    )
    from openverse_catalog_spark.streaming.incremental import stream_landing_to_cow
    from tests.test_providers import _flickr_fetch, _flickr_photo

    landing = str(tmp_path / "landing")
    root = str(tmp_path / "cow")
    cols = image_db_schema()
    CowTable.create(
        spark, root, spark.createDataFrame([], spark_schema(cols)), target_files=2
    )
    f1 = provider_fetcher(
        FlickrStyleAdapter(), _flickr_fetch([[_flickr_photo(i) for i in range(4)]])
    )
    write_landing(f1, landing, "2024-01-01", "flickr")

    real_commit = cowmod.CowTable._commit
    state = {"crashed": False}

    def crashing_commit(self, *a, **kw):
        if not state["crashed"]:
            state["crashed"] = True  # data files are on disk; die now
            raise RuntimeError("injected crash before manifest commit")
        return real_commit(self, *a, **kw)

    cowmod.CowTable._commit = crashing_commit
    try:
        with pytest.raises(Exception, match="injected crash"):
            stream_landing_to_cow(spark, landing, root, cols)
        # the crash left orphan data files but NO commit and NO
        # checkpoint progress — table still at the empty v1
        t = CowTable(spark, root)
        assert t.version == 1 and t.read().count() == 0

        # re-run: the same micro-batch replays and lands exactly once
        t = stream_landing_to_cow(spark, landing, root, cols)
    finally:
        cowmod.CowTable._commit = real_commit
    assert t.version == 2
    got = [r["foreign_identifier"] for r in t.read().collect()]
    assert sorted(got) == ["1000", "1001", "1002", "1003"]  # no dup, no loss

    # the crashed attempt's unreferenced files exist until vacuum...
    data_dirs = set(os.listdir(os.path.join(root, "data")))
    referenced = {
        e["path"].split("/")[1] for e in t._manifest()["files"]
    }
    assert data_dirs - referenced  # orphan present
    # default retention protects a YOUNG orphan (it could be a live
    # writer's in-flight attempt); retention 0 = offline cleanup mode
    t.vacuum(keep_versions=2)
    assert set(os.listdir(os.path.join(root, "data"))) == data_dirs
    t.vacuum(keep_versions=2, retention_seconds=0.0)
    data_dirs_after = set(os.listdir(os.path.join(root, "data")))
    assert data_dirs_after <= referenced  # ...then swept


def test_parse_audio_header_real_formats():
    """parse_audio_header is a real container parser: WAV RIFF chunk
    walk (junk chunk before fmt, declared data size -> duration), MP3
    ID3v2 skip + frame-header indices + Xing frame count, CBR estimate
    fallback when no Xing, and clean Nones on garbage/truncation."""
    from openverse_catalog_spark.operators.multimodal import (
        parse_audio_header,
        synthesize_mp3_bytes,
        synthesize_wav_bytes,
    )

    wav = synthesize_wav_bytes(44100, 2, 2, junk_pad=6)
    assert parse_audio_header(wav) == ("wav", 2000, 44100, 44100 * 2 * 16)
    mono = synthesize_wav_bytes(8000, 1, 5)
    assert parse_audio_header(mono) == ("wav", 5000, 8000, 128000)

    mp3 = synthesize_mp3_bytes(14, 0, 441, id3_pad=33)  # 320kbps 44.1k
    assert parse_audio_header(mp3) == (
        "mp3", 441 * 1152 * 1000 // 44100, 44100, 320000
    )
    # no Xing tag -> CBR size estimate over the post-ID3 payload
    bare = b"\xff\xfb" + bytes([(9 << 4) | (1 << 2)]) + b"\x00" + b"\x00" * 4000
    fmt, dur, sr, br = parse_audio_header(bare)
    assert (fmt, sr, br) == ("mp3", 48000, 128000)
    assert dur == len(bare) * 8 * 1000 // 128000

    assert parse_audio_header(b"garbage") == (None, None, None, None)
    assert parse_audio_header(b"RIFF\x00\x00\x00\x00WAVE") == (
        None, None, None, None
    )
    # reserved bitrate index (15) and reserved sample-rate index rejected
    bad = b"\xff\xfb" + bytes([(15 << 4)]) + b"\x00"
    assert parse_audio_header(bad) == (None, None, None, None)


def test_rotate_snapshots_keeps_newest(tmp_path):
    """rotate_db_snapshots analog over the publish_swap chain: keep the
    newest N versioned snapshots, delete older, never touch the live
    (newest) one."""
    import os

    from openverse_catalog_spark.streaming.incremental import rotate_snapshots

    root = tmp_path / "pub" / "scored"
    for v in (100, 200, 300, 400):
        (root / f"v={v}").mkdir(parents=True)
        (root / f"v={v}" / "part-0.parquet").write_bytes(b"x")

    deleted = rotate_snapshots(str(tmp_path / "pub"), "scored", keep=2)
    assert [os.path.basename(p) for p in deleted] == ["v=100", "v=200"]
    assert sorted(os.listdir(root)) == ["v=300", "v=400"]
    # keep=0 still refuses to delete the live snapshot
    deleted = rotate_snapshots(str(tmp_path / "pub"), "scored", keep=0)
    assert os.listdir(root) == ["v=400"]
    # missing table: clean no-op
    assert rotate_snapshots(str(tmp_path / "pub"), "nope") == []


def test_parse_video_header_real_formats():
    """parse_video_header is a real ISO BMFF parser: box-tree walk
    (ftyp brand gate, free-box sibling skip, moov descent), mvhd v0/v1
    duration+timescale, tkhd 16.16 fixed-point dimensions, 64-bit
    largesize boxes, and clean Nones on garbage/missing moov."""
    import struct

    from openverse_catalog_spark.operators.multimodal import (
        parse_video_header,
        synthesize_mp4_bytes,
    )

    v0 = synthesize_mp4_bytes(3000, 1000, 1280, 720, version=0, pad=9)
    assert parse_video_header(v0) == ("mp4", 3000, 1000, 1280, 720)
    v1 = synthesize_mp4_bytes(180000, 90000, 640, 360, version=1)
    assert parse_video_header(v1) == ("mp4", 2000, 90000, 640, 360)

    # 64-bit largesize moov wrapper still parses
    raw = synthesize_mp4_bytes(5000, 1000, 320, 240)
    moov_at = raw.find(b"moov") - 4
    moov = raw[moov_at:]
    large = (
        raw[:moov_at]
        + struct.pack(">I", 1) + b"moov" + struct.pack(">Q", len(moov) + 8)
        + moov[8:]
    )
    assert parse_video_header(large) == ("mp4", 5000, 1000, 320, 240)

    assert parse_video_header(b"garbage") == (None,) * 5
    # ftyp without moov -> unrecognized
    only_ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x00\x00"
    assert parse_video_header(only_ftyp) == (None,) * 5


def test_paged_fetcher_retries_transient_failures():
    """A flaky transport (raises twice, then serves) still yields the
    batch — the reference's DelayedRequester retry loop; a persistently
    failing transport surfaces the error after 1+retries attempts."""
    import pytest

    from openverse_catalog_spark.sources.landing import PagedFetcher

    calls = {"n": 0}

    def flaky(params):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise ConnectionError("transient")
        if params["page"] > 0:
            return {"items": []}
        return {"items": [{"id": 1}]}

    f = PagedFetcher(
        fetch_fn=flaky,
        get_batch_data=lambda r: r["items"],
        get_next_query_params=lambda p: {"page": 0 if p is None else p["page"] + 1},
        retries=2,
    )
    assert list(f.batches()) == [[{"id": 1}]]

    def dead(params):
        calls["n"] += 1
        raise ConnectionError("down")

    calls["n"] = 0
    f2 = PagedFetcher(
        fetch_fn=dead,
        get_batch_data=lambda r: r["items"],
        get_next_query_params=lambda p: {"page": 0},
        retries=2,
    )
    with pytest.raises(ConnectionError):
        list(f2.batches())
    assert calls["n"] == 3  # 1 attempt + 2 retries, then give up


def test_parse_video_header_corrupt_payloads_degrade_to_none():
    """One corrupt payload must not kill a mapInPandas stage: a
    truncated v1 mvhd at end-of-buffer (the guard used to admit 28
    bytes but unpack needed 32) and assorted malformed boxes all return
    the all-None tuple instead of raising struct.error."""
    import struct

    from openverse_catalog_spark.operators.multimodal import (
        parse_video_header,
        synthesize_mp4_bytes,
    )

    def box(btype, payload):
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    # v1 mvhd with exactly 28 payload bytes: passes the old >=28 guard,
    # but unpacking 12 bytes from offset 20 needs 32
    truncated_v1 = ftyp + box(
        b"moov", box(b"mvhd", bytes([1, 0, 0, 0]) + b"\x00" * 24)
    )
    assert parse_video_header(truncated_v1) == (
        "mp4", None, None, None, None
    )
    # unknown mvhd version: skipped, not parsed with the v0 layout
    weird_ver = ftyp + box(
        b"moov", box(b"mvhd", bytes([7, 0, 0, 0]) + b"\x00" * 80)
    )
    assert parse_video_header(weird_ver) == ("mp4", None, None, None, None)
    # garbage and empty stay None-tuples
    assert parse_video_header(b"") == (None, None, None, None, None)
    assert parse_video_header(b"\x00" * 64) == (None, None, None, None, None)
    # and a healthy payload still parses
    ok = synthesize_mp4_bytes(3000, 1000, 640, 480)
    assert parse_video_header(ok) == ("mp4", 3000, 1000, 640, 480)


def test_stream_cow_changes_replay_is_idempotent(spark, tmp_path):
    """At-least-once file delivery + the high-water mark = exactly-once
    apply: wiping the file-source checkpoint (forcing full re-delivery
    of every manifest) must not re-apply already-consumed spans, and a
    new commit after the wipe is still picked up exactly once."""
    import os
    import shutil

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.streaming.incremental import (
        stream_cow_changes,
    )
    from tests.test_cowtable import _base_rows, _batch_rows
    from tests.test_merge_upsert import COLS, mk

    t = CowTable.create(
        spark, str(tmp_path / "tbl"), mk(spark, _base_rows()), target_files=4
    )
    t.merge(mk(spark, _batch_rows()), COLS, deterministic=True)  # v2
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def apply_fn(ch, lo, hi):
        ch.write.mode("append").parquet(sink)

    r1 = stream_cow_changes(t, ckpt, apply_fn)
    assert r1["high_water"] == 2 and r1["batches_applied"] == 1
    n1 = spark.read.parquet(sink).count()
    assert n1 == 3  # update pre+post + insert

    # simulate a lost file-source checkpoint: every manifest re-delivers
    shutil.rmtree(os.path.join(ckpt, "files"))
    r2 = stream_cow_changes(t, ckpt, apply_fn)
    assert r2["batches_applied"] == 0  # hwm made the replay a no-op
    assert spark.read.parquet(sink).count() == n1

    t.delete(F.col("foreign_identifier") == "f000")  # v3
    r3 = stream_cow_changes(t, ckpt, apply_fn)
    assert r3["high_water"] == 3 and r3["batches_applied"] == 1
    got = spark.read.parquet(sink)
    assert got.count() == n1 + 1
    assert got.filter(F.col("_change_type") == "delete").count() == 1


def test_png_bmp_wav_real_decode_roundtrip():
    """REAL pixel/sample decode with stdlib only: the PNG path inflates
    zlib IDAT and reverses all five scanline filters bit-exactly; BMP
    handles bottom-up row order, padding and BGR; WAV reads PCM16
    frames. Every byte is checked against the closed-form pattern, and
    corrupt payloads degrade to None instead of raising."""
    import numpy as np

    from openverse_catalog_spark.operators.multimodal import (
        decode_bmp_pixels,
        decode_gif_pixels,
        decode_png_pixels,
        decode_wav_samples,
        synthesize_bmp_image,
        synthesize_gif_image,
        synthesize_png_image,
        synthesize_wav_samples,
    )

    def pattern(d, h, w, ch):
        y, x, c = np.meshgrid(
            np.arange(h), np.arange(w), np.arange(ch), indexing="ij"
        )
        return (7 * x + 13 * y + 29 * c + d) % 256

    for d in (0, 1, 5, 12, 23):
        w, h = 8 + d % 9, 6 + d % 5
        for ch in (1, 3, 4):  # grey / RGB / RGBA; filters cycle y % 5
            px = decode_png_pixels(synthesize_png_image(d, w, h, ch))
            assert px.shape == (h, w, ch)
            assert (px.astype(np.int64) == pattern(d, h, w, ch)).all()
        bp = decode_bmp_pixels(synthesize_bmp_image(d, w, h))
        assert bp.shape == (h, w, 3)
        assert (bp.astype(np.int64) == pattern(d, h, w, 3)).all()
        # GIF: real LZW decode; greyscale palette replicates the index
        gp = decode_gif_pixels(synthesize_gif_image(d, w, h))
        assert gp.shape == (h, w, 3)
        assert (gp[:, :, 0].astype(np.int64) == pattern(d, h, w, 1)[:, :, 0]).all()
        assert (gp[:, :, 1] == gp[:, :, 0]).all()
        n = 120 + d % 50
        arr = decode_wav_samples(synthesize_wav_samples(d, 8000, n))
        assert arr.shape == (n, 1)
        assert (
            arr[:, 0].astype(np.int64)
            == (31 * np.arange(n) + d) % 65536 - 32768
        ).all()
    # stereo PCM decode (interleaved frames -> (n, 2))
    import struct

    frames = struct.pack("<6h", 1, -1, 2, -2, 3, -3)
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + len(fmt) + 8 + len(frames))
        + b"WAVE" + fmt + b"data" + struct.pack("<I", len(frames)) + frames
    )
    st = decode_wav_samples(wav)
    assert st.shape == (3, 2) and st[1].tolist() == [2, -2]
    # corrupt payloads: None, never an exception
    assert decode_png_pixels(b"\x89PNG\r\n\x1a\n" + b"junk") is None
    assert decode_png_pixels(b"") is None
    assert decode_bmp_pixels(b"BM\x00\x00") is None
    assert decode_gif_pixels(b"GIF89a") is None
    # a BIG gif forces LZW code-size growth AND a dictionary reset
    big = decode_gif_pixels(synthesize_gif_image(3, 200, 150))
    assert big.shape == (150, 200, 3)
    yy, xx = np.meshgrid(np.arange(150), np.arange(200), indexing="ij")
    assert (big[:, :, 0].astype(np.int64) == (7 * xx + 13 * yy + 3) % 256).all()
    assert decode_wav_samples(b"RIFF\x00\x00\x00\x00WAVE") is None


def test_multimodal_resize_and_frame_features(spark):
    """Nearest resize, box downsample and audio framing pinned against
    independent scalar-loop references (not the vectorized numpy the
    operators use), end-to-end through the Arrow-batched Spark path."""
    import numpy as np

    from openverse_catalog_spark.operators.multimodal import (
        attach_decodable_audio_payload,
        attach_decodable_image_payload,
        downsample_image_pixels_box,
        extract_audio_frame_features,
        resize_image_pixels_nearest,
    )

    docs = spark.createDataFrame(
        [(d,) for d in range(8)], "doc_id long"
    )
    imgs = attach_decodable_image_payload(docs)

    def pattern(d, h, w, ch, gif):
        y, x, c = np.meshgrid(
            np.arange(h), np.arange(w), np.arange(ch), indexing="ij"
        )
        return (7 * x + 13 * y + (0 if gif else 29) * c + d) % 256

    def fixture(d):
        w, h = 8 + d % 9, 6 + d % 5
        gif = d % 4 == 2
        ch = 3 if d % 4 in (0, 2) else (1, 3, 4)[d % 3]
        return pattern(d, h, w, ch, gif), w, h, ch

    near = {
        r["doc_id"]: r
        for r in resize_image_pixels_nearest(imgs, 5, 4).collect()
    }
    box = {
        r["doc_id"]: r
        for r in downsample_image_pixels_box(imgs, 2).collect()
    }
    for d in range(8):
        px, w, h, ch = fixture(d)
        # scalar nearest reference
        s = ck = 0
        for y2 in range(4):
            for x2 in range(5):
                for c in range(ch):
                    v = int(px[(y2 * h) // 4, (x2 * w) // 5, c])
                    s += v
                    ck += v * (y2 * 5 + x2 + 1)
        assert near[d]["resized_sum"] == s and near[d]["checksum"] == ck
        assert near[d]["out_width"] == 5 and near[d]["out_height"] == 4
        # scalar 2x2 block-sum reference
        w2, h2 = w // 2, h // 2
        s = ck = 0
        for y in range(h2 * 2):
            for x in range(w2 * 2):
                for c in range(ch):
                    v = int(px[y, x, c])
                    s += v
                    ck += v * ((y // 2) * w2 + (x // 2) + 1)
        assert box[d]["resized_sum"] == s and box[d]["checksum"] == ck
        assert box[d]["out_width"] == w2 and box[d]["out_height"] == h2

    frames = {
        r["doc_id"]: r
        for r in extract_audio_frame_features(
            attach_decodable_audio_payload(docs), frame=32, hop=16
        ).collect()
    }
    for d in range(8):
        n = 120 + d % 50
        v = [((31 * i + d) % 65536) - 32768 for i in range(n)]
        nf = (n - 32) // 16 + 1
        energy = zcr = 0.0
        rms = []
        for f in range(nf):
            fr = v[f * 16: f * 16 + 32]
            e = sum(x * x for x in fr)
            energy += e
            zcr += sum(
                1 for a, b in zip(fr[:-1], fr[1:]) if a * b < 0
            )
            rms.append((e / 32.0) ** 0.5)
        r = frames[d]
        assert r["n_frames"] == nf
        assert r["energy_total"] == int(energy)
        assert r["zcr_total"] == int(zcr)
        assert abs(r["mean_rms"] - sum(rms) / nf) < 1e-9
    # degenerate: clip shorter than one frame -> 0 frames, NULL stats
    short = extract_audio_frame_features(
        attach_decodable_audio_payload(docs), frame=4096, hop=16
    ).collect()
    assert all(
        r["n_frames"] == 0 and r["energy_total"] is None for r in short
    )
