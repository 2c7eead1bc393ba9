"""Packing operator invariants: bin fill bounds, chunk coverage totals,
partition independence, and shuffle-free chunking."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from openverse_catalog_spark.operators import packing as pk


@pytest.fixture(scope="module")
def toks(spark):
    rows = [(i, f"s{i % 3}", 10 + (i * 7) % 50) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, shard string, n_tok long")


def test_pack_bins_contiguous_and_bounded(toks):
    out = pk.pack_offsets(toks, "shard", "doc_id", "n_tok", 128)
    per_bin = (
        out.groupBy("shard", "_bin")
        .agg(F.sum("n_tok").alias("fill"), F.max("n_tok").alias("mx"))
        .collect()
    )
    bins = {}
    for r in per_bin:
        bins.setdefault(r.shard, []).append(r["_bin"])
        # a bin overfills only by the straddling doc, never more
        assert r.fill < 128 + 59
    for shard, ids in bins.items():
        assert sorted(ids) == list(range(len(ids)))  # no gaps per shard


def test_pack_starts_are_running_offsets(toks):
    out = (
        pk.pack_offsets(toks, "shard", "doc_id", "n_tok", 128)
        .filter(F.col("shard") == "s0")
        .orderBy("doc_id")
        .collect()
    )
    cum = 0
    for r in out:
        assert r["_start"] == cum
        cum += r["n_tok"]


def test_pack_partition_independent(toks):
    a = pk.pack_offsets(toks, "shard", "doc_id", "n_tok", 128)
    b = pk.pack_offsets(toks.repartition(17), "shard", "doc_id", "n_tok", 128)
    key = lambda r: (r.doc_id, r["_bin"])  # noqa: E731
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_chunk_spans_cover_every_token_once_per_stride(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, ""), (3, "x")], "doc_id long, text string"
    )
    out = pk.chunk_spans(df, ["doc_id"], "text", window=4, stride=3)
    rows = {r.doc_id: [] for r in out.collect()}
    for r in out.collect():
        rows[r.doc_id].append((r.chunk_idx, r.start, r.chunk_len))
    # 7 tokens, stride 3 -> starts 0,3,6; last window truncated to 1
    assert rows[1] == [(0, 0, 4), (1, 3, 4), (2, 6, 1)]
    assert rows[2] == [(0, 0, 0)]  # empty doc surfaces, not dropped
    assert rows[3] == [(0, 0, 1)]


def test_length_bucket_edges(spark):
    df = spark.createDataFrame([(0,), (15,), (16,), (39,), (40,)], "n long")
    got = df.select(
        "n", pk.length_bucket(F.col("n"), (16, 24, 32, 40)).alias("b")
    ).collect()
    assert {r.n: r.b for r in got} == {0: 0, 15: 0, 16: 1, 39: 3, 40: 4}


def test_chunking_is_shuffle_free(toks, spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pk.chunk_spans(df, ["doc_id"], "text", 16, 12).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_pack_segments_cover_bins_contiguously(spark):
    """Segments within a bin are contiguous (each starts where the
    previous ended), seg_idx counts from 0 in order, and a doc longer
    than the remaining bin space starts the straddle (docs never split)."""
    from openverse_catalog_spark.operators.packing import pack_segments

    rows = [("s", i, n) for i, n in enumerate([300, 300, 200, 512, 100])]
    df = spark.createDataFrame(rows, "shard string, k long, n_tok long")
    segs = sorted(
        pack_segments(df, "shard", "k", "n_tok", 512).collect(),
        key=lambda r: (r["bin"], r["seg_idx"]),
    )
    # doc0 starts bin0@0; doc1 starts at 300 (straddles into bin1 space)
    assert (segs[0]["bin"], segs[0]["seg_start"], segs[0]["seg_len"]) == (0, 0, 300)
    assert (segs[1]["bin"], segs[1]["seg_start"]) == (0, 300)
    by_bin = {}
    for s in segs:
        by_bin.setdefault(s["bin"], []).append(s)
    for bin_segs in by_bin.values():
        assert [s["seg_idx"] for s in bin_segs] == list(range(len(bin_segs)))
    # total packed tokens conserved
    assert sum(s["seg_len"] for s in segs) == 300 + 300 + 200 + 512 + 100
