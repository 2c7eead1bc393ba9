"""Property-based invariants (hypothesis): the algebraic laws the
operators rely on, checked over randomized inputs rather than fixtures.
Each example round-trips through Spark, so example counts stay small;
the properties are the point, not the volume."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from openverse_catalog_spark.operators import sampling as smp
from openverse_catalog_spark.operators.merge import snapshot_diff
from openverse_catalog_spark.operators.packing import pack_offsets

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    rates=st.tuples(
        st.floats(0.05, 0.95), st.floats(0.05, 0.95)
    ),
    salt=st.sampled_from(["p1", "p2", "p3"]),
)
@_settings
def test_hash_samples_nest_by_rate(spark, rates, salt):
    lo, hi = min(rates), max(rates)
    df = spark.range(0, 400).withColumnRenamed("id", "k")
    small = {r.k for r in smp.hash_sample(df, "k", lo, salt).collect()}
    big = {r.k for r in smp.hash_sample(df, "k", hi, salt).collect()}
    assert small <= big  # one threshold, nested membership


@given(
    toks=st.lists(st.integers(1, 200), min_size=1, max_size=40),
    budget=st.integers(50, 500),
)
@_settings
def test_pack_partitions_every_doc_exactly_once(spark, toks, budget):
    rows = [(i, "s", t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, n_tok long")
    out = pack_offsets(df, "shard", "doc_id", "n_tok", budget).collect()
    assert len(out) == len(toks)  # total function: no doc dropped/duplicated
    by_id = sorted(out, key=lambda r: r.doc_id)
    # starts are exact prefix sums; bins are the start-offset intervals
    cum = 0
    for r in by_id:
        assert r["_start"] == cum and r["_bin"] == cum // budget
        cum += r["n_tok"]


@given(
    a_keys=st.sets(st.integers(0, 30), max_size=12),
    b_keys=st.sets(st.integers(0, 30), max_size=12),
)
@_settings
def test_snapshot_diff_antisymmetric(spark, a_keys, b_keys):
    mk = lambda ks: spark.createDataFrame(  # noqa: E731
        [(k, f"v{k}") for k in sorted(ks)], "k long, s string"
    )
    fwd = {
        (r.k, r.change_type)
        for r in snapshot_diff(mk(a_keys), mk(b_keys), ["k"], ["s"]).collect()
    }
    rev = {
        (r.k, r.change_type)
        for r in snapshot_diff(mk(b_keys), mk(a_keys), ["k"], ["s"]).collect()
    }
    flip = {"added": "removed", "removed": "added", "changed": "changed"}
    assert rev == {(k, flip[c]) for k, c in fwd}
    # equal values on shared keys -> only membership changes are reported
    assert {k for k, c in fwd if c == "added"} == b_keys - a_keys
    assert {k for k, c in fwd if c == "removed"} == a_keys - b_keys


@given(weights=st.dictionaries(
    st.sampled_from(["a", "b", "c"]), st.floats(0.1, 1.0), min_size=1
))
@_settings
def test_domain_mix_never_upsamples(spark, weights):
    rows = [(i, d) for i, d in enumerate(["a", "b", "c"] * 50)]
    df = spark.createDataFrame(rows, "k long, d string")
    before = {r.d: r["count"] for r in df.groupBy("d").count().collect()}
    after = {
        r.d: r["count"]
        for r in smp.domain_mix(df, "k", "d", weights)
        .groupBy("d")
        .count()
        .collect()
    }
    for d, n in after.items():
        assert d in weights and n <= before[d]


@given(
    seen_keys=st.sets(st.integers(0, 10_000), min_size=1, max_size=60),
    probe_keys=st.sets(st.integers(0, 10_000), min_size=1, max_size=60),
    n_bits=st.sampled_from([1 << 11, 1 << 13]),
)
@_settings
def test_bloom_anti_join_always_exact(spark, seen_keys, probe_keys, n_bits):
    """For ANY key sets and bitmap size — even undersized, fp-heavy
    bitmaps — the bloom-pruned anti-join equals the plain anti-join
    (false positives only shrink the pruning, never the result)."""
    from openverse_catalog_spark.operators import sketches as sk

    seen = spark.createDataFrame([(k,) for k in seen_keys], "k long")
    probe = spark.createDataFrame([(k,) for k in probe_keys], "k long")
    bloom = sk.bloom_build(seen, F.col("k"), n_bits=n_bits)
    got = {r.k for r in
           sk.bloom_anti_join(probe, seen, lambda d: d["k"], bloom).collect()}
    assert got == probe_keys - seen_keys
    # and membership never has a false negative
    flagged = sk.bloom_maybe_contains(seen, F.col("k"), bloom)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=3, max_size=30),
        min_size=2, max_size=12,
    ),
)
@_settings
def test_containment_bounded_and_symmetric_domain(spark, texts):
    """Containment is always in (0, 1] and only emitted for id_a < id_b."""
    from openverse_catalog_spark.operators import dedupe as dd

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = dd.ngram_containment_pairs(
        df, "id", "text", n=2, min_containment=0.0
    ).collect()
    for r in out:
        assert r["id_a"] < r["id_b"]
        assert 0.0 < r["containment"] <= 1.0


# --- media codec round-trips over ARBITRARY content -------------------------
# pure Python/numpy (no Spark per example), so examples can be generous

_codec_settings = settings(max_examples=40, deadline=None)


@given(
    data=st.data(),
    width=st.integers(1, 40),
    height=st.integers(1, 24),
    channels=st.sampled_from([1, 3, 4]),
)
@_codec_settings
def test_png_roundtrip_arbitrary_content(data, width, height, channels):
    """encode_png_pixels -> decode_png_pixels is the identity for ANY
    8-bit content and shape — all five scanline filters are exercised
    (they cycle per row) against adversarial rather than patterned
    pixels."""
    import numpy as np

    from openverse_catalog_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_pixels,
    )

    seed = data.draw(st.integers(0, 2**32 - 1))
    arr = np.random.RandomState(seed).randint(
        0, 256, (height, width, channels), dtype=np.uint8
    )
    out = decode_png_pixels(encode_png_pixels(arr))
    assert out is not None and out.shape == arr.shape
    assert (out == arr).all()


@given(
    data=st.data(),
    width=st.integers(1, 64),
    height=st.integers(1, 32),
)
@_codec_settings
def test_gif_lzw_roundtrip_arbitrary_content(data, width, height):
    """encode_gif_pixels -> decode_gif_pixels is the identity for ANY
    index content — random indices defeat LZW dictionary reuse and
    repetitive ones stress code-size growth / CLEAR resets; both paths
    must reproduce every index through the palette."""
    import numpy as np

    from openverse_catalog_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif_pixels,
    )

    seed = data.draw(st.integers(0, 2**32 - 1))
    rng = np.random.RandomState(seed)
    if data.draw(st.booleans()):
        idx = rng.randint(0, 256, (height, width)).astype(np.uint8)
    else:  # low-entropy: long runs -> dictionary growth + resets
        idx = rng.randint(0, 3, (height, width)).astype(np.uint8)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    out = decode_gif_pixels(encode_gif_pixels(idx, pal))
    assert out is not None and out.shape == (height, width, 3)
    assert (out == pal[idx]).all()


@given(
    data=st.data(),
    n=st.integers(1, 500),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@_codec_settings
def test_wav_roundtrip_arbitrary_samples(data, n, rate):
    import numpy as np

    from openverse_catalog_spark.operators.multimodal import (
        decode_wav_samples,
        synthesize_wav_samples,
    )

    # synthesize_wav_samples is pattern-based; build an arbitrary-data
    # WAV through the same chunk layout by splicing random PCM in
    import struct

    seed = data.draw(st.integers(0, 2**32 - 1))
    samples = np.random.RandomState(seed).randint(
        -32768, 32768, n
    ).astype("<i2")
    body = samples.tobytes()
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + len(fmt) + 8 + len(body))
        + b"WAVE" + fmt + b"data" + struct.pack("<I", len(body)) + body
    )
    out = decode_wav_samples(wav)
    assert out is not None and out.shape == (n, 1)
    assert (out[:, 0] == samples).all()


@given(
    data=st.data(),
    width=st.integers(1, 40),
    height=st.integers(1, 24),
    channels=st.sampled_from([1, 3]),
)
@_codec_settings
def test_jpeg_roundtrip_near_lossless_at_quant1(data, width, height, channels):
    """decode_jpeg_pixels(encode_jpeg_pixels(x, quant=1)) must stay
    within DCT-rounding distance of ANY 8-bit content (JPEG is lossy,
    but at unit quantization the only error is float rounding through
    the transform pair — a budget of a few levels; greyscale adds the
    exact path, RGB the YCbCr round-trip). One wrong Huffman bit or a
    misplaced zigzag index blows the bound immediately."""
    import numpy as np

    from openverse_catalog_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_pixels,
    )

    seed = data.draw(st.integers(0, 2**32 - 1))
    arr = np.random.RandomState(seed).randint(
        0, 256, (height, width, channels), dtype=np.uint8
    )
    out = decode_jpeg_pixels(encode_jpeg_pixels(arr, quant=1))
    assert out is not None and out.shape == arr.shape
    tol = 2 if channels == 1 else 4  # YCbCr adds a rounding trip
    assert int(np.abs(out.astype(int) - arr.astype(int)).max()) <= tol


@given(
    data=st.data(),
    width=st.integers(8, 33),
    height=st.integers(8, 29),
)
@_codec_settings
def test_jpeg_blockwise_constant_is_bit_exact(data, width, height):
    """The oracle's lever: a blockwise-constant greyscale image at
    quant=1 exercises only the (integer-exact) DC path, so the decode
    reproduces the source BIT-EXACTLY — including partial edge MCUs
    (edge-replication padding keeps them constant too)."""
    import numpy as np

    from openverse_catalog_spark.operators.multimodal import (
        decode_jpeg_pixels,
        synthesize_jpeg_image,
    )

    doc_id = data.draw(st.integers(0, 10_000))
    y, x = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    want = ((7 * (x // 8) + 13 * (y // 8) + doc_id) % 256)[:, :, None]
    out = decode_jpeg_pixels(synthesize_jpeg_image(doc_id, width, height))
    assert out is not None and (out == want).all()


def test_jpeg_decoder_rejects_non_baseline_and_garbage():
    """Progressive (SOF2) and truncated/garbage payloads return None —
    honest refusal, never wrong pixels."""
    from openverse_catalog_spark.operators.multimodal import (
        decode_jpeg_pixels,
        synthesize_jpeg_image,
    )

    good = synthesize_jpeg_image(3, 16, 16)
    assert decode_jpeg_pixels(good) is not None
    # flip SOF0 (0xC0) to SOF2 (0xC2): progressive -> refused
    i = good.find(b"\xff\xc0")
    prog = good[:i + 1] + b"\xc2" + good[i + 2:]
    assert decode_jpeg_pixels(prog) is None
    assert decode_jpeg_pixels(good[: len(good) // 2]) is None
    assert decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None
    assert decode_jpeg_pixels(b"not a jpeg") is None
