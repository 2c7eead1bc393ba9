"""Mergeable frequency sketches: count-min with md5-derived hash rows.

A count-min sketch is the scale answer to "top talkers" questions the
reference answers with exact GROUP BY (duplicate counting, provider
volume reports): the sketch is a fixed depth x width counter grid,
counters are ADDITIVE — partials combine map-side, across partitions,
across streaming batches, across days — and estimate error is bounded
by N·e/width with probability 1-e^-depth, independent of cardinality.

Hash rows use hash60 (md5, functions/hashing.py), so a DuckDB oracle
reproduces the grid and the estimates bit-exactly — the rare sketch
whose correctness gate can be value-exact rather than tolerance-based.

Estimation needs a candidate set (CMS answers point queries, it does not
enumerate). Here candidates come from `distinct` of the queried column;
at 100 TB you'd feed the candidate stream from a hash_sample
(operators/sampling.py) — any true heavy hitter survives a uniform
sample, and the sketch then scores the survivors exactly as here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    StructField,
    StructType,
)

from openverse_catalog_spark.functions.hashing import hash60, hash60_sql


def _cell(value: Column, row: int, width: int, salt: str) -> Column:
    return hash60(
        F.concat(F.lit(f"cms{salt}|{row}|"), value.cast("string"))
    ) % F.lit(width)


def cell_sql(value_expr: str, row: int, width: int, salt: str) -> str:
    h = hash60_sql(f"'cms{salt}|{row}|' || CAST({value_expr} AS VARCHAR)")
    return f"({h} % {width})"


def cms_build(
    df: DataFrame, col: str, width: int, depth: int, salt: str = ""
) -> DataFrame:
    """Build the (row, cell, cnt) counter grid — depth*width rows total.

    One explode (depth rows per input) then a partial-aggregating
    groupBy; the shuffled data is the GRID (tiny, bounded), not the
    input. Grids from disjoint inputs merge by summing cnt.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cell(F.col(col), i, width, salt).alias("cell"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    candidates: DataFrame,
    col: str,
    sketch: DataFrame,
    width: int,
    depth: int,
    salt: str = "",
) -> DataFrame:
    """Point-estimate each candidate: min over rows of its cell counter.

    The sketch is depth*width rows — always broadcast; candidates are
    never shuffled. Missing cells count 0 (value never seen)."""
    probes = candidates.select(
        col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cell(F.col(col), i, width, salt).alias("cell"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(col, F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
    return (
        probes.join(F.broadcast(sketch), ["row", "cell"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


# ===========================================================================
# Bloom filter: mergeable membership sketch
# ===========================================================================
#
# The scale answer to "have we seen this key before?" when the seen-side
# is too big to broadcast as raw keys but its BITMAP fits on every
# executor: a 1-billion-key corpus at 10 bits/key is a ~1.2 GB broadcast,
# vs ~60+ GB of raw url/text-hash keys. The reference answers the same
# question with a unique index probe (0003_openledger_image_schema.sql);
# the training-data use is cross-corpus dedup and URL/blocklist pruning,
# where the bloom prunes the fact side BEFORE the shuffle join and the
# exact join then removes the (bounded-rate) false positives — the final
# result stays exact, which is what lets the oracle gate it with a plain
# NOT EXISTS.
#
# Build is fully distributed and mergeable: each partition ORs its keys
# into a local bitmap (one numpy pass per Arrow batch), emits the bitmap
# as fixed-size CHUNK rows, and chunks OR-combine in a partial-aggregating
# groupBy — the shuffle moves n_partitions * (n_bits/8) bytes of bitmap,
# never the keys. Hashing is the classic Kirsch-Mitzenmacher double hash
# h1 + i*h2 (uint64 wraparound, identical numpy arithmetic on build and
# probe), with h1/h2 taken from two md5 halves computed JVM-side.

_BLOOM_CHUNK_BYTES = 64 * 1024


def _bloom_hashes(value: Column) -> list[Column]:
    # NULL keys hash as a reserved sentinel instead of propagating NULL
    # into the Arrow stage (a null h1/h2 would fail the int64 conversion);
    # SQL NULL semantics would drop them from any equality join anyway,
    # so flagging them "maybe seen" conservatively is safe — the exact
    # anti-join settles their fate either way.
    hex_ = F.md5(F.coalesce(value.cast("string"), F.lit("\x00__null__")))
    h1 = F.conv(F.substring(hex_, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(hex_, 17, 15), 16, 10).cast("long")
    return [h1.alias("__h1"), h2.alias("__h2")]


def _probe_idx(h1, h2, n_bits: int, n_hashes: int):
    """(n_rows, n_hashes) bit indices; pure uint64 numpy on both the
    build and probe side, so wraparound is consistent by construction."""
    import numpy as np

    a = h1.to_numpy(dtype="int64").astype("uint64")[:, None]
    b = h2.to_numpy(dtype="int64").astype("uint64")[:, None]
    i = np.arange(n_hashes, dtype="uint64")[None, :]
    # make the stride odd so probes cycle the whole bit space
    return (a + i * (b * np.uint64(2) + np.uint64(1))) % np.uint64(n_bits)


def bloom_build(df: DataFrame, key: Column, n_bits: int, n_hashes: int = 5) -> bytes:
    """Distributed bloom build over ``key``; returns the assembled bitmap
    (n_bits/8 bytes) on the driver, ready to broadcast.

    Partitions reduce to bitmap chunks map-side (mapInPandas accumulates
    across the partition's Arrow batches and emits once), chunks OR-merge
    in applyInPandas, and only the final n_bits/8 bytes reach the driver.
    """
    if n_bits % 8:
        raise ValueError("n_bits must be a multiple of 8")
    n_bytes = n_bits // 8
    chunk = min(_BLOOM_CHUNK_BYTES, n_bytes)

    def to_chunks(batches):
        import numpy as np
        import pandas as pd

        bitmap = np.zeros(n_bytes, dtype="uint8")
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            idx = _probe_idx(pdf["__h1"], pdf["__h2"], n_bits, n_hashes).ravel()
            np.bitwise_or.at(bitmap, (idx >> np.uint64(3)).astype("int64"),
                             np.left_shift(np.uint8(1), (idx & np.uint64(7)).astype("uint8")))
        if not seen:
            return
        for cid in range(0, n_bytes, chunk):
            yield pd.DataFrame(
                {"chunk_id": [cid], "bits": [bitmap[cid:cid + chunk].tobytes()]}
            )

    schema = StructType([
        StructField("chunk_id", IntegerType()),
        StructField("bits", BinaryType()),
    ])

    def or_merge(pdf):
        import numpy as np
        import pandas as pd

        acc = np.frombuffer(pdf["bits"].iloc[0], dtype="uint8").copy()
        for raw in pdf["bits"].iloc[1:]:
            acc |= np.frombuffer(raw, dtype="uint8")
        return pd.DataFrame({"chunk_id": [pdf["chunk_id"].iloc[0]], "bits": [acc.tobytes()]})

    merged = (
        df.select(*_bloom_hashes(key))
        .mapInPandas(to_chunks, schema)
        .groupBy("chunk_id")
        .applyInPandas(or_merge, schema)
        .collect()
    )
    out = bytearray(n_bytes)
    for r in merged:
        out[r["chunk_id"]:r["chunk_id"] + len(r["bits"])] = r["bits"]
    return bytes(out)


def bloom_maybe_contains(
    df: DataFrame,
    key: Column,
    bloom: bytes,
    n_hashes: int = 5,
    flag_col: str = "maybe_seen",
) -> DataFrame:
    """Append a boolean ``flag_col``: False = DEFINITELY not in the built
    set (no false negatives), True = maybe (false-positive rate set by
    the build's bits-per-key). The bitmap is an executor broadcast; the
    probe is one vectorized numpy pass per Arrow batch, no shuffle."""
    n_bits = len(bloom) * 8
    bc = df.sparkSession.sparkContext.broadcast(bloom)
    cols = list(df.columns)
    # copy the field list — StructType.add would mutate df's cached schema
    out_schema = StructType(
        list(df.schema.fields) + [StructField(flag_col, BooleanType())]
    )

    def probe(batches):
        import numpy as np

        bitmap = np.frombuffer(bc.value, dtype="uint8")
        for pdf in batches:
            if len(pdf) == 0:
                continue
            idx = _probe_idx(pdf["__h1"], pdf["__h2"], n_bits, n_hashes)
            bits = bitmap[(idx >> np.uint64(3)).astype("int64")]
            hit = (bits >> (idx & np.uint64(7)).astype("uint8")) & np.uint8(1)
            res = pdf[cols].copy()
            res[flag_col] = hit.all(axis=1)
            yield res

    return df.select("*", *_bloom_hashes(key)).mapInPandas(probe, out_schema)


def bloom_anti_join(
    df: DataFrame,
    seen: DataFrame,
    key_expr,
    bloom: bytes,
    n_hashes: int = 5,
) -> DataFrame:
    """Exact ``df ANTI JOIN seen ON key`` with the bloom as pre-filter:
    rows whose key misses the bloom skip the join entirely (definitely
    new); only bloom HITS — true dups plus the small false-positive
    fraction — reach the shuffle anti-join that restores exactness. At
    scale this turns an all-rows shuffle into a dup-fraction shuffle."""
    key = key_expr(df) if callable(key_expr) else F.expr(key_expr)
    flagged = bloom_maybe_contains(df, key, bloom, n_hashes)
    fresh = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    seen_keys = seen.select(
        (key_expr(seen) if callable(key_expr) else F.expr(key_expr)).alias("__k")
    )
    survivors = maybe.join(
        seen_keys,
        (key_expr(maybe) if callable(key_expr) else F.expr(key_expr)) == F.col("__k"),
        "left_anti",
    )
    return fresh.unionByName(survivors)


# --- KMV / theta sketches (distinct-cardinality set algebra) ---------------
#
# The k-minimum-values sketch keeps the k smallest DISTINCT hash values
# of a column; theta = h_k / |hash space| estimates the sampled fraction
# and (k-1)/theta the distinct count (Beyer et al. 2007; the Theta
# sketch framework generalizes the set algebra). Unlike HLL (also in
# this module) the kept hashes form a UNIFORM SAMPLE of the distinct
# keys, so sketches compose under union AND intersection/difference —
# the "how many users clicked AND purchased" question the reference
# answers with exact COUNT(DISTINCT) joins. hash60 (md5) keeps every
# estimate bit-reproducible in the DuckDB oracle.
#
# SCALE: the build's only shuffle is a map-side-combined distinct on
# the 60-bit hashes; the k-smallest step is Spark's TakeOrdered (per-
# partition top-k, driver merge of k-row partials). Sketch state is k
# longs — join/broadcast-friendly, mergeable across days/streams.

KMV_SPACE = float(2**60)  # hash60 range; theta = h_k / KMV_SPACE


def kmv_build(df: DataFrame, col: str, k: int, salt: str = "") -> DataFrame:
    """The sketch: k smallest distinct hash60 values of ``col`` (NULLs
    excluded), as a (h bigint) frame of <= k rows."""
    h = hash60(F.concat(F.lit(f"kmv{salt}|"), F.col(col).cast("string")))
    return (
        df.filter(F.col(col).isNotNull())
        .select(h.alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Union composition: the k smallest of the merged hash sets — the
    sketch of the UNION of the underlying key sets (exactly, because
    any of the union's k smallest hashes is among its side's k
    smallest)."""
    return a.union(b).distinct().orderBy("h").limit(k)


def _hk_and_count(sketch: DataFrame, k: int) -> tuple[int | None, int]:
    """(h_k, kept) driver-side: h_k is None while the sketch holds
    fewer than k hashes (estimates are then EXACT counts). The bound
    stays an exact integer so cross-engine comparisons never round."""
    rows = [r["h"] for r in sketch.collect()]
    if len(rows) < k:
        return None, len(rows)
    return max(rows), len(rows)


def kmv_estimate(sketch: DataFrame, k: int) -> float:
    """Distinct-count estimate: exact below k, else (k-1)/theta with
    theta = h_k / KMV_SPACE."""
    hk, kept = _hk_and_count(sketch, k)
    if hk is None:
        return float(kept)
    return (k - 1.0) / (hk / KMV_SPACE)


def kmv_intersect_estimate(a: DataFrame, b: DataFrame, k: int) -> float:
    """|A ∩ B| estimate: both sketches restricted below the SMALLER
    theta are uniform samples of the same rate, so the common hashes
    strictly below it scale up by 1/theta. Exact when both sides kept
    < k (theta = 1, no restriction)."""
    ha, _ = _hk_and_count(a, k)
    hb, _ = _hk_and_count(b, k)
    bounds = [h for h in (ha, hb) if h is not None]
    common = a.join(b, on="h", how="inner")
    if not bounds:
        return float(common.count())
    hk = min(bounds)
    n = common.filter(F.col("h") < F.lit(hk)).count()
    return n / (hk / KMV_SPACE)


def kmv_sql(col_expr: str, salt: str = "") -> str:
    """DuckDB text for the same per-value hash (oracle building block)."""
    return hash60_sql(f"'kmv{salt}|' || CAST({col_expr} AS VARCHAR)")


# --- hash-rank sample quantiles (mergeable approximate percentiles) --------
#
# The exact percentile operators (operators/popularity.py) rank every
# row — one full sort per group, the step that dies first at 100 TB.
# The mergeable alternative: a deterministic uniform row sample — the k
# rows whose hashed ROW IDENTITY is smallest (KMV over row ids rather
# than distinct values). Any of the union's k smallest ids is among its
# side's k smallest, so samples compose under union EXACTLY like KMV
# sketches: per-day/per-partition samples merge into the corpus sample
# without resampling. Quantiles are then order statistics of k rows
# (driver-side), with rank error O(sqrt(q(1-q)/k)) — and, because the
# sample is hash-pinned rather than random-seeded, every estimate is
# bit-reproducible in the DuckDB oracle.

def quantile_sample_build(
    df: DataFrame, id_col: str, value_col: str, k: int, salt: str = ""
) -> DataFrame:
    """The sample: (h, value) for the k rows with the smallest hashed
    ids. ``id_col`` must be row-unique (hash ties would make the
    boundary row ambiguous); NULL values are excluded, matching
    percentile semantics."""
    h = hash60(F.concat(F.lit(f"qs{salt}|"), F.col(id_col).cast("string")))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(h.alias("h"), F.col(value_col).alias("value"))
        .orderBy("h")
        .limit(k)
    )


def quantile_sample_merge(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Union composition over DISJOINT row sets (e.g. daily shards):
    the merged sample is exactly the sample of the concatenated
    input."""
    return a.union(b).orderBy("h").limit(k)


def quantile_sample_estimate(
    sample: DataFrame, percentiles: list[float]
) -> list[float]:
    """percentile_disc over the sample: value at row ceil(p * n) of the
    ascending value order — the same rule the exact operator and the
    oracle apply, so sample-vs-exact differences are pure sampling
    error, never definition skew."""
    import math

    vals = sorted(r["value"] for r in sample.collect())
    if not vals:
        raise ValueError("quantile_sample_estimate: empty sample")
    n = len(vals)
    return [vals[max(0, math.ceil(p * n) - 1)] for p in percentiles]


def quantile_sample_by_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    value_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Per-GROUP hash-rank sample: the k rows with the smallest hashed
    ids within each group — one window shuffle keyed on the group, but
    unlike the exact per-group percentile rank (which sorts EVERY row
    of the largest group in one task) the downstream state is k rows
    per group regardless of skew: feed the result to
    ``popularity.percentile_disc_multi`` for bounded-error group
    quantiles whose per-task cost no hot group can blow up. Returns
    (group_cols..., value) sample rows."""
    from pyspark.sql import Window as W

    h = hash60(
        F.concat(F.lit(f"qg{salt}|"), F.col(id_col).cast("string"))
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, F.col(value_col).alias("value"),
                h.alias("__h"))
        .withColumn("__rn", F.row_number().over(
            W.partitionBy(*group_cols).orderBy("__h")))
        .filter(F.col("__rn") <= k)
        .select(*group_cols, "value")
    )
