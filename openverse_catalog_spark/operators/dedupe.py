"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's exact dedup (``DELETE ... same provider AND same
md5(foreign_identifier)`` — reference ``loader/sql.py:220-232``), this
module adds the near-dup family a 100 TB text corpus needs:

  * exact_dedupe        — hash-groupBy keep-one (reference J6 semantics)
  * minhash_signatures  — char-shingle MinHash (N seeded permutations)
  * minhash_lsh_pairs   — banded LSH candidate pairs (band-key equi-join)
  * simhash             — 16-bit SimHash per document
  * simhash_near_pairs  — pairs within a Hamming radius
  * ngram_jaccard_pairs — exact n-gram Jaccard similarity for candidates

All hashing is md5-based (functions/hashing.py) so every operator is
DuckDB-oracle verifiable, and everything is pure Catalyst expressions —
no Python UDFs in any hot path.

Scale notes: MinHash/LSH is the scale path — cost is linear in corpus
size (explode shingles → one groupBy per doc → one equi-join on band
keys); it never forms the quadratic pair space. The quadratic operators
(simhash_near_pairs on the full cross join, ngram_jaccard on arbitrary
pairs) are intended to run on LSH-candidate output or within small
blocking groups, which is how they're wired in the query suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openverse_catalog_spark.functions.hashing import (
    MERSENNE_P,
    hash60,
    perm_expr,
    perm_params,
)

DEFAULT_SEEDS = 16
DEFAULT_BANDS = 4  # 4 bands x 4 rows with 16 seeds
DEFAULT_SHINGLE = 5  # character shingle width


def normalize_text(c):
    """lower + collapse whitespace; the canonical text key."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def _spread(df: DataFrame) -> DataFrame:
    """Ensure enough partitions for an Arrow pass WITHOUT shuffling a
    corpus that is already well-split: a 100 TB input arrives with
    thousands of file splits, where a blanket repartition() would be a
    full-corpus shuffle for nothing. Only a small local input (fewer
    splits than cores — exactly the sf0.x single-file test tables) gets
    spread; everything else passes through untouched."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedupe(
    df: DataFrame, key_cols: list[str], order_cols: list | None = None
) -> DataFrame:
    """Keep one row per key (reference J6: arbitrary winner; we pin the
    first by ``order_cols`` for determinism). row_number window — a single
    hash-partition shuffle on the key."""
    if not order_cols:
        # the partition key is constant inside its own window — ordering
        # by it would leave the keeper arbitrary. Default to every other
        # ORDERABLE column so the winner is stable across runs and
        # partitionings (maps — at any nesting depth — are unorderable
        # in Spark and skipped).
        from openverse_catalog_spark.operators.merge import orderable_columns

        order_cols = [
            F.col(c) for c in orderable_columns(df, exclude=key_cols)
        ] or [F.lit(1)]
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_text_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-duplicate detection by normalized-text hash: returns
    (text_hash, n_dups, keeper_id) for groups with >1 member."""
    h = hash60(normalize_text(F.col(text_col)))
    return (
        df.select(F.col(id_col), h.alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_dups") > 1)
    )


def shingles_expr(text_col, k: int = DEFAULT_SHINGLE):
    """Array of character k-shingles of the normalized text (JVM-side:
    transform over an index sequence; no UDF)."""
    t = normalize_text(text_col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1))),
        lambda i: t.substr(i, F.lit(k)),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_seeds: int = DEFAULT_SEEDS,
    k: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """One row per doc: id + mh_0..mh_{n-1} minhash values.

    Arrow-batch implementation, chosen by MEASUREMENT over the pure
    expression form: per-shingle md5 inside interpreted higher-order
    functions (transform + aggregate/zip_with fold, which box a
    16-long array per shingle) costs ~23 s for a 6.2k-doc corpus at
    sf0.1, while hashlib md5 + one numpy (seeds x shingles)
    multiply-add-min does the same work in ~3 s including Python
    worker startup; batch-level shingle-hash memoization plus per-doc
    shingle-set dedup halves that again. The operator stays
    embarrassingly parallel — zero shuffles (``_spread`` only
    round-robins inputs with fewer splits than cores, i.e. the local
    single-file test tables; a well-split corpus passes through).

    md5 parity with the DuckDB oracle is kept (hashlib md5 == Spark
    md5 == DuckDB md5 on UTF-8 bytes); min() is duplicate-insensitive
    so shingle dedup is skipped on purpose. Normalization uses Java \\s
    (ASCII incl. \\x0B), not Python's Unicode-aware \\s, keeping parity
    with the expression/oracle normalization.
    """
    import numpy as np

    params = perm_params(n_seeds)
    perm_a = np.array([a for a, _ in params], dtype="int64")[:, None]
    perm_b = np.array([b for _, b in params], dtype="int64")[:, None]

    def gen(batches):
        import hashlib
        import re

        import pandas as pd

        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        # shingle-hash memo shared across the batch: common k-grams repeat
        # heavily across docs, and min() is duplicate-insensitive, so each
        # doc contributes its shingle SET and each unique shingle is
        # md5'd exactly once per partition
        memo: dict[str, int] = {}

        def shash(sh: str) -> int:
            v = memo.get(sh)
            if v is None:
                v = (
                    int(hashlib.md5(sh.encode()).hexdigest()[:15], 16)
                    % MERSENNE_P
                )
                memo[sh] = v
            return v

        for pdf in batches:
            ids, rows = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                # .strip(" ") not .strip(): F.trim removes only 0x20, while
                # bare strip() eats all Unicode whitespace — edge NBSPs would
                # silently desync the Python signatures from the SQL oracle
                t = ws.sub(" ", (text or "").lower()).strip(" ")
                n_sh = max(len(t) - (k - 1), 1)
                uniq = {t[i : i + k] for i in range(n_sh)}
                hs = np.fromiter(
                    (shash(s) for s in uniq), dtype="int64", count=len(uniq)
                )
                ids.append(doc_id)
                rows.append(((perm_a * hs[None, :] + perm_b) % MERSENNE_P).min(axis=1))
            mh = np.stack(rows) if rows else np.zeros((0, n_seeds), dtype="int64")
            data = {id_col: np.array(ids, dtype="int64")}
            for s in range(n_seeds):
                data[f"mh_{s}"] = mh[:, s]
            yield pd.DataFrame(data)

    schema = f"{id_col} long, " + ", ".join(f"mh_{s} long" for s in range(n_seeds))
    src = _spread(df.select(id_col, text_col))
    return src.mapInPandas(gen, schema)


def minhash_lsh_pairs(
    signatures: DataFrame,
    id_col: str,
    n_seeds: int = DEFAULT_SEEDS,
    n_bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any band key.

    Band key = hash of the concatenated minhashes of that band's rows.
    Self equi-join on (band_index, band_key) — never materializes the
    quadratic pair space. The signature table is materialized ONCE via
    lazy ``localCheckpoint`` before the self-join; measured at sf0.1:
    plain self-join (signatures computed once per side) 12.5 s, groupBy
    + in-bucket pair expansion 6.1 s, checkpointed join 1.6 s. The
    checkpoint is doc-count x (n_seeds+1) longs — executor-resident at
    any scale; on executor loss the query re-runs (signatures are
    deterministic and derived).
    """
    assert n_seeds % n_bands == 0, "n_seeds must divide evenly into bands"
    signatures = signatures.localCheckpoint(eager=False)
    rows = n_seeds // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                hash60(
                    F.concat_ws(
                        ",", *[F.col(f"mh_{b * rows + r}") for r in range(rows)]
                    )
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = signatures.select(
        F.col(id_col), F.explode(bands).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = exploded.select(F.col(id_col).alias("id_a"), "band", "key")
    b = exploded.select(F.col(id_col).alias("id_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_star_edges(
    signatures: DataFrame,
    id_col: str,
    n_seeds: int = DEFAULT_SEEDS,
    n_bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Candidate edges for CONNECTED-COMPONENTS consumption: within each
    LSH band bucket, connect every member to the bucket's MIN id (a
    star) instead of materializing all pairs.

    Connectivity-equivalent to ``minhash_lsh_pairs`` (every same-bucket
    pair is linked through the hub) but LINEAR in bucket size where
    all-pairs is quadratic — the difference between surviving and
    OOMing on a dup-heavy corpus: a bucket of c near-identical docs
    (c ~ 100s for boilerplate/mirror-heavy crawls) emits c-1 edges, not
    c(c-1)/2. This is the standard large-scale CC candidate shape
    (hash-to-min). Star edges raise cluster diameter by at most 1 hop
    per bucket, so give ``dup_components_bounded`` one extra round when
    switching from pair edges. Returns (id_a=hub, id_b=member) with
    id_a < id_b."""
    assert n_seeds % n_bands == 0, "n_seeds must divide evenly into bands"
    signatures = signatures.localCheckpoint(eager=False)
    rows = n_seeds // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                hash60(
                    F.concat_ws(
                        ",", *[F.col(f"mh_{b * rows + r}") for r in range(rows)]
                    )
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = signatures.select(
        F.col(id_col), F.explode(bands).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    hubs = (
        exploded.groupBy("band", "key")
        .agg(F.min(id_col).alias("__hub"), F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
    )
    return (
        exploded.join(hubs, ["band", "key"])
        .filter(F.col(id_col) != F.col("__hub"))
        .select(F.col("__hub").alias("id_a"), F.col(id_col).alias("id_b"))
        .distinct()
    )


def tokens_expr(text_col):
    """Lower-cased word tokens (non-alphanumeric separators)."""
    return F.filter(
        F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda t: t != ""
    )


def _simhash_expr(text_col, bits: int):
    """SimHash as a single row-local JVM expression: per bit b, sum
    (+1/-1) of token-hash bit b across the doc's DISTINCT tokens; output
    bit b = 1 iff the vote sum > 0. Token hash = ``hash60`` (md5-based),
    identical on both engines, so oracle values are unchanged.

    Everything is higher-order array functions over the in-row token
    array — no Python, no Arrow transfer, no shuffle, and the whole
    sketch stays inside one whole-stage-codegen span. The per-token bit
    unroll lives INSIDE the fold lambda (one md5 per token; ``votes`` is
    referenced exactly once downstream so the aggregate subtree is never
    duplicated)."""
    toks = F.array_distinct(tokens_expr(F.coalesce(text_col, F.lit(""))))
    hs = F.transform(toks, hash60)
    zeros = F.array_repeat(F.lit(0).cast("long"), bits)
    votes = F.aggregate(
        hs,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1,
                        F.lit(1).cast("long"),
                    ).otherwise(F.lit(-1).cast("long"))
                    for b in range(bits)
                ]
            ),
            lambda a, c: a + c,
        ),
    )
    weights = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    weighted = F.zip_with(
        votes, weights, lambda v, w: F.when(v > 0, w).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(weighted, F.lit(0).cast("long"), lambda a, x: a + x)


def _simhash_hybrid(
    df: DataFrame, id_col: str, text_col: str, bits: int
) -> DataFrame:
    """SimHash sketch, hybrid JVM/Arrow split chosen by MEASUREMENT:
    tokenization + per-token md5 stay JVM-side (``tokens_expr`` +
    ``hash60`` — byte-identical to the oracle's lower/split/md5), while
    the pure integer vote math (per-bit +1/-1 sums, sign, weight sum)
    runs vectorized in ONE Arrow pass. The expression form unrolls
    ``bits`` WHEN branches per token inside an interpreted fold — 5.1 s
    for the sf0.1 corpus at 60 bits; the numpy bit-matrix does the same
    math in 0.8 s, bit-identical output. Still row-local: zero shuffles,
    and only (id, token-hash array) crosses the Arrow boundary."""
    import numpy as np

    hs_df = df.select(
        F.col(id_col),
        F.transform(
            F.array_distinct(tokens_expr(F.coalesce(F.col(text_col), F.lit("")))),
            hash60,
        ).alias("hs"),
    )
    shifts = np.arange(bits, dtype="int64")
    weights = np.int64(1) << shifts

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out = np.zeros(len(pdf), dtype="int64")
            for i, hs in enumerate(pdf["hs"]):
                arr = np.asarray(hs, dtype="int64")
                if arr.size:
                    ones = ((arr[:, None] >> shifts) & 1).sum(axis=0)
                    votes = ones * 2 - arr.size  # (+1/-1 vote sum)
                    out[i] = int(weights[votes > 0].sum())
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return hs_df.mapInPandas(gen, f"{id_col} long, simhash long")


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash over word tokens (hybrid JVM-hash/Arrow-vote path,
    see ``_simhash_hybrid``; still row-local, zero shuffles)."""
    return _simhash_hybrid(df, id_col, text_col, 16)


def simhash_near_pairs(
    sims: DataFrame,
    id_col: str,
    max_hamming: int = 3,
    block_col: str | None = None,
    allow_cross_join: bool = False,
) -> DataFrame:
    """Pairs with Hamming(simhash) <= radius. With ``block_col`` the join
    is an equi-join within blocks (the scale path); without it, a full
    cross join — quadratic, so it is REFUSED unless the caller opts in
    with ``allow_cross_join=True`` for a known-small candidate set
    (e.g. LSH-candidate output). This guard keeps the exported API from
    silently materializing an O(n^2) pair space on a full corpus. The
    sketch table is lazy-checkpointed so the upstream sketch pipeline
    runs once, not once per join side."""
    if block_col is None and not allow_cross_join:
        raise ValueError(
            "simhash_near_pairs without block_col is a full cross join; "
            "pass block_col (the scale path — e.g. simhash band keys, see "
            "simhash60_banded) or allow_cross_join=True for a bounded "
            "candidate set"
        )
    sims = sims.localCheckpoint(eager=False)
    a = sims.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"),
        *( [F.col(block_col).alias("__blk")] if block_col else [] ),
    )
    b = sims.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"),
        *( [F.col(block_col).alias("__blk")] if block_col else [] ),
    )
    joined = a.join(b, ["__blk"]) if block_col else a.crossJoin(b)
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    block_col: str | None = None,
    min_jaccard: float = 0.0,
    max_df: int | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity for document pairs.

    Implemented as: explode distinct n-grams → self equi-join on the
    n-gram (plus optional block) → count intersections → join per-doc
    set sizes → |A∩B| / (|A|+|B|-|A∩B|). Pairs sharing no n-gram never
    appear (their Jaccard is 0) — that's what makes this scale: the
    shuffle is on n-grams, not on the pair space.

    ``max_df`` caps gram document frequency: grams shared by more than
    ``max_df`` docs (within the block, if blocking) are dropped BEFORE
    the self-join, and per-doc set sizes are computed over the capped
    gram space, so the Jaccard is exact over the restricted universe.
    Without a cap the pair aggregate emits Σ df(g)² rows — one stop-gram
    shared by 1M docs would alone produce 10¹² pairs; with it the
    self-join output is bounded by |grams| × max_df. Always set it at
    corpus scale (stop-grams carry no dedup signal anyway).
    """
    blk = [F.col(block_col)] if block_col else []
    # Distinct n-grams are generated and md5-hashed per doc inside one
    # Arrow batch stage: the expression form paid an interpreted
    # transform/slice/concat_ws per gram plus a distinct() shuffle of the
    # full gram strings; this emits already-distinct compact int64 gram
    # keys (60-bit md5 — collision odds ~|grams|^2/2^61, nil), so the
    # join shuffle carries 8-byte keys instead of strings. Gram-hash
    # intersection counts equal gram-string counts absent collisions, so
    # oracle parity holds.
    import numpy as np

    blk_schema = (
        f", {block_col} {df.schema[block_col].dataType.simpleString()}"
        if block_col
        else ""
    )

    def gen(batches):
        import hashlib
        import re

        import pandas as pd

        sep = re.compile(r"[^a-z0-9]+")
        for pdf in batches:
            out_id, out_blk, out_g = [], [], []
            blk_vals = pdf[block_col] if block_col else None
            for row_i, (doc_id, text) in enumerate(zip(pdf[id_col], pdf[text_col])):
                toks = [t for t in sep.split((text or "").lower()) if t]
                n_g = max(len(toks) - (n - 1), 1)
                grams = {" ".join(toks[i : i + n]) for i in range(n_g)}
                for g_str in grams:
                    out_id.append(doc_id)
                    out_g.append(
                        int(hashlib.md5(g_str.encode()).hexdigest()[:15], 16)
                    )
                    if block_col:
                        out_blk.append(blk_vals.iloc[row_i])
            data = {id_col: np.array(out_id, dtype="int64")}
            if block_col:
                data[block_col] = out_blk
            data["__g"] = np.array(out_g, dtype="int64")
            yield pd.DataFrame(data)

    g = (
        _spread(df.select(F.col(id_col), *blk, F.col(text_col)))
        .mapInPandas(gen, f"{id_col} long{blk_schema}, __g long")
        # the gram table feeds THREE consumers (per-doc sizes + both
        # self-join sides); lazy-checkpoint so the Arrow stage runs once
        .localCheckpoint(eager=False)
    )
    join_cols = ["__g"] + ([block_col] if block_col else [])
    if max_df is not None:
        # Drop stop-grams before the self-join: one extra groupBy on the
        # gram key (same shuffle partitioning the join needs) + a
        # broadcast-unfriendly but narrow semi-join of 8-byte keys.
        keep = (
            g.groupBy(*join_cols)
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_df)
            .drop("__df")
        )
        g = g.join(keep, join_cols, "left_semi").localCheckpoint(eager=False)
    sizes = g.groupBy(id_col).agg(F.count("*").alias("__sz"))
    a = g.select(F.col(id_col).alias("id_a"), *[F.col(c) for c in join_cols])
    b = g.select(F.col(id_col).alias("id_b"), *[F.col(c) for c in join_cols])
    inter = (
        a.join(b, join_cols)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__inter"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("__sz").alias("__sza")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("__sz").alias("__szb")), "id_b")
        .withColumn(
            "jaccard",
            F.col("__inter") / (F.col("__sza") + F.col("__szb") - F.col("__inter")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def doc_gram_keys(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """Distinct word-n-gram keys per document as compact int64s (60-bit
    md5 of the space-joined gram — same keying as ngram_jaccard_pairs,
    so counts are oracle-matchable via md5 in SQL). One Arrow-batched
    pass, no shuffle; downstream joins carry 8-byte keys, not strings."""
    import numpy as np

    def gen(batches):
        import hashlib
        import re

        import pandas as pd

        sep = re.compile(r"[^a-z0-9]+")
        for pdf in batches:
            out_id, out_g = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in sep.split((text or "").lower()) if t]
                n_g = max(len(toks) - (n - 1), 1)
                grams = {" ".join(toks[i : i + n]) for i in range(n_g)}
                for g_str in grams:
                    out_id.append(doc_id)
                    out_g.append(
                        int(hashlib.md5(g_str.encode()).hexdigest()[:15], 16)
                    )
            yield pd.DataFrame(
                {
                    id_col: np.array(out_id, dtype="int64"),
                    "__g": np.array(out_g, dtype="int64"),
                }
            )

    return (
        _spread(df.select(F.col(id_col), F.col(text_col)))
        .mapInPandas(gen, f"{id_col} long, __g long")
    )


def exact_substring_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    width: int = 64,
    stride: int = 32,
    max_df: int | None = None,
    min_shared: int = 2,
) -> DataFrame:
    """Verbatim-span near-dup pairs: docs sharing >= ``min_shared``
    exact ``width``-char windows sampled every ``stride`` chars (the
    rolling-window form of exact-substring dedup — catches long copied
    passages, quote farms and template boilerplate that token-level
    Jaccard dilutes away). A copied span of length L that survives at
    aligned offsets contributes ~L/stride shared windows, so
    ``min_shared`` is a span-length threshold in disguise.

    Entirely expression-side: windows come from one
    sequence/transform/substring expression (no Python), collapse to
    distinct 8-byte 60-bit hashes per doc, and pairs form on a window
    equi-join — the shuffle is linear in windows (~len/stride per doc),
    never the pair space. ``max_df`` drops boilerplate windows shared by
    more than that many docs BEFORE the self-join, bounding the pair
    aggregate at |windows| x max_df (the same stop-key lesson as
    ``ngram_jaccard_pairs``); always set it at corpus scale. Docs
    shorter than ``width`` have no window and never pair.
    """
    wins = F.expr(
        f"transform(sequence(0, CAST(floor((length({text_col}) - {width})"
        f" / {stride}) AS INT)),"
        f" j -> substring({text_col}, j * {stride} + 1, {width}))"
    )
    w = (
        df.filter(F.length(text_col) >= width)
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(wins)).alias("__w"),
        )
        .select(F.col(id_col), hash60(F.col("__w")).alias("__wh"))
    )
    if max_df is not None:
        keep = (
            w.groupBy("__wh")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_df)
            .drop("__df")
        )
        w = w.join(keep, "__wh", "left_semi")
    w = w.localCheckpoint(eager=False)  # both self-join sides
    a = w.select(F.col(id_col).alias("id_a"), "__wh")
    b = w.select(F.col(id_col).alias("id_b"), "__wh")
    return (
        a.join(b, "__wh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def contamination_check(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    text_col: str = "text",
    n: int = 5,
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark decontamination: for every (corpus doc, benchmark doc)
    pair sharing at least ``min_shared`` distinct word-n-grams, emit the
    shared-gram count and the fraction of the benchmark doc covered —
    the standard pre-training leak check (an n-gram-overlap variant of
    the GPT-3/PaLM decontamination procedure).

    Scale shape: both sides reduce to (id, gram-key) lists; the join is
    an equi-join on the gram key, so the shuffle is proportional to the
    gram sets, never the doc-pair cross product. The benchmark side is
    tiny by construction — at cluster scale mark it broadcast-able."""
    dg = doc_gram_keys(docs, id_col, text_col, n)
    bg = doc_gram_keys(bench, bench_id_col, text_col, n)
    bench_sizes = bg.groupBy(bench_id_col).agg(F.count("*").alias("__bsz"))
    shared = (
        dg.join(bg, "__g")
        .groupBy(id_col, bench_id_col)
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return shared.join(F.broadcast(bench_sizes), bench_id_col).select(
        id_col,
        bench_id_col,
        "n_shared",
        (F.col("n_shared") / F.col("__bsz")).alias("bench_overlap"),
    )


def dup_components_bounded(
    pairs: DataFrame,
    rounds: int = 3,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keeper selection over a near-dup pair set: min-label propagation
    for a FIXED number of rounds assigns every paired doc a canonical id
    (the smallest id reachable within ``rounds`` hops). For dup clusters
    of diameter <= rounds this IS connected components; deeper chains
    keep propagating in later incremental runs (the operator is
    idempotent and monotone, so re-running converges).

    Each round is one equi-join + one min-aggregate — 2 shuffles — the
    standard scalable CC shape (no driver-side graph). Returns
    (doc_id, canonical_id); docs in no pair are absent (they keep
    themselves).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        # materialize once: every round joins against edges, and without
        # this the whole upstream pair-generation lineage (e.g. the
        # MinHash pipeline) re-executes per round
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(rounds):
        via_nb = edges.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "label")
        labels = (
            labels.unionByName(via_nb)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("canonical_id"))


def simhash60(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash per document (``_simhash_expr`` widened to the full
    hash60 width) — enough bits that random 60-bit collisions at
    Hamming <= 3 are ~3e-14, so banded blocking is both exact and
    sub-quadratic. Pure narrow projection, zero shuffles."""
    return _simhash_hybrid(df, id_col, text_col, 60)


def simhash_banded_pairs(
    sims: DataFrame,
    id_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
    bits: int = 60,
) -> DataFrame:
    """EXACT Hamming <= max_hamming pairs via band blocking: split the
    simhash into ``n_bands`` bit-slices; by pigeonhole, any pair within
    ``n_bands - 1`` differing bits shares at least one identical band, so
    candidates = same-(band, key) pairs and nothing is missed (requires
    max_hamming < n_bands). Sub-quadratic: one explode (n_bands rows per
    doc) + band-key equi-join + bit_count filter + pair distinct — the
    scale path that needs no source/provider blocking column.

    The sketch table is materialized ONCE via lazy ``localCheckpoint``
    before the self-join: measured at sf0.1, recomputing the upstream
    sketch per join side costs 9.2 s, a groupBy + in-bucket array
    expansion (which must materialize m^2/2 structs per collision
    bucket — this corpus has large near-dup clusters) costs 8.5 s, and
    the checkpointed join costs 2.1 s. The checkpoint is doc-count x
    16 bytes — trivially executor-resident at any scale; on executor
    loss the query re-runs (the sketch is deterministic and derived,
    so this only trades a rare retry for a 4x steady-state win)."""
    assert max_hamming < n_bands, "pigeonhole exactness needs max_hamming < n_bands"
    sims = sims.localCheckpoint(eager=False)
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = sims.select(
        F.col(id_col), F.col("simhash"), F.explode(bands).alias("bk")
    ).select(
        id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = exploded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "band", "key"
    )
    b = exploded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "band", "key"
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def simhash_pair_census(
    sims: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    bits: int = 16,
) -> DataFrame:
    """Exact (hamming, n_pairs) census of all doc pairs within
    ``max_hamming`` on a narrow sketch, WITHOUT materializing the pairs:
    collapse docs to (simhash, cnt) — a ``bits``-wide sketch has at most
    2^bits distinct values, so this frame is bounded regardless of corpus
    size — run the pigeonhole band join over distinct values only, and
    recover doc-pair counts as cnt_u * cnt_v per qualifying value pair
    plus C(cnt, 2) inside each value (hamming 0).

    Scale shape: one map-side-combined groupBy over the corpus (the only
    doc-cardinality step), then all joins/aggregates run on a <= 2^bits-row
    frame that broadcasts. Output is <= max_hamming + 1 rows."""
    assert max_hamming < n_bands, "pigeonhole exactness needs max_hamming < n_bands"
    vals = sims.groupBy("simhash").agg(F.count(F.lit(1)).alias("cnt"))
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = vals.select("simhash", "cnt", F.explode(bands).alias("bk")).select(
        "simhash", "cnt", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = exploded.select(
        F.col("simhash").alias("sh_a"), F.col("cnt").alias("cnt_a"), "band", "key"
    )
    b = exploded.select(
        F.col("simhash").alias("sh_b"), F.col("cnt").alias("cnt_b"), "band", "key"
    )
    cross_value = (
        a.join(b, ["band", "key"])
        .filter(F.col("sh_a") < F.col("sh_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        # a value pair can collide in several bands — count it once
        .select("sh_a", "sh_b", "hamming", "cnt_a", "cnt_b")
        .distinct()
        .select("hamming", (F.col("cnt_a") * F.col("cnt_b")).alias("n"))
    )
    within_value = vals.filter(F.col("cnt") > 1).select(
        F.lit(0).alias("hamming"),
        (F.col("cnt") * (F.col("cnt") - 1) / 2).cast("long").alias("n"),
    )
    return (
        cross_value.unionByName(within_value)
        .groupBy("hamming")
        .agg(F.sum("n").alias("n_pairs"))
    )


def minhash_lsh_match_index(
    probe_sigs: DataFrame,
    index_sigs: DataFrame,
    id_col: str,
    n_seeds: int = DEFAULT_SEEDS,
    n_bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Probe a persisted signature INDEX with a new batch's signatures:
    distinct (probe_id, index_id) band collisions.

    The incremental-dedup shape for a growing corpus: the historical
    side is a stored signature table (computed once per doc, ever);
    each day's batch is banded and equi-joined against it — cost scales
    with |batch| x collision rate, never with |corpus|^2, and the
    band-key join is a plain hash join (broadcastable when the batch is
    small, AQE-splittable when a band key is hot).
    """

    assert n_seeds % n_bands == 0, "n_seeds must divide evenly into bands"

    def banded(sigs: DataFrame, out: str) -> DataFrame:
        rows = n_seeds // n_bands
        bands = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    hash60(
                        F.concat_ws(
                            ",",
                            *[F.col(f"mh_{b * rows + r}") for r in range(rows)],
                        )
                    ).alias("key"),
                )
                for b in range(n_bands)
            ]
        )
        return sigs.select(F.col(id_col).alias(out), F.explode(bands).alias("bk")).select(
            out, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
        )

    p = banded(probe_sigs, "probe_id")
    x = banded(index_sigs, "index_id")
    return p.join(x, ["band", "key"]).select("probe_id", "index_id").distinct()


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list,
    max_dist: int,
) -> DataFrame:
    """Edit-distance near-dup pairs: (id_a, id_b, dist) for rows in the
    same block with Levenshtein(text) <= max_dist.

    The edit-distance family complements the token-set sketches
    (minhash/simhash/jaccard): it catches character-level corruption —
    OCR noise, truncation, encoding damage — that token sketches score
    as distant. The reference dedups only on exact (provider,
    md5(foreign_identifier)) keys (loader/sql.py:220-232); this is the
    natural near-dup extension for title/caption catalogs.

    Scale shape: block equi-join (never a cross join), with the JVM
    ``levenshtein(l, r, threshold)`` form — the banded DP early-exits
    once the distance provably exceeds the threshold, O(len * max_dist)
    per comparison instead of O(len^2). Cost is sum over blocks of
    m^2/2, so block choice is the scale knob; at 100 TB block on
    (lang, prefix-token) or an LSH bucket, exactly as the simhash
    blocked join does.
    """
    base = df.select(
        F.col(id_col),
        *[c.alias(f"__blk{i}") for i, c in enumerate(block_cols)],
        F.col(text_col).alias("__t"),
    ).localCheckpoint(eager=False)
    keys = [f"__blk{i}" for i in range(len(block_cols))]
    a = base.select(
        F.col(id_col).alias("id_a"), *keys, F.col("__t").alias("__ta")
    )
    b = base.select(
        F.col(id_col).alias("id_b"), *keys, F.col("__t").alias("__tb")
    )
    dist = F.levenshtein(F.col("__ta"), F.col("__tb"), max_dist)
    return (
        a.join(b, keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_df: int | None = None,
    min_containment: float = 0.9,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT: |A∩B| / min(|A|, |B|) — the
    subset/quote detector Jaccard misses. A short doc fully embedded in
    a long one has near-1 containment but tiny Jaccard (the union is
    dominated by the long doc), so resemblance thresholds never fire;
    containment normalizes by the smaller gram set and catches it.

    Same scale shape as ``ngram_jaccard_pairs``: distinct compact gram
    keys per doc (one Arrow pass), optional ``max_df`` stop-gram cap
    BEFORE the self-join, pair aggregate bounded by |grams| x max_df.
    Emits (id_a, id_b, containment) for pairs at or above the floor."""
    g = doc_gram_keys(df, id_col, text_col, n=n).localCheckpoint(eager=False)
    if max_df is not None:
        keep = (
            g.groupBy("__g")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_df)
            .drop("__df")
        )
        g = g.join(keep, "__g", "left_semi").localCheckpoint(eager=False)
    sizes = g.groupBy(id_col).agg(F.count("*").alias("__sz"))
    a = g.select(F.col(id_col).alias("id_a"), "__g")
    b = g.select(F.col(id_col).alias("id_b"), "__g")
    inter = (
        a.join(b, "__g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__i"))
    )
    return (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("__sz").alias("__sza")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("__sz").alias("__szb")),
            "id_b",
        )
        .withColumn(
            "containment",
            F.col("__i") / F.least(F.col("__sza"), F.col("__szb")),
        )
        .filter(F.col("containment") >= min_containment)
        .select("id_a", "id_b", "containment")
    )


def self_repeat_trim(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """INTRA-document repetition removal (the 'deduplicating training
    data makes LMs better' self-repeat case): truncate each doc at the
    first position where a word n-gram repeats an n-gram seen earlier
    in the SAME doc — generated/boilerplate text loops, and training on
    the loop tail is wasted compute. Returns (id, n_tokens,
    kept_tokens, kept_text).

    Plan: one narrow explode of (doc, gram_start, gram_hash) — the
    token arrays themselves never ride through the explode — a
    (doc, gram) window finds each gram's first occurrence, a per-doc
    aggregate takes the earliest second occurrence as the cut, and one
    doc_id join back slices the original tokens. Two keyed shuffles,
    both on bounded keys."""
    toks = tokens_expr(F.col(text_col))
    base = df.select(
        F.col(id_col), toks.alias("__toks"), F.size(toks).alias("n_tokens")
    ).localCheckpoint(eager=False)
    starts = F.when(
        F.col("n_tokens") >= n,
        F.sequence(F.lit(1), F.col("n_tokens") - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = base.select(
        F.col(id_col), F.explode(starts).alias("pos"), "__toks"
    ).select(
        id_col,
        "pos",
        hash60(F.concat_ws(" ", F.slice(F.col("__toks"), F.col("pos"), n))).alias(
            "__g"
        ),
    )
    w = Window.partitionBy(id_col, "__g")
    cuts = (
        grams.withColumn("__first", F.min("pos").over(w))
        .groupBy(id_col)
        .agg(
            F.min(
                F.when(F.col("pos") > F.col("__first"), F.col("pos"))
            ).alias("__cut")
        )
    )
    out = base.join(cuts, [id_col], "left")
    kept = F.coalesce(F.col("__cut") - 1, F.col("n_tokens"))
    return out.select(
        id_col,
        "n_tokens",
        kept.alias("kept_tokens"),
        F.concat_ws(" ", F.slice(F.col("__toks"), F.lit(1), kept)).alias(
            "kept_text"
        ),
    )


def segment_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seg_words: int = 10,
) -> DataFrame:
    """CROSS-corpus segment-level dedup — the C4 cleaning rule ("we
    discard all but one of any three-sentence span occurring more than
    once in the data set", Raffel et al. 2020 §2.2) restated over
    fixed ``seg_words``-word segments: every segment that appears
    anywhere else in the corpus keeps only its FIRST occurrence
    (ordered by (doc, position)), and each document is reassembled
    from its surviving segments. Returns (id, n_segments, n_kept,
    cleaned_text).

    The reference has no corpus-text analog (its dedup is row-keyed,
    ``loader/sql.py`` upsert); this is the training-data operator LLM
    pipelines run right after exact doc dedup.

    Plan: one narrow expression builds the segment array (no Python),
    posexplode ships (id, pos, md5(segment), segment); the global
    first-occurrence pick is ONE window over the 128-bit segment hash
    ordered by (id, pos) — the corpus shuffles once on the hash, the
    hash (not the text) is the shuffle key payload-dominant column —
    and the reassembly is ONE groupBy(id) with an order-pinned
    collect. Two keyed shuffles total, both linear in segments; no
    self-join, no pair blowup on duplicate-heavy corpora (a segment
    duplicated k times costs k window rows, not k² pair rows)."""
    words = F.split(F.col(text_col), " ")
    n_seg = F.floor((F.size(words) + (seg_words - 1)) / seg_words)
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.concat_ws(
            " ", F.slice(words, i * seg_words + 1, seg_words)
        ),
    )
    exploded = (
        df.filter(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
        .select(F.col(id_col), F.posexplode(segs).alias("pos", "seg"))
        .select(id_col, "pos", F.md5(F.col("seg")).alias("__h"), "seg")
    )
    w = Window.partitionBy("__h").orderBy(id_col, "pos")
    kept = exploded.withColumn("__rn", F.row_number().over(w))
    return kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.when(F.col("__rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__rn") == 1,
                            F.struct(F.col("pos"), F.col("seg")),
                        )
                    )
                ),
                lambda s: s.seg,
            ),
        ).alias("cleaned_text"),
    )
