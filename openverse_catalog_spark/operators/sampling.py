"""Deterministic sampling / data-mixing operators for corpus construction.

Training-data pipelines need samples that are REPRODUCIBLE across engines,
cluster sizes, and re-runs — `df.sample()` is none of those (partition-
dependent RNG). Everything here keys off ``hash60`` (md5-based, identical
in Spark and DuckDB — functions/hashing.py), so a sample taken on a
1000-executor cluster is bit-identical to one taken on a laptop, and the
oracle can verify membership exactly.

  * ``hash_sample`` — Bernoulli(rate) via integer threshold on the 60-bit
    key hash. A pure narrow filter: no shuffle, pushes past scans, and
    composable (two salts give independent samples).
  * ``stratified_sample`` — exactly ``n`` rows per stratum, chosen by
    hash order (a deterministic uniform draw). One shuffle on the strata
    columns; state per group is bounded by ``n``.
  * ``domain_mix`` — resample to TARGET domain proportions (the data-
    mixing step of corpus assembly, e.g. DoReMi-style fixed weights).
    Computes per-domain keep-rates from observed counts (largest
    achievable sample with no upsampling: the binding domain keeps
    rate 1.0), then hash-filters. Counts aggregate map-side; the
    per-domain rate table is broadcast — the fact table is never
    shuffled.

Thresholds are ``floor(rate * 2^60)`` computed identically on both
engines (floor, never cast — Spark truncates, DuckDB rounds).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openverse_catalog_spark.functions.hashing import hash60, hash60_sql

HASH_SPACE = 1 << 60


def _keyhash(key: Column, salt: str) -> Column:
    return hash60(F.concat(F.lit(f"{salt}|"), key.cast("string")))


def keyhash_sql(key_expr: str, salt: str) -> str:
    """DuckDB SQL computing the same salted 60-bit key hash."""
    return hash60_sql(f"'{salt}|' || CAST({key_expr} AS VARCHAR)")


def threshold(rate: Column | float) -> Column:
    """Integer keep-threshold for a [0,1] rate — floor on both engines."""
    r = F.lit(rate) if isinstance(rate, (int, float)) else rate
    return F.floor(r * F.lit(float(HASH_SPACE))).cast("bigint")


def threshold_sql(rate_expr: str) -> str:
    return f"CAST(floor(({rate_expr}) * {float(HASH_SPACE)!r}) AS BIGINT)"


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli sample: keep iff hash(salt|key) < rate·2^60.

    Engine-, partitioning-, and run-independent; a narrow filter (no
    shuffle) that Catalyst pushes toward the scan.
    """
    return df.filter(_keyhash(F.col(key_col), salt) < threshold(rate))


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    key_col: str,
    salt: str = "strat",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, drawn by hash order.

    Hash order is a uniform random permutation fixed by (salt, key), so
    the draw is unbiased and reproducible; ties are impossible while keys
    are unique within a stratum (hash then key breaks residual ties).
    One shuffle on the strata columns.
    """
    w = (
        Window.partitionBy(*strata_cols)
        .orderBy(_keyhash(F.col(key_col), salt), F.col(key_col))
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def domain_mix_rates(
    df: DataFrame, domain_col: str, weights: Mapping[str, float]
) -> DataFrame:
    """Per-domain keep-rates hitting target proportions without upsampling.

    rate_d = (w_d / n_d) / max_e(w_e / n_e): the domain most under-
    represented relative to its target keeps everything; all others are
    downsampled so the kept counts land in the target ratio. Domains not
    in ``weights`` get rate 0. Returns (domain, n_rows, rate).
    """
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    scored = counts.withColumn(
        "_need", F.coalesce(wmap[F.col("domain")], F.lit(0.0)) / F.col("n_rows")
    )
    top = scored.agg(F.max("_need").alias("_max_need"))
    return (
        scored.crossJoin(F.broadcast(top))
        .select(
            "domain",
            "n_rows",
            (F.col("_need") / F.col("_max_need")).alias("rate"),
        )
    )


def domain_mix(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    weights: Mapping[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Resample ``df`` toward the target domain weights (downsample-only).

    The rate table is tiny (one row per domain) and broadcast; the fact
    table sees a single narrow filter — no shuffle at any scale.
    """
    rates = domain_mix_rates(df, domain_col, weights).select(
        F.col("domain").alias(domain_col), "rate"
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .filter(_keyhash(F.col(key_col), salt) < threshold(F.col("rate")))
        .drop("rate")
    )


def leakage_free_split(
    df: DataFrame,
    id_col: str,
    group_key: Column,
    cuts: tuple[int, int] = (90, 95),
    salt: str = "leakfree",
) -> DataFrame:
    """Train/val/test assignment where every row of a duplicate GROUP
    lands in the same split — the guard against test-set leakage through
    duplicates (a near-copy of a training doc in the eval split measures
    memorization, not generalization).

    The split is a pure function of the group REPRESENTATIVE (min id per
    ``group_key``), so group integrity holds by construction. The group
    key is hashed to 32 bytes before the groupBy, so the shuffle carries
    md5 keys, never document text; the rep table joins back on the same
    hash. Appends group_rep / bucket / split.
    """
    k = F.md5(group_key.cast("string")).alias("__gk")
    reps = (
        df.select(k, F.col(id_col))
        .groupBy("__gk")
        .agg(F.min(id_col).alias("group_rep"))
    )
    bucket = (_keyhash(F.col("group_rep"), salt) % 100).alias("bucket")
    return (
        df.withColumn("__gk", k)
        .join(reps, "__gk")
        .drop("__gk")
        .withColumn("bucket", bucket)
        .withColumn(
            "split",
            F.when(F.col("bucket") < cuts[0], "train")
            .when(F.col("bucket") < cuts[1], "val")
            .otherwise("test"),
        )
    )


def token_budget_cap(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    domain_col: str,
    budget: int,
    salt: str = "tokcap",
    bucket_bits: int = 10,
) -> DataFrame:
    """Per-domain token-budget enforcement: walk each domain's docs in
    deterministic hash order and keep docs while the tokens BEFORE them
    total under ``budget`` — token-level (not doc-level) downsampling,
    the knob a training-mix budget actually specifies.

    A naive single window per domain is a scale bottleneck (one task
    sorts the whole domain). Instead the hash order is split by its own
    high bits into 2^bucket_bits ranges: per-(domain, bucket) token sums
    cumulate in a TINY window (<= domains x 2^bucket_bits rows), and the
    exact running sum runs only WITHIN each bucket partition — identical
    keep set to the global walk (bucket order IS hash-prefix order), but
    the largest sort any task performs is a 2^-bucket_bits slice of the
    domain. Two bounded shuffles + one bucket-partitioned window.
    """
    h = _keyhash(F.col(id_col), salt)
    base = df.withColumn("__h", h).withColumn(
        "__b", F.shiftright("__h", 60 - bucket_bits).cast("int")
    )
    per_bucket = base.groupBy(domain_col, "__b").agg(
        F.sum(tokens_col).alias("__bt")
    )
    wb = (
        Window.partitionBy(domain_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_before = per_bucket.withColumn(
        "__before_bucket", F.coalesce(F.sum("__bt").over(wb), F.lit(0))
    ).drop("__bt")
    wd = (
        Window.partitionBy(domain_col, "__b")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(bucket_before), [domain_col, "__b"])
        .withColumn(
            "cum_before",
            F.col("__before_bucket")
            + F.coalesce(F.sum(tokens_col).over(wd), F.lit(0)),
        )
        .filter(F.col("cum_before") < budget)
        .drop("__h", "__b", "__before_bucket")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    scale: float = 1.0,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted Bernoulli: row kept with probability
    min(scale * weight, 1) — importance sampling with the same
    engine/partition/run independence as ``hash_sample`` (the decision
    is a pure function of (salt, key, weight)). A narrow filter, no
    shuffle; the training-data use is quality- or length-proportional
    retention where a uniform rate would over-keep boilerplate."""
    rate = F.least(weight * F.lit(float(scale)), F.lit(1.0))
    return df.filter(_keyhash(F.col(key_col), salt) < threshold(rate))


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epoch: int,
    n_shards: int,
    salt: str = "epoch",
) -> DataFrame:
    """Deterministic training-order assignment: every row gets a
    (shard, pos) for the given epoch — hash(salt|epoch|key) drives both
    shard routing and within-shard order, so each epoch is a fresh
    pseudo-random global permutation that any engine reproduces, and
    NOTHING global ever sorts: the only shuffle partitions on shard and
    each task orders its own shard (repartition + sortWithinPartitions
    at write time; here a per-shard window for an explicit pos). The
    distributed answer to 'shuffle the corpus every epoch' that a naive
    ORDER BY rand() gets wrong twice (nondeterministic AND a global
    sort)."""
    h = _keyhash(F.col(key_col), f"{salt}|{epoch}")
    w = Window.partitionBy("shard").orderBy("__h", key_col)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", (F.col("__h") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .drop("__h")
    )


def domain_upsample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    factors: Mapping[str, float],
    salt: str = "upsample",
) -> DataFrame:
    """Deterministic UPsampling: each row of domain d is repeated
    floor(f_d) times plus one more with probability frac(f_d) — the
    hash-thresholded fractional copy makes expected replication exactly
    f_d while staying engine/partition/run independent (sampled epochs
    are reproducible). Domains absent from ``factors`` keep factor 1.
    Completes ``domain_mix``: mix handles over-represented domains by
    downsampling, this handles under-represented ones when dropping
    data is not acceptable. Appends ``copy_id`` (1-based) so replicas
    stay distinguishable downstream (e.g. for packing). A narrow
    explode — output rows ~ sum(f_d * n_d), no shuffle."""
    fmap = F.create_map(*[F.lit(x) for kv in factors.items() for x in kv])
    f = F.coalesce(fmap[F.col(domain_col)], F.lit(1.0))
    whole = F.floor(f).cast("int")
    frac = f - F.floor(f)
    extra = (_keyhash(F.col(key_col), salt) < threshold(frac)).cast("int")
    n = (whole + extra).alias("__n")
    return (
        df.withColumn("__n", n)
        .filter(F.col("__n") > 0)
        .withColumn("copy_id", F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__n")
    )


def group_capped_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str,
    salt: str = "gcap",
    bucket_bits: int = 10,
) -> DataFrame:
    """Per-group fixed-size sample: keep the first ``k`` rows of each
    group in deterministic hash order — the doc-count sibling of
    token_budget_cap (balanced per-domain corpora are usually specified
    as 'at most K docs per source/language'). Hash order makes the draw
    uniform-without-replacement, reproducible on any engine or
    partitioning, and stable under appends of non-sampled rows.

    Physically this IS ``token_budget_cap`` with unit token weights and
    budget k (count-before < k keeps exactly the first k of the hash
    walk), so it inherits the bucketed-range plan: no task ever sorts a
    whole group — the scale property the plan suite pins for the budget
    cap."""
    one = "__gcap_one"
    return (
        token_budget_cap(
            df.withColumn(one, F.lit(1)),
            id_col,
            one,
            group_col,
            k,
            salt=salt,
            bucket_bits=bucket_bits,
        )
        .drop(one, "cum_before")
    )


def temperature_mix_rates(
    df: DataFrame, domain_col: str, alpha: float = 0.5
) -> DataFrame:
    """Temperature-flattened sampling rates (the mC4/PaLM recipe):
    target weights proportional to n^alpha (alpha < 1 flattens the
    domain distribution toward uniform without naming explicit weights
    — the multilingual-corpus standard). With downsample-only
    normalization that reduces to rate_d = (n_d / n_min)^(alpha-1): the
    smallest domain keeps everything, big domains shed their excess.
    Rates are rounded to 9 decimals so both engines' pow() agree
    bit-for-bit at the keep-threshold. Returns (domain, n_rows, rate)."""
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    mn = counts.agg(F.min("n_rows").alias("n_min"))
    return counts.crossJoin(F.broadcast(mn)).select(
        "domain",
        "n_rows",
        F.round(
            F.pow(F.col("n_rows") / F.col("n_min"), F.lit(alpha - 1.0)), 9
        ).alias("rate"),
    )


def temperature_mix(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    alpha: float = 0.5,
    salt: str = "tmix",
) -> DataFrame:
    """Resample toward the temperature-flattened distribution: tiny
    broadcast rate table + one narrow hash filter — no shuffle of the
    fact side at any scale (same plan shape as domain_mix)."""
    rates = temperature_mix_rates(df, domain_col, alpha).select(
        F.col("domain").alias(domain_col), "rate"
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .filter(_keyhash(F.col(key_col), salt) < threshold(F.col("rate")))
        .drop("rate")
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
# ---------------------------------------------------------------------------
# Select raw-corpus documents whose hashed-ngram distribution looks like a
# small TARGET domain sample: fit bag-of-hashed-ngrams models p (target) and
# q (raw), weight each raw doc by sum over its grams of ln p_b - ln q_b, then
# Gumbel-top-k resample. Everything below is hash60-deterministic so the
# DuckDB oracle verifies the exact selected SET, like every other sampler in
# this module.


def dsir_gram_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 512,
    salt: str = "dsir",
    keep: Sequence[str] = (),
) -> DataFrame:
    """Hashed unigram+bigram feature buckets, one row per gram occurrence.

    The gram list is built entirely inside the token ARRAY (zip_with on two
    slices — no posexplode + lag window, so no token-level shuffle), then
    exploded once to (id, bucket). Docs with zero tokens contribute no
    features and are absent downstream (their importance weight is an empty
    product, exactly the paper's behavior for empty text).
    """
    from openverse_catalog_spark.functions import text as tx

    toks = tx.tokens(F.col(text_col))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigrams)
    bucket = F.explode(
        F.transform(
            grams,
            lambda g: F.pmod(
                hash60(F.concat(F.lit(f"{salt}|"), g)), F.lit(n_buckets)
            ),
        )
    ).alias("bucket")
    return df.select(F.col(id_col), *[F.col(c) for c in keep], bucket)


def dsir_grams_sql(
    table: str, id_expr: str, text_expr: str, n_buckets: int = 512,
    salt: str = "dsir", keep: str = "",
) -> str:
    """DuckDB CTE body producing the same (id, bucket) relation.

    ``keep`` is an optional ', col, ...' suffix carried through (e.g. the
    domain column the caller splits target/raw on).
    """
    h = hash60_sql(f"'{salt}|' || g")
    return f"""
      SELECT {id_expr}{keep}, {h} % {n_buckets} AS bucket
      FROM (
        SELECT *, list_filter(
                 string_split_regex(lower({text_expr}), '[^a-z0-9]+'),
                 x -> x <> '') AS t
        FROM {table}
      ) tl, LATERAL (
        SELECT g FROM unnest(t) AS u(g)
        UNION ALL
        SELECT t[i] || ' ' || t[i + 1] FROM unnest(range(1, len(t))) AS r(i)
      ) gr
    """


def _dsir_counts(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    salt: str,
):
    """Shared fitting stage: the raw gram relation plus the four count
    frames (target/raw per-bucket counts and totals) BOTH weight-table
    shapes derive from — the formula and the counting exist once, so
    the direct path and the persisted model can never drift."""
    rb = dsir_gram_buckets(raw, id_col, text_col, n_buckets, salt)
    tb = dsir_gram_buckets(target, id_col, text_col, n_buckets, salt)
    tcnt = tb.groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    rcnt = rb.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    tt = tcnt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"))
    rt = rcnt.agg(F.coalesce(F.sum("cr"), F.lit(0)).alias("nr"))
    return rb, tcnt, rcnt, tt, rt


def _dsir_logw(alpha: float, n_buckets: int) -> Column:
    """The ONE smoothed log-ratio expression (over ct/cr/nt/nr cols):
    ln((ct + a)/(Nt + aB)) - ln((cr + a)/(Nr + aB))."""
    ab = float(alpha * n_buckets)
    return (
        F.log((F.coalesce(F.col("ct"), F.lit(0)) + alpha)
              / (F.col("nt") + ab))
        - F.log((F.coalesce(F.col("cr"), F.lit(0)) + alpha)
                / (F.col("nr") + ab))
    ).alias("logw")


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 512,
    alpha: float = 0.5,
    salt: str = "dsir",
) -> DataFrame:
    """Per-raw-doc DSIR log importance weight.

    log w(doc) = sum over the doc's gram occurrences of
    ln((ct_b + a)/(Nt + a*B)) - ln((cr_b + a)/(Nr + a*B)) — additively
    smoothed hashed-ngram LMs of the target and raw corpora
    (arxiv 2302.03169 §2; counts, not presence, per the paper's
    bag-of-hashed-ngrams parameterization).

    Plan at scale: both sides explode their gram arrays once; the two count
    tables aggregate map-side down to <= B rows each; the weight table is a
    B-row broadcast joined to the raw gram relation (narrow), and the only
    data-sized shuffle is the final groupBy(id). Returns
    (id, n_grams, logweight).
    """
    rb, tcnt, rcnt, tt, rt = _dsir_counts(
        raw, target, id_col, text_col, n_buckets, salt
    )
    # sparse weight table: raw docs only ever hit raw-seen buckets
    w = (
        rcnt.join(tcnt, "bucket", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select("bucket", _dsir_logw(alpha, n_buckets))
    )
    return (
        rb.join(F.broadcast(w), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("logw").alias("logweight"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    n_buckets: int = 512,
    alpha: float = 0.5,
    salt: str = "dsir",
    gumbel_salt: str = "dsirg",
    keep: Sequence[str] = (),
) -> DataFrame:
    """Gumbel-top-k resample of ``raw`` toward the target distribution.

    score = logweight + Gumbel(0,1) where the Gumbel draw is the
    deterministic inverse-CDF of the doc's salted key hash,
    u = (hash60 + 0.5) / 2^60 in (0,1) — so selection is a pure function
    of the corpus and the salts (engine/partitioning/run independent),
    and sampling WITHOUT replacement proportional-to-weight, the
    Gumbel-top-k identity the paper relies on. TakeOrdered top-k: no
    global sort materializes. Returns (id, keep..., score) rows, k of them.
    """
    lw = dsir_logweights(raw, target, id_col, text_col, n_buckets, alpha, salt)
    u = (_keyhash(F.col(id_col), gumbel_salt) + 0.5) / F.lit(float(HASH_SPACE))
    score = (F.col("logweight") - F.log(-F.log(u))).alias("score")
    top = (
        lw.select(F.col(id_col), score)
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
    if keep:
        # label columns join AFTER the top-k: k rows against the corpus
        # (the k-row side broadcasts), never a corpus-sized exchange for
        # columns that affect neither score nor tie-break. Duplicate ids
        # in `raw` would fan the join out past k rows (and make the
        # weights ill-defined to begin with) — collapse back to k with
        # min() per label so even the degenerate case stays a pure
        # function of the data, never of partitioning (keep columns
        # must therefore be orderable types)
        top = (
            top.join(raw.select(id_col, *keep), id_col)
            .groupBy(id_col, "score")
            .agg(*[F.min(c).alias(c) for c in keep])
        )
    return top.select(F.col(id_col), *[F.col(c) for c in keep], "score")


def dsir_gumbel_sql(id_expr: str, gumbel_salt: str = "dsirg") -> str:
    """DuckDB SQL for the same deterministic Gumbel(0,1) draw."""
    h = keyhash_sql(id_expr, gumbel_salt)
    return f"-ln(-ln(({h} + 0.5) / {float(HASH_SPACE)!r}))"


def dsir_model(
    spark,
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 512,
    alpha: float = 0.5,
    salt: str = "dsir",
) -> DataFrame:
    """DENSE B-row DSIR importance model: (bucket, logw) for EVERY
    bucket 0..B-1, not just buckets the fitting corpora happened to
    hit — an arriving batch can contain grams neither corpus saw, and
    those must score at the smoothing floor rather than drop out.
    Persist with ``.write.parquet(dir)`` and score later batches
    against the frozen model (the production shape: fit once on the
    corpus snapshot, stream-score forever after)."""
    _, tcnt, rcnt, tt, rt = _dsir_counts(
        raw, target, id_col, text_col, n_buckets, salt
    )
    all_b = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    return (
        all_b.join(tcnt, "bucket", "left")
        .join(rcnt, "bucket", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select("bucket", _dsir_logw(alpha, n_buckets))
    )


def dsir_score(
    batch: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 512,
    salt: str = "dsir",
) -> DataFrame:
    """Score an ARRIVING batch against a frozen DSIR model: gram
    explode, broadcast join on the B-row model, one id shuffle for the
    per-doc sum — the corpus that fit the model is never rescanned.
    Returns (id, n_grams, logweight)."""
    bb = dsir_gram_buckets(batch, id_col, text_col, n_buckets, salt)
    return (
        bb.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("logw").alias("logweight"),
        )
    )
