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
