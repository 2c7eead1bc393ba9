"""Distributed linear-classifier training (logistic regression by
full-batch gradient descent) over document feature columns.

A training-data-pipeline operator beyond the reference's surface (the
reference's closest analog is its static quality gates — required-field
drops and tag blacklists, ``common/loader/sql.py`` /
``common/storage/media.py:102-135`` — which are hand-written rules, not
learned): modern corpus curation trains a small fasttext-style quality
or language classifier on labeled examples and scores every document
with it (GPT-3's WebText-vs-CommonCrawl LR filter, CCNet's fasttext
gate). This module is the Spark-native trainer + scorer for that tier:
features are plain numeric columns (the text-analysis operators in
``functions/text.py`` produce them), the model is a dim+1 weight
vector, and both passes are expression-only scans.

Spark-first design (same driver-literal iteration discipline as k-means
centroids, PCA's component vector, and BPE's merge table):

- Weights live on the DRIVER (dim+1 doubles). Each GD round is ONE
  corpus scan: the margin/sigmoid is a whole-stage-codegen expression
  against the weight literals (no UDF, no join), and the gradient is a
  single aggregation with dim+1 map-side partial sums — the shuffle
  moves one dim+1-row partial per partition regardless of input size.
- Scoring is a pure SELECT (margin expression against the final weight
  literals): zero shuffles, fully pushdown-friendly.

At 100 TB the per-round cost is one scan (mitigate with a cached
column-pruned projection, exactly like the kmeans base) and the driver
state stays dim+1 doubles; rounds are the only serialization points.

Determinism contract (what the DuckDB oracle pins by replaying every
round in SQL): w starts at ZERO, each round applies

    w  <-  w - lr * (1/n) * sum_i x_i * (sigmoid(x_i . w) - y_i)

with features folded in index order. Cross-engine float drift is
per-sum ~1e-15 (summation order) plus <=1 ulp in exp(); after a bounded
number of rounds the weights agree to far better than the 6 decimals
the oracle rounds to.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _margin(x_cols: list[Column], weights: list[float]) -> Column:
    """x . w as a pure expression: fold in index order so Spark and the
    oracle agree on the (float-associative) addition order."""
    if len(x_cols) != len(weights):
        raise ValueError(
            f"{len(x_cols)} feature columns but {len(weights)} weights"
        )
    m = F.lit(0.0)
    for c, w in zip(x_cols, weights):
        m = m + c.cast("double") * F.lit(float(w))
    return m


def sigmoid(m: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-m))


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    rounds: int = 3,
    lr: float = 0.5,
    add_bias: bool = True,
) -> list[float]:
    """Full-batch logistic-regression GD: returns the learned weights
    (bias LAST when ``add_bias``). ``label_col`` must be 0/1 (cast to
    double). One scan + one dim+1-column aggregate per round; weights
    round-trip through the driver as literals."""
    cols = [F.col(c) for c in feature_cols]
    if add_bias:
        cols = cols + [F.lit(1.0)]
    d = len(cols)
    base = df.select(
        *[c.cast("double").alias(f"__x{j}") for j, c in enumerate(cols)],
        F.col(label_col).cast("double").alias("__y"),
    ).localCheckpoint(eager=False)
    xs = [F.col(f"__x{j}") for j in range(d)]

    w = [0.0] * d
    for _ in range(rounds):
        err = sigmoid(_margin(xs, w)) - F.col("__y")
        row = base.agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(xs[j] * err).alias(f"g{j}") for j in range(d)],
        ).head()
        n = int(row["n"])
        if n == 0:
            raise ValueError("logreg_train: input has no rows")
        w = [w[j] - lr * float(row[f"g{j}"]) / n for j in range(d)]
    return w


def logreg_score(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    out_col: str = "prob",
    add_bias: bool = True,
) -> DataFrame:
    """Score with a trained model: appends ``out_col`` = P(y=1 | x).
    Pure expression against the weight literals — no shuffle, no UDF;
    filters on the probability push down with the scan."""
    cols = [F.col(c) for c in feature_cols]
    if add_bias:
        cols = cols + [F.lit(1.0)]
    return df.withColumn(out_col, sigmoid(_margin(cols, weights)))
