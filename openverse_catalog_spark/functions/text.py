"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure Catalyst expressions (regexp + array ops) so they run JVM-side
at full scan speed and are DuckDB-oracle verifiable. Heuristics are
deliberately simple + deterministic; swap in real models via pandas UDFs
behind the same column contract when libraries are available.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from openverse_catalog_spark.functions.hashing import hash60

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "la", "los", "es", "una", "que"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + ["it", "for", "on", "with", "as", "at"]


def tokens(c: Column) -> Column:
    return F.filter(F.split(F.lower(c), r"[^a-z0-9]+"), lambda t: t != "")


def token_count(c: Column) -> Column:
    """Whitespace-ish token count (BPE-approximating regex split)."""
    return F.size(tokens(c))


def marker_hits(c: Column, words: list[str]) -> Column:
    """How many tokens of the text are in the marker word list."""
    toks = tokens(c)
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordset, t)))


def lang_id(c: Column) -> Column:
    """Pick the language whose marker-set hit count is highest (ties →
    lexicographically first language code); no hits → 'und'."""
    scored = F.array(
        *[
            F.struct(
                (-marker_hits(c, words)).alias("neg_hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_min(scored)
    return F.when(best["neg_hits"] < 0, best["lang"]).otherwise(F.lit("und"))


def _quality_features(c: Column) -> tuple[Column, Column, Column]:
    """(length_score, alpha_ratio, stop_score) — the shared feature
    triple behind the heuristic mean and the linear classifier."""
    n = F.length(c)
    alpha = F.length(F.regexp_replace(F.lower(c), r"[^a-z]", ""))
    ntok = token_count(c)
    stop = marker_hits(c, EN_STOPWORDS)
    length_score = F.least(n / F.lit(200.0), F.lit(1.0))
    alpha_ratio = F.when(n > 0, alpha / n.cast("double")).otherwise(F.lit(0.0))
    stop_score = F.least(
        F.when(ntok > 0, stop / ntok.cast("double")).otherwise(F.lit(0.0)) * 4.0,
        F.lit(1.0),
    )
    return length_score, alpha_ratio, stop_score


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality heuristic: mean of
      - length score: min(n_chars / 200, 1)
      - alpha ratio: alphabetic chars / all chars
      - stopword score: min(stopword_ratio * 4, 1)  (prose has ~25%+)
    """
    length_score, alpha_ratio, stop_score = _quality_features(c)
    return (length_score + alpha_ratio + stop_score) / 3.0


# default weights for classifier_score: hand-set stand-ins for
# coefficients a logistic regression would learn offline from a labeled
# sample (the CCNet/fastText quality-filter shape); punctuation soup is
# penalized, prose signals rewarded
QUALITY_CLF_WEIGHTS = (1.2, 2.0, 1.5, -3.0)
QUALITY_CLF_BIAS = -1.8


def classifier_score(
    c: Column,
    weights: tuple[float, float, float, float] = QUALITY_CLF_WEIGHTS,
    bias: float = QUALITY_CLF_BIAS,
) -> Column:
    """Model-based quality score: sigmoid of a linear model over
    (length_score, alpha_ratio, stop_score, punct_ratio).

    The classifier-based filtering stage of a training-data pipeline
    (CCNet / fastText-style), with the model reduced to its inference
    form: weights are driver-held constants folded into ONE codegen'd
    expression — scoring 100 TB is a narrow projection, no UDF, no
    shuffle, and swapping in re-trained weights is a literal change."""
    length_score, alpha_ratio, stop_score = _quality_features(c)
    feats = (length_score, alpha_ratio, stop_score, punct_ratio(c))
    z = F.lit(float(bias))
    for w, x in zip(weights, feats):
        z = z + F.lit(float(w)) * x
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def punct_ratio(c: Column) -> Column:
    n = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\-]", ""))
    return F.when(n > 0, punct / n.cast("double")).otherwise(F.lit(0.0))


def fingerprint(c: Column, k: int = 8) -> Column:
    """Order-insensitive document fingerprint: hash of the k smallest
    distinct token hashes (winnowing-style min-k sketch). Equal for
    token-permuted duplicates; robust to small reorderings."""
    hashes = F.array_sort(
        F.transform(F.array_distinct(tokens(c)), lambda t: hash60(t))
    )
    return hash60(F.concat_ws(",", F.slice(hashes, 1, k)))


def repetition_profile(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document repetition stats (Gopher-style quality signals):
    total tokens, distinct tokens, and the most-frequent token's count.
    Zero-token documents are dropped (no fractions exist for them).

    A Counter per row inside one Arrow-batched pass — embarrassingly
    parallel, no shuffle; the expression-only alternative is an
    O(distinct x tokens) interpreted HOF per row, which does not scale."""

    def gen(batches):
        import re
        from collections import Counter

        import pandas as pd

        sep = re.compile(r"[^a-z0-9]+")
        for pdf in batches:
            ids, nt, nd, mx = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in sep.split((text or "").lower()) if t]
                if not toks:
                    continue
                c = Counter(toks)
                ids.append(doc_id)
                nt.append(len(toks))
                nd.append(len(c))
                mx.append(max(c.values()))
            yield pd.DataFrame(
                {id_col: ids, "n_tokens": nt, "n_distinct": nd, "max_count": mx}
            )

    return df.select(id_col, text_col).mapInPandas(
        gen, f"{id_col} long, n_tokens long, n_distinct long, max_count long"
    )


def token_entropy(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document Shannon entropy of the token distribution (nats) —
    the diversity signal complementing repetition_profile's ratio stats:
    keyword-stuffed or template text scores low even when its dup-token
    FRACTION looks normal, because entropy weighs the whole distribution,
    not just the top token. Row-local Counter in one Arrow pass, no
    shuffle; numpy float64 summation agrees with the SQL oracle to well
    inside the rounded 4 decimals. Zero-token docs are dropped."""

    def gen(batches):
        import re
        from collections import Counter

        import numpy as np
        import pandas as pd

        sep = re.compile(r"[^a-z0-9]+")
        for pdf in batches:
            ids, ent = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in sep.split((text or "").lower()) if t]
                if not toks:
                    continue
                counts = np.fromiter(
                    Counter(toks).values(), dtype="float64"
                )
                p = counts / counts.sum()
                ids.append(doc_id)
                ent.append(float(-(p * np.log(p)).sum()))
            yield pd.DataFrame({id_col: ids, "entropy": ent})

    return df.select(id_col, text_col).mapInPandas(
        gen, f"{id_col} long, entropy double"
    )


def readability_flesch(c: Column) -> Column:
    """Flesch reading-ease: 206.835 - 1.015*(words/sentences) -
    84.6*(syllable_groups/words), with the classic heuristics —
    sentences = non-empty [.!?]+ segments (min 1), syllables = vowel-
    group runs ([aeiouy]+) over the lowered text. Pure codegen'd
    expression: scoring is a narrow projection at any corpus size.
    NULL for zero-word docs (no reading ease exists for them)."""
    words = token_count(c)
    sentences = F.greatest(
        F.size(F.filter(F.split(c, r"[.!?]+"), lambda s: F.trim(s) != "")),
        F.lit(1),
    )
    syllables = F.size(
        F.filter(F.split(F.lower(c), r"[^aeiouy]+"), lambda s: s != "")
    )
    return F.when(
        words > 0,
        F.lit(206.835)
        - F.lit(1.015) * (words / sentences.cast("double"))
        - F.lit(84.6) * (syllables / words.cast("double")),
    )
