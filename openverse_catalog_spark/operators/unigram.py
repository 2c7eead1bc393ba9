"""Unigram language-model tokenizer (SentencePiece-style), Spark-first.

Kudo 2018's unigram LM is the other trainable subword tokenizer
families ship besides BPE (operators/bpe.py): score every candidate
piece by a unigram probability, segment each word by the
maximum-likelihood piece sequence (Viterbi), and iterate EM — the
E-step re-segments the corpus under the current scores, the M-step
re-estimates scores from piece usage. This module implements the
deterministic Viterbi-EM variant (hard counts from the single best
segmentation rather than forward-backward expectations — the
documented simplification that keeps every round exactly replayable
by a SQL oracle, the same bar operators/bpe.py set).

Determinism contract (what makes the oracle byte-exact):

  * Scores are integer MICRO-LOGS: ``floor((ln(u) - ln(total)) * 1e6
    + 0.5)`` — path scores are SUMS OF INT64, exact and
    addition-order-independent, so no float-ULP tie ambiguity can
    creep in between the Spark DP and the SQL replay.
  * Viterbi ties break on (score desc, first-piece-length desc,
    recursively) — equivalently: the lexicographically GREATEST
    piece-length digit string. Within one word, equal length sequences
    ARE the same segmentation, so the order is total.
  * The seed vocabulary is every substring of length <= max_piece_len
    with corpus usage >= min_count, plus every single character
    (coverage guarantee); after a round, only pieces actually USED by
    some best segmentation survive — every word stays segmentable
    because its own round-N segmentation is made of surviving pieces.

Distribution strategy (the 100 TB shape, same as BPE):

  * Everything runs on the DISTINCT-WORD frequency table, never the
    corpus. Seeding is one explode + groupBy; each EM round is one
    Arrow-batched Viterbi pass over distinct words (DP is
    O(len * max_piece_len) per word) + one vocab-scale usage
    aggregation.
  * The score table is MODEL STATE (like k-means centroids or the BPE
    merge table): it collects to the driver (size-capped, raise past
    the cap) and broadcasts into the DP.
  * Encoding broadcast-joins the word->pieces dictionary onto the
    exploded corpus; unseen words Viterbi-segment once per distinct
    word.

Words longer than ``max_word_len`` are dropped from BOTH training and
encoding (a production SentencePiece would byte-fallback; the cap also
bounds the oracle's path enumeration).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "unigram_word_frequencies",
    "seed_pieces",
    "piece_scores",
    "viterbi_tokenize",
    "unigram_learn",
    "unigram_encode",
]

MAX_WORD_LEN = 12
MAX_PIECE_LEN = 4
LOG_SCALE = 1_000_000
MAX_VOCAB_COLLECT = 200_000


def unigram_word_frequencies(
    df: DataFrame, text_col: str = "text", max_word_len: int = MAX_WORD_LEN
) -> DataFrame:
    """Corpus -> (word, cnt): lowercase [a-z]+ words, length-capped."""
    words = df.select(
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", " "),
                "\\s+",
            )
        ).alias("word")
    ).filter(
        (F.col("word") != "") & (F.length("word") <= max_word_len)
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def seed_pieces(
    words: DataFrame,
    max_piece_len: int = MAX_PIECE_LEN,
    min_count: int = 2,
) -> DataFrame:
    """Candidate pieces: every substring of length <= max_piece_len,
    usage = count-weighted occurrences; single characters always kept
    (coverage), longer pieces kept at usage >= min_count. One explode +
    one groupBy over the distinct-word table — vocab-scale."""
    subs = words.select(
        F.col("cnt"),
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(word)), i -> "
                f"transform(sequence(1, least({int(max_piece_len)}, "
                "length(word) - i + 1)), l -> substring(word, i, l))))"
            )
        ).alias("piece"),
    )
    usage = subs.groupBy("piece").agg(F.sum("cnt").alias("usage"))
    return usage.filter(
        (F.length("piece") == 1) | (F.col("usage") >= int(min_count))
    )


def piece_scores(usage_df: DataFrame) -> dict[str, int]:
    """(piece, usage) -> {piece: micro-log score}: ``floor((ln(u) -
    ln(total)) * 1e6 + 0.5)`` as int — the model state. Collect is
    vocab-scale and capped."""
    rows = usage_df.select("piece", "usage").limit(
        MAX_VOCAB_COLLECT + 1
    ).collect()
    if len(rows) > MAX_VOCAB_COLLECT:
        raise ValueError(
            f"unigram vocabulary exceeds {MAX_VOCAB_COLLECT} pieces; "
            "raise min_count or lower max_piece_len"
        )
    total = sum(r["usage"] for r in rows)
    lt = math.log(total)
    return {
        r["piece"]: int(
            math.floor((math.log(r["usage"]) - lt) * LOG_SCALE + 0.5)
        )
        for r in rows
    }


def _segment(word: str, scores: dict[str, int], max_piece_len: int):
    """Right-to-left DP: best suffix segmentation per position.
    Candidate key = (suffix score, piece length) maximized — the
    (score desc, length-digits desc) total order. Returns the piece
    list, or None when no piece covers some position (impossible while
    every character is in the vocabulary)."""
    n = len(word)
    best: list[tuple[int, int] | None] = [None] * (n + 1)
    best[n] = (0, 0)
    for i in range(n - 1, -1, -1):
        top = None
        for ln in range(1, min(max_piece_len, n - i) + 1):
            nxt = best[i + ln]
            if nxt is None:
                continue
            lp = scores.get(word[i: i + ln])
            if lp is None:
                continue
            key = (lp + nxt[0], ln)
            if top is None or key > top:
                top = key
        best[i] = top
    if best[0] is None:
        return None
    out, i = [], 0
    while i < n:
        ln = best[i][1]
        out.append(word[i: i + ln])
        i += ln
    return out


def viterbi_tokenize(
    words: DataFrame,
    scores: dict[str, int],
    max_piece_len: int = MAX_PIECE_LEN,
    word_col: str = "word",
) -> DataFrame:
    """Distinct words -> (word, [cnt,] toks, score): the
    maximum-likelihood segmentation under ``scores``, Arrow-batched
    (one DP per distinct word, O(len * max_piece_len))."""
    import pandas as pd

    spark = words.sparkSession
    bc = spark.sparkContext.broadcast(scores)
    has_cnt = "cnt" in words.columns
    schema = (
        f"{word_col} string, " + ("cnt long, " if has_cnt else "")
        + "toks string, score long"
    )

    def go(batches):
        sc = bc.value
        for pdf in batches:
            toks, total = [], []
            for w in pdf[word_col]:
                seg = _segment(str(w), sc, max_piece_len)
                if seg is None:
                    toks.append(None)
                    total.append(None)
                else:
                    toks.append(" ".join(seg))
                    total.append(sum(sc[p] for p in seg))
            out = {word_col: pdf[word_col]}
            if has_cnt:
                out["cnt"] = pdf["cnt"]
            out["toks"] = toks
            out["score"] = total
            yield pd.DataFrame(out)

    cols = [word_col] + (["cnt"] if has_cnt else [])
    return words.select(*cols).mapInPandas(go, schema)


def unigram_learn(
    words: DataFrame,
    rounds: int = 2,
    max_piece_len: int = MAX_PIECE_LEN,
    min_count: int = 2,
) -> tuple[dict[str, int], DataFrame, DataFrame]:
    """Viterbi-EM: seed scores from substring counts, then ``rounds``
    of (re-segment distinct words, re-estimate scores from usage).
    Returns (scores, usage_df, tokenized_words) at the final state —
    usage_df is (piece, usage, lp) and tokenized_words the exact
    segmentation of every training word (what encode joins)."""
    scores = piece_scores(seed_pieces(words, max_piece_len, min_count))
    usage = None
    for _ in range(rounds):
        tok = viterbi_tokenize(words, scores, max_piece_len)
        usage = (
            tok.select(
                F.col("cnt"),
                F.explode(F.split("toks", " ")).alias("piece"),
            )
            .groupBy("piece")
            .agg(F.sum("cnt").alias("usage"))
            .localCheckpoint(eager=False)
        )
        scores = piece_scores(usage)
    # final state: the words re-segmented under the FINAL scores (the
    # dictionary encode joins), and the score table itself
    tok = viterbi_tokenize(words, scores, max_piece_len)
    lp_df = words.sparkSession.createDataFrame(
        sorted(scores.items()), "piece string, lp long"
    )
    usage_df = usage.join(lp_df, "piece", "inner")
    return scores, usage_df, tok


def unigram_encode(
    df: DataFrame,
    text_col: str,
    tokenized_words: DataFrame,
    scores: dict[str, int],
    id_cols: tuple[str, ...] = ("doc_id",),
    max_word_len: int = MAX_WORD_LEN,
    max_piece_len: int = MAX_PIECE_LEN,
) -> DataFrame:
    """Encode a corpus under learned scores: explode to length-capped
    words, broadcast-join the word->pieces dictionary, Viterbi-segment
    unseen distinct words once, aggregate per document. Output:
    id_cols + n_words + n_tokens + toks (space-joined, word order)."""
    ids = [F.col(c) for c in id_cols]
    words = df.select(
        *ids,
        F.posexplode(
            F.split(
                F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", " "),
                "\\s+",
            )
        ).alias("pos", "word"),
    ).filter(
        (F.col("word") != "") & (F.length("word") <= max_word_len)
    )
    dic = tokenized_words.select("word", "toks")
    joined = words.join(F.broadcast(dic), "word", "left")
    missing = (
        joined.filter(F.col("toks").isNull()).select("word").distinct()
    )
    if missing.head(1):
        extra = viterbi_tokenize(missing, scores, max_piece_len).select(
            "word", "toks"
        )
        if extra.filter(F.col("toks").isNull()).head(1):
            raise ValueError(
                "corpus contains words not coverable by the learned "
                "pieces (a character fell out of the vocabulary)"
            )
        dic = dic.unionByName(extra)
        joined = words.join(F.broadcast(dic), "word", "left")
    return joined.groupBy(*id_cols).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.size(F.split(F.col("toks"), " "))).alias("n_tokens"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "toks"))),
                lambda s: s["toks"],
            ),
        ).alias("toks"),
    )
