"""Byte-pair-encoding vocabulary induction + encoding, Spark-first.

The classic BPE loop (Sennrich et al. 2016): start from characters (plus
a word-terminal marker), repeatedly count adjacent symbol pairs across
the corpus and merge the most frequent pair, for N rounds; encoding
applies the learned merge table in order. The LLM-pipeline operator the
reference has no analog for — token ops elsewhere in this repo are
whitespace/regex-based (functions/text.py); this is the trainable
tokenizer step of a training-data pipeline.

Distribution strategy (what survives 100 TB):

  * All per-round work runs on the DISTINCT-WORD frequency table, not
    the corpus — vocabulary size, not corpus size (Zipf: orders of
    magnitude smaller). Building it is one groupBy over the exploded
    corpus; everything after is vocab-scale.
  * One round = one pair-count aggregation (map-side partial combine,
    one keyed shuffle) + a ``limit(1)`` collect of the single best pair
    (driver receives ONE row per round — the merge table is driver
    state by nature, like k-means centroids) + one narrow fold
    expression rewriting each word's token string. No cross join, no
    per-row Python.
  * The fold is a codegen'd ``aggregate()`` higher-order function over
    the token array — greedy left-to-right pair merging, exactly the
    reference algorithm, JVM-side.
  * Token strings are space-joined (symbols never contain spaces by
    construction: corpus is normalized to [a-z] + the '_' terminal), so
    a word's tokenization is one flat string — cheap to shuffle, cheap
    to fold.
  * Lineage is cut every ``checkpoint_every`` rounds (localCheckpoint):
    N stacked fold expressions would otherwise exceed Janino's codegen
    limits and fall back to interpreted mode.
  * ENCODE never re-folds the corpus: the learned table already holds
    every training word's final tokenization; encoding is a broadcast
    join of the (vocab-sized) word→tokens dictionary onto the exploded
    text — new/unseen words fall back to character+terminal splitting
    folded through the merge table (vocab-scale work again, because it
    runs on the distinct unseen words only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_frequencies",
    "initial_tokens",
    "bpe_learn",
    "bpe_apply_merges",
    "bpe_encode",
]

#: word-terminal marker appended as its own symbol (so merges can learn
#: word-final units, e.g. ('e','_') -> 'e_'), kept out of [a-z] by
#: construction
TERMINAL = "_"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, cnt) over normalized words: lowercase, [a-z]
    only (whitespace-delimited). One explode + one groupBy; everything
    downstream is vocabulary-scale."""
    words = df.select(
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", " "),
                "\\s+",
            )
        ).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def initial_tokens(words: DataFrame, word_col: str = "word") -> DataFrame:
    """Seed tokenization: each character its own symbol, plus the
    terminal marker — as one space-joined string column ``toks``."""
    # split('abc', '') -> [a, b, c] (Spark drops the trailing empty)
    return words.withColumn(
        "toks",
        F.concat_ws(
            " ",
            F.concat(
                F.split(F.col(word_col), ""), F.array(F.lit(TERMINAL))
            ),
        ),
    )


def _fold_expr(a: str, b: str) -> str:
    """Greedy left-to-right merge of adjacent pair (a, b) over the
    space-joined token string, as one codegen'd aggregate() fold.
    Symbols are [a-z_]+ so inlining them as SQL literals is safe, and
    'ends_with(acc, " a")' identifies the LAST token exactly (tokens
    never contain spaces). Matches the reference algorithm: after a
    merge the new symbol 'ab' cannot chain-merge with the next 'b'."""
    ab = a + b
    return f"""
      aggregate(split(toks, ' '), '', (acc, x) ->
        CASE WHEN acc = '' THEN x
             WHEN (acc = '{a}' OR endswith(acc, ' {a}')) AND x = '{b}'
             THEN concat(left(acc, length(acc) - {len(a)}), '{ab}')
             ELSE concat(acc, ' ', x) END)
    """


_SAFE = set("abcdefghijklmnopqrstuvwxyz_")


def _check_symbol(s: str) -> str:
    if not s or not set(s) <= _SAFE:
        raise ValueError(
            f"BPE symbol {s!r} outside [a-z_] — normalize the corpus "
            "with word_frequencies() first"
        )
    return s


def bpe_learn(
    words: DataFrame,
    num_merges: int,
    checkpoint_every: int = 4,
) -> tuple[list[dict], DataFrame]:
    """Learn ``num_merges`` BPE merges over a (word, cnt) frequency
    table. Returns ``(merge_table, tokenized_words)`` where
    merge_table is ``[{step, a, b, merged, n}, ...]`` in merge order
    and tokenized_words is (word, cnt, toks) at the final state — the
    exact tokenization of every training word, which ``bpe_encode``
    broadcast-joins instead of re-deriving.

    Per round: one vocab-scale pair-count shuffle, a 1-row collect, one
    narrow fold. Ties break on (count desc, pair asc) so the result is
    deterministic and replayable by an external oracle."""
    cur = initial_tokens(words)
    merges: list[dict] = []
    for step in range(1, num_merges + 1):
        pairs = cur.select(
            F.col("cnt"),
            F.explode(
                F.expr(
                    "transform(slice(split(toks, ' '), 1, "
                    "size(split(toks, ' ')) - 1), "
                    "(t, i) -> concat(t, ' ', split(toks, ' ')[i + 1]))"
                )
            ).alias("pair"),
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, n = best[0]["pair"], best[0]["n"]
        a, b = pair.split(" ", 1)
        _check_symbol(a), _check_symbol(b)
        merges.append(
            {"step": step, "a": a, "b": b, "merged": a + b, "n": n}
        )
        cur = cur.withColumn("toks", F.expr(_fold_expr(a, b)))
        if step % checkpoint_every == 0:
            # cut lineage: stacked folds exceed codegen limits
            cur = cur.localCheckpoint(eager=True)
    return merges, cur


def bpe_apply_merges(
    words: DataFrame,
    merges: list[dict],
    word_col: str = "word",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Apply a learned merge table, in order, to NEW words (word_col)
    -> (word, toks). Vocab-scale: run it on distinct unseen words, then
    join back."""
    cur = initial_tokens(words, word_col)
    for i, m in enumerate(merges, start=1):
        cur = cur.withColumn(
            "toks", F.expr(_fold_expr(_check_symbol(m["a"]), _check_symbol(m["b"])))
        )
        if i % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
    return cur


def bpe_encode(
    df: DataFrame,
    text_col: str,
    tokenized_words: DataFrame,
    merges: list[dict] | None = None,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Encode a corpus with a learned vocabulary: explode to words,
    broadcast-join the word->tokens dictionary, and aggregate per
    document (token count + per-word tokenizations re-joined in word
    order). Unseen words (absent from the dictionary) are tokenized by
    folding the merge table over their characters IF ``merges`` is
    given — computed once per DISTINCT unseen word — else they raise.

    Output: id_cols + n_words + n_tokens + toks (the document's full
    space-joined token string)."""
    ids = [F.col(c) for c in id_cols]
    words = df.select(
        *ids,
        F.posexplode(
            F.split(
                F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", " "),
                "\\s+",
            )
        ).alias("pos", "word"),
    ).filter(F.col("word") != "")
    dic = tokenized_words.select("word", "toks")
    joined = words.join(F.broadcast(dic), "word", "left")
    missing = joined.filter(F.col("toks").isNull()).select("word").distinct()
    if missing.head(1):
        if merges is None:
            raise ValueError(
                "corpus contains words outside the trained vocabulary "
                "and no merge table was passed for fallback encoding"
            )
        extra = bpe_apply_merges(missing, merges).select("word", "toks")
        dic = dic.unionByName(extra)
        joined = words.join(F.broadcast(dic), "word", "left")
    per_doc = joined.groupBy(*id_cols).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.size(F.split(F.col("toks"), " "))).alias("n_tokens"),
        F.concat_ws(
            " ", F.transform(F.sort_array(F.collect_list(F.struct("pos", "toks"))), lambda s: s["toks"])
        ).alias("toks"),
    )
    return per_doc
