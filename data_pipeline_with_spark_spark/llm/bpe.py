"""Byte-pair-encoding tokenizer: corpus-scale train + apply.

Reference scope: the reference's text utilities stop at whitespace
tokenization (see SURVEY §2.9); this module is part of the
training-data-pipeline extension (token counting with a REAL learned
subword vocabulary instead of the BPE-ish regex estimate in
``text.with_token_estimate``).

Scale doctrine — why this shape survives 100 TB:

- ``bpe_train`` never iterates over the corpus. The corpus reduces to a
  WORD HISTOGRAM in one map-side-combined aggregation (the exchange
  carries (word, count) pairs, never documents), capped to the top
  ``max_vocab`` words by mass — the standard practice (Sennrich et al.
  '16 train on word-frequency dicts; a 100k-word histogram covers
  essentially all token mass of any natural corpus). Merge learning
  then runs driver-side on that small histogram, exactly like
  ``similarity.kmeans_lloyd`` pulls only k centroids.
- ``apply_bpe`` is the documented Arrow-batch escape hatch (iterative
  greedy merging is not expressible in Catalyst): a pandas UDF with the
  merge ranks broadcast in the closure and a PER-BATCH word→pieces memo
  — corpus words repeat constantly, so almost every token is a dict
  hit, not a merge loop.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_with_spark_spark.llm.text import tokens
from data_pipeline_with_spark_spark.util import ensure_min_partitions, exploded

# end-of-word marker, as in Sennrich et al. '16 — lets the tokenizer
# distinguish "low" the word from "low" the prefix of "lower"
EOW = "</w>"

# Word segmentation shared between train and apply. The histogram side
# tokenizes with text.tokens() — Java regex \s+, which is ASCII-only
# ([ \t\n\x0B\f\r]) — so the Python apply side must split on the SAME
# class, not str.split() (all Unicode whitespace): text containing e.g.
# NBSP or U+2028 would otherwise segment into word boundaries the
# training histogram never saw (r5 ADVICE).
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def split_words(text: str) -> list[str]:
    """Lowercase + split on Java ``\\s+`` semantics, empties dropped —
    the single word-boundary definition for BPE train AND apply."""
    return [w for w in _JAVA_WS.split(text.lower()) if w]


def word_histogram(
    df: DataFrame, text_col: str = "text", max_vocab: int = 100_000
) -> DataFrame:
    """(word, count) histogram of the corpus, top ``max_vocab`` by mass
    (count desc, word asc tiebreak — deterministic). One aggregation;
    the exchange carries words, never documents."""
    return (
        ensure_min_partitions(df)
        .transform(lambda d: exploded(d, [], tokens(text_col), "word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("word"))
        .limit(max_vocab)
    )


def _merge_pair(pieces: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(pieces):
        if i + 1 < len(pieces) and pieces[i] == a and pieces[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(pieces[i])
            i += 1
    return tuple(out)


def train_merges_from_histogram(
    hist: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word histogram (pure Python,
    driver-side). Deterministic: the winning pair each round is max by
    (weighted count, then lexicographic pair) so equal-count ties can't
    reorder merges between runs."""
    words: dict[tuple[str, ...], int] = {}
    for w, c in hist:
        pieces = tuple(list(w) + [EOW])
        words[pieces] = words.get(pieces, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for pieces, c in words.items():
            for i in range(len(pieces) - 1):
                p = (pieces[i], pieces[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        # deterministic winner: highest weighted count, then
        # lexicographically smallest pair on ties
        top = max(pair_counts.values())
        best_pair = min(p for p, c in pair_counts.items() if c == top)
        merges.append(best_pair)
        a, b = best_pair
        new_words: dict[tuple[str, ...], int] = {}
        for pieces, c in words.items():
            np = _merge_pair(pieces, a, b)
            new_words[np] = new_words.get(np, 0) + c
        words = new_words
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    max_vocab: int = 100_000,
) -> list[tuple[str, str]]:
    """Train BPE merges on a corpus: one histogram aggregation, then
    driver-side merge learning on the histogram."""
    hist = [
        (r["word"], r["count"]) for r in word_histogram(df, text_col, max_vocab).collect()
    ]
    return train_merges_from_histogram(hist, n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Greedy lowest-rank-first merging of one word (the GPT-2 apply
    order: repeatedly merge the best-ranked adjacent pair)."""
    pieces = tuple(list(word) + [EOW])
    while len(pieces) > 1:
        ranked = [
            (ranks[(pieces[i], pieces[i + 1])], i)
            for i in range(len(pieces) - 1)
            if (pieces[i], pieces[i + 1]) in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        pieces = pieces[:i] + (pieces[i] + pieces[i + 1],) + pieces[i + 2:]
    return pieces


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize ``text_col`` with a trained merge list. Adds
    ``bpe_tokens`` (array<string>) and ``n_bpe_tokens``. Arrow-batched
    pandas UDF with a per-batch word→pieces memo; the merge table rides
    the closure (broadcast once per executor)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def bpe_udf(texts: pd.Series) -> pd.Series:
        memo: dict[str, tuple[str, ...]] = {}

        def enc(text: str) -> list[str]:
            if not isinstance(text, str):
                return []  # NULL text: empty tokenization, like tokens()
            out: list[str] = []
            for w in split_words(text):
                hit = memo.get(w)
                if hit is None:
                    hit = memo[w] = encode_word(w, ranks)
                out.extend(hit)
            return out

        return texts.map(enc)

    out = ensure_min_partitions(df).withColumn("bpe_tokens", bpe_udf(F.col(text_col)))
    return out.withColumn("n_bpe_tokens", F.size("bpe_tokens").cast("bigint"))
