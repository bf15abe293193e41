"""Byte-pair-encoding tokenizer training + application [EXT].

The scale split mirrors how production tokenizers are actually trained:
the CORPUS-sized work — word frequency counting — is one Spark
aggregation (map-side combined, shuffle carries distinct words only);
the merge-learning loop runs DRIVER-side over that vocabulary table,
whose size is bounded by ``max_words`` regardless of corpus bytes
(BPE statistics converge on the frequency head; the long tail adds
per-word noise, not signal — the same truncation every practical
trainer applies). Applying the learned merges is an Arrow-batched
pandas UDF with the merge table broadcast in the closure — no shuffle,
no per-row Python.

The merge loop is the classic Sennrich et al. (2016, public) algorithm
with an inverted pair->words index so each merge touches only the words
containing its pair — O(affected) per step, not O(vocab): 2k merges
over a 50k-word table stay interactive. tests/test_bpe.py checks the
learned merges and tokenizations against an INDEPENDENT unindexed
restatement (recount-everything-each-step) on randomized corpora, so an
index-maintenance bug diverges immediately.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word sentinel, per the original formulation


def word_counts(
    df: DataFrame,
    text_col: str,
    max_words: int = 50_000,
    lowercase: bool = True,
) -> list[tuple[str, int]]:
    """The distributed half: (word, count) for the ``max_words`` most
    frequent whitespace words. One groupBy (map-side combined) + a
    bounded top-k; the driver receives at most ``max_words`` rows."""
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    toks = F.split(F.regexp_replace(c, r"^\s+|\s+$", ""), r"\s+")
    words = df.select(F.explode(toks).alias("w")).filter(F.col("w") != "")
    top = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")  # deterministic tie-break
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in top]


def learn_merges(
    counts: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """The classic BPE loop over a (word, count) table: repeatedly merge
    the most frequent adjacent symbol pair (ties broken by pair order —
    deterministic). Indexed: pair -> set of word ids containing it, so
    each step rescans only affected words."""
    words: list[list[str]] = [list(w) + [END] for w, _ in counts]
    freqs = [c for _, c in counts]
    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for i, sym in enumerate(words):
        for a, b in zip(sym, sym[1:]):
            pair_counts[(a, b)] += freqs[i]
            pair_words[(a, b)].add(i)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for i in list(pair_words[best]):
            sym = words[i]
            f = freqs[i]
            # remove old pair contributions of this word
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] -= f
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                pair_words[(a, b)].discard(i)
            # apply the merge within the word (left-to-right)
            out: list[str] = []
            j = 0
            while j < len(sym):
                if (
                    j + 1 < len(sym)
                    and sym[j] == best[0]
                    and sym[j + 1] == best[1]
                ):
                    out.append(merged)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            words[i] = out
            # re-add new pair contributions
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += f
                pair_words[(a, b)].add(i)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    max_words: int = 50_000,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Distributed word counts -> driver merge loop. Returns the ordered
    merge list (the whole learned state of a BPE tokenizer)."""
    return learn_merges(
        word_counts(df, text_col, max_words, lowercase), num_merges
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first application of the merge table to one
    word — the standard BPE encode."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_token_count(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Per-row BPE token count under the learned merges: Arrow-batched
    (mapInPandas-free — a scalar pandas UDF keeps the plan a narrow
    projection), merge table broadcast in the closure, per-batch word
    memoization (zipfian text makes the cache hit rate ~the corpus
    head's mass)."""
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf("long")
    def _count(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def one(t):
            if t is None:
                return 0
            total = 0
            for w in (t.lower() if lowercase else t).split():
                n = cache.get(w)
                if n is None:
                    n = len(encode_word(w, ranks))
                    cache[w] = n
                total += n
            return total

        return texts.map(one)

    return df.withColumn(out_col, _count(F.col(text_col)))
