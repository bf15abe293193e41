"""BPE training/apply (operators/bpe.py) vs an independent unindexed
restatement: the indexed merge loop must learn the IDENTICAL merge
sequence as recount-everything-from-scratch, on randomized corpora."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.operators.bpe import (
    END,
    bpe_token_count,
    encode_word,
    learn_merges,
    train_bpe,
    word_counts,
)


def _learn_reference(counts, num_merges):
    """Unindexed restatement: recount every pair over every word at
    every step. Same tie-break as the engine (count, then pair)."""
    words = [list(w) + [END] for w, _ in counts]
    freqs = [c for _, c in counts]
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for sym, f in zip(words, freqs):
            for pair in zip(sym, sym[1:]):
                pc[pair] += f
        if not pc:
            break
        best = max(pc.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        for i, sym in enumerate(words):
            out, j = [], 0
            while j < len(sym):
                if (
                    j + 1 < len(sym)
                    and sym[j] == best[0]
                    and sym[j + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            words[i] = out
    return merges


def _rand_counts(rng, vocab=120):
    alphabet = list("abcdefgh")
    out = {}
    for _ in range(vocab):
        w = "".join(
            rng.choice(alphabet)
            for _ in range(int(rng.integers(1, 9)))
        )
        out[w] = out.get(w, 0) + int(rng.integers(1, 50))
    return sorted(out.items())


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_indexed_loop_matches_unindexed_restatement(seed):
    rng = np.random.default_rng(seed)
    counts = _rand_counts(rng)
    n = int(rng.integers(5, 60))
    assert learn_merges(counts, n) == _learn_reference(counts, n)


def test_overlapping_pairs_in_one_word():
    # 'aaaa' with pair (a,a): left-to-right gives aa+aa, and the index
    # must survive a pair whose merge re-creates itself
    counts = [("aaaa", 10), ("ab", 1)]
    got = learn_merges(counts, 3)
    assert got == _learn_reference(counts, 3)
    assert got[0] == ("a", "a")


def test_word_counts_top_k_and_determinism(spark):
    df = spark.createDataFrame(
        [("b b b a a c",), ("A a  c",), (None,)], ["text"]
    )
    wc = word_counts(df, "text", max_words=2)
    assert wc == [("a", 4), ("b", 3)]  # lowercased, ties by count


def test_encode_word_uses_merge_ranks():
    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lower", ranks) == ["low", "er", END]
    assert encode_word("xyz", ranks) == ["x", "y", "z", END]


def test_bpe_token_count_matches_python(spark):
    rng = np.random.default_rng(7)
    texts = [
        " ".join(
            "".join(rng.choice(list("abcd")) for _ in range(int(rng.integers(1, 6))))
            for _ in range(int(rng.integers(0, 12)))
        )
        for _ in range(40)
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    merges = train_bpe(df, "text", num_merges=30, max_words=1000)
    got = {
        r["text"]: r["bpe_tokens"]
        for r in bpe_token_count(df, "text", merges).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    for t in texts:
        expect = sum(len(encode_word(w, ranks)) for w in t.lower().split())
        assert got[t] == expect, t


def test_more_merges_never_increase_token_count(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat the cat",)] * 3, ["text"]
    )
    m_few = train_bpe(df, "text", num_merges=2)
    m_many = train_bpe(df, "text", num_merges=20)
    few = bpe_token_count(df, "text", m_few).first()["bpe_tokens"]
    many = bpe_token_count(df, "text", m_many).first()["bpe_tokens"]
    assert many <= few
    # and with zero merges every char + </w> is a token
    zero = bpe_token_count(df, "text", []).first()["bpe_tokens"]
    words = "the cat sat on the mat the cat".split()
    assert zero == sum(len(w) + 1 for w in words)


def test_null_and_empty_text(spark):
    df = spark.createDataFrame([(None,), ("",), ("  ",)], ["text"])
    out = bpe_token_count(df, "text", [("a", "b")]).collect()
    assert [r["bpe_tokens"] for r in out] == [0, 0, 0]
