"""Benchmark-contamination detection (operators/contamination.py).

Goldens use n=3 so the fixtures stay readable; the papers' n=13 default
is pinned separately. Brute-force oracle: Python set intersection over
whitespace 3-grams of the lowercased texts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.operators.contamination import (
    contamination_hits,
    decontaminate,
    flag_contaminated,
)

BENCH = [
    ("What is the capital of France Paris",),
    ("Compute the derivative of x squared",),
]

DOCS = [
    # verbatim benchmark sentence inside prose -> contaminated
    (0, "As every quiz knows What is the capital of France Paris indeed"),
    # clean prose, no 3-gram overlap
    (1, "The quick brown fox jumps over the lazy dog tonight"),
    # shares only a 2-gram ("the derivative") -> NOT contaminated at n=3
    (2, "We take the derivative here but of something else entirely"),
    # case/whitespace variants still match (tokenization lowercases)
    (3, "WHAT IS THE   CAPITAL OF FRANCE PARIS"),
    # shorter than n tokens -> zero n-grams, never flagged
    (4, "capital of"),
    (5, None),
]


def _ngrams(text: str, n: int) -> set[str]:
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _expected_hits(n: int = 3) -> dict[int, int]:
    bench = set()
    for (t,) in BENCH:
        bench |= _ngrams(t, n)
    out = {}
    for i, t in DOCS:
        if t is None:
            continue
        k = len(_ngrams(t, n) & bench)
        if k:
            out[i] = k
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "id long, text string")
    bench = spark.createDataFrame(BENCH, "text string")
    return docs, bench


def test_contamination_hits_matches_bruteforce(spark, frames):
    docs, bench = frames
    got = {
        r.id: (r.n_hit_ngrams, r.n_doc_ngrams)
        for r in contamination_hits(docs, bench, n=3).collect()
    }
    exp = _expected_hits(3)
    assert {i: h for i, (h, _) in got.items()} == exp
    # denominators: tokens - n + 1 of each contaminated doc
    assert got[0][1] == len(DOCS[0][1].split()) - 2
    assert got[3][1] == len(DOCS[3][1].split()) - 2
    # hit_frac bounded
    for r in contamination_hits(docs, bench, n=3).collect():
        assert 0.0 < r.hit_frac <= 1.0


def test_flag_and_decontaminate(spark, frames):
    docs, bench = frames
    flags = {
        r.id: r.is_contaminated
        for r in flag_contaminated(docs, bench, n=3).collect()
    }
    exp_ids = set(_expected_hits(3))
    assert flags == {i: (i in exp_ids) for i, _ in DOCS}
    kept = {r.id for r in decontaminate(docs, bench, n=3).collect()}
    assert kept == {i for i, _ in DOCS} - exp_ids
    # decontaminate drops its working column
    assert "is_contaminated" not in decontaminate(docs, bench, n=3).columns


def test_min_hits_threshold(spark, frames):
    docs, bench = frames
    exp = _expected_hits(3)
    hi = max(exp.values())
    flags = {
        r.id: r.is_contaminated
        for r in flag_contaminated(docs, bench, n=3, min_hits=hi).collect()
    }
    assert {i for i, v in flags.items() if v} == {
        i for i, k in exp.items() if k >= hi
    }
    with pytest.raises(ValueError, match="min_hits"):
        flag_contaminated(docs, bench, n=3, min_hits=0)


def test_default_n_is_13_and_short_docs_safe(spark, frames):
    docs, bench = frames
    # every fixture doc has < 13 tokens in common runs -> nothing flagged
    out = flag_contaminated(docs, bench)
    assert out.filter(F.col("is_contaminated")).count() == 0


def test_probe_is_broadcast_no_corpus_shuffle_join(spark, frames):
    """The corpus-side probe and the flag join must both be broadcast
    hash joins — a SortMergeJoin would shuffle the 100 TB side."""
    docs, bench = frames
    plan = (
        flag_contaminated(docs, bench, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # opt-out leaves sizing to the planner (no forced hint): still must
    # produce the same rows
    rows_hinted = sorted(
        (r.id, r.is_contaminated)
        for r in flag_contaminated(docs, bench, n=3).collect()
    )
    rows_plain = sorted(
        (r.id, r.is_contaminated)
        for r in flag_contaminated(docs, bench, n=3, broadcast=False).collect()
    )
    assert rows_hinted == rows_plain
