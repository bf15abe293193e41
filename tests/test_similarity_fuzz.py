"""Bounded, seeded slice of the similarity/dedup fuzzer (round 10).

tools/similarity_fuzz.py is the randomized differential for the
approximate ANN/near-dup surfaces — exact Python restatements of
cosine_topk_lsh (plane contract + multi-probe + bucket join + ranking),
minhash signatures / banded LSH candidates / near_dup_pairs' jaccard
(on the from-spec pure-Python XXH64 in tools/xxh64_oracle.py), simhash,
and ivf_topk property checks (bit-exact cosines, rank contiguity, the
exact-duplicate probing guarantee, tie-aware recall floors).
Reproduce failures with ``python tools/similarity_fuzz.py --seed S
--case I``.
"""

import numpy as np
from pyspark.sql import functions as F

from tools.similarity_fuzz import (
    gen_frequent_case,
    gen_ivf_case,
    gen_lsh_case,
    gen_minhash_case,
    gen_simhash_case,
    gen_sketch_case,
    run_frequent_case,
    run_ivf_case,
    run_lsh_case,
    run_minhash_case,
    run_simhash_case,
    run_sketch_case,
)
from tools.xxh64_oracle import spark_xxhash64

SEED = 20260815


def test_similarity_fuzz_slice(spark):
    failures = []
    for i in range(15):
        rng = np.random.default_rng(SEED * 1_000_003 + i)
        fam = ("lsh_topk", "minhash", "simhash", "ivf",
               "sketch")[i % 5]
        if fam == "lsh_topk":
            corpus, queries, p = gen_lsh_case(rng, i)
            rec = run_lsh_case(spark, corpus, queries, p)
        elif fam == "minhash":
            docs, p = gen_minhash_case(rng)
            rec = run_minhash_case(spark, docs, p)
        elif fam == "simhash":
            docs, bits = gen_simhash_case(rng)
            rec = run_simhash_case(spark, docs, bits)
        elif fam == "sketch":
            rows, rsd, accuracy, q = gen_sketch_case(rng)
            rec = run_sketch_case(spark, rows, rsd, accuracy, q)
        else:
            corpus, queries, dup_map, p = gen_ivf_case(rng)
            rec = run_ivf_case(spark, corpus, queries, dup_map, p)
        if rec is not None:
            failures.append({"i": i, "family": fam, **rec})
    assert failures == []


def test_frequent_fuzz_slice_both_modes(spark):
    """Seeded frequent-family slice forced through BOTH threshold
    spellings (round 11 added phi): exactness, bounds, superset, and
    the phi-mode never-refuses contract, vs exact Python counts."""
    failures = []
    for i in range(6):
        rng = np.random.default_rng(SEED * 7_000_003 + i)
        items, parts, k, threshold, _ = gen_frequent_case(rng)
        phi = (0.002, 0.01, 0.05, None, None, None)[i]
        rec = run_frequent_case(spark, items, parts, k, threshold, phi)
        if rec is not None:
            failures.append({"i": i, **rec})
    assert failures == []


def test_xxh64_oracle_matches_spark(spark):
    """The fuzzer's from-spec XXH64 must agree with Spark's xxhash64 on
    every input shape the oracle uses: UTF-8 strings (all tail-length
    classes), 8-byte longs, 4-byte int literals, and seed chaining."""
    strs = ["", "a", "abcd", "abcdefg", "abcdefgh", "x" * 31, "y" * 32,
            "z" * 100, "café élève", "a\xa0b", "é" * 9]
    df = spark.createDataFrame([(s,) for s in strs], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    for r in df.collect():
        assert spark_xxhash64(r.s) == r.h, repr(r.s)
    longs = [0, 1, -1, 42, -(2 ** 63), 2 ** 63 - 1, 987654321987654321]
    df = spark.createDataFrame([(v,) for v in longs], "v long").select(
        "v", F.xxhash64("v").alias("h"),
        F.xxhash64(F.lit(7), "v").alias("h_chain"),
    )
    for r in df.collect():
        assert spark_xxhash64(r.v) == r.h
        assert spark_xxhash64(("int", 7), r.v) == r.h_chain


def test_ivf_dim_pins_index_dimension(spark):
    """Round-10 fix (found by the fuzzer): a stray wrong-dimension
    corpus row sampled FIRST used to silently define the index dim and
    empty the result for a valid query set. With dim= explicit (or the
    modal inference) the 4-dim majority wins regardless of row order."""
    from lcr_etl_upgrade_spark.operators.similarity import ivf_topk

    rows = [(0, [1.0, 2.0, 3.0])]  # 3-dim stray, FIRST
    rows += [(i, [float(i), 1.0, 0.5, -1.0]) for i in range(1, 30)]
    corpus = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>"
    ).coalesce(1)
    queries = spark.createDataFrame(
        [(100, [5.0, 1.0, 0.5, -1.0])], "query_id int, embedding array<float>"
    )
    for kwargs in ({"dim": 4}, {}):
        got = ivf_topk(
            corpus, queries, k=3, n_centroids=2, n_probe=2,
            query_id="query_id", seed=7, **kwargs
        ).collect()
        assert len(got) == 3, kwargs
