"""Bounded, seeded slice of the curation-primitive fuzzer (round 9).

tools/curation_fuzz.py randomizes chunking (hostile whitespace incl. a
real NBSP word — Java \\s is ASCII; the Python oracle restates that
explicitly), sequence packing (rows longer than the budget span bins)
and deterministic sampling (rate monotonicity + stratified == global
per stratum). Reproduce with ``python tools/curation_fuzz.py --seed S
--case I``.
"""

import numpy as np

from tools.curation_fuzz import (
    gen_chunk_case,
    gen_pack_case,
    gen_sample_case,
    run_chunk_case,
    run_pack_case,
    run_sample_case,
)

SEED = 20260815


def test_curation_fuzz_slice(spark):
    failures = []
    for i in range(12):
        rng = np.random.default_rng(SEED * 1_000_003 + i)
        fam = ("chunk", "pack", "sample")[i % 3]
        if fam == "chunk":
            pdf, ct, ov = gen_chunk_case(rng)
            rec = run_chunk_case(spark, pdf, ct, ov)
        elif fam == "pack":
            pdf, budget, grouped, bound = gen_pack_case(rng)
            rec = run_pack_case(spark, pdf, budget, grouped, bound)
        else:
            pdf, r1, r2, seed, rates = gen_sample_case(rng)
            rec = run_sample_case(spark, pdf, r1, r2, seed, rates)
        if rec is not None:
            failures.append({"i": i, "family": fam, **rec})
    assert failures == []
