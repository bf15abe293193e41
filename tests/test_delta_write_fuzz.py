"""Bounded, seeded slice of the delta WRITE-surface fuzzer (round 10).

tools/delta_write_fuzz.py randomizes the shapes the fixed delta tests
pin one instance of: merge_schema evolution interleaved with
constraint additions and predicted-refusal appends (pure-Python
expected-state oracle, NULL-violates CHECK semantics), plus identity
tables (lattice/uniqueness/watermark invariants over random
generate/explicit sequences, both step signs). It found a REAL bug on
its second seed: generation after an explicit insert parked the
watermark off the start+k*step lattice (seed 77 case 3, fixed in
delta_lite with lattice rounding — pinned here as case regressions).
Mutation evidence (constraint_nulls_pass detected 2/16 at seed 77) in
FUZZ_r10.json. Reproduce: python tools/delta_write_fuzz.py --seed S
--case I.
"""

from __future__ import annotations

import numpy as np
import pytest

from tools.delta_write_fuzz import run_case, run_identity_case

SEED = 20260815


def test_delta_write_fuzz_slice(spark):
    failures = []
    for i in range(8):
        rng = np.random.default_rng(SEED * 7_000_003 + i)
        rec = (
            run_identity_case(spark, rng, i)
            if i % 4 == 3
            else run_case(spark, rng, i)
        )
        if rec is not None:
            failures.append({"i": i, **rec})
    assert failures == []


def test_seed77_case3_lattice_regression(spark):
    """The off-lattice generation bug's exact reproducer: explicit
    inserts on a BY DEFAULT identity table move the watermark off the
    lattice; subsequent generation must round up to start + k*step."""
    rng = np.random.default_rng(77 * 7_000_003 + 3)
    assert run_identity_case(spark, rng, 3) is None
