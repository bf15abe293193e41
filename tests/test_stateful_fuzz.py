"""Bounded, seeded slice of the stateful-operator fuzzer (round 9).

tools/stateful_fuzz.py randomizes the SHAPES the frozen oracle queries
pin one instance of: sessionization (duplicate-ts ties, NULL
timestamps, deltas landing EXACTLY on the gap boundary), MERGE upsert
chains (latest-batch-wins restatement), SCD2 application over
dimensions with NULL IS_CURRENT rows, and (round 10) the watermark
incremental LOOP (multi-cycle cumulative sources with standing
watermarks, boundary collisions and NULL keys) and the as-of join
(duplicate instants, <= vs < boundary, NULL-in-value-column atomic
struct travel) — each vs an independent restatement of the documented
semantics. Mutation-detection evidence (gap > vs >=,
batch order flip, NULL-flag hit) is recorded in FUZZ_r09.json.
Reproduce a case with ``python tools/stateful_fuzz.py --seed S --case I``.
"""

import duckdb
import numpy as np
import pytest

from tools.stateful_fuzz import (
    gen_asof_case,
    gen_dyngap_case,
    gen_scd2_case,
    gen_session_case,
    gen_upsert_case,
    gen_watermark_case,
    run_asof_case,
    run_dyngap_case,
    run_scd2_case,
    run_session_case,
    run_upsert_case,
    run_watermark_case,
)

SEED = 20260815


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("SET timezone='UTC'")
    yield con
    con.close()


def test_stateful_fuzz_slice(spark, duck):
    failures = []
    for i in range(24):
        rng = np.random.default_rng(SEED * 1_000_003 + i)
        fam = ("sessionize", "upsert", "scd2", "dyngap",
               "watermark", "asof")[i % 6]
        if fam == "sessionize":
            pdf, gap_us = gen_session_case(rng)
            rec = run_session_case(spark, duck, pdf, gap_us)
        elif fam == "upsert":
            base, batches = gen_upsert_case(rng)
            rec = run_upsert_case(spark, duck, base, batches)
        elif fam == "dyngap":
            (pdf,) = gen_dyngap_case(rng)
            rec = run_dyngap_case(spark, duck, pdf)
        elif fam == "watermark":
            batches, use_key = gen_watermark_case(rng)
            rec = run_watermark_case(spark, batches, use_key)
        elif fam == "asof":
            la, ra, exact = gen_asof_case(rng)
            rec = run_asof_case(spark, la, ra, exact)
        else:
            dim, upd, as_of = gen_scd2_case(rng)
            rec = run_scd2_case(spark, duck, dim, upd, as_of)
        if rec is not None:
            failures.append({"i": i, "family": fam, **rec})
    assert failures == []
