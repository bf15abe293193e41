"""Bounded, seeded slice of the dirty-value pipeline fuzzer (round-9
ask #1).

tools/pipeline_fuzz.py generates random TableSpecs (random target types
from the reference's palette, case-mangled mappings, missing/extra
source columns, ETL_* fallbacks, future-cap subsets) x random dirty
all-string corpora, runs the REAL conform->cleanse->enrich pipeline
(``pipeline.transform_table``) and compares against a DuckDB SQL
restatement of the documented C1-C10/F3-F5 semantics — the one major
surface previously covered only by builder-authored fixtures. Full-size
runs: ``python tools/pipeline_fuzz.py`` (120 cases per seed); this pins
a smaller seeded slice for the suite. Reproduce one case with
``python tools/pipeline_fuzz.py --seed S --case I``.
"""

import duckdb
import numpy as np
import pytest

from tools.pipeline_fuzz import gen_spec, make_raw, run_case

SEED = 20260815


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("SET timezone='UTC'")
    yield con
    con.close()


def test_pipeline_fuzz_spark_matches_duckdb(spark, duck):
    failures = []
    for i in range(25):
        rng = np.random.default_rng(SEED * 1_000_003 + i)
        cols, extra_srcs, cap_cols, as_of = gen_spec(rng)
        pdf = make_raw(rng, cols, extra_srcs, 80)
        rec = run_case(spark, duck, cols, extra_srcs, cap_cols, as_of,
                       pdf)
        if rec is not None:
            failures.append({
                "i": i, "as_of": as_of,
                "cols": [(c.name, c.kind, c.src, c.mapped)
                         for c in cols],
                **rec,
            })
    assert failures == []


def test_pipeline_fuzz_slash_date_regression(spark, duck):
    """Pin the divergence the fuzzer's own first run surfaced: a DuckDB
    try_cast-based native restatement swallowed Y/m/d SLASH dates that
    Spark's native parser rejects (they must take the NY-localized
    fuzzy path). gen at seed 1 / case 2 contained '2023/10/02'."""
    rng = np.random.default_rng(1 * 1_000_003 + 2)
    cols, extra_srcs, cap_cols, as_of = gen_spec(rng)
    pdf = make_raw(rng, cols, extra_srcs, 120)
    assert run_case(
        spark, duck, cols, extra_srcs, cap_cols, as_of, pdf
    ) is None


def test_residual_scrub_backfill_fuzz(spark, duck):
    """F4-standalone (scrub_residual_garbage on string staging columns,
    ETL_* -> as_of) composed with C10 (backfill_modify_date), vs the
    DuckDB restatement (global-flag regexp_replace — DuckDB strips only
    the first occurrence without 'g', a trap the mutation check in
    FUZZ_r09.json proves this slice would catch)."""
    from tools.pipeline_fuzz import (
        gen_residual_case,
        make_residual_raw,
        run_residual_case,
    )

    failures = []
    for i in range(12):
        rng = np.random.default_rng(SEED * 1_000_003 + i)
        cols, scrub_cols, as_of = gen_residual_case(rng)
        pdf = make_residual_raw(rng, cols, 80)
        rec = run_residual_case(spark, duck, cols, scrub_cols, as_of,
                                pdf)
        if rec is not None:
            failures.append({"i": i, "cols": cols, "scrub": scrub_cols,
                             **rec})
    assert failures == []


def test_pipeline_fuzz_native_only_mode(spark, duck):
    """fuzzy=False (native-only parsing, the transform_table flag):
    fuzzy-format values must come out NULL instead of NY-localized —
    the oracle drops its strptime cascade accordingly."""
    failures = []
    for i in range(8):
        rng = np.random.default_rng((SEED + 7) * 1_000_003 + i)
        cols, extra_srcs, cap_cols, as_of = gen_spec(rng)
        pdf = make_raw(rng, cols, extra_srcs, 80)
        rec = run_case(spark, duck, cols, extra_srcs, cap_cols, as_of,
                       pdf, fuzzy=False)
        if rec is not None:
            failures.append({"i": i, **rec})
    assert failures == []
