"""Bounded, seeded slice of the query fuzzer (round-8 ask #2).

tools/query_fuzz.py generates random typed query trees over the
implemented relational surface (scan -> filter/project -> join ->
agg/window -> orderBy/limit -> distinct), renders each to BOTH PySpark
DataFrame calls and DuckDB SQL, and compares typed-normalized sorted
rows - covering operator-INTERACTION bugs the frozen 87-query registry
structurally cannot. Full-size runs: ``python tools/query_fuzz.py``
(150+ cases per seed); this pins a smaller seeded slice for the suite.
Any mismatch record includes the rendered SQL and a greedily minimized
still-failing variant; reproduce one case with
``python tools/query_fuzz.py --seed S --case I``.
"""

import duckdb
import numpy as np
import pytest

from tools.query_fuzz import (
    _SPARK_SCHEMA,
    gen_case,
    make_tables,
    run_case,
)

SEED = 20260815


@pytest.fixture(scope="module")
def fuzz_env(spark):
    tables = make_tables(np.random.default_rng(SEED), 200)
    con = duckdb.connect()
    sdfs = {}
    for name, pdf in tables.items():
        con.register(name, pdf)
        sdfs[name] = spark.createDataFrame(
            pdf.astype(object).where(pdf.notna(), None), _SPARK_SCHEMA
        ).cache()
        sdfs[name].count()
    yield spark, sdfs, con
    for df in sdfs.values():
        df.unpersist()


def test_query_fuzz_spark_matches_duckdb(fuzz_env):
    spark, sdfs, con = fuzz_env
    failures = []
    for i in range(60):
        case = gen_case(np.random.default_rng(SEED * 1_000_003 + i))
        rec = run_case(case, spark, sdfs, con)
        if rec is not None:
            failures.append({"i": i, "kind": case.kind,
                             "sql": case.to_sql(), **rec})
    assert failures == []
