"""Property-based tests (hypothesis): tolerant coercions are total
functions with closed output ranges; conformance preserves shape. Each
property evaluates one Spark job over the whole generated batch."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.functions.cleansing import (
    boolean_expr,
    boolean_string_expr,
)
from lcr_etl_upgrade_spark.operators.cleanse import timestamp_expr

text_rows = st.lists(
    st.one_of(st.none(), st.text(max_size=30)), min_size=1, max_size=50
)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(values=text_rows)
@SETTINGS
def test_boolean_expr_total_and_closed(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r.out for r in df.select(boolean_expr(F.col("v")).alias("out")).collect()]
    assert all(g in (True, False, None) for g in got)
    # token contract: recognized tokens always map, everything else nulls
    for v, g in zip(values, got):
        token = v.strip().lower() if isinstance(v, str) else None
        if token in ("true", "1", "yes", "t"):
            assert g is True or v != v.strip()  # untrimmed stays unrecognized
        elif token in ("false", "0", "no", "f"):
            assert g is False or v != v.strip()


@given(values=text_rows)
@SETTINGS
def test_boolean_string_passthrough_property(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [
        r.out for r in df.select(boolean_string_expr(F.col("v")).alias("out")).collect()
    ]
    for v, g in zip(values, got):
        if v is None:
            assert g is None
        else:
            # output is TRUE/FALSE or the input untouched — never mangled
            assert g in ("TRUE", "FALSE") or g == v


@given(values=text_rows)
@SETTINGS
def test_timestamp_expr_never_throws(spark, values):
    """ANSI mode throws on malformed casts; the cleansing expression must
    stay total over arbitrary junk (fuzzy path included)."""
    df = spark.createDataFrame([(v,) for v in values], "v string")
    out = df.select(timestamp_expr(F.col("v")).alias("out")).collect()
    assert len(out) == len(values)


@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 50)),  # (key, ts)
        min_size=1,
        max_size=20,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 50)),
        min_size=0,
        max_size=20,
    ),
)
@SETTINGS
def test_asof_join_equals_reference_semantics(spark, lefts, rights):
    """asof_join_backward == 'latest right with ts <= left ts per key',
    computed independently in Python, on arbitrary key/ts multisets
    (duplicate timestamps included — ties resolve to max value, matching
    the operator's (ts, value) ordering)."""
    from lcr_etl_upgrade_spark.operators.joins import asof_join_backward

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)], "pid long, k long, lts long"
    )
    r_schema = "k long, rts long, rval double"
    r_rows = [(k, t, float(t * 10 + k)) for k, t in rights]
    right = spark.createDataFrame(r_rows, r_schema)
    got = {
        r.pid: (r.rts, r.rval)
        for r in asof_join_backward(left, right, "k", "lts", "rts", ["rval"]).collect()
    }
    for i, (k, t) in enumerate(lefts):
        eligible = [(rt, float(rt * 10 + rk)) for rk, rt in rights if rk == k and rt <= t]
        expect = max(eligible) if eligible else (None, None)
        assert got[i] == expect, (i, k, t, got[i], expect)


@given(
    n_cols=st.integers(min_value=1, max_value=5),
    n_missing=st.integers(min_value=0, max_value=3),
)
@SETTINGS
def test_conform_schema_invariant(spark, n_cols, n_missing):
    """conform_columns always yields exactly the target schema, in order,
    regardless of which source columns exist."""
    from lcr_etl_upgrade_spark.operators.conform import conform_columns

    src_cols = [f"c{i}" for i in range(n_cols)]
    df = spark.createDataFrame([tuple("x" for _ in src_cols)], src_cols)
    target = [(f"T{i}", "string") for i in range(n_cols + n_missing)]
    mapping = {f"c{i}": f"T{i}" for i in range(n_cols)}
    out = conform_columns(df, mapping, target)
    assert out.columns == [name for name, _ in target]
    row = out.collect()[0]
    assert all(row[f"T{i}"] == "x" for i in range(n_cols))
    assert all(row[f"T{i}"] is None for i in range(n_cols, n_cols + n_missing))
