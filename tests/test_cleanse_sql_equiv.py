"""SQL-text cleansing expressions must match their Column twins exactly.

The r13 optimization round rebuilt the wide cleansing/conformance
projections as parsed SQL strings (one py4j round-trip instead of 2-4 per
Column call — ~0.3 s of driver time per 100-column build). These tests pin
value-level equality between each *_sql builder and its Column form on
adversarial inputs, and end-to-end equality of transform_table's folded
final projection against the standalone operators it replaced.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lcr_etl_upgrade_spark.functions.cleansing import (
    boolean_expr,
    boolean_expr_sql,
    boolean_string_expr,
    boolean_string_expr_sql,
    invalid_timestamp_predicate,
    invalid_timestamp_predicate_sql,
    quote_ident,
)
from lcr_etl_upgrade_spark.operators.cleanse import (
    as_of_sql,
    coerce_expr,
    coerce_sql,
    scrub_expr,
    scrub_sql,
)

ADVERSARIAL = [
    None,
    "",
    "t",
    "T",
    "true",
    "TRUE",
    "false",
    "0",
    "1",
    "yes",
    "no",
    "f",
    "x",
    "abc",
    "--",
    "garbage",
    "NaNope",
    "2024-01-02 03:04:05",
    "2024-01-02",
    "99-1-1",
    "1e3",
    "  true  ",
    "2024-13-45",
    "   ",
    "123",
    "1234",
    "00:00",
    "9999-12-31 23:59:59",
    "' OR `x` --",
    'he said "hi"',
    "back\\slash",
    "tab\there",
]


@pytest.fixture(scope="module")
def strings_df(spark):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(ADVERSARIAL)], "id long, v string"
    )


def _assert_twin(df, col_expr, sql_text):
    got = df.select(
        F.col("id"), col_expr.alias("a"), F.expr(sql_text).alias("b")
    ).collect()
    for row in got:
        assert row["a"] == row["b"], (
            f"id={row['id']}: column={row['a']!r} sql={row['b']!r}"
        )


def test_invalid_timestamp_predicate_sql(strings_df):
    _assert_twin(
        strings_df,
        invalid_timestamp_predicate(F.col("v")),
        invalid_timestamp_predicate_sql("v"),
    )


def test_boolean_expr_sql(strings_df):
    _assert_twin(strings_df, boolean_expr(F.col("v")), boolean_expr_sql("v"))


def test_boolean_string_expr_sql(strings_df):
    _assert_twin(
        strings_df, boolean_string_expr(F.col("v")), boolean_string_expr_sql("v")
    )


def test_scrub_sql(strings_df):
    _assert_twin(
        strings_df,
        scrub_expr(F.col("v").cast("string")),
        scrub_sql("CAST(v AS STRING)"),
    )


@pytest.mark.parametrize(
    "dtype,kwargs",
    [
        (T.StringType(), {}),
        (T.StringType(), {"json_column": True}),
        (T.StringType(), {"boolean_string": True}),
        (T.TimestampNTZType(), {}),
        (T.DateType(), {}),
        (T.DoubleType(), {}),
        (T.DecimalType(38, 0), {}),
        (T.BooleanType(), {}),
    ],
)
def test_coerce_sql_matches_coerce_expr(strings_df, dtype, kwargs):
    col_form = coerce_expr(F.col("v"), dtype, fuzzy=False, **kwargs)
    sql_form = coerce_sql("v", dtype, **kwargs)
    assert sql_form is not None
    _assert_twin(strings_df, col_form, sql_form)


def test_as_of_sql_literal(spark):
    got = spark.range(1).select(
        F.expr(as_of_sql("1999-06-01 00:00:00")).alias("a")
    ).collect()[0]["a"]
    import datetime

    assert got == datetime.datetime(1999, 6, 1)


def test_quote_ident_roundtrip(spark):
    df = spark.range(1).select(F.lit(7).alias("weird `name`"))
    assert df.selectExpr(f"{quote_ident('weird `name`')} + 1 AS x").collect()[0][
        "x"
    ] == 8


def test_transform_table_matches_standalone_operators(spark):
    """The folded final projection (cap+audit+align+select in one
    selectExpr) must produce byte-identical rows to the standalone
    operator chain it replaced."""
    from lcr_etl_upgrade_spark.operators.cleanse import (
        cap_future_timestamps,
        cleanse_to_schema,
    )
    from lcr_etl_upgrade_spark.operators.conform import (
        AUDIT_COLUMNS,
        add_audit_columns,
        conform_columns,
        select_target,
    )
    from lcr_etl_upgrade_spark.pipeline import transform_table
    from lcr_etl_upgrade_spark.schemas import LEAD_ASSIGNMENT

    as_of = "2001-02-03 04:05:06"
    spec = LEAD_ASSIGNMENT
    raw = spark.createDataFrame(
        [
            ("g1", "2024-01-02 03:04:05", "true", "xx", "3.5"),
            ("g2", None, "0", "2030-01-01 00:00:00", "nope"),
            ("g3", "garbage", "weird", "1999-12-31 23:59:59", "7"),
        ],
        "leadassignmentguid string, assignmentdate string, "
        "isdeleted string, modifydate string, leadscore string",
    )
    fast = transform_table(raw, spec, as_of=as_of, fuzzy=False)

    conformed = conform_columns(
        raw,
        spec.mapping,
        [
            (f.name, "string")
            for f in spec.target_schema.fields
            if f.name not in AUDIT_COLUMNS
        ],
    )
    cleansed = cleanse_to_schema(
        conformed,
        T.StructType(
            [f for f in spec.target_schema.fields if f.name not in AUDIT_COLUMNS]
        ),
        json_columns=spec.json_columns,
        boolean_string_columns=spec.boolean_string_columns,
        as_of=as_of,
        fuzzy=False,
    )
    if spec.cap_future_columns:
        cleansed = cap_future_timestamps(
            cleansed, list(spec.cap_future_columns), as_of=as_of
        )
    enriched = add_audit_columns(cleansed, as_of=as_of)
    enriched = enriched.withColumns(
        {
            f.name: F.col(f.name).cast(f.dataType)
            for f in spec.target_schema.fields
            if f.name in AUDIT_COLUMNS
        }
    )
    slow = select_target(enriched, spec.target_schema)

    assert fast.schema == slow.schema
    a = sorted(map(tuple, fast.collect()))
    b = sorted(map(tuple, slow.collect()))
    assert a == b
