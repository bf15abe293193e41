"""P1-P4 conformance operators (reference semantics per SURVEY.md §2.3;
golden cases mirror the reference's own tests, FIXTURES.md §A4)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from lcr_etl_upgrade_spark.operators.conform import (
    add_audit_columns,
    conform_columns,
    validate_schema,
)

TARGET = [
    ("LEAD_GUID", "string"),
    ("AGE", "decimal(38,0)"),
    ("MISSING_COL", "double"),
]


def test_case_insensitive_rename_and_add_missing(spark):
    df = spark.createDataFrame(
        [("g1", "44", "junk")], ["LeadGuid", "age", "extra_col"]
    )
    out = conform_columns(df, {"leadguid": "LEAD_GUID", "age": "AGE"}, TARGET)
    assert out.columns == ["LEAD_GUID", "AGE", "MISSING_COL"]  # order fixed
    row = out.collect()[0]
    assert row.LEAD_GUID == "g1"
    assert int(row.AGE) == 44
    assert row.MISSING_COL is None  # typed null for absent target column
    assert dict(out.dtypes)["MISSING_COL"] == "double"


def test_conform_is_single_projection(spark):
    """The whole conformance must be ONE Project node over the scan —
    the 100 TB requirement (no withColumn chains)."""
    df = spark.createDataFrame([("a", "1")], ["x", "y"])
    out = conform_columns(df, {"x": "A"}, [("A", "string"), ("B", "int")])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Project") == 1


def test_audit_columns_constants(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    out = add_audit_columns(df, as_of="2026-01-01 00:00:00").collect()[0]
    assert out.CREATED_BY == "ETL_PROCESS"
    assert out.TO_PROCESS is True
    assert out.EDW_EXTERNAL_SOURCE_SYSTEM == "LeadCustodyRepository"
    assert str(out.ETL_CREATED_DATE) == "2026-01-01 00:00:00"
    assert out.ETL_CREATED_DATE == out.ETL_LAST_UPDATE_DATE


def test_validate_schema_full_type_equality(spark):
    """Tightened vs the reference: parameterized types must match exactly
    (the reference's isinstance check lets DecimalType(10,2) pass for
    DecimalType(38,0), SURVEY.md §1.3)."""
    df = spark.createDataFrame([(1,)], ["id"]).selectExpr(
        "cast(id as decimal(10,2)) as AGE"
    )
    target = T.StructType([T.StructField("AGE", T.DecimalType(38, 0), True)])
    with pytest.raises(ValueError, match="type mismatch for AGE"):
        validate_schema(df, target)
    ok = df.selectExpr("cast(AGE as decimal(38,0)) as AGE")
    validate_schema(ok, target)  # no raise


def test_validate_schema_missing_column(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    target = T.StructType([T.StructField("NOPE", T.StringType(), True)])
    with pytest.raises(ValueError, match="missing column: NOPE"):
        validate_schema(df, target)


def test_conform_referenced_case_collision_raises_precisely(spark):
    """'Id' and 'ID' both present (routine after permissive JSON reads):
    resolving either must raise a clear ValueError naming the columns,
    not an ambiguous-reference AnalysisException at select time; a
    collision in a column nothing references stays harmless."""
    import pytest

    from lcr_etl_upgrade_spark.operators.conform import conform_columns

    df = spark.createDataFrame([(1, 2, "x")], ["Id", "ID", "name"])
    with pytest.raises(ValueError, match="collide on 'id'"):
        conform_columns(df, {"id": "T_ID"}, [("T_ID", "long")])

    # unreferenced collision: Id/ID dropped, name conforms fine
    out = conform_columns(df, {"name": "T_NAME"}, [("T_NAME", "string")])
    assert out.columns == ["T_NAME"]
    assert out.collect()[0].T_NAME == "x"


def test_audit_columns_ntz_in_both_modes(spark):
    """add_audit_columns must produce TIMESTAMP_NTZ audit columns whether
    as_of is pinned or wall-clock — the live mode used to emit LTZ
    (current_timestamp), so replay and live runs wrote different schemas
    to the same sink and appends failed on type mismatch."""
    df = spark.range(1)
    pinned = add_audit_columns(df, as_of="2024-06-01 00:00:00")
    live = add_audit_columns(df)
    for frame in (pinned, live):
        types = dict(frame.dtypes)
        assert types["ETL_CREATED_DATE"] == "timestamp_ntz"
        assert types["ETL_LAST_UPDATE_DATE"] == "timestamp_ntz"
    # the two modes agree on the FULL audit schema
    assert dict(pinned.dtypes) == dict(live.dtypes)
