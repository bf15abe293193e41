"""End-to-end table pipeline over dirty raw fixtures (FIXTURES.md family A):
conform -> cleanse -> cap -> enrich -> validate -> sink, one observed pass."""

from __future__ import annotations

import datetime as dt

from lcr_etl_upgrade_spark.pipeline import run_pipeline, transform_table
from lcr_etl_upgrade_spark.schemas import LEAD, LEAD_ASSIGNMENT

AS_OF = "2026-01-01 00:00:00"

RAW_LEAD_ROWS = [
    # leadguid, leadcode, leadtypeid, leadcreatedate, age, subsourceid,
    # loandate, consumerdebt, isdeletedsource, leadattributes, createdate, modifydate
    ("g1", "LC1", "3", "2024-03-01 10:00:00", "44", "true",
     "2020-05-05", "12.5", "true", '{"a":1,"b":{"c":2}}',
     "2024-01-01 00:00:00", "2024-06-01 00:00:00"),
    ("g2", "LC2", "abc", "abc", "-1", "x",
     "2091-01-01", "junk", "weird", None,
     "2024-01-02 00:00:00", None),
    ("g3", "LC3", None, "2091-01-01 00:00:00", None, "0",
     None, "1000", "f", None, "abc", "2024-07-01 00:00:00"),
]
RAW_LEAD_COLS = [
    "LeadGuid", "leadcode", "LEADTYPEID", "leadcreatedate", "age",
    "subsourceid", "loandate", "consumerdebt", "isdeletedsource",
    "leadattributes", "createdate", "modifydate",
]


def _raw_lead(spark):
    return spark.createDataFrame(RAW_LEAD_ROWS, RAW_LEAD_COLS)


def test_lead_pipeline_end_to_end(spark, tmp_path):
    out_path = str(tmp_path / "lead_out")
    result = run_pipeline(
        spark,
        _raw_lead(spark),
        LEAD,
        sink=lambda df: df.write.mode("overwrite").parquet(out_path),
        as_of=AS_OF,
    )
    assert result.rows_out == 3

    got = {r.LEAD_GUID: r for r in spark.read.parquet(out_path).collect()}
    g1, g2, g3 = got["g1"], got["g2"], got["g3"]

    # typed coercions
    assert int(g1.LEAD_TYPE_ID) == 3 and g2.LEAD_TYPE_ID is None
    assert g1.SUB_SOURCE_ID is True and g2.SUB_SOURCE_ID is None
    assert g1.CONSUMER_DEBT == 12.5 and g2.CONSUMER_DEBT is None
    # garbage timestamp -> null; valid parses; boolean-string normalize
    assert g2.LEAD_CREATE_DATE is None
    assert g1.LEAD_CREATE_DATE == dt.datetime(2024, 3, 1, 10, 0)
    assert g1.IS_DELETED_SOURCE == "TRUE" and g2.IS_DELETED_SOURCE == "weird"
    # future DATE -> null (asymmetry), valid date kept
    assert g2.LOAN_DATE is None and g1.LOAN_DATE == dt.date(2020, 5, 5)
    # JSON survives byte-identical
    assert g1.LEAD_ATTRIBUTES == '{"a":1,"b":{"c":2}}'
    # absent source column arrives as typed null
    assert g1.UTM_CAMPAIGN is None
    # audit columns pinned to as_of
    assert str(g1.ETL_CREATED_DATE) == AS_OF
    assert g1.CREATED_BY == "ETL_PROCESS" and g1.TO_PROCESS is True


def test_lead_assignment_future_caps(spark):
    raw = spark.createDataFrame(
        [("a1", "x1", "2091-01-01 00:00:00", '{"k": 1}', "yes",
          "2024-01-01 00:00:00", "2024-01-02 00:00:00")],
        ["leadassignmentguid", "leadxrefguid", "purchasedate", "metadata",
         "isdeletedsource", "createdate", "modifydate"],
    )
    row = transform_table(raw, LEAD_ASSIGNMENT, as_of=AS_OF).collect()[0]
    # future timestamp capped to as_of (not nulled)
    assert row.PURCHASE_DATE == dt.datetime(2026, 1, 1)
    # lead_assignment IS_DELETED_SOURCE is a real boolean; "yes" -> True
    # (the integration test's exact case in the reference)
    assert row.IS_DELETED_SOURCE is True
    assert row.METADATA == '{"k": 1}'


def test_full_schema_fidelity():
    """The registry carries the reference's COMPLETE column surface
    (ingest.py:58-231, 234-383), including its type quirks."""
    from pyspark.sql import types as T

    from lcr_etl_upgrade_spark.schemas import LEAD_XREF, TABLE_SPECS

    # full column counts (business + 5 audit) == the reference's schema
    # blocks ingest.py:59-163 / 164-185 / 186-230
    assert len(LEAD.target_schema.fields) == 101
    assert len(LEAD_XREF.target_schema.fields) == 18
    assert len(LEAD_ASSIGNMENT.target_schema.fields) == 41
    # mapping cardinality matches ingest.py:234-383
    assert len(LEAD.mapping) == 95
    assert len(LEAD_XREF.mapping) == 12
    assert len(LEAD_ASSIGNMENT.mapping) == 35
    # every mapping target exists in its schema; unmapped = typed-null adds
    for spec in TABLE_SPECS.values():
        names = {f.name for f in spec.target_schema.fields}
        assert set(spec.mapping.values()) <= names
    # the type quirks that make or break a port
    by_name = {f.name: f.dataType for f in LEAD.target_schema.fields}
    assert isinstance(by_name["SUB_SOURCE_ID"], T.BooleanType)
    assert isinstance(by_name["BIRTH_DATE"], T.StringType)
    assert isinstance(by_name["COBORROWER_BIRTH_DATE"], T.TimestampNTZType)
    xref_types = {f.name: f.dataType for f in LEAD_XREF.target_schema.fields}
    assert isinstance(xref_types["LEAD_LEVEL_ID"], T.StringType)
    assert isinstance(xref_types["DATA_SOURCE_ID"], T.StringType)
    la_types = {f.name: f.dataType for f in LEAD_ASSIGNMENT.target_schema.fields}
    assert isinstance(la_types["IS_DELETED_SOURCE"], T.BooleanType)
    assert LEAD_ASSIGNMENT.cap_future_columns == (
        "PURCHASE_DATE", "ASSIGN_DATE", "CREATE_DATE",
        "MODIFY_DATE", "STATUS_DATE", "EXCLUSIVITY_END_DATE",
    )


def test_lead_assignment_json_safe_read_truncate_load(spark, tmp_path):
    """The reference's historical lead_assignment flow composed end to end:
    JSON-safe read (multiLine/PERMISSIVE, ingest.py:633-643) -> transform
    (future-cap included) -> truncate-then-load sink (ingest.py:782-791):
    end state equals exactly the new batch, replacing prior contents."""
    import json

    from lcr_etl_upgrade_spark.sinks.registry import get_sink
    from lcr_etl_upgrade_spark.sources.registry import read_json

    src = tmp_path / "raw.json"
    records = [
        {"leadassignmentguid": "a1", "leadxrefguid": "x1",
         "purchasedate": "2091-01-01 00:00:00",
         "metadata": '{"k": 1}', "isdeletedsource": "yes",
         "createdate": "2024-01-01 00:00:00", "modifydate": "2024-01-02 00:00:00"},
        {"leadassignmentguid": "a2", "leadxrefguid": "x2",
         "purchasedate": "2024-05-05 00:00:00",
         "metadata": None, "isdeletedsource": "weird",
         "createdate": "2024-01-03 00:00:00", "modifydate": None},
    ]
    # multiLine pretty-printed JSON array — the shape PERMISSIVE+multiLine
    # exists to handle
    src.write_text(json.dumps(records, indent=2))

    out = str(tmp_path / "stg_lcr_lead_assignment")
    # pre-existing stale contents that truncate-then-load must replace
    spark.range(5).write.mode("overwrite").parquet(out)

    raw = read_json(spark, str(src), multi_line=True)
    final = transform_table(raw, LEAD_ASSIGNMENT, as_of=AS_OF)
    get_sink("parquet_truncate_load")(final, out)

    got = {r.LEAD_ASSIGNMENT_GUID: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {"a1", "a2"}  # stale rows gone
    assert got["a1"].PURCHASE_DATE == dt.datetime(2026, 1, 1)  # capped
    assert got["a1"].IS_DELETED_SOURCE is True
    assert got["a2"].IS_DELETED_SOURCE is None  # 'weird' -> null (C6)
    assert got["a1"].METADATA == '{"k": 1}'  # JSON passthrough
    assert got["a2"].MODIFY_DATE is None


def test_row_count_preserved(spark):
    out = transform_table(_raw_lead(spark), LEAD, as_of=AS_OF)
    assert out.count() == 3
    assert [f.name for f in out.schema.fields] == [
        f.name for f in LEAD.target_schema.fields
    ]
