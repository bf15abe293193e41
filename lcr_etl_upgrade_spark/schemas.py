"""Built-in TableSpecs reproducing the reference's three conformed tables.

Column inventory derives from the reference's target schemas
(ingest.py:58-231) and source->target mappings (ingest.py:234-383); the
special-case sets mirror JSON passthrough columns (ingest.py:51-55),
boolean-string columns (ingest.py:386-388) and the six future-capped
timestamp columns of lead_assignment (ingest.py:734-748). Trimmed to the
representative columns per type family — the registry pattern (not the
exact 90-column payroll) is the capability under test; adding the long
tail is data entry, and FIXTURES.md family A exercises every branch.
"""

from __future__ import annotations

from pyspark.sql import types as T

from lcr_etl_upgrade_spark.pipeline import TableSpec


def _audit_fields() -> list[T.StructField]:
    return [
        T.StructField("ETL_CREATED_DATE", T.TimestampNTZType(), False),
        T.StructField("ETL_LAST_UPDATE_DATE", T.TimestampNTZType(), False),
        T.StructField("CREATED_BY", T.StringType(), False),
        T.StructField("TO_PROCESS", T.BooleanType(), False),
        T.StructField("EDW_EXTERNAL_SOURCE_SYSTEM", T.StringType(), False),
    ]


LEAD = TableSpec(
    name="lead",
    mapping={
        "leadguid": "LEAD_GUID",
        "legacyleadid": "LEGACY_LEAD_ID",
        "leadcode": "LEAD_CODE",
        "leadtypeid": "LEAD_TYPE_ID",
        "leadcreatedate": "LEAD_CREATE_DATE",
        "birthdate": "BIRTH_DATE",
        "age": "AGE",
        "subsourceid": "SUB_SOURCE_ID",
        "loandate": "LOAN_DATE",
        "consumerdebt": "CONSUMER_DEBT",
        "isdeletedsource": "IS_DELETED_SOURCE",
        "leadattributes": "LEAD_ATTRIBUTES",
        "createdate": "CREATE_DATE",
        "modifydate": "MODIFY_DATE",
    },
    target_schema=T.StructType(
        [
            T.StructField("LEAD_GUID", T.StringType(), True),
            T.StructField("LEGACY_LEAD_ID", T.StringType(), True),
            T.StructField("LEAD_CODE", T.StringType(), True),
            T.StructField("LEAD_TYPE_ID", T.DecimalType(38, 0), True),
            T.StructField("LEAD_CREATE_DATE", T.TimestampNTZType(), True),
            T.StructField("BIRTH_DATE", T.StringType(), True),
            T.StructField("AGE", T.DecimalType(38, 0), True),
            T.StructField("SUB_SOURCE_ID", T.BooleanType(), True),
            T.StructField("LOAN_DATE", T.DateType(), True),
            T.StructField("CONSUMER_DEBT", T.DoubleType(), True),
            T.StructField("IS_DELETED_SOURCE", T.StringType(), True),
            T.StructField("LEAD_ATTRIBUTES", T.StringType(), True),
            T.StructField("UTM_CAMPAIGN", T.StringType(), True),
            T.StructField("CREATE_DATE", T.TimestampNTZType(), True),
            T.StructField("MODIFY_DATE", T.TimestampNTZType(), True),
            *_audit_fields(),
        ]
    ),
    json_columns={"LEAD_ATTRIBUTES"},
    boolean_string_columns={"IS_DELETED_SOURCE"},
)


LEAD_XREF = TableSpec(
    name="lead_xref",
    mapping={
        "leadxrefguid": "LEAD_XREF_GUID",
        "legacyleadid": "LEGACY_LEAD_ID",
        "leadcode": "LEAD_CODE",
        "leadlevelid": "LEAD_LEVEL_ID",
        "leadlevel": "LEAD_LEVEL",
        "datasourceid": "DATA_SOURCE_ID",
        "leveldate": "LEVEL_DATE",
        "createdate": "CREATE_DATE",
        "modifydate": "MODIFY_DATE",
        "isdeletedsource": "IS_DELETED_SOURCE",
    },
    target_schema=T.StructType(
        [
            T.StructField("LEAD_XREF_GUID", T.StringType(), True),
            T.StructField("LEGACY_LEAD_ID", T.StringType(), True),
            T.StructField("LEAD_CODE", T.StringType(), True),
            T.StructField("LEAD_LEVEL_ID", T.DecimalType(38, 0), True),
            T.StructField("LEAD_LEVEL", T.StringType(), True),
            T.StructField("DATA_SOURCE_ID", T.DecimalType(38, 0), True),
            T.StructField("LEVEL_DATE", T.TimestampNTZType(), True),
            T.StructField("CREATE_DATE", T.TimestampNTZType(), True),
            T.StructField("MODIFY_DATE", T.TimestampNTZType(), True),
            T.StructField("IS_DELETED_SOURCE", T.StringType(), True),
            *_audit_fields(),
        ]
    ),
    boolean_string_columns={"IS_DELETED_SOURCE"},
)


LEAD_ASSIGNMENT = TableSpec(
    name="lead_assignment",
    mapping={
        "leadassignmentguid": "LEAD_ASSIGNMENT_GUID",
        "leadxrefguid": "LEAD_XREF_GUID",
        "agentcode": "AGENT_CODE",
        "purchasedate": "PURCHASE_DATE",
        "assigndate": "ASSIGN_DATE",
        "statusdate": "STATUS_DATE",
        "exclusivityenddate": "EXCLUSIVITY_END_DATE",
        "purchaseprice": "PURCHASE_PRICE",
        "hqpurchaseamount": "HQ_PURCHASE_AMOUNT",
        "metadata": "METADATA",
        "isdeletedsource": "IS_DELETED_SOURCE",
        "createdate": "CREATE_DATE",
        "modifydate": "MODIFY_DATE",
    },
    target_schema=T.StructType(
        [
            T.StructField("LEAD_ASSIGNMENT_GUID", T.StringType(), True),
            T.StructField("LEAD_XREF_GUID", T.StringType(), True),
            T.StructField("AGENT_CODE", T.StringType(), True),
            T.StructField("PURCHASE_DATE", T.TimestampNTZType(), True),
            T.StructField("ASSIGN_DATE", T.TimestampNTZType(), True),
            T.StructField("STATUS_DATE", T.TimestampNTZType(), True),
            T.StructField("EXCLUSIVITY_END_DATE", T.TimestampNTZType(), True),
            T.StructField("PURCHASE_PRICE", T.DoubleType(), True),
            T.StructField("HQ_PURCHASE_AMOUNT", T.DoubleType(), True),
            T.StructField("METADATA", T.StringType(), True),
            # Boolean here, boolean-STRING on lead/lead_xref — the
            # reference is deliberately asymmetric (ingest.py:213 vs 386-388).
            T.StructField("IS_DELETED_SOURCE", T.BooleanType(), True),
            T.StructField("CREATE_DATE", T.TimestampNTZType(), True),
            T.StructField("MODIFY_DATE", T.TimestampNTZType(), True),
            *_audit_fields(),
        ]
    ),
    json_columns={"METADATA"},
    cap_future_columns=(
        "PURCHASE_DATE",
        "ASSIGN_DATE",
        "STATUS_DATE",
        "EXCLUSIVITY_END_DATE",
        "CREATE_DATE",
        "MODIFY_DATE",
    ),
)

TABLE_SPECS = {spec.name: spec for spec in (LEAD, LEAD_XREF, LEAD_ASSIGNMENT)}
