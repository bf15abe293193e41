"""Built-in TableSpecs reproducing the reference's three conformed tables.

FULL-FIDELITY transcription of the reference's behavioral spec: target
schemas (ingest.py:58-231), source->target mappings (ingest.py:234-383),
JSON passthrough columns (ingest.py:51-55), boolean-string columns
(ingest.py:386-388) and the six future-capped timestamp columns of
lead_assignment (ingest.py:734-748). Field order matches the reference
exactly — the final projection (P3) fixes column order, so order IS part
of the contract. A user porting the real tables finds them ready-made.

The column names/types here are the reference's observable behavior (its
data model), not its code; they are the one part of the reference that
must be carried over verbatim to be compatible.

Type conventions vs the reference:
- TimestampType -> TimestampNTZType: the rebuild pins NY-wall-time
  semantics in the parse layer (operators/parsers.py) and keeps stored
  values session-TZ-independent, which also makes DuckDB oracle hashes
  deterministic.
- Everything else is identical, including the quirks: lead.SUB_SOURCE_ID
  is Boolean (ingest.py:102), lead.BIRTH_DATE is String (ingest.py:76)
  while COBORROWER_BIRTH_DATE is Timestamp (ingest.py:120),
  lead_xref.LEAD_LEVEL_ID / DATA_SOURCE_ID are String (ingest.py:170-172),
  and IS_DELETED_SOURCE is String on lead/lead_xref but Boolean on
  lead_assignment (ingest.py:143,177 vs 213).
"""

from __future__ import annotations

from pyspark.sql import types as T

from lcr_etl_upgrade_spark.pipeline import TableSpec

_S = T.StringType()
_TS = T.TimestampNTZType()
_DT = T.DateType()
_DBL = T.DoubleType()
_B = T.BooleanType()
_D38 = T.DecimalType(38, 0)


def _schema(fields: list[tuple[str, T.DataType]]) -> T.StructType:
    """Business columns (nullable) + the 5 audit columns (non-null),
    mirroring the reference's nullability split (ingest.py:157-161)."""
    business = [T.StructField(name, dtype, True) for name, dtype in fields]
    audit = [
        T.StructField("ETL_CREATED_DATE", _TS, False),
        T.StructField("ETL_LAST_UPDATE_DATE", _TS, False),
        T.StructField("CREATED_BY", _S, False),
        T.StructField("TO_PROCESS", _B, False),
        T.StructField("EDW_EXTERNAL_SOURCE_SYSTEM", _S, False),
    ]
    return T.StructType(business + audit)


# --- lead (ingest.py:59-163; mapping ingest.py:235-331) -------------------

_LEAD_FIELDS: list[tuple[str, T.DataType]] = [
    ("STG_LCR_LEAD_KEY", _S),  # no source mapping -> typed-null (P2)
    ("LEAD_GUID", _S),
    ("LEGACY_LEAD_ID", _S),
    ("INDIV_ID", _S),
    ("HH_ID", _S),
    ("ADDR_ID", _S),
    ("LEAD_CODE", _S),
    ("LEAD_TYPE_ID", _D38),
    ("LEAD_TYPE", _S),
    ("LEAD_SOURCE", _S),
    ("LEAD_CREATE_DATE", _TS),
    ("FIRST_NAME", _S),
    ("MIDDLE_NAME", _S),
    ("LAST_NAME", _S),
    ("SUFFIX", _S),
    ("BIRTH_DATE", _S),  # String, NOT date — reference ingest.py:76
    ("AGE", _D38),
    ("SEX", _S),
    ("STREET_1", _S),
    ("STREET_2", _S),
    ("CITY", _S),
    ("STATE_ID", _D38),
    ("STATE", _S),
    ("ZIP", _S),
    ("ZIP5", _S),
    ("COUNTY", _S),
    ("COUNTRY", _S),
    ("PHONE", _S),
    ("HOME_PHONE", _S),
    ("CELL_PHONE", _S),
    ("WORK_PHONE", _S),
    ("DO_NOT_CALL", _S),
    ("CALLER_ID", _S),
    ("EMAIL", _S),
    ("DYNAMIC_LEAD", _S),
    ("PROSPECT_ID", _S),
    ("EXT_PARTNER_ID", _S),
    ("CHANNEL_ID", _D38),
    ("CHANNEL", _S),
    ("OPT_SOURCE_ID", _S),
    ("SOURCE_ID", _D38),
    ("SUB_SOURCE_ID", _B),  # Boolean despite the _ID name — ingest.py:102
    ("SOURCE_OF_REFERRAL", _S),
    ("DIVISION", _S),
    ("LEAD_SUB_SOURCE", _S),
    ("LEAD_SUB_SOURCE_ID", _S),
    ("LENDER", _S),
    ("LOAN_AMOUNT", _S),
    ("LOAN_DATE", _DT),
    ("DIABETES", _S),
    ("HEALTH_PROBLEMS", _S),
    ("HEART_PROBLEMS", _S),
    ("HEIGHT", _S),
    ("HIGH_BP_CHOL", _S),
    ("IS_INSURED", _S),
    ("SMOKER", _S),
    ("OCCUPATION", _S),
    ("SPOUSE", _S),
    ("COBORROWER_AGE", _DBL),
    ("COBORROWER_BIRTH_DATE", _TS),  # Timestamp while BIRTH_DATE is String
    ("COBORROWER_HEIGHT", _S),
    ("COBORROWER_ON_MORTGAGE", _S),
    ("COBORROWER_NAME", _S),
    ("COBORROWER_RELATION", _S),
    ("COBORROWER_SEX", _S),
    ("COBORROWER_SMOKER", _S),
    ("COBORROWER_WEIGHT", _S),
    ("COBORROWER_OCCUPATION", _S),
    ("DATA_SOURCE", _S),
    ("LEAD_ORIGIN_URL", _S),
    ("MAILING_ID", _S),
    ("SUSPECT_CAMPAIGN_ID", _D38),
    ("CONSUMER_DEBT", _DBL),
    ("MORTGAGE_DEBT", _DBL),
    ("UTM_CAMPAIGN", _S),
    ("UTM_MEDIUM", _S),
    ("UTM_SOURCE", _S),
    ("REFERRING_URL", _S),
    ("PCS_POLICIES_ID", _D38),
    ("CREATE_DATE", _TS),
    ("MODIFY_DATE", _TS),
    ("SOURCE_TABLE", _S),
    ("IS_DELETED_SOURCE", _S),  # boolean-STRING on this table
    ("EXP_DATE", _TS),
    ("SOURCE_TYPE", _S),
    ("SOURCE_TYPE_ID", _D38),
    ("PRODUCT_TYPE", _S),
    ("LEAD_ATTRIBUTES", _S),  # JSON-in-string, never flattened (C1)
    ("CUSTODY_TARGET_AUDIENCE", _S),
    ("SOURCE", _S),
    ("PRODUCT_TYPE_ID", _D38),
    ("LEAD_SOURCE_ID", _S),
    ("ORIGIN_SYSTEM_ID", _S),
    ("ORIGIN_SYSTEM", _S),
    ("ORIGIN_SYSTEM_ORIG", _S),
    ("LEAD_INGESTION_METHOD", _S),
]

_LEAD_MAPPING = {
    "leadguid": "LEAD_GUID",
    "legacyleadid": "LEGACY_LEAD_ID",
    "individ": "INDIV_ID",
    "hhid": "HH_ID",
    "addrid": "ADDR_ID",
    "leadcode": "LEAD_CODE",
    "leadtypeid": "LEAD_TYPE_ID",
    "leadtype": "LEAD_TYPE",
    "leadsource": "LEAD_SOURCE",
    "leadcreatedate": "LEAD_CREATE_DATE",
    "firstname": "FIRST_NAME",
    "middlename": "MIDDLE_NAME",
    "lastname": "LAST_NAME",
    "suffix": "SUFFIX",
    "birthdate": "BIRTH_DATE",
    "age": "AGE",
    "sex": "SEX",
    "street1": "STREET_1",
    "street2": "STREET_2",
    "city": "CITY",
    "stateid": "STATE_ID",
    "state": "STATE",
    "zip": "ZIP",
    "zip5": "ZIP5",
    "county": "COUNTY",
    "country": "COUNTRY",
    "phone": "PHONE",
    "homephone": "HOME_PHONE",
    "cellphone": "CELL_PHONE",
    "workphone": "WORK_PHONE",
    "donotcall": "DO_NOT_CALL",
    "callerid": "CALLER_ID",
    "email": "EMAIL",
    "dynamiclead": "DYNAMIC_LEAD",
    "prospectid": "PROSPECT_ID",
    "extpartnerid": "EXT_PARTNER_ID",
    "channelid": "CHANNEL_ID",
    "channel": "CHANNEL",
    "optsourceid": "OPT_SOURCE_ID",
    "sourceid": "SOURCE_ID",
    "subsourceid": "SUB_SOURCE_ID",
    "sourceofreferral": "SOURCE_OF_REFERRAL",
    "division": "DIVISION",
    "leadsubsource": "LEAD_SUB_SOURCE",
    "leadsubsourceid": "LEAD_SUB_SOURCE_ID",
    "lender": "LENDER",
    "loanamount": "LOAN_AMOUNT",
    "loandate": "LOAN_DATE",
    "diabetes": "DIABETES",
    "healthproblems": "HEALTH_PROBLEMS",
    "heartproblems": "HEART_PROBLEMS",
    "height": "HEIGHT",
    "highbpchol": "HIGH_BP_CHOL",
    "isinsured": "IS_INSURED",
    "smoker": "SMOKER",
    "occupation": "OCCUPATION",
    "spouse": "SPOUSE",
    "coborrowerage": "COBORROWER_AGE",
    "coborrowerbirthdate": "COBORROWER_BIRTH_DATE",
    "coborrowerheight": "COBORROWER_HEIGHT",
    "coborroweronmortgage": "COBORROWER_ON_MORTGAGE",
    "coborrowername": "COBORROWER_NAME",
    "coborrowerrelation": "COBORROWER_RELATION",
    "coborrowersex": "COBORROWER_SEX",
    "coborrowersmoker": "COBORROWER_SMOKER",
    "coborrowerweight": "COBORROWER_WEIGHT",
    "coborroweroccupation": "COBORROWER_OCCUPATION",
    "datasource": "DATA_SOURCE",
    "leadoriginurl": "LEAD_ORIGIN_URL",
    "mailingid": "MAILING_ID",
    "suspectcampaignid": "SUSPECT_CAMPAIGN_ID",
    "consumerdebt": "CONSUMER_DEBT",
    "mortgagedebt": "MORTGAGE_DEBT",
    "utmcampaign": "UTM_CAMPAIGN",
    "utmmedium": "UTM_MEDIUM",
    "utmsource": "UTM_SOURCE",
    "referringurl": "REFERRING_URL",
    "pcspoliciesid": "PCS_POLICIES_ID",
    "createdate": "CREATE_DATE",
    "modifydate": "MODIFY_DATE",
    "sourcetable": "SOURCE_TABLE",
    "isdeletedsource": "IS_DELETED_SOURCE",
    "expdate": "EXP_DATE",
    "sourcetype": "SOURCE_TYPE",
    "sourcetypeid": "SOURCE_TYPE_ID",
    "producttype": "PRODUCT_TYPE",
    "leadattributes": "LEAD_ATTRIBUTES",
    "custodytargetaudience": "CUSTODY_TARGET_AUDIENCE",
    "source": "SOURCE",
    "producttypeid": "PRODUCT_TYPE_ID",
    "leadsourceid": "LEAD_SOURCE_ID",
    "originsystemid": "ORIGIN_SYSTEM_ID",
    "originsystem": "ORIGIN_SYSTEM",
    # the one non-mechanical key in the reference (ingest.py:329)
    "originsystem_orig": "ORIGIN_SYSTEM_ORIG",
    "leadingestionmethod": "LEAD_INGESTION_METHOD",
}

LEAD = TableSpec(
    name="lead",
    mapping=_LEAD_MAPPING,
    target_schema=_schema(_LEAD_FIELDS),
    json_columns={"LEAD_ATTRIBUTES"},
    boolean_string_columns={"IS_DELETED_SOURCE"},
)


# --- lead_xref (ingest.py:164-185; mapping ingest.py:332-345) -------------

_LEAD_XREF_FIELDS: list[tuple[str, T.DataType]] = [
    ("STG_LCR_LEAD_XREF_KEY", _S),  # no source mapping -> typed-null (P2)
    ("LEAD_XREF_GUID", _S),
    ("LEGACY_LEAD_ID", _S),
    ("LEAD_CODE", _S),
    ("LEAD_LEVEL_ID", _S),  # String, not numeric — ingest.py:170
    ("LEAD_LEVEL", _S),
    ("DATA_SOURCE_ID", _S),  # String, not numeric — ingest.py:172
    ("LEVEL_DATE", _TS),
    ("CREATE_DATE", _TS),
    ("MODIFY_DATE", _TS),
    ("AVAILABLE_FOR_PURCHASE_IND", _S),
    ("IS_DELETED_SOURCE", _S),
    ("LEAD_LEVEL_ALIAS", _S),
]

_LEAD_XREF_MAPPING = {
    "leadxrefguid": "LEAD_XREF_GUID",
    "legacyleadid": "LEGACY_LEAD_ID",
    "leadcode": "LEAD_CODE",
    "leadlevelid": "LEAD_LEVEL_ID",
    "leadlevel": "LEAD_LEVEL",
    "datasourceid": "DATA_SOURCE_ID",
    "leveldate": "LEVEL_DATE",
    "createdate": "CREATE_DATE",
    "modifydate": "MODIFY_DATE",
    "availableforpurchaseind": "AVAILABLE_FOR_PURCHASE_IND",
    "isdeletedsource": "IS_DELETED_SOURCE",
    "leadlevelalias": "LEAD_LEVEL_ALIAS",
}

LEAD_XREF = TableSpec(
    name="lead_xref",
    mapping=_LEAD_XREF_MAPPING,
    target_schema=_schema(_LEAD_XREF_FIELDS),
    boolean_string_columns={"IS_DELETED_SOURCE"},
)


# --- lead_assignment (ingest.py:186-230; mapping ingest.py:346-382) -------

_LEAD_ASSIGNMENT_FIELDS: list[tuple[str, T.DataType]] = [
    ("STG_LCR_LEAD_ASSIGNMENT_KEY", _S),  # no source mapping -> typed-null
    ("LEAD_ASSIGNMENT_GUID", _S),
    ("LEAD_XREF_GUID", _S),
    ("AGENT_CODE", _S),
    ("PURCHASE_DATE", _TS),
    ("PURCHASE_PRICE", _DBL),
    ("ASSIGN_DATE", _TS),
    ("INACTIVE_IND", _S),
    ("STATUS", _S),
    ("AGENT_EXTUID", _S),
    ("ALLOCATE_IND", _S),
    ("COMMENTS", _S),
    ("SFG_DIRECT_AGENT_ID", _S),
    ("BASE_SHOP_OWNER_AGENT_ID", _S),
    ("TOTAL_UPLINE_AGENT_CODES", _S),
    ("UNPAID_IND", _S),
    ("APP_COUNT", _S),
    ("APP_APV", _S),
    ("ACTUAL_APP_COUNT", _S),
    ("ACTUAL_APV", _S),
    ("CREATE_DATE", _TS),
    ("MODIFY_DATE", _TS),
    ("SOURCE_TABLE", _S),
    ("METADATA", _S),  # JSON-in-string, never flattened (C1)
    ("STATUS_DATE", _TS),
    ("IS_DELETED_SOURCE", _B),  # Boolean HERE, boolean-string elsewhere
    ("ORDER_NUMBER", _S),
    ("LEAD_STATUS_ID", _S),
    ("LEAD_STATUS", _S),
    ("HQ_PURCHASE_AMOUNT", _DBL),
    ("LEAD_ORDER_SYSTEM_ID", _S),
    ("LEAD_ORDER_SYSTEM", _S),
    ("ORDER_SYSTEM_ID", _S),
    ("ORDER_SYSTEM", _S),
    ("ORDER_SYSTEM_ORIG", _S),
    ("EXCLUSIVITY_END_DATE", _TS),
]

_LEAD_ASSIGNMENT_MAPPING = {
    "leadassignmentguid": "LEAD_ASSIGNMENT_GUID",
    "leadxrefguid": "LEAD_XREF_GUID",
    "agentcode": "AGENT_CODE",
    "purchasedate": "PURCHASE_DATE",
    "purchaseprice": "PURCHASE_PRICE",
    "assigndate": "ASSIGN_DATE",
    "inactiveind": "INACTIVE_IND",
    "status": "STATUS",
    "agentextuid": "AGENT_EXTUID",
    "allocateind": "ALLOCATE_IND",
    "comments": "COMMENTS",
    "sfgdirectagentid": "SFG_DIRECT_AGENT_ID",
    "baseshopowneragentid": "BASE_SHOP_OWNER_AGENT_ID",
    "totaluplineagentcodes": "TOTAL_UPLINE_AGENT_CODES",
    "unpaidind": "UNPAID_IND",
    "appcount": "APP_COUNT",
    "appapv": "APP_APV",
    "actualappcount": "ACTUAL_APP_COUNT",
    "actualapv": "ACTUAL_APV",
    "createdate": "CREATE_DATE",
    "modifydate": "MODIFY_DATE",
    "sourcetable": "SOURCE_TABLE",
    "metadata": "METADATA",
    "statusdate": "STATUS_DATE",
    "isdeletedsource": "IS_DELETED_SOURCE",
    "ordernumber": "ORDER_NUMBER",
    "leadstatusid": "LEAD_STATUS_ID",
    "leadstatus": "LEAD_STATUS",
    "hqpurchaseamount": "HQ_PURCHASE_AMOUNT",
    "leadordersystemid": "LEAD_ORDER_SYSTEM_ID",
    "leadordersystem": "LEAD_ORDER_SYSTEM",
    "ordersystemid": "ORDER_SYSTEM_ID",
    "ordersystem": "ORDER_SYSTEM",
    "ordersystemorig": "ORDER_SYSTEM_ORIG",
    "exclusivityenddate": "EXCLUSIVITY_END_DATE",
}

LEAD_ASSIGNMENT = TableSpec(
    name="lead_assignment",
    mapping=_LEAD_ASSIGNMENT_MAPPING,
    target_schema=_schema(_LEAD_ASSIGNMENT_FIELDS),
    json_columns={"METADATA"},
    # the six columns the reference future-caps (ingest.py:734-748), in
    # the reference's own list order
    cap_future_columns=(
        "PURCHASE_DATE",
        "ASSIGN_DATE",
        "CREATE_DATE",
        "MODIFY_DATE",
        "STATUS_DATE",
        "EXCLUSIVITY_END_DATE",
    ),
)

TABLE_SPECS = {spec.name: spec for spec in (LEAD, LEAD_XREF, LEAD_ASSIGNMENT)}
