"""Full-pipeline lifecycle queries for lead_xref and lead_assignment.

Complements ``extended.pipeline_lead_end_to_end`` (the lead table's
lifecycle): together the three drive the complete reference flow —
conform (P1/P2) -> cleanse (C1-C10) -> special-case future-cap (F5,
lead_assignment only, ingest.py:734-748) -> enrich (P4) -> project (P3)
-> residual scrub (F4) — over the FULL-fidelity schemas in
``schemas.py`` (transcribed from ingest.py:58-231, 234-383).

Dirty raw rows are synthesized deterministically from ``orders`` so
every cleansing branch is exercised and the DuckDB oracle can state the
expected semantics in plain SQL. fuzzy=False keeps the plan
oracle-expressible; the pandas-UDF fuzzy path has its own unit goldens.

Scale shape: the whole pipeline is two projections + one final select —
no shuffle at all until a sink demands one; at 100 TB this is a pure
map-side job that AQE can size freely. (The registered queries' final
ORDER BY is declared output semantics, not part of the pipeline — its
range-partition exchange is the only one in their executed plans.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.plans.registry import query
from lcr_etl_upgrade_spark.sources.testdata import load_table

_AS_OF = "1999-06-01 00:00:00"

# DuckDB rendering of the F3 scrub + native parse (fuzzy=False) chain.
# Plain .format templates (NOT f-strings): {{1,3}} renders to the regex
# quantifier {1,3} after .format.
_PARSE_SQL = """CASE WHEN regexp_matches({v}, '^[A-Za-z]{{1,3}}$')
                OR LENGTH({v}) <= 3
                OR NOT regexp_matches({v}, '.*[0-9]+.*')
              THEN NULL
              ELSE TRY_CAST({v} AS TIMESTAMP) END"""

_SCRUB_SQL = "CAST(" + _PARSE_SQL + " AS VARCHAR)"

_CAP_SQL = """CAST(CASE WHEN ts_{v} > TIMESTAMP '{as_of}'
              THEN TIMESTAMP '{as_of}'
              ELSE ts_{v} END AS VARCHAR)"""


@query(
    "pipeline_lead_xref_end_to_end",
    oracle=f"""
    WITH raw AS (
      SELECT CONCAT('x', o_orderkey) AS leadxrefguid,
             CONCAT('LC', o_orderkey) AS leadcode,
             CONCAT('L', o_orderkey % 7) AS leadlevelid,
             CAST(o_orderkey % 9 AS VARCHAR) AS datasourceid,
             CASE o_orderkey % 4
                  WHEN 0 THEN CAST(o_orderdate AS VARCHAR)
                  WHEN 1 THEN 'N/A'
                  WHEN 2 THEN '--'
                  ELSE NULL END AS leveldate,
             CAST(o_orderdate AS VARCHAR) AS createdate,
             CASE o_orderkey % 6 WHEN 0 THEN NULL
                  ELSE CAST(o_orderdate AS VARCHAR) END AS modifydate,
             CASE o_orderkey % 5 WHEN 0 THEN 'yes' WHEN 1 THEN 'f'
                  WHEN 2 THEN 'maybe' ELSE NULL END AS isdeletedsource,
             CASE o_orderkey % 2 WHEN 0 THEN CONCAT('alias', o_orderkey)
                  ELSE NULL END AS leadlevelalias
      FROM orders WHERE o_orderkey <= 3000
    )
    SELECT CAST(NULL AS VARCHAR) AS STG_LCR_LEAD_XREF_KEY,
           leadxrefguid AS LEAD_XREF_GUID,
           leadcode AS LEAD_CODE,
           leadlevelid AS LEAD_LEVEL_ID,
           datasourceid AS DATA_SOURCE_ID,
           {_SCRUB_SQL.format(v='leveldate')} AS LEVEL_DATE,
           {_SCRUB_SQL.format(v='createdate')} AS CREATE_DATE,
           {_SCRUB_SQL.format(v='modifydate')} AS MODIFY_DATE,
           CAST(NULL AS VARCHAR) AS AVAILABLE_FOR_PURCHASE_IND,
           CASE WHEN isdeletedsource IS NULL THEN NULL
                WHEN LOWER(isdeletedsource) IN ('true','1','yes','t') THEN 'TRUE'
                WHEN LOWER(isdeletedsource) IN ('false','0','no','f') THEN 'FALSE'
                ELSE isdeletedsource END AS IS_DELETED_SOURCE,
           leadlevelalias AS LEAD_LEVEL_ALIAS,
           '{_AS_OF}' AS ETL_CREATED_DATE,
           'ETL_PROCESS' AS CREATED_BY,
           TRUE AS TO_PROCESS,
           'LeadCustodyRepository' AS EDW_EXTERNAL_SOURCE_SYSTEM
    FROM raw
    ORDER BY LEAD_XREF_GUID
    """,
)
def pipeline_lead_xref_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead_xref lifecycle on the full schema: exercises the String-typed
    LEAD_LEVEL_ID / DATA_SOURCE_ID fidelity quirk (ingest.py:170-172),
    C7 boolean-string normalize, C9 timestamp scrub, P2 typed-null adds
    (STG key, AVAILABLE_FOR_PURCHASE_IND) and P3 full projection."""
    from lcr_etl_upgrade_spark.pipeline import transform_table
    from lcr_etl_upgrade_spark.schemas import LEAD_XREF

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    k = F.col("o_orderkey")
    iso = F.col("o_orderdate").cast("string")
    raw = orders.select(
        F.concat(F.lit("x"), k.cast("string")).alias("leadxrefguid"),
        F.concat(F.lit("LC"), k.cast("string")).alias("leadcode"),
        F.concat(F.lit("L"), (k % 7).cast("string")).alias("leadlevelid"),
        (k % 9).cast("string").alias("datasourceid"),
        F.when(k % 4 == 0, iso)
        .when(k % 4 == 1, F.lit("N/A"))
        .when(k % 4 == 2, F.lit("--"))
        .otherwise(F.lit(None))
        .alias("leveldate"),
        iso.alias("createdate"),
        F.when(k % 6 == 0, F.lit(None)).otherwise(iso).alias("modifydate"),
        F.when(k % 5 == 0, F.lit("yes"))
        .when(k % 5 == 1, F.lit("f"))
        .when(k % 5 == 2, F.lit("maybe"))
        .otherwise(F.lit(None))
        .alias("isdeletedsource"),
        F.when(k % 2 == 0, F.concat(F.lit("alias"), k.cast("string")))
        .otherwise(F.lit(None))
        .alias("leadlevelalias"),
    )
    out = transform_table(raw, LEAD_XREF, as_of=_AS_OF, fuzzy=False)
    return out.select(
        "STG_LCR_LEAD_XREF_KEY",
        "LEAD_XREF_GUID",
        "LEAD_CODE",
        "LEAD_LEVEL_ID",
        "DATA_SOURCE_ID",
        F.col("LEVEL_DATE").cast("string").alias("LEVEL_DATE"),
        F.col("CREATE_DATE").cast("string").alias("CREATE_DATE"),
        F.col("MODIFY_DATE").cast("string").alias("MODIFY_DATE"),
        "AVAILABLE_FOR_PURCHASE_IND",
        "IS_DELETED_SOURCE",
        "LEAD_LEVEL_ALIAS",
        F.col("ETL_CREATED_DATE").cast("string").alias("ETL_CREATED_DATE"),
        "CREATED_BY",
        "TO_PROCESS",
        "EDW_EXTERNAL_SOURCE_SYSTEM",
    ).orderBy("LEAD_XREF_GUID")


@query(
    "pipeline_lead_assignment_end_to_end",
    oracle=f"""
    WITH raw AS (
      SELECT CONCAT('a', o_orderkey) AS leadassignmentguid,
             CONCAT('x', o_orderkey) AS leadxrefguid,
             CONCAT('AG', o_orderkey % 100) AS agentcode,
             CASE o_orderkey % 4
                  WHEN 0 THEN CAST(o_orderdate AS VARCHAR)
                  WHEN 1 THEN '2050-01-01 00:00:00'
                  WHEN 2 THEN 'bad' ELSE NULL END AS purchasedate,
             CASE o_orderkey % 2 WHEN 0 THEN CAST(o_totalprice AS VARCHAR)
                  ELSE 'x9x' END AS purchaseprice,
             CAST(o_orderdate AS VARCHAR) AS assigndate,
             CASE o_orderkey % 3 WHEN 0 THEN '2077-12-31 23:59:59'
                  ELSE CAST(o_orderdate AS VARCHAR) END AS statusdate,
             CASE o_orderkey % 5 WHEN 0 THEN '2050-06-01 00:00:00'
                  ELSE NULL END AS exclusivityenddate,
             CASE o_orderkey % 2 WHEN 0 THEN CONCAT('{{"m":', o_orderkey, '}}')
                  ELSE NULL END AS metadata,
             CASE o_orderkey % 5 WHEN 0 THEN 'true' WHEN 1 THEN '0'
                  WHEN 2 THEN 't' WHEN 3 THEN 'weird' ELSE NULL
                  END AS isdeletedsource,
             CAST(o_orderdate AS VARCHAR) AS createdate,
             CASE o_orderkey % 6 WHEN 0 THEN NULL
                  ELSE CAST(o_orderdate AS VARCHAR) END AS modifydate
      FROM orders WHERE o_orderkey <= 3000
    ), parsed AS (
      SELECT *,
             {_PARSE_SQL.format(v='purchasedate')} AS ts_purchasedate,
             {_PARSE_SQL.format(v='assigndate')} AS ts_assigndate,
             {_PARSE_SQL.format(v='statusdate')} AS ts_statusdate,
             {_PARSE_SQL.format(v='exclusivityenddate')} AS ts_exclusivityenddate,
             {_PARSE_SQL.format(v='createdate')} AS ts_createdate,
             {_PARSE_SQL.format(v='modifydate')} AS ts_modifydate
      FROM raw
    )
    SELECT CAST(NULL AS VARCHAR) AS STG_LCR_LEAD_ASSIGNMENT_KEY,
           leadassignmentguid AS LEAD_ASSIGNMENT_GUID,
           leadxrefguid AS LEAD_XREF_GUID,
           agentcode AS AGENT_CODE,
           {_CAP_SQL.format(v='purchasedate', as_of=_AS_OF)} AS PURCHASE_DATE,
           TRY_CAST(purchaseprice AS DOUBLE) AS PURCHASE_PRICE,
           {_CAP_SQL.format(v='assigndate', as_of=_AS_OF)} AS ASSIGN_DATE,
           {_CAP_SQL.format(v='createdate', as_of=_AS_OF)} AS CREATE_DATE,
           {_CAP_SQL.format(v='modifydate', as_of=_AS_OF)} AS MODIFY_DATE,
           metadata AS METADATA,
           {_CAP_SQL.format(v='statusdate', as_of=_AS_OF)} AS STATUS_DATE,
           CASE WHEN LOWER(isdeletedsource) IN ('true','1','yes','t') THEN TRUE
                WHEN LOWER(isdeletedsource) IN ('false','0','no','f') THEN FALSE
                ELSE NULL END AS IS_DELETED_SOURCE,
           {_CAP_SQL.format(v='exclusivityenddate', as_of=_AS_OF)}
             AS EXCLUSIVITY_END_DATE,
           '{_AS_OF}' AS ETL_CREATED_DATE,
           'ETL_PROCESS' AS CREATED_BY,
           TRUE AS TO_PROCESS,
           'LeadCustodyRepository' AS EDW_EXTERNAL_SOURCE_SYSTEM
    FROM parsed
    ORDER BY LEAD_ASSIGNMENT_GUID
    """,
)
def pipeline_lead_assignment_end_to_end(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """lead_assignment lifecycle on the full schema — the reference's most
    involved path (§3.2 step 4): C1 METADATA JSON passthrough
    (ingest.py:749-752), C6 Boolean IS_DELETED_SOURCE (ingest.py:213),
    C4/C5 numeric coercion, and the six-column F5 future-cap
    (ingest.py:734-748) with planted future timestamps that must clamp
    to as_of."""
    from lcr_etl_upgrade_spark.pipeline import transform_table
    from lcr_etl_upgrade_spark.schemas import LEAD_ASSIGNMENT

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    k = F.col("o_orderkey")
    iso = F.col("o_orderdate").cast("string")
    raw = orders.select(
        F.concat(F.lit("a"), k.cast("string")).alias("leadassignmentguid"),
        F.concat(F.lit("x"), k.cast("string")).alias("leadxrefguid"),
        F.concat(F.lit("AG"), (k % 100).cast("string")).alias("agentcode"),
        F.when(k % 4 == 0, iso)
        .when(k % 4 == 1, F.lit("2050-01-01 00:00:00"))
        .when(k % 4 == 2, F.lit("bad"))
        .otherwise(F.lit(None))
        .alias("purchasedate"),
        F.when(k % 2 == 0, F.col("o_totalprice").cast("string"))
        .otherwise(F.lit("x9x"))
        .alias("purchaseprice"),
        iso.alias("assigndate"),
        F.when(k % 3 == 0, F.lit("2077-12-31 23:59:59"))
        .otherwise(iso)
        .alias("statusdate"),
        F.when(k % 5 == 0, F.lit("2050-06-01 00:00:00"))
        .otherwise(F.lit(None))
        .alias("exclusivityenddate"),
        F.when(
            k % 2 == 0, F.concat(F.lit('{"m":'), k.cast("string"), F.lit("}"))
        )
        .otherwise(F.lit(None))
        .alias("metadata"),
        F.when(k % 5 == 0, F.lit("true"))
        .when(k % 5 == 1, F.lit("0"))
        .when(k % 5 == 2, F.lit("t"))
        .when(k % 5 == 3, F.lit("weird"))
        .otherwise(F.lit(None))
        .alias("isdeletedsource"),
        iso.alias("createdate"),
        F.when(k % 6 == 0, F.lit(None)).otherwise(iso).alias("modifydate"),
    )
    out = transform_table(raw, LEAD_ASSIGNMENT, as_of=_AS_OF, fuzzy=False)
    return out.select(
        "STG_LCR_LEAD_ASSIGNMENT_KEY",
        "LEAD_ASSIGNMENT_GUID",
        "LEAD_XREF_GUID",
        "AGENT_CODE",
        F.col("PURCHASE_DATE").cast("string").alias("PURCHASE_DATE"),
        "PURCHASE_PRICE",
        F.col("ASSIGN_DATE").cast("string").alias("ASSIGN_DATE"),
        F.col("CREATE_DATE").cast("string").alias("CREATE_DATE"),
        F.col("MODIFY_DATE").cast("string").alias("MODIFY_DATE"),
        "METADATA",
        F.col("STATUS_DATE").cast("string").alias("STATUS_DATE"),
        "IS_DELETED_SOURCE",
        F.col("EXCLUSIVITY_END_DATE").cast("string").alias("EXCLUSIVITY_END_DATE"),
        F.col("ETL_CREATED_DATE").cast("string").alias("ETL_CREATED_DATE"),
        "CREATED_BY",
        "TO_PROCESS",
        "EDW_EXTERNAL_SOURCE_SYSTEM",
    ).orderBy("LEAD_ASSIGNMENT_GUID")
