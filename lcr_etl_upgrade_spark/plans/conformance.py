"""Conformance / cleansing operator queries (the reference's core surface,
SURVEY.md §2.3–§2.6), demonstrated deterministically over the synthetic
tables so the DuckDB oracle can hash-check them.

The reference applies these to raw JDBC/Delta lead tables; here the same
Column expressions (from ``operators.conform`` / ``functions.cleansing``)
run over testdata with dirty values *constructed from* clean ones, so every
branch (garbage token, valid value, null) is exercised and the oracle can
reproduce the construction with plain SQL.

Wall-clock points ("now") are injected as a pinned ``AS_OF`` literal —
the engine's operators take an ``as_of`` parameter precisely so futures-
capping and audit timestamps are deterministic (SURVEY.md §7.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.functions.cleansing import (
    boolean_expr,
    boolean_string_expr,
    invalid_timestamp_predicate,
)
from lcr_etl_upgrade_spark.plans.registry import query
from lcr_etl_upgrade_spark.sources.testdata import load_table

AS_OF = "1999-06-01 00:00:00"


# --------------------------------------------------------------------------
# P1+P2+P3: rename / add-missing-as-typed-null / reorder, as ONE projection
# --------------------------------------------------------------------------
@query(
    "conform_rename_project",
    oracle="""
    SELECT l_orderkey AS ORDER_KEY,
           l_linenumber AS LINE_NUMBER,
           l_quantity AS QUANTITY,
           CAST(NULL AS VARCHAR) AS SOURCE_SYSTEM,
           CAST(NULL AS DOUBLE) AS ADJUSTED_PRICE
    FROM lineitem
    WHERE l_orderkey <= 500
    ORDER BY ORDER_KEY, LINE_NUMBER
    """,
)
def conform_rename_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lcr_etl_upgrade_spark.operators.conform import conform_columns

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    mapping = {
        "l_orderkey": "ORDER_KEY",
        "l_linenumber": "LINE_NUMBER",
        "l_quantity": "QUANTITY",
    }
    target = [
        ("ORDER_KEY", "bigint"),
        ("LINE_NUMBER", "int"),
        ("QUANTITY", "double"),
        ("SOURCE_SYSTEM", "string"),
        ("ADJUSTED_PRICE", "double"),
    ]
    return conform_columns(li, mapping, target).orderBy("ORDER_KEY", "LINE_NUMBER")


# --------------------------------------------------------------------------
# P4: audit-metadata enrichment with injected as_of (reference ingest.py:681-700)
# --------------------------------------------------------------------------
@query(
    "conform_metadata_enrichment",
    oracle=f"""
    SELECT o_orderkey,
           CAST(TIMESTAMP '{AS_OF}' AS VARCHAR) AS ETL_CREATED_DATE,
           CAST(TIMESTAMP '{AS_OF}' AS VARCHAR) AS ETL_LAST_UPDATE_DATE,
           'ETL_PROCESS' AS CREATED_BY,
           TRUE AS TO_PROCESS,
           'LeadCustodyRepository' AS EDW_EXTERNAL_SOURCE_SYSTEM
    FROM orders
    WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    """,
)
def conform_metadata_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lcr_etl_upgrade_spark.operators.conform import add_audit_columns

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    enriched = add_audit_columns(orders.select("o_orderkey"), as_of=AS_OF)
    return enriched.select(
        "o_orderkey",
        F.col("ETL_CREATED_DATE").cast("string").alias("ETL_CREATED_DATE"),
        F.col("ETL_LAST_UPDATE_DATE").cast("string").alias("ETL_LAST_UPDATE_DATE"),
        "CREATED_BY",
        "TO_PROCESS",
        "EDW_EXTERNAL_SOURCE_SYSTEM",
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# C6: tolerant boolean coercion (reference ingest.py:593-608)
# --------------------------------------------------------------------------
_DIRTY_BOOL_SQL = """
      CASE o_orderkey % 8 WHEN 0 THEN 'true' WHEN 1 THEN 'FALSE'
           WHEN 2 THEN '1' WHEN 3 THEN '0' WHEN 4 THEN 'Yes'
           WHEN 5 THEN 't' WHEN 6 THEN 'maybe' ELSE NULL END
"""


def _dirty_bool_col() -> F.Column:
    k = F.col("o_orderkey") % 8
    return (
        F.when(k == 0, F.lit("true"))
        .when(k == 1, F.lit("FALSE"))
        .when(k == 2, F.lit("1"))
        .when(k == 3, F.lit("0"))
        .when(k == 4, F.lit("Yes"))
        .when(k == 5, F.lit("t"))
        .when(k == 6, F.lit("maybe"))
        .otherwise(F.lit(None).cast("string"))
    )


@query(
    "cleanse_boolean",
    oracle=f"""
    WITH raw AS (
      SELECT o_orderkey, {_DIRTY_BOOL_SQL} AS raw_flag
      FROM orders WHERE o_orderkey <= 2000
    )
    SELECT o_orderkey, raw_flag,
           CASE WHEN LOWER(raw_flag) IN ('true','1','yes','t') THEN TRUE
                WHEN LOWER(raw_flag) IN ('false','0','no','f') THEN FALSE
                ELSE NULL END AS flag
    FROM raw ORDER BY o_orderkey
    """,
)
def cleanse_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    raw = orders.select("o_orderkey", _dirty_bool_col().alias("raw_flag"))
    return raw.withColumn("flag", boolean_expr(F.col("raw_flag"))).orderBy(
        "o_orderkey"
    )


# --------------------------------------------------------------------------
# C7: boolean-string normalization (reference ingest.py:610-618)
# --------------------------------------------------------------------------
@query(
    "cleanse_boolean_string",
    oracle=f"""
    WITH raw AS (
      SELECT o_orderkey, {_DIRTY_BOOL_SQL} AS raw_flag
      FROM orders WHERE o_orderkey <= 2000
    )
    SELECT o_orderkey, raw_flag,
           CASE WHEN raw_flag IS NULL THEN NULL
                WHEN LOWER(raw_flag) IN ('true','1','yes','t') THEN 'TRUE'
                WHEN LOWER(raw_flag) IN ('false','0','no','f') THEN 'FALSE'
                ELSE raw_flag END AS flag
    FROM raw ORDER BY o_orderkey
    """,
)
def cleanse_boolean_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    raw = orders.select("o_orderkey", _dirty_bool_col().alias("raw_flag"))
    return raw.withColumn("flag", boolean_string_expr(F.col("raw_flag"))).orderBy(
        "o_orderkey"
    )


# --------------------------------------------------------------------------
# F3+C2 (native path): invalid-timestamp scrub then parse
# (reference ingest.py:507-536,551-570 — garbage tokens -> null, ISO parses)
# --------------------------------------------------------------------------
_DIRTY_TS_SQL = """
      CASE o_orderkey % 6 WHEN 0 THEN CAST(o_orderdate AS VARCHAR)
           WHEN 1 THEN 'abc' WHEN 2 THEN '--' WHEN 3 THEN 'N/A'
           WHEN 4 THEN CAST(o_orderdate AS VARCHAR) ELSE NULL END
"""


def _dirty_ts_col() -> F.Column:
    k = F.col("o_orderkey") % 6
    iso = F.col("o_orderdate").cast("string")
    return (
        F.when(k == 0, iso)
        .when(k == 1, F.lit("abc"))
        .when(k == 2, F.lit("--"))
        .when(k == 3, F.lit("N/A"))
        .when(k == 4, iso)
        .otherwise(F.lit(None).cast("string"))
    )


@query(
    "cleanse_timestamp_scrub",
    oracle=f"""
    WITH raw AS (
      SELECT o_orderkey, {_DIRTY_TS_SQL} AS raw_ts
      FROM orders WHERE o_orderkey <= 3000
    )
    SELECT o_orderkey, raw_ts,
           CAST(CASE WHEN regexp_matches(raw_ts, '^[A-Za-z]{{1,3}}$')
                       OR LENGTH(raw_ts) <= 3
                       OR NOT regexp_matches(raw_ts, '.*[0-9]+.*')
                     THEN NULL
                     ELSE TRY_CAST(raw_ts AS TIMESTAMP) END AS VARCHAR) AS parsed_ts
    FROM raw ORDER BY o_orderkey
    """,
)
def cleanse_timestamp_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    raw = orders.select("o_orderkey", _dirty_ts_col().alias("raw_ts"))
    scrubbed = F.when(
        invalid_timestamp_predicate(F.col("raw_ts")), F.lit(None).cast("string")
    ).otherwise(F.col("raw_ts"))
    return raw.select(
        "o_orderkey",
        "raw_ts",
        F.to_timestamp(scrubbed).cast("timestamp_ntz").cast("string").alias("parsed_ts"),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# F5: future-timestamp capping against injected as_of (ingest.py:734-748)
# --------------------------------------------------------------------------
@query(
    "cleanse_future_cap",
    oracle=f"""
    SELECT o_orderkey,
           CAST(o_orderdate AS VARCHAR) AS o_orderdate,
           CAST(CASE WHEN o_orderdate > TIMESTAMP '{AS_OF}'
                     THEN TIMESTAMP '{AS_OF}' ELSE o_orderdate END AS VARCHAR) AS capped_date,
           (o_orderdate > TIMESTAMP '{AS_OF}') AS was_future
    FROM orders
    ORDER BY o_orderkey
    """,
)
def cleanse_future_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lcr_etl_upgrade_spark.operators.cleanse import cap_future_timestamps

    orders = load_table(spark, sf_dir, "orders")
    capped = cap_future_timestamps(orders, ["o_orderdate"], as_of=AS_OF, output_suffix="_capped")
    return capped.select(
        "o_orderkey",
        F.col("o_orderdate").cast("string").alias("o_orderdate"),
        F.col("o_orderdate_capped").cast("string").alias("capped_date"),
        (F.col("o_orderdate") > F.lit(AS_OF).cast("timestamp_ntz")).alias("was_future"),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# C4/C5: decimal & double coercion from strings (ingest.py:584-591)
# --------------------------------------------------------------------------
@query(
    "cleanse_numeric_coercion",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CASE o_orderkey % 4 WHEN 0 THEN CAST(o_totalprice AS VARCHAR)
                  WHEN 1 THEN 'not-a-number'
                  WHEN 2 THEN CAST(o_custkey AS VARCHAR) ELSE NULL END AS raw_num
      FROM orders WHERE o_orderkey <= 3000
    )
    SELECT o_orderkey, raw_num,
           TRY_CAST(raw_num AS DOUBLE) AS as_double,
           CAST(TRY_CAST(raw_num AS DECIMAL(38,2)) AS VARCHAR) AS as_decimal_str
    FROM raw ORDER BY o_orderkey
    """,
)
def cleanse_numeric_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    k = F.col("o_orderkey") % 4
    raw_num = (
        F.when(k == 0, F.col("o_totalprice").cast("string"))
        .when(k == 1, F.lit("not-a-number"))
        .when(k == 2, F.col("o_custkey").cast("string"))
        .otherwise(F.lit(None).cast("string"))
    )
    raw = orders.select("o_orderkey", raw_num.alias("raw_num"))
    return raw.select(
        "o_orderkey",
        "raw_num",
        F.col("raw_num").try_cast("double").alias("as_double"),
        F.col("raw_num").try_cast("decimal(38,2)").cast("string").alias("as_decimal_str"),
    ).orderBy("o_orderkey")
