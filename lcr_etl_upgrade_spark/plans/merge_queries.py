"""Merge/upsert and SCD2 queries (batch MERGE-INTO emulation, oracled)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.plans.registry import query
from lcr_etl_upgrade_spark.sources.testdata import load_table

AS_OF = "1999-06-01 00:00:00"

_UPDATES_SQL = """
      SELECT c_custkey + 100000 AS c_custkey, c_name, c_nationkey,
             c_acctbal + 1000.0 AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey, 0.0 AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 7 = 0
"""


def _updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    inserts = cust.filter(F.col("c_custkey") % 10 == 0).select(
        (F.col("c_custkey") + 100000).alias("c_custkey"),
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        "c_mktsegment",
    )
    changes = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        "c_mktsegment",
    )
    return inserts.unionByName(changes)


@query(
    "merge_upsert",
    oracle=f"""
    WITH updates AS ({_UPDATES_SQL})
    SELECT c.c_custkey, c.c_name, c.c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
    UNION ALL
    SELECT c_custkey, c_name, c_acctbal FROM updates
    ORDER BY c_custkey
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics: rows matched by key are replaced by the update,
    unmatched updates are inserted, everything else is untouched."""
    from lcr_etl_upgrade_spark.operators.merge import upsert

    cust = load_table(spark, sf_dir, "customer")
    merged = upsert(cust, _updates(spark, sf_dir), ["c_custkey"], broadcast_updates=True)
    return merged.select("c_custkey", "c_name", "c_acctbal").orderBy("c_custkey")


@query(
    "merge_scd2",
    oracle=f"""
    WITH updates AS (
      SELECT c_custkey, 0.0 AS c_acctbal FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT c.c_custkey, c.c_acctbal,
           '1995-01-01 00:00:00' AS valid_from,
           CAST(NULL AS VARCHAR) AS valid_to,
           TRUE AS is_current
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
    UNION ALL
    SELECT c.c_custkey, c.c_acctbal,
           '1995-01-01 00:00:00' AS valid_from,
           '{AS_OF}' AS valid_to,
           FALSE AS is_current
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
    UNION ALL
    SELECT c_custkey, c_acctbal, '{AS_OF}' AS valid_from,
           CAST(NULL AS VARCHAR) AS valid_to, TRUE AS is_current
    FROM updates
    ORDER BY c_custkey, valid_from
    """,
)
def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2: updated keys get their current version closed at as_of and a
    new open-ended version appended; history rows ride along untouched."""
    from lcr_etl_upgrade_spark.operators.merge import scd2_apply

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    dim = cust.withColumns(
        {
            "VALID_FROM": F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"),
            "VALID_TO": F.lit(None).cast("timestamp_ntz"),
            "IS_CURRENT": F.lit(True),
        }
    )
    updates = (
        cust.filter(F.col("c_custkey") % 7 == 0)
        .select("c_custkey")
        .withColumn("c_acctbal", F.lit(0.0))
    )
    out = scd2_apply(dim, updates, ["c_custkey"], as_of=AS_OF)
    return out.select(
        "c_custkey",
        "c_acctbal",
        F.col("VALID_FROM").cast("string").alias("valid_from"),
        F.col("VALID_TO").cast("string").alias("valid_to"),
        F.col("IS_CURRENT").alias("is_current"),
    ).orderBy("c_custkey", "valid_from")
