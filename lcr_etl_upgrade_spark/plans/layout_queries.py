"""Data-layout queries: the oracle-able face of operators/layout.py.

``layout_zorder_key`` hash-checks the Morton-key arithmetic itself
(bucketize -> bit-interleave) against DuckDB computing the identical
floor/clamp/shift spelling — the clustering key a 100 TB OPTIMIZE-style
rewrite would range-partition on. The LAYOUT effect (file/row-group
pruning) is measured separately in tests/test_layout.py, where parquet
footer stats are counted directly; a query result can't witness that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.operators.layout import (
    uniform_bucket,
    zorder_key,
    zorder_key_sql,
)
from lcr_etl_upgrade_spark.plans.registry import query
from lcr_etl_upgrade_spark.sources.testdata import load_table

# Fixed bounds so the key is deterministic and oracle-able (uniform
# cells; the skew-robust quantile path is exercised in tests instead —
# its approxQuantile boundaries are engine-specific by design).
_ZBITS = 8
_ZCOLS = [("l_extendedprice", 0.0, 120000.0), ("l_quantity", 0.0, 64.0)]


@query(
    "layout_zorder_key",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {zorder_key_sql(_ZCOLS, _ZBITS)} AS zkey
    FROM lineitem
    ORDER BY zkey, l_orderkey, l_linenumber
    """,
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton / Z-order clustering key over (price, quantity): the exact
    integer the layout optimizer range-partitions and sorts by. 16
    shift/mask/or terms, all inside whole-stage codegen — no UDF, no
    shuffle beyond the final presentation sort."""
    li = load_table(spark, sf_dir, "lineitem")
    buckets = [
        uniform_bucket(name, lo, hi, _ZBITS) for name, lo, hi in _ZCOLS
    ]
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            zorder_key(buckets, _ZBITS).alias("zkey"),
        )
        .orderBy("zkey", "l_orderkey", "l_linenumber")
    )
