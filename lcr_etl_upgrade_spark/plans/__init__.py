"""Named query library.

Every implemented operator from SURVEY.md §2 is exposed here as a named
query ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an ANSI
SQL oracle string that DuckDB runs on the same parquet tables. The driver
hash-compares the two at sf=0.01; this is the correctness gate.

Registration happens via the ``@query`` decorator; importing the submodules
populates the registry.
"""

from __future__ import annotations

from lcr_etl_upgrade_spark.plans.registry import ORACLES, QUERIES, query  # noqa: F401

# Import for side effect: populate the registry.
from lcr_etl_upgrade_spark.plans import relational  # noqa: E402,F401
from lcr_etl_upgrade_spark.plans import events  # noqa: E402,F401
from lcr_etl_upgrade_spark.plans import conformance  # noqa: E402,F401
from lcr_etl_upgrade_spark.plans import llm  # noqa: E402,F401
from lcr_etl_upgrade_spark.plans import extended  # noqa: E402,F401
from lcr_etl_upgrade_spark.plans import merge_queries  # noqa: E402,F401
from lcr_etl_upgrade_spark.plans import lifecycle  # noqa: E402,F401
from lcr_etl_upgrade_spark.plans import multimodal  # noqa: E402,F401
from lcr_etl_upgrade_spark.plans import tpch_extra  # noqa: E402,F401
from lcr_etl_upgrade_spark.plans import layout_queries  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
