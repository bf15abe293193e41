from lcr_etl_upgrade_spark.sources.testdata import TABLES, load_all, load_table

__all__ = ["TABLES", "load_all", "load_table"]
