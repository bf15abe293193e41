from lcr_etl_upgrade_spark.sinks.registry import Sink, get_sink, write

__all__ = ["Sink", "get_sink", "write"]
