from lcr_etl_upgrade_spark.streaming.windows import (
    sessionized_stream,
    sliding_counts,
    stateful_running_totals,
    streaming_dedup,
    tumbling_counts,
)

__all__ = [
    "sessionized_stream",
    "sliding_counts",
    "stateful_running_totals",
    "streaming_dedup",
    "tumbling_counts",
]
