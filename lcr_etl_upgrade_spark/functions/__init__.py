from lcr_etl_upgrade_spark.functions.numeric import davg, dsum
from lcr_etl_upgrade_spark.functions.cleansing import (
    boolean_expr,
    boolean_string_expr,
    invalid_timestamp_predicate,
    residual_garbage_predicate,
)

__all__ = [
    "davg",
    "dsum",
    "boolean_expr",
    "boolean_string_expr",
    "invalid_timestamp_predicate",
    "residual_garbage_predicate",
]
