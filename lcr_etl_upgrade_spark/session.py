"""SparkSession factory.

Defaults tuned for the test harness (single JVM, ``local[N]``) while staying
cluster-correct: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), shuffle partitions sized to cores locally (a real cluster run
overrides via ``spark.sql.shuffle.partitions``), UTC session timezone so
timestamp semantics are deterministic and oracle-comparable, Arrow enabled
for any pandas-UDF path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# The driver-generated events table stores TIMESTAMP(NANOS) parquet, which
# Spark's reader rejects unless nanos are surfaced as raw longs.
NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"


def get_session(
    app_name: str = "lcr_etl_upgrade_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-sane defaults."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # PySpark's DataFrame-debugging wrapper adds ~3 py4j round-trips +
        # a Python stack walk to EVERY DataFrame/Column API call to tag
        # errors with their Python call site. On wide plans that is the
        # dominant driver cost: the 101-column lead pipeline measured
        # 1.35s of pure plan construction with it on, 0.73s off. Error
        # MESSAGES are unchanged — only the "called from file:line"
        # origin tag is dropped. (Read once per process and cached, so it
        # must be set before the first DataFrame call, i.e. here.)
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config(NANOS_AS_LONG, "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_runtime_conf(spark: SparkSession) -> SparkSession:
    """Set session-settable confs this engine relies on.

    Called from loaders so externally-provided sessions (the verify driver
    builds its own) behave identically to ours.
    """
    try:
        spark.conf.set(NANOS_AS_LONG, "true")
    except Exception:
        pass  # static conf on some builds; reader falls back to pyarrow
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    return spark
