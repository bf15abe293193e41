"""lcr_etl_upgrade_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
repo `ayan980801/lcr-etl-upgrade` (a two-stage PySpark ETL pipeline:
JDBC->Delta sync + Delta->warehouse conform/cleanse/enrich ingest), extended
with a full relational operator surface and LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing), designed for
100 TB scale: declarative DataFrame plans (Catalyst optimizes), broadcast
joins for dims, no driver-side loops on data paths, Arrow-vectorized pandas
UDFs only where built-ins can't express the semantics.

Layout:
    session      — SparkSession factory (AQE, UTC, Arrow on)
    sources      — readers: parquet/csv/json/jdbc/text/delta/avro +
                   testdata loader
    sinks        — writers: parquet/csv/json/delta/avro/jdbc
    delta_lite   — the public Delta transaction-log protocol (log-replay
                   reads incl. time travel, atomic v1 commits) backing
                   the delta paths when delta-spark is absent
    avro_lite    — the open Avro container format (binary codec both
                   directions) backing the avro paths without spark-avro
    operators    — conform / cleanse / incremental / dedup / similarity /
                   text / multimodal operator library (DataFrame -> DataFrame)
    functions    — reusable Column-expression helpers
    plans        — the named query library exposed through __spark_entry__
    streaming    — Structured Streaming equivalents of the batch operators
    pipeline     — config-driven table pipeline runner (the reference's
                   sync/ingest flow, generalized)
"""

__version__ = "0.1.0"
