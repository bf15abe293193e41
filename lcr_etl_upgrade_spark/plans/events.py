"""Event-stream queries: JSON extraction, time windows, sessionization,
as-of join, incremental watermark filter (SURVEY.md §2.10, L6).

All run in batch over the `events` table; the same logical operations are
exposed as Structured Streaming transforms in ``lcr_etl_upgrade_spark.streaming``
(time-bucketed aggregation via window/date_trunc is batch/stream identical).

Determinism notes: event timestamps carry microseconds, so gap and as-of
comparisons use exact integer epoch-microseconds (never float seconds), and
grouped time buckets are emitted as strings to sidestep engine timestamp-
type differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.functions.numeric import (
    davg,
    dquantize,
    dsum,
    dsum_final,
)
from lcr_etl_upgrade_spark.plans.registry import query
from lcr_etl_upgrade_spark.sources.testdata import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def _epoch_us(col):
    # timestamp_ntz wall-time == UTC instant under our UTC session config.
    return F.unix_micros(col.cast("timestamp"))


# --------------------------------------------------------------------------
# L6: JSON extraction from string props
# --------------------------------------------------------------------------
@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(TRY_CAST(CASE WHEN json_valid(props)
                    THEN json_extract_string(props, '$.k') END AS INTEGER) AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value) AS avg_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # try_cast: under ANSI mode a plain cast THROWS on an out-of-range or
    # non-numeric prop value — one bad row would kill a 100 TB job where
    # NULL-and-continue is the right semantics
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").try_cast("int"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("k").cast("long")).alias("sum_k"),
            davg("value", "avg_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Tumbling time window (batch form of a streaming windowed aggregation)
# --------------------------------------------------------------------------
@query(
    "events_tumbling_window",
    oracle="""
    SELECT CAST(DATE_TRUNC('hour', ts) AS VARCHAR) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts"))
            .cast("timestamp_ntz")
            .cast("string")
            .alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# Sliding window: each event lands in every window covering it
# (1-hour windows sliding by 30 minutes => 2 buckets per event)
# --------------------------------------------------------------------------
@query(
    "events_sliding_window",
    oracle="""
    WITH slid AS (
      SELECT CAST(DATE_TRUNC('hour', ts) AS VARCHAR) AS window_start, value FROM events
      UNION ALL
      SELECT CAST(DATE_TRUNC('hour', ts + INTERVAL 30 MINUTE) - INTERVAL 30 MINUTE AS VARCHAR)
             AS window_start, value FROM events
    )
    SELECT window_start, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM slid GROUP BY 1 ORDER BY 1
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Emit one row per covering window (the streaming sliding-window
    # semantics of F.window(ts, "1 hour", "30 minutes"), spelled with
    # date_trunc so the oracle SQL is engine-portable).
    # value is pre-quantized below the explode: the aggregate child is
    # evaluated per exploded row (2x per event here); dquantize runs the
    # chain once and the explode copies a compact decimal
    # (dsum(c) ≡ dsum_final(dquantize(c)), hash-identical).
    return (
        ev.select(
            F.explode(
                F.array(
                    F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz"),
                    (
                        F.date_trunc(
                            "hour", F.col("ts") + F.expr("INTERVAL 30 MINUTES")
                        )
                        - F.expr("INTERVAL 30 MINUTES")
                    ).cast("timestamp_ntz"),
                )
            ).alias("window_start_ts"),
            dquantize("value", "__q"),
        )
        .groupBy(F.col("window_start_ts").cast("string").alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n"), dsum_final("__q", "total_value"))
        .orderBy("window_start")
    )


def session_ids(ev: DataFrame, gap_us_expr) -> DataFrame:
    """Shared lag/cumsum sessionization core (used by the fixed-gap
    ``sessionize`` and the dynamic-gap query in plans.extended): per
    user in (ts, event_id) order, a session breaks where the gap to the
    previous event exceeds the PREVIOUS row's gap allowance
    (``gap_us_expr``, epoch microseconds — pass a literal for a fixed
    gap). Interval arithmetic on TIMESTAMP_NTZ is exactly epoch-us
    arithmetic, so one spelling serves both. The event_id tiebreaker
    keeps duplicate (user_id, ts) rows deterministic in BOTH the
    marking and running-sum windows. Returns the input columns plus
    ``session_id``."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    prev_ts = F.lag("ts").over(w)
    allowance = F.lag(gap_us_expr).over(w)
    marked = ev.withColumn(
        "is_new",
        F.when(
            prev_ts.isNull()
            | (_epoch_us(F.col("ts")) - _epoch_us(prev_ts) > allowance),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return marked.withColumn(
        "session_id", F.sum("is_new").over(wrun).cast("long")
    ).drop("is_new")


def sessionize(ev: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Batch lag/cumsum sessionization over (user_id, event_id, ts, value):
    a session breaks where the gap to the previous event (per user, in
    (ts, event_id) order) exceeds ``gap_us``. One shuffle on user_id;
    both windows share it. The running sum carries the same event_id
    tiebreaker as the marking window: with ORDER BY ts alone, duplicate
    (user_id, ts) rows take an engine/partitioning-dependent ROWS-frame
    order and the tied rows' session_id flips.

    NULL-ts events are dropped explicitly: they cannot be sessionized,
    and leaving them to window NULL ordering diverges across engines
    (Spark sorts NULLS FIRST ascending, DuckDB NULLS LAST)."""
    ev = ev.filter(F.col("ts").isNotNull()).select(
        "user_id", "event_id", "ts", "value"
    )
    return (
        session_ids(ev, F.lit(gap_us))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").cast("string").alias("session_start"),
            F.max("ts").cast("string").alias("session_end"),
            dsum("value", "session_value"),
        )
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------------
# Sessionization: gap > 30 min starts a new session (lag + cumulative sum)
# --------------------------------------------------------------------------
@query(
    "events_sessionization",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WHERE ts IS NOT NULL  -- unsessionizable; NULL window ordering also differs across engines
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(MIN(ts) AS VARCHAR) AS session_start,
           CAST(MAX(ts) AS VARCHAR) AS session_end,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# J5: as-of join — each purchase matched to the latest prior view of the
# same user. Implemented as union + running last() window (LINEAR, one
# shuffle); the oracle states the classic range-join + row_number
# formulation, so the hash-match doubles as the semantic cross-check.
# The range-join shape materializes purchases x views per user before
# discarding all but one row — quadratic for a hot user; see
# operators/joins.py:asof_join_backward and tests/test_joins_skew.py.
# --------------------------------------------------------------------------
@query(
    "events_asof_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), views AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'view'
    ), paired AS (
      SELECT p.event_id, p.user_id, p.ts AS purchase_ts, p.value AS purchase_value,
             v.ts AS view_ts, v.value AS view_value,
             -- v.value DESC tiebreak: duplicate-ts views are in-domain,
             -- and the Spark side deterministically resolves same-instant
             -- ties to the greatest (ts, value) struct — an untied
             -- ROW_NUMBER here would be nondeterministic in DuckDB
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY v.ts DESC, v.value DESC) AS rn
      FROM purchases p JOIN views v
        ON v.user_id = p.user_id AND v.ts <= p.ts
    )
    SELECT event_id, user_id,
           CAST(purchase_ts AS VARCHAR) AS purchase_ts,
           purchase_value,
           CAST(view_ts AS VARCHAR) AS last_view_ts,
           view_value AS last_view_value
    FROM paired WHERE rn = 1
    ORDER BY event_id
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lcr_etl_upgrade_spark.operators.joins import asof_join_backward

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    joined = asof_join_backward(
        purchases,
        views,
        key="user_id",
        left_ts="purchase_ts",
        right_ts="view_ts",
        value_cols=["view_value"],
    )
    return (
        # inner-join semantics of the oracle: purchases with no prior view drop
        joined.filter(F.col("view_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("purchase_ts").cast("string").alias("purchase_ts"),
            "purchase_value",
            F.col("view_ts").cast("string").alias("last_view_ts"),
            F.col("view_value").alias("last_view_value"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# F1+C10: incremental watermark filter with modify-date backfill
# (the reference's CDC-lite pattern, ingest.py:802-805, made deterministic)
# --------------------------------------------------------------------------
@query(
    "events_incremental_filter",
    oracle="""
    WITH raw AS (
      SELECT event_id, user_id, event_type, value,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE ts END AS modify_date,
             ts - INTERVAL 1 DAY AS create_date
      FROM events
    )
    SELECT event_id, user_id, event_type, value,
           CAST(COALESCE(modify_date, create_date) AS VARCHAR) AS effective_modify_date
    FROM raw
    WHERE COALESCE(modify_date, create_date) >= TIMESTAMP '2024-01-20 00:00:00'
    ORDER BY event_id
    """,
)
def events_incremental_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    raw = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("ts")).alias("modify_date"),
        (F.col("ts") - F.expr("INTERVAL 1 DAY")).alias("create_date"),
    )
    watermark = F.lit("2024-01-20 00:00:00").cast("timestamp_ntz")
    return (
        raw.withColumn(
            "effective_modify_date", F.coalesce("modify_date", "create_date")
        )
        .filter(F.col("effective_modify_date") >= watermark)
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.col("effective_modify_date").cast("string").alias("effective_modify_date"),
        )
        .orderBy("event_id")
    )
