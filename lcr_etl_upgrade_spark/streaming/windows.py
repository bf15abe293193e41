"""Structured Streaming operators (SURVEY.md §2.10 [EXT]).

The reference is pure batch; its only stream-like behavior is the persisted
watermark + MODIFY_DATE filter (operators.incremental). These transforms
provide the real streaming surface on public APIs: event-time watermarks,
tumbling/sliding/session windows, and stateful dedup.

Every function takes and returns a DataFrame and works identically on a
batch frame or a readStream frame — windowed aggregation is the
batch/stream-unified part of Spark's model. Tests drive them with a
file-source readStream + memory sink (processAllAvailable), the public
local pattern for deterministic streaming tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window count+sum per key with a late-data watermark."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    value_col: str = "value",
) -> DataFrame:
    """Sliding-window aggregate: each event lands in window/slide buckets."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "total_value",
        )
    )


def sessionized_stream(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    value_col: str = "value",
) -> DataFrame:
    """Session windows with a dynamic gap (F.session_window) — the
    streaming-native equivalent of the batch lag/cumsum sessionization in
    plans.events."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("s"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("session_value"),
        )
        .select(
            F.col(key_col),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stateful exact dedup within the watermark horizon
    (dropDuplicatesWithinWatermark on a stream; plain dropDuplicates in
    batch)."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def stateful_running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key
    running (count, sum, max) maintained in GroupState across
    micro-batches; each batch that touches a key emits that key's updated
    totals (output mode 'update').

    This is the public pattern for stateful logic the built-in windowed
    aggregations can't express (cross-batch accumulators, custom
    eviction, session machines). State per key is three scalars — at 100
    TB-of-stream scale the state store grows with |keys|, not |events|,
    and the grouping shuffle is the only shuffle.

    Batch frames take the equivalent one-shot groupBy — final state ==
    batch aggregate over the same rows, which the equivalence test
    asserts (tests/test_incremental_streaming.py).
    """
    # the key field keeps the input's real type (a hardcoded 'long' would
    # fail or mis-cast string/decimal keys, breaking stream==batch parity)
    from pyspark.sql.types import StructField, StructType

    key_type = events.schema[key_col].dataType
    out_schema = StructType(
        [StructField(key_col, key_type)]
        + list(StructType.fromDDL("n long, total double, max_value double"))
    )
    if not events.isStreaming:
        return events.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("double")).alias("total"),
            F.max(F.col(value_col).cast("double")).alias("max_value"),
        )

    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import numpy as _np

        n, total, mx = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            vals = pdf[value_col].astype("float64").to_numpy()
            n += len(pdf)
            # Spark aggregate parity: sum/max IGNORE missing values and
            # are NULL when no valid value was ever seen — pandas' skipna
            # sum() of an all-missing series is 0.0, which silently
            # diverged from the batch twin. (Arrow hands Python NULL and
            # NaN indistinguishably as NaN for float columns, so actual
            # NaN inputs are treated as missing on this path — the one
            # documented divergence from Spark's NaN-propagating sum.)
            valid = vals[~_np.isnan(vals)]
            if len(valid):
                total = (total or 0.0) + float(valid.sum())
                vmax = float(valid.max())
                mx = vmax if mx is None else max(mx, vmax)
        state.update((n, total, mx))
        yield pd.DataFrame(
            {key_col: [key[0]], "n": [n], "total": [total], "max_value": [mx]}
        )

    return (
        events.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType="n long, total double, max_value double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
