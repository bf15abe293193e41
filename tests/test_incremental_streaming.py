"""Watermark/incremental cycle (F1/F2/C10) and Structured Streaming
windowed operators (memory sink + processAllAvailable)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.operators.incremental import (
    DEFAULT_WATERMARK,
    WatermarkStore,
    incremental_filter,
    run_incremental,
)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "id long, MODIFY_DATE timestamp_ntz, CREATE_DATE timestamp_ntz"
    )


def test_watermark_store_default_on_missing(tmp_path):
    store = WatermarkStore(str(tmp_path))
    assert store.read("nope") == DEFAULT_WATERMARK
    store.write("t", "2024-06-01 00:00:00")
    assert store.read("t") == "2024-06-01 00:00:00"


def test_incremental_filter_backfills_modify_date(spark):
    df = _frame(
        spark,
        [
            (1, dt.datetime(2024, 6, 2), dt.datetime(2024, 1, 1)),
            (2, None, dt.datetime(2024, 6, 3)),   # null modify -> create used
            (3, dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 1)),
        ],
    )
    got = sorted(
        r.id for r in incremental_filter(df, "2024-06-01 00:00:00").collect()
    )
    assert got == [1, 2]


def test_run_incremental_cycle(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm"))
    out = str(tmp_path / "out")
    df = _frame(
        spark,
        [
            (1, dt.datetime(2024, 6, 2), dt.datetime(2024, 1, 1)),
            (2, dt.datetime(2024, 6, 5), dt.datetime(2024, 1, 1)),
        ],
    )
    sink = lambda d: d.write.mode("append").parquet(out)  # noqa: E731
    n = run_incremental(spark, df, "t", store, sink)
    assert n == 2
    # watermark advanced to batch max(MODIFY_DATE), not wall clock
    assert store.read("t") == "2024-06-05 00:00:00"
    # second run: watermark == max(MODIFY_DATE), so only the boundary row
    # re-loads (the reference's >= comparison, ingest.py:805 — kept so a
    # row modified exactly at the watermark is never silently skipped)
    assert run_incremental(spark, df, "t", store, sink) == 1


def test_run_incremental_boundary_idempotent_with_key(spark, tmp_path):
    """With key_col the boundary rows written at the watermark instant are
    excluded next run: a plain append sink accumulates no duplicates."""
    store = WatermarkStore(str(tmp_path / "wm"))
    out = str(tmp_path / "out")
    df = _frame(
        spark,
        [
            (1, dt.datetime(2024, 6, 2), dt.datetime(2024, 1, 1)),
            (2, dt.datetime(2024, 6, 5), dt.datetime(2024, 1, 1)),
            (3, dt.datetime(2024, 6, 5), dt.datetime(2024, 1, 1)),  # tie at max
        ],
    )
    sink = lambda d: d.write.mode("append").parquet(out)  # noqa: E731
    assert run_incremental(spark, df, "t", store, sink, key_col="id") == 3
    wm, boundary = store.read_state("t")
    assert wm == "2024-06-05 00:00:00"
    assert sorted(boundary) == ["2", "3"]
    # no new data: second and third runs are true no-ops
    assert run_incremental(spark, df, "t", store, sink, key_col="id") == 0
    assert run_incremental(spark, df, "t", store, sink, key_col="id") == 0
    assert spark.read.parquet(out).count() == 3
    # a NEW row at the exact old watermark instant is still picked up
    df2 = df.union(
        _frame(spark, [(4, dt.datetime(2024, 6, 5), dt.datetime(2024, 1, 1))])
    )
    assert run_incremental(spark, df2, "t", store, sink, key_col="id") == 1
    assert spark.read.parquet(out).count() == 4
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == [1, 2, 3, 4]
    # the standing watermark UNIONs boundary keys (an overwrite here would
    # keep only "4", re-admitting 2 and 3 next run as duplicates)
    wm2, boundary2 = store.read_state("t")
    assert wm2 == "2024-06-05 00:00:00"
    assert sorted(boundary2) == ["2", "3", "4"]
    assert run_incremental(spark, df2, "t", store, sink, key_col="id") == 0
    assert spark.read.parquet(out).count() == 4


def test_run_incremental_null_key_never_silently_dropped(spark, tmp_path):
    """A NULL key at the watermark instant must be KEPT by the boundary
    exclusion (three-valued NOT-IN would drop it) and never recorded as
    a boundary key — it re-selects next run instead of vanishing."""
    store = WatermarkStore(str(tmp_path / "wm"))
    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 6, 5), dt.datetime(2024, 1, 1)),
            (None, dt.datetime(2024, 6, 5), dt.datetime(2024, 1, 1)),
        ],
        "k string, MODIFY_DATE timestamp_ntz, CREATE_DATE timestamp_ntz",
    )
    sink = lambda d: d.write.mode("append").parquet(out)  # noqa: E731
    assert run_incremental(spark, df, "t", store, sink, key_col="k") == 2
    _, boundary = store.read_state("t")
    assert boundary == ["a"]  # NULL key not recorded
    # next run: the NULL-keyed boundary row re-selects (documented
    # contract: exact idempotence needs a non-null key), the 'a' row
    # is excluded, and crucially nothing errors or silently drops
    assert run_incremental(spark, df, "t", store, sink, key_col="k") == 1
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert got.filter(F.col("k").isNull()).count() == 2


def test_streaming_tumbling_window(spark, tmp_path):
    """File-source readStream -> windowed agg -> memory sink: the public
    deterministic local pattern for streaming tests."""
    from lcr_etl_upgrade_spark.streaming import tumbling_counts

    src_dir = str(tmp_path / "stream_src")
    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 5), "click", 1.0),
        (2, dt.datetime(2024, 1, 1, 10, 55), "click", 2.0),
        (3, dt.datetime(2024, 1, 1, 11, 5), "view", 3.0),
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    batch.write.mode("overwrite").parquet(src_dir)

    stream = spark.readStream.schema(batch.schema).parquet(src_dir)
    agg = tumbling_counts(stream, window="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r.window_start), r.event_type): (r.n, r.total_value)
            for r in spark.sql("SELECT * FROM tumbling_out").collect()
        }
    finally:
        q.stop()
    assert got[("2024-01-01 10:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 11:00:00", "view")] == (1, 3.0)
    # batch/stream unification: same transform on the batch frame agrees
    batch_got = {
        (str(r.window_start), r.event_type): (r.n, r.total_value)
        for r in tumbling_counts(batch, window="1 hour").collect()
    }
    assert batch_got == got


def test_streaming_dedup_batch_path(spark):
    from lcr_etl_upgrade_spark.streaming import streaming_dedup

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1)), (1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 2))],
        "k long, ts timestamp",
    )
    assert streaming_dedup(df, ["k"]).count() == 2


def test_streaming_session_window(spark, tmp_path):
    from lcr_etl_upgrade_spark.streaming import sessionized_stream

    src_dir = str(tmp_path / "sess_src")
    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0), 7, 1.0),
        (2, dt.datetime(2024, 1, 1, 10, 10), 7, 2.0),   # same session (10 min gap)
        (3, dt.datetime(2024, 1, 1, 12, 0), 7, 4.0),    # new session (110 min gap)
        (4, dt.datetime(2024, 1, 1, 10, 5), 8, 8.0),
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    batch.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(batch.schema).parquet(src_dir)
    q = (
        sessionized_stream(stream, gap="30 minutes")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sessions_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, str(r.session_start)): (r.n_events, r.session_value)
            for r in spark.sql("SELECT * FROM sessions_out").collect()
        }
    finally:
        q.stop()
    assert got[(7, "2024-01-01 10:00:00")] == (2, 3.0)
    assert got[(7, "2024-01-01 12:00:00")] == (1, 4.0)
    assert got[(8, "2024-01-01 10:05:00")] == (1, 8.0)


def test_streaming_foreach_batch_sink(spark, tmp_path):
    """foreachBatch: the exactly-once custom-sink seam (reference K2's
    connector write maps here in a streaming deployment)."""
    src_dir = str(tmp_path / "fb_src")
    out_dir = str(tmp_path / "fb_out")
    batch = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    )
    batch.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(batch.schema).parquet(src_dir)

    def handle(bdf, epoch_id):
        bdf.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out_dir)

    q = stream.writeStream.foreachBatch(handle).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out_dir)
    assert got.count() == 2
    assert set(got.columns) == {"id", "v", "epoch"}


def test_stateful_running_totals_applyinpandas_with_state(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): per-key state
    accumulates ACROSS micro-batches, and the final emitted state equals
    the one-shot batch aggregate over the same rows."""
    from lcr_etl_upgrade_spark.streaming import stateful_running_totals

    src_dir = tmp_path / "state_src"
    src_dir.mkdir()
    schema = "user_id long, value double"
    batch1 = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], schema
    )
    batch2 = spark.createDataFrame(
        [(1, 30.0), (2, 1.0), (3, 7.0)], schema
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(str(src_dir / "b1"))

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir / "*"))
    )
    out = stateful_running_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .start()
    )
    try:
        q.processAllAvailable()
        mid = {
            r.user_id: (r.n, r.total)
            for r in spark.sql("SELECT * FROM running_totals").collect()
        }
        # first micro-batch state
        assert mid[1] == (2, 30.0) and mid[2] == (1, 5.0)
        batch2.coalesce(1).write.mode("overwrite").parquet(str(src_dir / "b2"))
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM running_totals").collect()
    finally:
        q.stop()
    # memory sink in update mode appends each emission; last row per key
    # is the final state
    final = {}
    for r in rows:
        final[r.user_id] = (r.n, r.total, r.max_value)
    assert final == {
        1: (3, 60.0, 30.0),
        2: (2, 6.0, 5.0),
        3: (1, 7.0, 7.0),
    }
    # batch equivalence: the batch path's one-shot aggregate agrees
    all_rows = batch1.union(batch2)
    batch_got = {
        r.user_id: (r.n, r.total, r.max_value)
        for r in stateful_running_totals(all_rows).collect()
    }
    assert batch_got == final


def test_stateful_running_totals_string_key(spark, tmp_path):
    """The output schema's key field must carry the INPUT's key type —
    a string-keyed stream previously hit a hardcoded 'long' field and
    failed/mis-cast at runtime."""
    from lcr_etl_upgrade_spark.streaming import stateful_running_totals

    src_dir = tmp_path / "state_src_str"
    src_dir.mkdir()
    schema = "user_id string, value double"
    batch = spark.createDataFrame([("a", 10.0), ("a", 20.0), ("b", 5.0)], schema)
    batch.coalesce(1).write.mode("overwrite").parquet(str(src_dir / "b1"))
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir / "*"))
    )
    q = (
        stateful_running_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals_str")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.user_id: (r.n, r.total, r.max_value)
            for r in spark.sql("SELECT * FROM running_totals_str").collect()
        }
    finally:
        q.stop()
    assert got == {"a": (2, 30.0, 20.0), "b": (1, 5.0, 5.0)}
    batch_got = {
        r.user_id: (r.n, r.total, r.max_value)
        for r in stateful_running_totals(batch).collect()
    }
    assert batch_got == got


def test_streaming_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed aggregation with a watermark: a window is
    finalized once the watermark passes its end, and an event arriving
    AFTER that (later micro-batch, older timestamp) must not resurrect
    or alter the closed window."""
    from lcr_etl_upgrade_spark.streaming import tumbling_counts

    src_dir = tmp_path / "late_src"
    src_dir.mkdir()
    schema = "event_id long, ts timestamp, event_type string, value double"
    on_time = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 10, 5), "click", 1.0),
            (2, dt.datetime(2024, 1, 1, 10, 20), "click", 2.0),
            # advances the watermark far past the 10:00 window's end
            (3, dt.datetime(2024, 1, 1, 15, 0), "click", 3.0),
        ],
        schema,
    )
    on_time.coalesce(1).write.parquet(str(src_dir / "b1"))
    stream = (
        spark.readStream.schema(on_time.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir / "*"))
    )
    agg = tumbling_counts(stream, window="1 hour", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # a late event for the already-finalized 10:00 window
        late = spark.createDataFrame(
            [(4, dt.datetime(2024, 1, 1, 10, 30), "click", 100.0)], schema
        )
        late.coalesce(1).write.parquet(str(src_dir / "b2"))
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM late_out").collect()
    finally:
        q.stop()
    got = {str(r.window_start): (r.n, r.total_value) for r in rows}
    # the 10:00 window was emitted from the on-time batch only: the late
    # value-100 event is dropped, not merged and not re-emitted
    assert got["2024-01-01 10:00:00"] == (2, 3.0)
    assert all(
        abs(t - 100.0) > 1e-9 for _, t in got.values()
    ), got


def test_streaming_foreach_batch_upsert(spark, tmp_path):
    """The reference's incremental load as a streaming pipeline:
    readStream -> foreachBatch(upsert into the target by key). Re-sent
    and updated keys converge to last-written state instead of
    accumulating — the idempotent-sink composition the incremental
    operators document."""
    from lcr_etl_upgrade_spark.operators.merge import upsert

    src_dir = tmp_path / "up_src"
    src_dir.mkdir()
    out = str(tmp_path / "target")
    schema = "id long, v string, MODIFY_DATE timestamp"
    b1 = spark.createDataFrame(
        [
            (1, "a1", dt.datetime(2024, 6, 1)),
            (2, "b1", dt.datetime(2024, 6, 1)),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (2, "b2", dt.datetime(2024, 6, 2)),  # update of key 2
            (3, "c1", dt.datetime(2024, 6, 2)),  # new key
        ],
        schema,
    )
    b1.coalesce(1).write.parquet(str(src_dir / "b1"))

    def apply_batch(bdf, epoch_id):
        spark_local = bdf.sparkSession
        try:
            current = spark_local.read.parquet(out)
            merged = upsert(current, bdf, ["id"])
        except Exception:  # first batch: no target yet
            merged = bdf
        # stage-then-swap: parquet can't read+overwrite the same path in
        # one job (Delta MERGE does this transactionally on a cluster)
        staged = f"{out}__stage_{epoch_id}"
        merged.write.mode("overwrite").parquet(staged)
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        shutil.move(staged, out)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir / "*"))
    )
    q = stream.writeStream.foreachBatch(apply_batch).start()
    try:
        q.processAllAvailable()
        assert {r.id: r.v for r in spark.read.parquet(out).collect()} == {
            1: "a1",
            2: "b1",
        }
        b2.coalesce(1).write.parquet(str(src_dir / "b2"))
        q.processAllAvailable()
    finally:
        q.stop()
    final = {r.id: r.v for r in spark.read.parquet(out).collect()}
    assert final == {1: "a1", 2: "b2", 3: "c1"}  # updated, inserted, kept


def test_stateful_operator_on_rocksdb_state_store(spark, tmp_path):
    """The production state-store config: RocksDBStateStoreProvider keeps
    per-key state off-heap/on-disk, so stateful-operator memory scales
    with the working set, not |keys| — the 100 TB-of-stream setting. The
    same applyInPandasWithState operator must run unchanged on it."""
    from lcr_etl_upgrade_spark.streaming import stateful_running_totals

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src_dir = tmp_path / "rocks_src"
        src_dir.mkdir()
        schema = "user_id long, value double"
        b1 = spark.createDataFrame([(1, 5.0), (2, 2.0)], schema)
        b1.coalesce(1).write.parquet(str(src_dir / "b1"))
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src_dir / "*"))
        )
        q = (
            stateful_running_totals(stream)
            .writeStream.outputMode("update")
            .option("checkpointLocation", str(tmp_path / "rocks_ckpt"))
            .format("memory")
            .queryName("rocks_totals")
            .start()
        )
        try:
            q.processAllAvailable()
            b2 = spark.createDataFrame([(1, 10.0)], schema)
            b2.coalesce(1).write.parquet(str(src_dir / "b2"))
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM rocks_totals").collect()
        finally:
            q.stop()
        final = {}
        for r in rows:
            final[r.user_id] = (r.n, r.total)
        assert final == {1: (2, 15.0), 2: (1, 2.0)}
    finally:
        spark.conf.set(key, prev)


def test_watermark_store_boundary_keys_roundtrip_hostile_strings(tmp_path):
    """Boundary keys are arbitrary cast-to-string business keys; a key
    containing a newline (or an empty string) must survive persistence —
    the JSON line format exists exactly for this."""
    store = WatermarkStore(str(tmp_path))
    keys = ["plain", "two\nlines", "tab\tkey", "", "unicode-é中"]
    store.write_state("t", "2024-06-05 00:00:00", keys)
    wm, got = store.read_state("t")
    assert wm == "2024-06-05 00:00:00"
    assert got == keys
    # corrupt key line degrades to plain >= semantics, never a crash
    with open(store._path("t"), "w") as fh:
        fh.write("2024-06-05 00:00:00\nnot-json[")
    assert store.read_state("t") == ("2024-06-05 00:00:00", [])


def test_watermark_store_legacy_scalar_state_degrades(tmp_path):
    """A second line holding a JSON *scalar* (legacy single-key formats)
    must degrade to plain >= semantics — a bare number used to raise
    TypeError on iteration, and a quoted string sheared into per-character
    phantom keys that could wrongly exclude live rows at the watermark."""
    store = WatermarkStore(str(tmp_path))
    for scalar in ("12345", '"abc"', "null", "true", '{"k": 1}'):
        with open(store._path("t"), "w") as fh:
            fh.write("2024-06-05 00:00:00\n" + scalar)
        wm, keys = store.read_state("t")
        assert wm == "2024-06-05 00:00:00"
        assert keys == []  # never ['a','b','c'], never a crash


def test_boundary_key_overflow_truncates_never_clears(
    spark, tmp_path, monkeypatch
):
    """Standing watermark + boundary union over MAX_BOUNDARY_KEYS: the
    state must keep a truncated subset of WRITTEN keys, never be cleared —
    clearing would re-admit every watermark-instant row next run as
    duplicates into a plain append sink. Dropped-tail keys may duplicate
    (the documented partial-idempotence degrade); re-admitting the whole
    instant must not happen."""
    from lcr_etl_upgrade_spark.operators import incremental as inc

    monkeypatch.setattr(inc, "MAX_BOUNDARY_KEYS", 3)
    store = WatermarkStore(str(tmp_path / "wm"))
    out = str(tmp_path / "out")
    sink = lambda d: d.write.mode("append").parquet(out)  # noqa: E731
    ts = dt.datetime(2024, 6, 5)
    old = dt.datetime(2024, 1, 1)
    df = _frame(spark, [(1, ts, old), (2, ts, old)])
    assert run_incremental(spark, df, "t", store, sink, key_col="id") == 2
    wm, b1 = store.read_state("t")
    assert wm == "2024-06-05 00:00:00" and sorted(b1) == ["1", "2"]
    # two NEW rows at the standing watermark instant: union = 4 keys > cap 3
    df2 = df.union(_frame(spark, [(3, ts, old), (4, ts, old)]))
    assert run_incremental(spark, df2, "t", store, sink, key_col="id") == 2
    _, b2 = store.read_state("t")
    assert len(b2) == 3  # truncated, NOT cleared
    assert set(b2) <= {"1", "2", "3", "4"}  # every kept key was written
    assert set(b1) <= set(b2)  # prior keys survive (union order)
    # third run re-admits ONLY the one dropped-tail key (a duplicate, not
    # data loss) — with the old clearing behavior this would be 4
    assert run_incremental(spark, df2, "t", store, sink, key_col="id") == 1
    assert spark.read.parquet(out).count() == 5


def test_boundary_fetch_overflow_preserves_prior_keys(
    spark, tmp_path, monkeypatch
):
    """The FETCH itself exceeding MAX_BOUNDARY_KEYS (not just the union)
    under a standing watermark must still preserve prior runs' keys —
    the old code fell through to an empty list, erasing them and
    re-admitting run 1's rows as duplicates on run 3."""
    from lcr_etl_upgrade_spark.operators import incremental as inc

    monkeypatch.setattr(inc, "MAX_BOUNDARY_KEYS", 3)
    store = WatermarkStore(str(tmp_path / "wm"))
    out = str(tmp_path / "out")
    sink = lambda d: d.write.mode("append").parquet(out)  # noqa: E731
    ts = dt.datetime(2024, 6, 5)
    old = dt.datetime(2024, 1, 1)
    df = _frame(spark, [(1, ts, old), (2, ts, old)])
    assert run_incremental(spark, df, "t", store, sink, key_col="id") == 2
    _, b1 = store.read_state("t")
    assert sorted(b1) == ["1", "2"]
    # FIVE new rows at the same instant: the fetch alone (5) > cap (3)
    df2 = df.union(
        _frame(spark, [(i, ts, old) for i in range(3, 8)])
    )
    assert run_incremental(spark, df2, "t", store, sink, key_col="id") == 5
    _, b2 = store.read_state("t")
    assert len(b2) == 3  # truncated to the cap, NOT cleared
    assert set(b1) <= set(b2)  # run 1's keys survive (prior-first union)
    # run 3 re-admits only the dropped-tail keys (7 total - 3 kept = 4),
    # never run 1's rows
    n3 = run_incremental(spark, df2, "t", store, sink, key_col="id")
    assert n3 == 4


def test_write_state_is_atomic(tmp_path, monkeypatch):
    """write_state goes through temp + os.replace: no in-place truncation
    window where a crash persists the watermark without its keys."""
    import os as _os

    from lcr_etl_upgrade_spark.operators import incremental as inc

    store = WatermarkStore(str(tmp_path))
    store.write_state("t", "2024-06-05 00:00:00", ["1", "2"])
    calls = {}
    real_replace = _os.replace

    def spy(src, dst):
        calls["src"], calls["dst"] = src, dst
        return real_replace(src, dst)

    monkeypatch.setattr(inc.os, "replace", spy)
    store.write_state("t", "2024-06-06 00:00:00", ["3"])
    assert calls and calls["dst"] == store._path("t")
    assert calls["src"] != calls["dst"]  # went through a temp file
    wm, keys = store.read_state("t")
    assert wm == "2024-06-06 00:00:00" and keys == ["3"]
    assert [
        f for f in _os.listdir(tmp_path) if f.endswith(".tmp")
    ] == []  # no temp litter


def test_stateful_running_totals_null_values_match_batch(spark, tmp_path):
    """Keys whose events carry NULL values: the streaming state must
    report total=NULL/max=NULL exactly like the batch aggregate — the
    pandas skipna sum() of an all-missing series is 0.0, which silently
    diverged."""
    from lcr_etl_upgrade_spark.streaming.windows import (
        stateful_running_totals,
    )

    rows = [(1, None), (1, None), (2, 5.0), (2, None)]
    batch = spark.createDataFrame(rows, "user_id long, value double")
    want = {
        r.user_id: (r.n, r.total, r.max_value)
        for r in stateful_running_totals(batch).collect()
    }
    assert want[1] == (2, None, None)  # all-null key: NULL, not 0.0
    assert want[2] == (2, 5.0, 5.0)  # null ignored, valid value counted

    src = str(tmp_path / "src")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        stateful_running_totals(stream)
        .writeStream.format("memory")
        .queryName("nulltotals")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        rows_out = spark.sql("select * from nulltotals").collect()
    finally:
        q.stop()
    got = {}
    for r in rows_out:  # update mode appends; last emission per key wins
        got[r.user_id] = (r.n, r.total, r.max_value)
    assert got == want  # stream == batch, including the NULL semantics


def test_windowed_aggregates_value_col_parameter(spark):
    """tumbling/sliding/session operators accept a value_col — they were
    parameterized on every OTHER column but hardcoded 'value'."""
    import datetime as _dt

    from lcr_etl_upgrade_spark.streaming.windows import (
        sessionized_stream,
        sliding_counts,
        tumbling_counts,
    )

    df = spark.createDataFrame(
        [("a", _dt.datetime(2024, 6, 1, 10, 0), 2.0),
         ("a", _dt.datetime(2024, 6, 1, 10, 30), 3.0)],
        "event_type string, ts timestamp, amount double",
    )
    t = tumbling_counts(df, value_col="amount").collect()
    assert sum(r.total_value for r in t) == 5.0
    s = sliding_counts(df, value_col="amount").collect()
    assert len(s) > 0
    sess = sessionized_stream(
        df, key_col="event_type", gap="1 hour", value_col="amount"
    ).collect()
    assert sess[0].session_value == 5.0
