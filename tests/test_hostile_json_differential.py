"""Differential batteries for the events and embeddings tables.

JSON-extraction queries on hostile props:
NULL, malformed, truncated, non-object, empty object, unicode keys,
null values, out-of-int32 values, string-valued and duplicate keys.

First run caught two Spark-side totality bugs (ANSI cast throwing on an
out-of-range prop value; array[0] throwing on an empty '{}' map) and
three oracle gaps (DuckDB json functions ERRORING on malformed JSON
where Spark yields NULL). Domain exclusions are engine-internal
semantics stated in the query docstrings: duplicate JSON keys (Spark's
map keeps the last occurrence, DuckDB's $.k path reads the first) and,
for the roundtrip reserialization only, string-valued props.
"""

from __future__ import annotations

import datetime as dt
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HOSTILE_PROPS = [
    None,
    '{"k": 7}',
    '{"k":7}',
    '{ "k" : 42 , "z" : 1 }',
    '{"z":1,"k":99}',
    "{}",
    '{"k": 7, "k": 8}',  # duplicate key — excluded where engines differ
    '{"ké": 5, "k": 3}',  # unicode key
    '{"k": null}',
    '{"other": 12}',
    "not json at all",
    '{"k": 7',  # truncated
    "[1,2,3]",  # valid JSON, not an object
    '{"k": "12"}',  # string-valued — excluded for reserialization
    '{"k": 2147483648}',  # > int32: try_cast NULL, never a thrown cast
]

# documented domain exclusions by event_id (index into HOSTILE_PROPS)
EXCLUDE = {
    "events_json_advanced": {6},
    "events_json_roundtrip": {6, 13},
}


@pytest.fixture(scope="module")
def hostile_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hostile_events")
    base = dt.datetime(2024, 3, 1)
    rows = [
        (
            i,
            base + dt.timedelta(minutes=7 * i),
            i % 5,
            ["click", "view", "purchase"][i % 3],
            float(i) / 2,
            p,
        )
        for i, p in enumerate(HOSTILE_PROPS)
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["events_json_extract", "events_json_advanced", "events_json_roundtrip"],
)
def test_json_query_matches_oracle_on_hostile_props(
    spark, hostile_events_dir, name
):
    import duckdb

    import __spark_entry__ as entry
    from check_oracle import frame_to_rows

    sdf = entry.queries()[name](spark, hostile_events_dir)
    srows, scols = sdf.collect(), sdf.columns

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{hostile_events_dir}/events.parquet'"
    )
    res = con.execute(entry.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()

    drop = EXCLUDE.get(name, set())
    if "event_id" in scols:
        i = scols.index("event_id")
        srows = [r for r in srows if r[i] not in drop]
        j = dcols.index("event_id")
        drows = [r for r in drows if r[j] not in drop]

    s_norm, s_cols = frame_to_rows([tuple(r) for r in srows], scols)
    d_norm, d_cols = frame_to_rows(drows, dcols)
    assert s_cols == d_cols
    assert s_norm == d_norm


# --------------------------------------------------------------------------
# NULL-timestamp battery: Spark windows sort NULLS FIRST ascending where
# DuckDB sorts NULLS LAST, so any window query over a NULLable order key
# silently diverges. The sessionization queries drop NULL-ts events
# explicitly (unsessionizable) on both sides; this pins that, plus the
# non-window events queries' NULL-ts behavior.
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def null_ts_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("null_ts_events")
    base = dt.datetime(2024, 3, 1)
    rows = [
        (
            i,
            None if i % 7 == 0 else base + dt.timedelta(minutes=11 * (i % 13)),
            i % 4,
            ["click", "view", "purchase"][i % 3],
            float(i) / 2,
            '{"k": %d}' % i,
        )
        for i in range(40)
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "events_sessionization",
        "events_dynamic_session_gap",
        "events_tumbling_window",
        "events_sliding_window",
        "events_asof_join",
        "events_incremental_filter",
    ],
)
def test_events_query_matches_oracle_on_null_ts(spark, null_ts_events_dir, name):
    import duckdb

    import __spark_entry__ as entry
    from check_oracle import frame_to_rows

    sdf = entry.queries()[name](spark, null_ts_events_dir)
    s_norm, s_cols = frame_to_rows([tuple(r) for r in sdf.collect()], sdf.columns)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{null_ts_events_dir}/events.parquet'"
    )
    res = con.execute(entry.oracle_sql()[name])
    d_norm, d_cols = frame_to_rows(res.fetchall(), [d[0] for d in res.description])
    con.close()

    assert s_cols == d_cols
    assert s_norm == d_norm


# --------------------------------------------------------------------------
# NULL-embedding battery: NULL vectors are unscorable — every ANN path
# (exact, LSH, vectorized, IVF) excludes them by contract, and DuckDB's
# list_cosine_similarity ERRORS on NULL where Spark yields NULL.
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def null_embeddings_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("null_embeddings")
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [
        (i, None if i % 9 == 0 else [float(x) for x in rng.randn(16)])
        for i in range(60)
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], pa.list_(pa.float32())
                ),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


@pytest.mark.parametrize(
    "name", ["embedding_cosine_topk", "embedding_cosine_near_dup"]
)
def test_embedding_query_matches_oracle_on_null_vectors(
    spark, null_embeddings_dir, name
):
    import duckdb

    import __spark_entry__ as entry
    from check_oracle import frame_to_rows

    sdf = entry.queries()[name](spark, null_embeddings_dir)
    s_norm, s_cols = frame_to_rows([tuple(r) for r in sdf.collect()], sdf.columns)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{null_embeddings_dir}/embeddings.parquet'"
    )
    res = con.execute(entry.oracle_sql()[name])
    d_norm, d_cols = frame_to_rows(res.fetchall(), [d[0] for d in res.description])
    con.close()

    assert s_cols == d_cols
    assert s_norm == d_norm
    assert s_norm, "battery must not trivially pass on zero rows"
