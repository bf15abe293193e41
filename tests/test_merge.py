"""Upsert / SCD2 merge semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.operators.merge import scd2_apply, upsert


def test_upsert_update_and_insert(spark):
    current = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["k", "name", "v"]
    )
    updates = spark.createDataFrame(
        [(2, "b", 99.0), (3, "c", 30.0)], ["k", "name", "v"]
    )
    got = {r.k: r.v for r in upsert(current, updates, ["k"]).collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 30.0}


def test_scd2_closes_and_appends(spark):
    dim = spark.createDataFrame(
        [
            (1, 10.0, dt.datetime(1995, 1, 1), None, True),
            (1, 5.0, dt.datetime(1990, 1, 1), dt.datetime(1995, 1, 1), False),
            (2, 20.0, dt.datetime(1995, 1, 1), None, True),
        ],
        "k long, v double, VALID_FROM timestamp_ntz, VALID_TO timestamp_ntz, IS_CURRENT boolean",
    )
    updates = spark.createDataFrame([(1, 11.0)], "k long, v double")
    out = scd2_apply(dim, updates, ["k"], as_of="2000-01-01 00:00:00")
    rows = sorted(out.collect(), key=lambda r: (r.k, r.VALID_FROM))

    k1 = [r for r in rows if r.k == 1]
    assert len(k1) == 3  # history + closed + fresh
    hist, closed, fresh = k1
    assert hist.IS_CURRENT is False and hist.v == 5.0
    assert closed.v == 10.0 and closed.IS_CURRENT is False
    assert closed.VALID_TO == dt.datetime(2000, 1, 1)
    assert fresh.v == 11.0 and fresh.IS_CURRENT is True and fresh.VALID_TO is None
    # untouched key rides along unchanged
    (k2,) = [r for r in rows if r.k == 2]
    assert k2.IS_CURRENT is True and k2.VALID_TO is None


def test_scd2_exactly_one_current_per_key(spark):
    dim = spark.createDataFrame(
        [(i, float(i), dt.datetime(1995, 1, 1), None, True) for i in range(20)],
        "k long, v double, VALID_FROM timestamp_ntz, VALID_TO timestamp_ntz, IS_CURRENT boolean",
    )
    updates = spark.createDataFrame(
        [(i, float(i) * 2) for i in range(0, 20, 3)], "k long, v double"
    )
    out = scd2_apply(dim, updates, ["k"], as_of="2000-01-01 00:00:00")
    per_key = (
        out.filter(F.col("IS_CURRENT"))
        .groupBy("k")
        .count()
        .select(F.min("count"), F.max("count"))
        .collect()[0]
    )
    assert per_key == (1, 1)


def test_scd2_null_current_flag_rows_survive(spark):
    """A dim row whose IS_CURRENT is NULL (never backfilled) and whose key
    is touched by an update must pass through unchanged — the old
    three-branch formulation dropped it (NULL fails both `flag` and
    `~flag` filters): silent data loss in a merge operator."""
    from lcr_etl_upgrade_spark.operators.merge import scd2_apply

    dim = spark.createDataFrame(
        [
            (1, "old", "2020-01-01 00:00:00", None, None),  # NULL flag!
            (1, "cur", "2023-01-01 00:00:00", None, True),
            (2, "other", "2021-01-01 00:00:00", None, True),
        ],
        "k long, v string, VALID_FROM string, VALID_TO string, "
        "IS_CURRENT boolean",
    ).withColumns(
        {
            "VALID_FROM": F.col("VALID_FROM").cast("timestamp_ntz"),
            "VALID_TO": F.col("VALID_TO").cast("timestamp_ntz"),
        }
    )
    updates = spark.createDataFrame([(1, "new")], "k long, v string")
    out = scd2_apply(dim, updates, ["k"], as_of="2024-06-01 00:00:00")
    rows = {(r.k, r.v): (r.IS_CURRENT, r.VALID_TO) for r in out.collect()}
    assert set(rows) == {(1, "old"), (1, "cur"), (1, "new"), (2, "other")}
    # the NULL-flag row survives UNCHANGED
    assert rows[(1, "old")] == (None, None)
    # the true current version was closed
    flag, vto = rows[(1, "cur")]
    assert flag is False and vto is not None
    # untouched key untouched, fresh version open
    assert rows[(2, "other")] == (True, None)
    assert rows[(1, "new")][0] is True
