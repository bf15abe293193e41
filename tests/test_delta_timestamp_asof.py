"""TIMESTAMP AS OF time travel: version_at_timestamp resolution +
read_delta_lite(timestamp=...) + restore_table(timestamp=...).

Resolution rule (delta-spark parity): greatest version whose commit
timestamp <= the requested time, on CANONICALIZED (running-max)
commit timestamps so clock skew between writers cannot make the
mapping ambiguous; a pre-table timestamp raises, and a future one
raises on the read path (delta-spark parity) while resolving to latest
only under allow_future=True (the RESTORE rule) — round-11 ADVICE.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from lcr_etl_upgrade_spark.delta_lite import (
    read_delta_lite,
    restore_table,
    version_at_timestamp,
    write_delta_lite,
)


def _table_with_times(spark, path, times_ms):
    """A table whose commitInfo timestamps are rewritten to times_ms,
    one per version (log-authoritative, like table_history reads)."""
    write_delta_lite(spark.range(0, 10).select("id"), path)
    for i, _ in enumerate(times_ms[1:], start=1):
        write_delta_lite(
            spark.range(i * 10, i * 10 + 10).select("id"),
            path,
            mode="append",
        )
    log = os.path.join(path, "_delta_log")
    for v, ts in enumerate(times_ms):
        p = os.path.join(log, f"{v:020d}.json")
        lines = [json.loads(l) for l in open(p) if l.strip()]
        for a in lines:
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = ts
        with open(p, "w") as fh:
            for a in lines:
                fh.write(json.dumps(a) + "\n")


def test_resolution_boundaries(spark, tmp_path):
    path = str(tmp_path / "t")
    _table_with_times(spark, path, [1000, 2000, 3000])
    assert version_at_timestamp(path, 1000) == 0
    assert version_at_timestamp(path, 1999) == 0
    assert version_at_timestamp(path, 2000) == 1
    assert version_at_timestamp(path, 2500) == 1
    # future: reads refuse (delta-spark parity), RESTORE rule -> latest
    with pytest.raises(ValueError, match="after the latest commit"):
        version_at_timestamp(path, 10_000_000)
    assert version_at_timestamp(path, 10_000_000, allow_future=True) == 2
    with pytest.raises(ValueError, match="precedes the first commit"):
        version_at_timestamp(path, 999)


def test_clock_skew_canonicalized(spark, tmp_path):
    # version 1's writer had a fast clock (5000), version 2 a correct
    # one (3000): canonicalization carries the running max, so 4000
    # maps BELOW version 1 and both later versions need >= 5000
    path = str(tmp_path / "t")
    _table_with_times(spark, path, [1000, 5000, 3000])
    assert version_at_timestamp(path, 4999) == 0
    assert version_at_timestamp(path, 5000) == 2  # 1 and 2 both at 5000
    assert version_at_timestamp(path, 6000, allow_future=True) == 2


def test_read_at_timestamp(spark, tmp_path):
    path = str(tmp_path / "t")
    _table_with_times(spark, path, [1000, 2000, 3000])
    assert read_delta_lite(spark, path, timestamp=2100).count() == 20
    assert read_delta_lite(spark, path, timestamp=1500).count() == 10
    with pytest.raises(ValueError, match="not both"):
        read_delta_lite(spark, path, version=1, timestamp=1500)


def test_datetime_and_iso_inputs(spark, tmp_path):
    path = str(tmp_path / "t")
    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    ms = int(t0.timestamp() * 1000)
    _table_with_times(spark, path, [ms, ms + 60_000])
    assert version_at_timestamp(path, t0) == 0
    assert version_at_timestamp(path, "2026-01-01T00:00:30+00:00") == 0
    assert version_at_timestamp(path, "2026-01-01T00:01:00+00:00") == 1
    # naive datetime/ISO read as UTC
    assert version_at_timestamp(
        path, dt.datetime(2026, 1, 1, 0, 1, 0)
    ) == 1


def test_restore_to_timestamp(spark, tmp_path):
    path = str(tmp_path / "t")
    _table_with_times(spark, path, [1000, 2000, 3000])
    res = restore_table(spark, path, timestamp=2400)  # -> version 1
    assert res["version"] == 3
    assert read_delta_lite(spark, path).count() == 20
    with pytest.raises(ValueError, match="exactly one"):
        restore_table(spark, path)
    with pytest.raises(ValueError, match="exactly one"):
        restore_table(spark, path, version=0, timestamp=1000)
