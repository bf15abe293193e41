"""Retention-mode VACUUM (round 11): reclaim files whose every log
reference precedes the horizon, with deletion-vector .bin files and
_change_data files in the referenced-set accounting — while the
current snapshot, everything referenced within the retained window,
and checkpoint-referenced state stay untouchable. Default (no
retain_hours) behavior is byte-for-byte the old orphan-only vacuum.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.delta_lite import (
    delete_rows,
    read_delta_changes,
    read_delta_lite,
    replay_log,
    vacuum,
    write_delta_lite,
)


def _backdate(path, versions, ts_ms=1000):
    """Rewrite commitInfo timestamps of the given versions to ts_ms
    (log-authoritative, same trick the TIMESTAMP AS OF tests use); adds
    a commitInfo when the commit lacks one."""
    log = os.path.join(path, "_delta_log")
    for v in versions:
        p = os.path.join(log, f"{v:020d}.json")
        lines = [json.loads(l) for l in open(p) if l.strip()]
        if not any("commitInfo" in a for a in lines):
            lines.insert(0, {"commitInfo": {"timestamp": ts_ms}})
        for a in lines:
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = ts_ms
        with open(p, "w") as fh:
            for a in lines:
                fh.write(json.dumps(a) + "\n")


def _parquets(path):
    out = set()
    for root, dirs, names in os.walk(path):
        dirs[:] = [d for d in dirs if d != "_delta_log"]
        for n in names:
            if n.endswith(".parquet"):
                out.add(os.path.relpath(os.path.join(root, n), path))
    return out


def test_retention_reclaims_expired_overwrites(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 10).select("id"), path)  # v0
    write_delta_lite(spark.range(10, 20).select("id"), path)  # v1 overwrite
    write_delta_lite(spark.range(20, 30).select("id"), path)  # v2 overwrite
    _backdate(path, [0, 1])  # v0/v1 ancient; v2 has a current timestamp
    before = _parquets(path)
    assert len(before) >= 3
    # no-retention default: nothing referenced is touched
    assert vacuum(spark, path) == []
    removed = vacuum(spark, path, retain_hours=1.0)
    assert removed, "expired overwritten files must reclaim"
    # the current snapshot still reads
    assert {r.id for r in read_delta_lite(spark, path).collect()} == set(
        range(20, 30)
    )
    # v0's data file is gone: pre-horizon time travel is broken, as
    # documented (delta-spark semantics)
    with pytest.raises(Exception):
        read_delta_lite(spark, path, version=0).collect()


def test_retention_keeps_window_time_travel(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 5).select("id"), path)  # v0 ancient
    write_delta_lite(spark.range(5, 9).select("id"), path)  # v1 recent
    write_delta_lite(
        spark.range(9, 12).select("id"), path, mode="append"
    )  # v2 recent
    _backdate(path, [0])
    vacuum(spark, path, retain_hours=1.0)
    # v1 is INSIDE the window: time travel to it still works even
    # though v2 superseded nothing of it (stricter than delta-spark)
    assert {r.id for r in read_delta_lite(spark, path, version=1)
            .collect()} == set(range(5, 9))
    assert {r.id for r in read_delta_lite(spark, path).collect()} == set(
        range(5, 12)
    )


def test_retention_reclaims_expired_dv_bins_keeps_live(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 400).select("id").coalesce(1), path)
    # u-storage DVs (inline_threshold=0 forces .bin files)
    delete_rows(spark, path, F.col("id") < 5, inline_threshold=0)  # v1
    delete_rows(spark, path, F.col("id") < 9, inline_threshold=0)  # v2
    bins = [f for f in os.listdir(path) if f.endswith(".bin")]
    assert len(bins) == 2  # v1's superseded bin + v2's live bin
    live_bin = None
    st = replay_log(spark, path)
    from lcr_etl_upgrade_spark.delta_lite import _dv_bin_rel

    live_bin = _dv_bin_rel(path, next(iter(st.dvs.values())))
    write_delta_lite(
        spark.range(400, 405).select("id"), path, mode="append"
    )  # v3 recent
    # v2 must expire too: its REMOVE carries v1's old DV descriptor, so
    # a retained v2 correctly pins the superseded bin (DV-diff change
    # reads of the window need it)
    _backdate(path, [0, 1, 2])
    removed = vacuum(spark, path, retain_hours=1.0)
    assert any(r.endswith(".bin") for r in removed), removed
    assert os.path.isfile(os.path.join(path, live_bin))
    # snapshot still reads with its live DV applied: 400 - 9 + 5
    assert read_delta_lite(spark, path).count() == 396


def test_retention_reclaims_expired_change_data(spark, tmp_path):
    from tests.test_cdf_write_validator import _enable_cdf

    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 30).select("id"), path)  # v0
    _enable_cdf(path)  # v1
    delete_rows(spark, path, F.col("id") % 3 == 0)  # v2: cdc files
    write_delta_lite(
        spark.range(30, 35).select("id"), path, mode="append"
    )  # v3
    delete_rows(spark, path, F.col("id") == 31)  # v4: cdc files, recent
    cdc_before = {p for p in _parquets(path) if p.startswith("_change_data")}
    assert len(cdc_before) >= 2
    _backdate(path, [0, 1, 2])
    removed = vacuum(spark, path, retain_hours=1.0)
    assert any(r.startswith("_change_data") for r in removed), removed
    # the retained window's change feed still reads
    ch = read_delta_changes(spark, path, 4, 4).collect()
    assert {r["id"] for r in ch} == {31}
    # the expired window's change files are gone
    cdc_after = {p for p in _parquets(path) if p.startswith("_change_data")}
    assert cdc_after < cdc_before


def test_checkpoint_state_survives_any_retention(spark, tmp_path):
    from lcr_etl_upgrade_spark.delta_lite import (
        cleanup_log,
        write_checkpoint,
    )

    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 8).select("id"), path)  # v0
    write_delta_lite(
        spark.range(8, 11).select("id"), path, mode="append"
    )  # v1
    write_checkpoint(spark, path)
    cleanup_log(spark, path)
    _backdate(path, [v for v in []])  # nothing to backdate: mtimes now
    # even with retain_hours=0 (everything expired), checkpoint-named
    # state is untouchable
    removed = vacuum(spark, path, retain_hours=0.0)
    assert {r.id for r in read_delta_lite(spark, path).collect()} == set(
        range(11)
    )
    assert not any(r.endswith(".parquet") for r in removed)
