"""delta_lite.restore_table: RESTORE TABLE ... TO VERSION AS OF.

Invariants: the post-restore LATEST snapshot equals the target-version
snapshot (full-row multisets); the restore is ONE forward commit with
dataChange=true actions, so the change feed sees exactly the row-level
revert and the snapshot algebra closes over it; every intermediate
version stays time-travelable; metadata (schema) reverts with the data;
and the documented refusals (vacuumed files, appendOnly, column-mapping
mode change, forward targets) each raise with the stated reason.

Reference parity: sync.py's overwrite disposition (sync.py:112-114)
means the reference recovers from a bad load by re-running the copy;
RESTORE is the Delta-native, one-commit expression of that recovery.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.delta_lite import (
    delete_rows,
    read_delta_changes,
    read_delta_lite,
    replay_log,
    restore_table,
    table_history,
    vacuum,
    write_delta_lite,
)


def _snap(spark, path, cols=("id",), version=None):
    df = read_delta_lite(spark, path, version=version)
    return Counter(tuple(r[c] for c in cols) for r in df.collect())


def test_restore_reverts_appends(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 10).select("id"), path)
    snap0 = _snap(spark, path)
    write_delta_lite(spark.range(10, 20).select("id"), path, mode="append")
    write_delta_lite(spark.range(20, 30).select("id"), path, mode="append")
    res = restore_table(spark, path, 0)
    assert res["version"] == 3
    assert res["removed"] >= 2 and res["added"] == 0
    assert _snap(spark, path) == snap0
    # intermediate versions still time-travel
    assert len(_snap(spark, path, version=2)) == 30
    # history records the operation with its parameter
    top = table_history(path)[0]
    assert top["operation"] == "RESTORE"
    # delta-spark string-encodes operationParameters values (r11 ADVICE)
    assert top["operationParameters"] == {"version": "0"}
    # the change feed sees the revert as row-level deletes
    ch = read_delta_changes(spark, path, 3, 3).collect()
    assert all(r["_change_type"] == "delete" for r in ch)
    assert Counter(r["id"] for r in ch) == Counter(range(10, 30))


def test_restore_reverts_overwrite_including_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 5).select("id"), path)
    snap0 = _snap(spark, path)
    write_delta_lite(
        spark.range(0, 3).select(
            F.col("id").alias("k"), F.lit("x").alias("s")
        ),
        path,
    )
    res = restore_table(spark, path, 0)
    assert res["version"] == 2
    assert res["added"] >= 1 and res["removed"] >= 1
    assert res["metadata_restored"] is True
    assert [f.name for f in replay_log(spark, path).schema.fields] == ["id"]
    assert _snap(spark, path) == snap0


def test_restore_reverts_dv_delete_same_path(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 20).select("id").coalesce(1), path)
    snap0 = _snap(spark, path)
    delete_rows(spark, path, F.col("id") % 2 == 0)
    assert len(_snap(spark, path)) == 10
    res = restore_table(spark, path, 0)
    # same path, DV cleared: identity is (path, dvId) so remove+add
    assert res["added"] == 1 and res["removed"] == 1
    assert _snap(spark, path) == snap0
    # CDF over the restore commit: the deleted evens come back as inserts
    ch = read_delta_changes(spark, path, 2, 2).collect()
    assert Counter(r["id"] for r in ch if r["_change_type"] == "insert") \
        == Counter(range(0, 20, 2))
    assert not [r for r in ch if r["_change_type"] == "delete"]


def test_restore_preserves_stats_extras(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 10).select("id").coalesce(1), path)
    tgt = replay_log(spark, path)
    assert any("stats" in (tgt.adds.get(r) or {}) for r in tgt.files)
    write_delta_lite(spark.range(50, 60).select("id"), path)
    restore_table(spark, path, 0)
    back = replay_log(spark, path)
    assert set(back.files) == set(tgt.files)
    for rel in back.files:
        assert (back.adds.get(rel) or {}).get("stats") == (
            (tgt.adds.get(rel) or {}).get("stats")
        )


def test_restore_noop_and_forward_refusal(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 5).select("id"), path)
    write_delta_lite(spark.range(5, 9).select("id"), path, mode="append")
    assert restore_table(spark, path, 1)["version"] is None
    with pytest.raises(ValueError, match="only goes backward"):
        restore_table(spark, path, 7)
    # restoring twice to the same target: second call is a no-op
    assert restore_table(spark, path, 0)["version"] == 2
    assert restore_table(spark, path, 0)["version"] is None


def test_restore_snapshot_algebra_over_mixed_history(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 30).select("id").coalesce(2), path)
    write_delta_lite(spark.range(30, 45).select("id"), path, mode="append")
    delete_rows(spark, path, F.col("id") < 5)
    res = restore_table(spark, path, 1)
    v = res["version"]
    # algebra: snap(v-1) + inserts - deletes == snap(v)
    ch = read_delta_changes(spark, path, v, v).collect()
    ins = Counter(r["id"] for r in ch if r["_change_type"] == "insert")
    dels = Counter(r["id"] for r in ch if r["_change_type"] == "delete")
    before = Counter(t[0] for t in _snap(spark, path, version=v - 1))
    after = Counter(t[0] for t in _snap(spark, path))
    assert before + ins - dels == after
    assert after == Counter(range(0, 45))


def test_restore_refuses_when_target_files_deleted(spark, tmp_path):
    # THIS repo's vacuum is conservative (keeps every historically-
    # referenced file — pinned below), so restore survives it; the
    # refusal targets tables cleaned by a foreign retention-based
    # VACUUM, simulated by deleting the superseded files directly.
    import os

    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 5).select("id"), path)
    old_files = set(replay_log(spark, path, version=0).files)
    write_delta_lite(spark.range(9, 12).select("id"), path)  # overwrite
    assert vacuum(spark, path) == []  # conservative: time travel intact
    for rel in old_files:
        os.remove(os.path.join(path, rel))
    with pytest.raises(ValueError, match="no longer on disk"):
        restore_table(spark, path, 0)


def test_restore_refuses_append_only(spark, tmp_path):
    import json
    import os

    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 5).select("id"), path)
    write_delta_lite(spark.range(5, 8).select("id"), path, mode="append")
    # flip delta.appendOnly on via a raw metadata commit
    state = replay_log(spark, path)
    meta = dict(state.metadata)
    meta["configuration"] = {"delta.appendOnly": "true"}
    log = os.path.join(path, "_delta_log")
    with open(os.path.join(log, f"{state.version + 1:020d}.json"),
              "w") as fh:
        fh.write(json.dumps({"metaData": meta}) + "\n")
    with pytest.raises(ValueError, match="appendOnly"):
        restore_table(spark, path, 0)


def test_restore_refuses_mapping_mode_change(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 5).select("id"), path)
    write_delta_lite(
        spark.range(0, 5).select("id"), path, column_mapping="name"
    )
    with pytest.raises(ValueError, match="column-mapping|columnMapping"):
        restore_table(spark, path, 0)


def test_restore_mapped_table_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(
        spark.range(0, 8).select("id"), path, column_mapping="name"
    )
    snap0 = _snap(spark, path)
    write_delta_lite(
        spark.range(100, 104).select("id"), path, mode="append"
    )
    res = restore_table(spark, path, 0)
    assert res["version"] == 2
    assert _snap(spark, path) == snap0


def test_restore_partitioned_table(spark, tmp_path):
    path = str(tmp_path / "t")
    df0 = spark.range(0, 20).select(
        "id", (F.col("id") % 2).cast("string").alias("p")
    )
    write_delta_lite(df0, path, partition_by=("p",))
    snap0 = _snap(spark, path, cols=("id", "p"))
    write_delta_lite(
        spark.range(20, 30).select(
            "id", F.lit("9").alias("p")
        ),
        path,
        mode="append",
    )
    res = restore_table(spark, path, 0)
    assert res["version"] == 2 and res["removed"] >= 1
    assert _snap(spark, path, cols=("id", "p")) == snap0
