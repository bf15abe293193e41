"""delta_lite.optimize: bin-packing compaction + OPTIMIZE ZORDER.

Invariants: the snapshot is IDENTICAL before and after (full-row
multisets), the change feed sees nothing, time travel to the
pre-optimize version still works, file counts actually drop, DVs
materialize away, and the z-order variant clusters footer stats.
"""

from __future__ import annotations

import glob
import os
from collections import Counter

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.delta_lite import (
    delete_rows,
    optimize,
    read_delta_changes,
    read_delta_lite,
    replay_log,
    write_delta_lite,
)


def _snap(spark, path, cols, version=None):
    df = read_delta_lite(spark, path, version=version)
    return Counter(tuple(r[c] for c in cols) for r in df.collect())


def _drip(spark, path, n_appends=5):
    write_delta_lite(spark.range(0, 100).select("id").coalesce(1), path)
    for i in range(1, n_appends):
        write_delta_lite(
            spark.range(i * 100, i * 100 + 100).select("id").coalesce(1),
            path,
            mode="append",
        )


def test_compaction_preserves_rows_and_shrinks_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _drip(spark, path)
    before = _snap(spark, path, ["id"])
    v_pre = replay_log(spark, path).version
    n_files_before = len(replay_log(spark, path).files)
    res = optimize(spark, path)
    assert res["version"] == v_pre + 1
    assert res["rewritten"] == n_files_before
    state = replay_log(spark, path)
    assert len(state.files) < n_files_before
    assert _snap(spark, path, ["id"]) == before
    # time travel to the pre-optimize version still reads
    assert _snap(spark, path, ["id"], version=v_pre) == before
    # the change feed sees NOTHING
    assert read_delta_changes(spark, path, res["version"],
                              res["version"]).count() == 0


def test_optimize_materializes_deletion_vectors(spark, tmp_path):
    path = str(tmp_path / "t")
    _drip(spark, path, n_appends=3)
    delete_rows(spark, path, F.col("id") % 7 == 0)
    before = _snap(spark, path, ["id"])
    state = replay_log(spark, path)
    assert state.dvs  # the delete produced DVs
    res = optimize(spark, path)
    after_state = replay_log(spark, path)
    assert not after_state.dvs  # materialized away
    assert _snap(spark, path, ["id"]) == before
    assert read_delta_changes(spark, path, res["version"],
                              res["version"]).count() == 0


def test_optimize_noop_when_nothing_to_do(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(10).select("id").coalesce(1), path)
    res = optimize(spark, path)
    assert res == {"version": None, "rewritten": 0, "added": 0}
    assert replay_log(spark, path).version == 0  # no commit written


def test_optimize_respects_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(40).select(
        "id", (F.col("id") % 2).cast("long").alias("p")
    )
    write_delta_lite(df.coalesce(1), path, partition_by=("p",))
    write_delta_lite(
        spark.range(40, 80)
        .select("id", (F.col("id") % 2).cast("long").alias("p"))
        .coalesce(1),
        path,
        mode="append",
    )
    before = _snap(spark, path, ["id", "p"])
    optimize(spark, path)
    state = replay_log(spark, path)
    assert _snap(spark, path, ["id", "p"]) == before
    # rewritten files stay inside their hive partition directories and
    # never mix partition values
    for rel, pvals in state.files.items():
        assert f"p={pvals['p']}" in rel


def test_optimize_zorder_clusters_footers(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(40_000).select(
        (F.pmod(F.hash(F.col("id") * 2 + 1), 10_000)).cast("double").alias("x"),
        (F.pmod(F.hash(F.col("id") * 2), 10_000)).cast("double").alias("y"),
    )
    write_delta_lite(df.repartition(8), path)
    before = _snap(spark, path, ["x", "y"])
    res = optimize(
        spark, path, target_file_bytes=40_000, zorder_by=["x", "y"]
    )
    assert res["added"] > 1  # clustering kept multiple files
    assert _snap(spark, path, ["x", "y"]) == before
    state = replay_log(spark, path)

    def mean_span(col):
        spans, n = 0.0, 0
        for rel in state.files:
            md = pq.ParquetFile(os.path.join(path, rel)).metadata
            for rg in range(md.num_row_groups):
                r = md.row_group(rg)
                for i in range(r.num_columns):
                    c = r.column(i)
                    if c.path_in_schema == col and c.statistics:
                        spans += c.statistics.max - c.statistics.min
                        n += 1
        return spans / n

    assert mean_span("x") < 10_000 * 0.6
    assert mean_span("y") < 10_000 * 0.6


def test_optimize_zorder_rejects_partition_and_unknown_columns(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    df = spark.range(10).select(
        "id", (F.col("id") % 2).cast("long").alias("p")
    )
    write_delta_lite(df, path, partition_by=("p",))
    with pytest.raises(ValueError, match="partition columns"):
        optimize(spark, path, zorder_by=["p"])
    with pytest.raises(ValueError, match="not in schema"):
        optimize(spark, path, zorder_by=["nope"])


def test_optimize_column_mapped_table(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(
        spark.range(20).select("id", F.lit("a").alias("s")).coalesce(1),
        path,
        column_mapping="name",
    )
    write_delta_lite(
        spark.range(20, 40).select("id", F.lit("b").alias("s")).coalesce(1),
        path,
        mode="append",
    )
    before = _snap(spark, path, ["id", "s"])
    res = optimize(spark, path)
    assert res["rewritten"] == 2
    assert _snap(spark, path, ["id", "s"]) == before


def test_optimize_refuses_row_tracking_extras(spark, tmp_path):
    import json

    path = str(tmp_path / "t")
    _drip(spark, path, n_appends=2)
    # graft a baseRowId onto one add via a synthetic re-add commit
    state = replay_log(spark, path)
    rel = sorted(state.files)[0]
    log = os.path.join(path, "_delta_log")
    with open(os.path.join(log, f"{state.version + 1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"add": {
            "path": rel, "partitionValues": {}, "size": 1,
            "modificationTime": 1, "dataChange": False, "baseRowId": 7,
        }}) + "\n")
    with pytest.raises(NotImplementedError, match="baseRowId"):
        optimize(spark, path)


def test_full_maintenance_lifecycle(spark, tmp_path):
    """The whole long-lived-table cycle composed: drip appends -> DV
    delete -> OPTIMIZE -> checkpoint -> log cleanup -> vacuum. The
    optimize-retired small files are referenced only by cleaned-up
    commits, so vacuum reclaims them; live files survive; the latest
    snapshot and checkpoint-version time travel keep working."""
    from lcr_etl_upgrade_spark.delta_lite import (
        cleanup_log,
        vacuum,
        write_checkpoint,
    )

    path = str(tmp_path / "t")
    _drip(spark, path, n_appends=3)  # v0..v2: 3 small files
    delete_rows(spark, path, F.col("id") % 5 == 0)  # v3: DVs
    expected = _snap(spark, path, ["id"])
    res = optimize(spark, path)  # v4: rewrites + materializes DVs
    assert res["version"] == 4
    write_checkpoint(spark, path)
    assert cleanup_log(spark, path)  # drops commits < 4
    # FIRST vacuum is conservative-correct: the optimize commit itself
    # (v4) survived cleanup and its remove actions still reference the
    # retired files, so nothing is reclaimed yet
    assert not any(
        r.endswith(".parquet") for r in vacuum(spark, path)
    )
    # the NEXT maintenance cycle retires commit 4 itself...
    write_delta_lite(
        spark.range(900, 903).select("id").coalesce(1), path, mode="append"
    )  # v5
    expected = expected + Counter({(i,): 1 for i in range(900, 903)})
    # change feed readable while v4's checkpoint still exists (after
    # the next cleanup, windows must start AT the new horizon — the
    # pre-horizon snapshot is retired with its checkpoint)
    assert read_delta_changes(spark, path, 5, 5).count() == 3
    cp_v = write_checkpoint(spark, path)
    assert cleanup_log(spark, path)
    pre_files = set(replay_log(spark, path).files)
    removed = vacuum(spark, path)
    # ...and NOW the three retired originals are reclaimable
    assert sum(r.endswith(".parquet") for r in removed) >= 3
    # live set untouched, snapshot identical, time travel to the
    # checkpointed version works
    assert set(replay_log(spark, path).files) == pre_files
    assert _snap(spark, path, ["id"]) == expected
    assert _snap(spark, path, ["id"], version=cp_v) == expected
