"""Log-level data skipping: per-file stats in add actions + pruned reads.

The contract: prune is a skipping HINT — results after the caller's own
filter are identical with and without it; what changes is the FILE SET
the plan touches (inputFiles), which is the 100 TB cost. Composed with
OPTIMIZE ZORDER, any clustered column prunes files from the log alone.
"""

from __future__ import annotations

import json
import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.delta_lite import (
    cleanup_log,
    optimize,
    read_delta_lite,
    replay_log,
    write_delta_lite,
    write_checkpoint,
)


def _rows(df, cols):
    return Counter(tuple(r[c] for c in cols) for r in df.collect())


def test_writer_emits_file_stats(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(
        spark.range(100).select(
            "id", (F.col("id") * 2).alias("v"), F.lit("x").alias("s")
        ).coalesce(1),
        path,
    )
    log = os.path.join(path, "_delta_log")
    with open(os.path.join(log, "00000000000000000000.json")) as fh:
        add = next(json.loads(ln)["add"] for ln in fh if '"add"' in ln)
    st = json.loads(add["stats"])
    assert st["numRecords"] == 100
    assert st["minValues"]["id"] == 0 and st["maxValues"]["id"] == 99
    assert st["minValues"]["v"] == 0 and st["maxValues"]["v"] == 198
    assert st["minValues"]["s"] == "x" == st["maxValues"]["s"]
    assert st["nullCount"]["id"] == 0


def test_prune_skips_files_and_preserves_filtered_results(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(40_000).select(
        (F.pmod(F.hash(F.col("id") * 2 + 1), 10_000)).cast("double").alias("x"),
        (F.pmod(F.hash(F.col("id") * 2), 10_000)).cast("double").alias("y"),
    )
    write_delta_lite(df.repartition(8), path)
    optimize(spark, path, target_file_bytes=40_000, zorder_by=["x", "y"])
    full = read_delta_lite(spark, path)
    pruned = read_delta_lite(
        spark, path, prune={"x": (4000.0, 5000.0), "y": (4000.0, 5000.0)}
    )
    # the plan touches strictly fewer files...
    assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
    # ...and after the caller's real filter the results are identical
    pred = (
        F.col("x").between(4000.0, 5000.0)
        & F.col("y").between(4000.0, 5000.0)
    )
    assert _rows(pruned.filter(pred), ["x", "y"]) == _rows(
        full.filter(pred), ["x", "y"]
    )
    # one-sided intervals work too
    top = read_delta_lite(spark, path, prune={"x": (9000.0, None)})
    assert len(top.inputFiles()) < len(full.inputFiles())
    assert _rows(top.filter(F.col("x") >= 9000.0), ["x", "y"]) == _rows(
        full.filter(F.col("x") >= 9000.0), ["x", "y"]
    )


def test_prune_fails_open_without_stats(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(10).select("id").coalesce(1), path)
    # strip the stats from the add (a foreign writer without stats)
    log = os.path.join(path, "_delta_log")
    cpath = os.path.join(log, "00000000000000000000.json")
    with open(cpath) as fh:
        actions = [json.loads(ln) for ln in fh if ln.strip()]
    for a in actions:
        if "add" in a:
            a["add"].pop("stats", None)
    with open(cpath, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    pruned = read_delta_lite(spark, path, prune={"id": (10_000, None)})
    assert len(pruned.inputFiles()) == 1  # kept: no stats, no proof
    assert pruned.count() == 10


def test_prune_on_column_mapped_table(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(
        spark.range(100).select("id").coalesce(1),
        path,
        column_mapping="name",
    )
    write_delta_lite(
        spark.range(10_000, 10_100).select("id").coalesce(1),
        path,
        mode="append",
    )
    pruned = read_delta_lite(spark, path, prune={"id": (None, 500)})
    assert len(pruned.inputFiles()) == 1
    assert pruned.filter(F.col("id") <= 500).count() == 100


def test_prune_unknown_column_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(3).select("id"), path)
    with pytest.raises(ValueError, match="not in schema"):
        read_delta_lite(spark, path, prune={"nope": (0, 1)})


def test_stats_survive_checkpoint_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(100).select("id").coalesce(1), path)
    write_delta_lite(
        spark.range(10_000, 10_100).select("id").coalesce(1),
        path,
        mode="append",
    )
    write_checkpoint(spark, path)
    assert cleanup_log(spark, path)  # stats now come from the checkpoint
    state = replay_log(spark, path)
    assert all("stats" in (state.adds.get(r) or {}) for r in state.files)
    pruned = read_delta_lite(spark, path, prune={"id": (None, 500)})
    assert len(pruned.inputFiles()) == 1
