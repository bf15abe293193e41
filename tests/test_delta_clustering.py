"""clusteredTable (round 11): set_cluster_by / cluster_columns and the
optimize() default — a plain OPTIMIZE on a clustered table performs the
Z-order clustering rewrite on the declared columns (delta-spark's
contract); the spec lives in the delta.clustering domain as PHYSICAL
names (columnMapping-aware) and survives checkpoints like every other
domain.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.delta_lite import (
    cluster_columns,
    optimize,
    read_delta_lite,
    replay_log,
    set_cluster_by,
    write_delta_lite,
)


def _xy(spark, n=40_000):
    return spark.range(n).select(
        (F.pmod(F.hash(F.col("id") * 2 + 1), 10_000))
        .cast("double")
        .alias("x"),
        (F.pmod(F.hash(F.col("id") * 2), 10_000))
        .cast("double")
        .alias("y"),
    )


def _mean_span(spark, path, col):
    state = replay_log(spark, path)
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


def test_set_cluster_by_roundtrip_and_protocol(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(_xy(spark, 100), path)
    assert cluster_columns(spark, path) == []
    v = set_cluster_by(spark, path, ["x", "y"])
    assert v == 1
    assert cluster_columns(spark, path) == ["x", "y"]
    st = replay_log(spark, path)
    feats = set((st.protocol or {}).get("writerFeatures") or ())
    assert {"clusteredTable", "domainMetadata"} <= feats
    # CLUSTER BY NONE
    set_cluster_by(spark, path, [])
    assert cluster_columns(spark, path) == []


def test_plain_optimize_clusters_a_clustered_table(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(_xy(spark).repartition(8), path)
    set_cluster_by(spark, path, ["x", "y"])
    before = {
        (r["x"], r["y"]) for r in read_delta_lite(spark, path).collect()
    }
    res = optimize(spark, path, target_file_bytes=40_000)  # no zorder_by
    assert res["version"] is not None and res["added"] > 1
    assert {
        (r["x"], r["y"]) for r in read_delta_lite(spark, path).collect()
    } == before
    # the default rewrite actually clustered: per-row-group spans shrink
    assert _mean_span(spark, path, "x") < 10_000 * 0.6
    assert _mean_span(spark, path, "y") < 10_000 * 0.6
    # an explicit zorder_by still overrides the table spec
    res2 = optimize(spark, path, zorder_by=["x"])
    assert res2["version"] is not None


def test_cluster_by_stores_physical_names(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(_xy(spark, 100), path, column_mapping="name")
    set_cluster_by(spark, path, ["x"])
    st = replay_log(spark, path)
    stored = json.loads(
        st.domains["delta.clustering"]["configuration"]
    )["clusteringColumns"]
    # physical name (col-N under this writer's name mapping), not "x"
    assert stored and stored[0][0] != "x"
    # but the logical view round-trips
    assert cluster_columns(spark, path) == ["x"]
    # and the default optimize resolves it back to the logical column
    res = optimize(spark, path, target_file_bytes=1 << 30)
    assert res["version"] is not None


def test_cluster_by_refusals(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(
        spark.range(10).select(
            "id", (F.col("id") % 2).cast("string").alias("s")
        ),
        path,
        partition_by=("s",),
    )
    with pytest.raises(ValueError, match="not in schema"):
        set_cluster_by(spark, path, ["nope"])
    with pytest.raises(ValueError, match="partition columns"):
        set_cluster_by(spark, path, ["s"])


def test_clustering_survives_checkpoint(spark, tmp_path):
    from lcr_etl_upgrade_spark.delta_lite import (
        cleanup_log,
        write_checkpoint,
    )

    path = str(tmp_path / "t")
    write_delta_lite(_xy(spark, 100), path)
    set_cluster_by(spark, path, ["y"])
    write_delta_lite(_xy(spark, 50), path, mode="append")
    write_checkpoint(spark, path)
    cleanup_log(spark, path)
    assert cluster_columns(spark, path) == ["y"]
