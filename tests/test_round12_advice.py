"""Round-12 regression tests for the three ADVICE.md findings:

1. (high) update_rows applied assignments via sequential
   withColumn(F.when(pred, ...)), so the predicate and later
   assignment/generated-column/rcv expressions were re-evaluated
   against ALREADY-UPDATED values: update 'v > 5' SET v=0, w=99
   committed (v=0, w=0). SQL UPDATE semantics require the predicate
   and every assignment RHS to see the ORIGINAL row — pinned here for
   multi-assignment, swap assignments, generated-column recompute,
   rowTracking rcv nulling, and CDF postimages.
2. (low) frequent_item_candidates persisted the summaries frame and
   never unpersisted it (lazy candidates pinned the cached blocks for
   their whole lifetime). Now: bounded eager collect + unpersist in a
   finally — no persistent RDDs left behind.
3. (low) update_rows recorded operationParameters['predicate'] as the
   PySpark Column repr ("Column<'(v > 5)'>") for Column conditions;
   delta-spark records the expression string.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.delta_lite import (
    read_delta_changes,
    read_delta_lite,
    read_row_ids,
    table_history,
    update_rows,
    write_delta_lite,
)
from lcr_etl_upgrade_spark.operators.frequent import (
    frequent_item_candidates,
    heavy_hitters,
)


def _base(spark, n=10):
    return spark.range(0, n).select(
        "id",
        F.col("id").cast("int").alias("v"),
        F.lit(1).cast("int").alias("w"),
    )


def test_update_assignment_does_not_falsify_predicate(spark, tmp_path):
    """SET v=0, w=99 WHERE v > 5: both assignments must land — the old
    sequential spelling dropped w because assigning v falsified pred."""
    path = str(tmp_path / "t")
    write_delta_lite(_base(spark), path)
    update_rows(spark, path, "v > 5", {"v": F.lit(0), "w": F.lit(99)})
    got = {r["id"]: (r["v"], r["w"]) for r in read_delta_lite(spark, path).collect()}
    for i in range(10):
        if i > 5:
            assert got[i] == (0, 99), (i, got[i])
        else:
            assert got[i] == (i, 1), (i, got[i])


def test_update_rhs_sees_old_values_swap(spark, tmp_path):
    """SET v=w, w=v is a swap (SQL UPDATE), not a sequential chain
    that copies w into both."""
    path = str(tmp_path / "t")
    write_delta_lite(_base(spark, 4), path)
    update_rows(
        spark, path, "id >= 2", {"v": F.col("w"), "w": F.col("v")}
    )
    got = {r["id"]: (r["v"], r["w"]) for r in read_delta_lite(spark, path).collect()}
    assert got[3] == (1, 3)
    assert got[2] == (1, 2)
    assert got[0] == (0, 1)


def test_update_generated_column_recomputes_despite_pred_falsified(
    spark, tmp_path
):
    """Generated column g = v + 1 must recompute from the NEW v even
    when the assignment falsifies the predicate that gated it."""
    import pyspark.sql.types as T

    path = str(tmp_path / "t")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.IntegerType()),
            T.StructField(
                "g",
                T.IntegerType(),
                metadata={"delta.generationExpression": "v + 1"},
            ),
        ]
    )
    df = spark.createDataFrame(
        [(i, i, i + 1) for i in range(8)], schema
    )
    write_delta_lite(df, path)
    update_rows(spark, path, "v > 3", {"v": F.lit(0)})
    got = {r["id"]: (r["v"], r["g"]) for r in read_delta_lite(spark, path).collect()}
    for i in range(8):
        want = (0, 1) if i > 3 else (i, i + 1)
        assert got[i] == want, (i, got[i])


def test_update_cdf_postimage_and_rcv_on_falsifying_assignment(
    spark, tmp_path
):
    """CDF update_postimage rows and rowTracking commit-version nulling
    must key off the PRISTINE-row match."""
    from tests.test_cdf_write_validator import _enable_cdf
    from tests.test_delta_rowtracking import _enable_row_tracking

    path = str(tmp_path / "t")
    write_delta_lite(_base(spark, 1), path)
    _enable_row_tracking(path)
    _enable_cdf(path)
    w = write_delta_lite(_base(spark), path, mode="overwrite")
    v = update_rows(spark, path, "v > 5", {"v": F.lit(0), "w": F.lit(99)})
    post = {
        r["id"]: (r["v"], r["w"])
        for r in read_delta_changes(spark, path, v, v)
        .filter(F.col("_change_type") == "update_postimage")
        .collect()
    }
    assert set(post) == {6, 7, 8, 9}
    assert all(val == (0, 99) for val in post.values()), post
    rid = {
        r["id"]: r["_row_commit_version"]
        for r in read_row_ids(spark, path).collect()
    }
    for i in range(10):
        assert rid[i] == (v if i > 5 else w), (i, rid[i])


def test_update_predicate_param_is_expression_sql(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(_base(spark), path)
    update_rows(spark, path, F.col("v") > 5, {"w": F.lit(7)})
    pred = table_history(path)[0]["operationParameters"]["predicate"]
    assert "Column<" not in pred
    assert "v" in pred and "5" in pred


def test_frequent_candidates_release_cache(spark):
    sc = spark.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet())
    items = spark.range(0, 5000).select(
        (F.col("id") % 7).cast("string").alias("tok")
    )
    cands, d, n, thr = frequent_item_candidates(items, "tok", 64, phi=0.01)
    after = set(sc._jsc.getPersistentRDDs().keySet())
    assert after <= before, "summaries left persisted"
    # eager candidates still drive an exact recount
    hh = heavy_hitters(items, "tok", phi=0.1)
    assert hh.count() == 7
    assert cands.count() >= 7
