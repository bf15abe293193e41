"""Salted join / aggregation skew utilities: results must equal the plain
formulation exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.operators.joins import salted_aggregate, salted_join


def test_salted_join_matches_plain_join(spark):
    # hot key 0 dominates the left side
    left = spark.createDataFrame(
        [(0, i) for i in range(500)] + [(k, k * 10) for k in range(1, 20)],
        ["k", "lv"],
    )
    right = spark.createDataFrame([(k, f"r{k}") for k in range(20)], ["k", "rv"])
    plain = left.join(right, "k").groupBy("k").count()
    salted = salted_join(left, right, "k", salt=4).groupBy("k").count()
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(0, 1), (9, 2)], ["k", "lv"])
    right = spark.createDataFrame([(0, "hit")], ["k", "rv"])
    got = {r.k: r.rv for r in salted_join(left, right, "k", salt=3, how="left").collect()}
    assert got == {0: "hit", 9: None}


def test_hot_key_salted_join_matches_plain_join(spark):
    """The targeted variant: hot keys detected by the MG sketch, salted
    branch + plain cold branch, union == the unsplit join exactly."""
    from lcr_etl_upgrade_spark.operators.joins import hot_key_salted_join

    left = spark.createDataFrame(
        [(0, i) for i in range(800)]            # planted hot key
        + [(k, k * 10) for k in range(1, 30)],  # cold tail
        ["k", "lv"],
    ).repartition(6)
    right = spark.createDataFrame(
        [(k, f"r{k}") for k in range(25)], ["k", "rv"]
    )
    for how in ("inner", "left", "left_semi", "left_anti"):
        plain = left.join(right, "k", how)
        split = hot_key_salted_join(
            left, right, "k", threshold=100, salt=4, how=how, k=64
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, split.collect())
        ), how
    # the sketch really did route key 0 to the hot branch
    from lcr_etl_upgrade_spark.operators.frequent import heavy_hitters

    hot = {r.k for r in heavy_hitters(
        left.select("k"), "k", threshold=100, k=64).collect()}
    assert hot == {0}


def test_hot_key_salted_join_caller_supplied_keys(spark):
    from lcr_etl_upgrade_spark.operators.joins import hot_key_salted_join

    left = spark.createDataFrame([(0, 1), (0, 2), (5, 3)], ["k", "lv"])
    right = spark.createDataFrame([(0, "a"), (5, "b")], ["k", "rv"])
    hot = spark.createDataFrame([(0,)], ["k"])
    got = hot_key_salted_join(
        left, right, "k", threshold=10**9, salt=2, hot_keys=hot
    )
    plain = left.join(right, "k")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_rejects_right_preserving_how(spark):
    """Right/full outer would emit unmatched right rows once per salt
    bucket — the operator must refuse, not silently duplicate."""
    import pytest

    left = spark.createDataFrame([(0, 1)], ["k", "lv"])
    right = spark.createDataFrame([(0, "r")], ["k", "rv"])
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(left, right, "k", salt=2, how=how)


def _asof_via_range_join(left, right, key, left_ts, right_ts, value_cols):
    """The classic range-join + row_number formulation — the semantic
    cross-check for asof_join_backward (and the shape it replaces)."""
    from pyspark.sql import Window as W

    r = right.select(
        F.col(key).alias("__rk"),
        F.col(right_ts),
        *[F.col(c) for c in value_cols],
    )
    w = W.partitionBy(*left.columns).orderBy(
        F.desc(right_ts), *[F.desc(c) for c in value_cols]
    )
    return (
        left.join(r, (left[key] == r["__rk"]) & (r[right_ts] <= left[left_ts]))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__rk")
    )


def test_asof_join_matches_range_join_formulation(spark):
    from lcr_etl_upgrade_spark.operators.joins import asof_join_backward

    left = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 205), (3, "u2", 150), (4, "u3", 50)],
        ["pid", "u", "pts"],
    )
    right = spark.createDataFrame(
        [("u1", 90, 9.0), ("u1", 100, 10.0), ("u1", 201, 20.1),
         ("u2", 10, 1.0), ("u2", 150, 15.0), ("u9", 1, 0.1)],
        ["u", "vts", "vval"],
    )
    got = asof_join_backward(left, right, "u", "pts", "vts", ["vval"])
    rows = {r.pid: (r.vts, r.vval) for r in got.collect()}
    # exact-instant match included (<=); latest prior wins; no-match -> NULL
    assert rows == {
        1: (100, 10.0),
        2: (201, 20.1),
        3: (150, 15.0),
        4: (None, None),
    }
    ref = _asof_via_range_join(left, right, "u", "pts", "vts", ["vval"])
    ref_rows = {r.pid: (r.vts, r.vval) for r in ref.collect()}
    inner = {k: v for k, v in rows.items() if v[0] is not None}
    assert inner == ref_rows


def test_asof_join_strict_inequality(spark):
    from lcr_etl_upgrade_spark.operators.joins import asof_join_backward

    left = spark.createDataFrame([(1, "u1", 100)], ["pid", "u", "pts"])
    right = spark.createDataFrame(
        [("u1", 100, 10.0), ("u1", 90, 9.0)], ["u", "vts", "vval"]
    )
    got = asof_join_backward(
        left, right, "u", "pts", "vts", ["vval"], allow_exact_match=False
    ).collect()[0]
    assert (got.vts, got.vval) == (90, 9.0)  # the ts==100 row is excluded


def test_asof_join_null_value_column_travels_atomically(spark):
    """When the matched right row has a NULL in one value column, that
    NULL must come through — NOT be backfilled from an older right row
    (the per-column last() bug: right_ts from the newer row + value from
    the older one is a mixed row no as-of formulation should emit)."""
    from lcr_etl_upgrade_spark.operators.joins import asof_join_backward

    left = spark.createDataFrame([(1, "u1", 200)], ["pid", "u", "pts"])
    right = spark.createDataFrame(
        [("u1", 100, 9.0, "old"), ("u1", 150, None, "new")],
        ["u", "vts", "vval", "vtag"],
    )
    got = asof_join_backward(
        left, right, "u", "pts", "vts", ["vval", "vtag"]
    ).collect()[0]
    # the matched row is (150, NULL, "new") — atomically
    assert (got.vts, got.vval, got.vtag) == (150, None, "new")


def test_asof_join_hot_key_linear(spark):
    """A power user with thousands of views must not blow up into a
    views x purchases intermediate: the union+window shape is linear, so
    this stays fast and exact. (The range-join formulation materializes
    50 x 5000 pairs for this input before discarding 99.98% of them.)"""
    from lcr_etl_upgrade_spark.operators.joins import asof_join_backward

    n_views, n_purch = 5000, 50
    views = spark.range(n_views).select(
        F.lit("hot").alias("u"),
        (F.col("id") * 2).alias("vts"),
        F.col("id").cast("double").alias("vval"),
    )
    purchases = spark.range(n_purch).select(
        F.col("id").alias("pid"),
        F.lit("hot").alias("u"),
        (F.col("id") * 100 + 1).alias("pts"),
    )
    got = asof_join_backward(purchases, views, "u", "pts", "vts", ["vval"])
    rows = {r.pid: r.vts for r in got.collect()}
    assert len(rows) == n_purch
    # purchase at pts = 100k+1 -> latest even vts <= that is 100k
    for pid, vts in rows.items():
        expect = min((pid * 100 + 1) // 2 * 2, (n_views - 1) * 2)
        assert vts == expect, (pid, vts, expect)
    # plan shape: no join node at all — a single window does the matching
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


def test_salted_aggregate_matches_plain(spark):
    df = spark.createDataFrame(
        [(0, float(i)) for i in range(1000)] + [(1, 5.0), (2, 7.0)],
        ["k", "v"],
    )
    plain = {
        r.k: (r.n, r.s)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        r.k: (r.n, r.s)
        for r in salted_aggregate(
            df,
            ["k"],
            aggs=[F.count(F.lit(1)).alias("pn"), F.sum("v").alias("ps")],
            partial_aggs=[F.sum("pn").alias("n"), F.sum("ps").alias("s")],
            salt=8,
        ).collect()
    }
    assert plain == salted


def test_aqe_splits_skewed_join_partitions(spark, tmp_path):
    """AQE skew-join handling is on in the session factory; verify it
    actually FIRES: a join with one massive key must show skew-split
    partitions in the final adaptive plan (the runtime guard that makes
    un-salted fact-fact joins survive hot keys at scale)."""
    left_path = str(tmp_path / "skew_left")
    right_path = str(tmp_path / "skew_right")
    # LEFT skewed: key 0 holds 2M rows, keys 1..99 hold 2k each.
    # RIGHT uniform: exactly one row per key, so join output stays linear
    # (the skew is in the shuffle partition SIZE, not the output).
    spark.range(2_000_000).select(
        F.lit(0).alias("k"), F.col("id").alias("lv")
    ).union(
        spark.range(198_000).select(
            (F.col("id") % 99 + 1).alias("k"), F.col("id").alias("lv")
        )
    ).write.mode("overwrite").parquet(left_path)
    spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    ).write.mode("overwrite").parquet(right_path)

    conf = {
        # thresholds low enough that the test-sized hot key counts as skew;
        # partition coalescing off — at test sizes it merges the small
        # partitions first and masks the skew decision
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        joined = spark.read.parquet(left_path).join(
            spark.read.parquet(right_path), "k"
        )
        # aggregate THROUGH the join and inspect that exact DataFrame's
        # executed plan — AQE finalizes (isFinalPlan=true) only on the
        # query execution that actually ran
        agg = joined.agg(F.count(F.lit(1)).alias("n"))
        assert agg.collect()[0].n == 2_198_000  # every left row matches once
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # AQE marks the join it split: the SMJ/SHJ node carries skew=true
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_asof_join_column_collision_refused(spark):
    """Both sides naming their timestamp 'ts' (the most natural call)
    used to produce a frame with TWO 'ts' columns — every downstream
    reference then raises AMBIGUOUS_REFERENCE; the operator must refuse
    up front with the rename remedy."""
    import pytest as _pytest

    from lcr_etl_upgrade_spark.operators.joins import asof_join_backward

    left = spark.createDataFrame(
        [(1, 10, 1.0)], "u long, ts long, lv double"
    )
    right = spark.createDataFrame(
        [(1, 5, 2.0)], "u long, ts long, v double"
    )
    with _pytest.raises(ValueError, match="collide with left columns"):
        asof_join_backward(
            left, right, key="u", left_ts="ts", right_ts="ts",
            value_cols=["v"],
        )
