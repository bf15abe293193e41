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


def test_salted_join_rejects_right_preserving_how(spark):
    """Right/full outer would emit unmatched right rows once per salt
    bucket — the operator must refuse, not silently duplicate."""
    import pytest

    left = spark.createDataFrame([(0, 1)], ["k", "lv"])
    right = spark.createDataFrame([(0, "r")], ["k", "rv"])
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(left, right, "k", salt=2, how=how)


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
