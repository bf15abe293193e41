"""Pin the SQL-text twins of the d-agg and cosine helpers to their
Column spellings, bit-for-bit (r13 driver-overhead optimization: str
inputs route through parsed SQL; the Column path must stay reachable and
identical for expression inputs)."""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

ADVERSARIAL = [
    0.0,
    -0.0,
    1.0,
    -1.0,
    1 / 128,  # exact .5 tie at 6dp (round-away regime)
    -1 / 128,
    7812.4999999,
    0.1234565,
    123456.789012,
    9.9e11,  # just inside the domain
    -9.9e11,
    1.1e12,  # outside -> NULL
    float("nan"),
    float("inf"),
    float("-inf"),
    None,
    4.4e9 + 0.0000005,
    2.0**52 / 1e6,
]


@pytest.fixture(scope="module")
def adv_df(spark):
    rows = [Row(g=i % 3, v=v) for i, v in enumerate(ADVERSARIAL)]
    return spark.createDataFrame(rows, "g int, v double")


def _bits(x):
    if x is None:
        return "NULL"
    return struct.pack(">d", x).hex()


def test_dsum_davg_sql_twin_bitwise(adv_df):
    from lcr_etl_upgrade_spark.functions.numeric import (
        _exact_sum,
        davg,
        dsum,
    )

    col_form = (
        adv_df.groupBy("g")
        .agg(
            _exact_sum(F.col("v")).cast("double").alias("s"),
            (
                _exact_sum(F.col("v")).cast("double")
                / F.count(
                    F.when((~F.isnan(F.col("v"))) & (F.abs("v") < 1e12), 1)
                )
            ).alias("a"),
        )
        .orderBy("g")
        .collect()
    )
    sql_form = (
        adv_df.groupBy("g")
        .agg(dsum("v", "s"), davg("v", "a"))
        .orderBy("g")
        .collect()
    )
    assert [( _bits(r.s), _bits(r.a)) for r in col_form] == [
        (_bits(r.s), _bits(r.a)) for r in sql_form
    ]


def test_dquantize_sql_twin_bitwise(adv_df):
    from lcr_etl_upgrade_spark.functions.numeric import (
        _quantized,
        dquantize,
    )

    both = adv_df.select(
        _quantized(F.col("v")).alias("c"), dquantize("v", "q")
    ).collect()
    for r in both:
        assert r.c == r.q, r


def test_dsum_expression_string_input(adv_df):
    """A non-identifier string is treated as SQL expression text."""
    from lcr_etl_upgrade_spark.functions.numeric import dsum

    a = adv_df.agg(dsum(F.col("v") * 2, "s")).collect()[0].s
    b = adv_df.agg(dsum("v * 2", "s")).collect()[0].s
    assert _bits(a) == _bits(b)


def test_safe_cosine_sql_twin_bitwise(spark):
    from lcr_etl_upgrade_spark.operators.similarity import (
        safe_cosine_expr,
        safe_cosine_sql,
    )

    rows = [
        Row(a=[1.0, 2.0, 3.0], b=[4.0, 5.0, 6.0]),
        Row(a=[0.0, 0.0], b=[1.0, 1.0]),  # zero norm -> NULL
        Row(a=[1e-30, 1e30], b=[1e30, 1e-30]),
        Row(a=[float("nan"), 1.0], b=[1.0, 1.0]),  # NaN propagates
        Row(a=[0.1, 0.2, 0.7], b=[-0.5, 0.25, 0.125]),
    ]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    got = df.select(
        safe_cosine_expr(F.col("a"), F.col("b")).alias("c"),
        F.expr(safe_cosine_sql("a", "b")).alias("s"),
    ).collect()
    for r in got:
        assert _bits(r.c) == _bits(r.s), r


def test_davg_over_matches_group_davg_bitwise(adv_df):
    """davg_over (window twin, r13 q17 restatement) must produce the
    IDENTICAL double per group as the groupBy davg: same quantized
    numerator, same guard-count denominator, one double division."""
    from pyspark.sql import Window as W

    from lcr_etl_upgrade_spark.functions.numeric import davg, davg_over

    grouped = {
        r.g: _bits(r.a)
        for r in adv_df.groupBy("g").agg(davg("v", "a")).collect()
    }
    windowed = adv_df.select(
        "g", davg_over("v", W.partitionBy("g"), "a")
    ).collect()
    assert windowed  # non-empty
    for r in windowed:
        assert _bits(r.a) == grouped[r.g], r
