"""percentile(c, array(p1, p2, ...)) must be BIT-identical to separate
percentile(c, p_i) calls — the r13 rewrite of agg_percentiles /
agg_approx_percentiles shares one counts-map buffer across percentile
levels, and agg_percentiles is hash-oracled against DuckDB, so a single
last-bit drift breaks parity."""

import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

nan, inf = float("nan"), float("inf")

ROWS = [
    # key, value — duplicates, negatives, exact .5 rank ties, specials
    ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 3.0), ("a", 100.0),
    ("b", -5.0), ("b", -5.0), ("b", 0.0), ("b", 0.5),
    ("c", 7.25),                       # single-value group
    ("d", None), ("d", 4.0), ("d", 8.0),   # nulls ignored
    ("e", None),                       # all-null group -> NULL result
    ("f", inf), ("f", -inf), ("f", 1.0),   # infinities sort at extremes
    ("g", nan), ("g", 1.0), ("g", 2.0),    # NaN sorts greatest
    ("h", 1e-300), ("h", 1e300), ("h", -1e300),
]

PS = [0.0, 0.25, 0.45, 0.5, 0.55, 0.95, 1.0]


def _bits(x):
    if x is None:
        return None
    return struct.pack("<d", x)


@pytest.fixture(scope="module")
def vals_df(spark):
    schema = StructType(
        [StructField("k", StringType()), StructField("v", DoubleType())]
    )
    return spark.createDataFrame(ROWS, schema)


def test_array_percentile_bit_identical(vals_df):
    arr_lit = ", ".join(f"{p}D" for p in PS)
    scalar_cols = [
        F.percentile("v", F.lit(p)).alias(f"s{i}") for i, p in enumerate(PS)
    ]
    out = (
        vals_df.groupBy("k")
        .agg(
            F.expr(f"percentile(v, array({arr_lit}))").alias("arr"),
            *scalar_cols,
        )
        .collect()
    )
    assert len(out) == len({k for k, _ in ROWS})
    for r in out:
        for i in range(len(PS)):
            got = None if r.arr is None else r.arr[i]
            assert _bits(got) == _bits(r[f"s{i}"]), (r.k, PS[i], got, r[f"s{i}"])


def test_array_percentile_long_type(spark):
    schema = StructType(
        [StructField("k", StringType()), StructField("v", LongType())]
    )
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 4), ("b", 10), ("b", None)], schema
    )
    out = (
        df.groupBy("k")
        .agg(
            F.expr("percentile(v, array(0.25D, 0.5D, 0.75D))").alias("arr"),
            F.percentile("v", F.lit(0.25)).alias("s0"),
            F.percentile("v", F.lit(0.5)).alias("s1"),
            F.percentile("v", F.lit(0.75)).alias("s2"),
        )
        .collect()
    )
    for r in out:
        for i in range(3):
            assert _bits(r.arr[i]) == _bits(r[f"s{i}"]), (r.k, i)
