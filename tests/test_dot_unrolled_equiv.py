"""dot_unrolled_sql must be BIT-identical to the zip_with/aggregate fold
(_dot_sql / dot_expr) on every input shape — it feeds the hash-oracled
exact near-dup path, where a single last-bit drift flips ROUND(cosine, 6)
on boundary values and breaks DuckDB parity."""

import math
import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from lcr_etl_upgrade_spark.operators.similarity import (
    _dot_sql,
    dot_expr,
    dot_unrolled_sql,
)

DIM = 8  # small dim keeps the unrolled tree readable; guard logic is
#          dimension-independent (the 64-dim production spelling only
#          adds terms of the same shape)

nan, inf = float("nan"), float("inf")

VECS = [
    [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
    [0.1, -0.2, 0.3, -0.4, 0.5, -0.6, 0.7, -0.8],
    [-0.0] * 8,                      # -0.0 products: fold starts 0.0 + p0
    [nan, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],   # NaN poisons the sum
    [inf, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],   # inf * x
    [inf, -inf, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],  # inf + -inf = NaN mid-fold
    [None, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],  # NULL element -> NULL sum
    [1.0, 2.0, 3.0],                 # ragged short: guard must fall back
    [1.0] * 12,                      # ragged long: guard must fall back
    [],                              # empty array
    [1e30, -1e30, 1e30, -1e30, 1e30, -1e30, 1e30, -1e30],  # cancellation
    [3.14159e-7, 2.5, -1.5e10, 0.5, 1e-300, -1e300, 7.0, 42.0],
]


def _bits(x):
    if x is None:
        return None
    return struct.pack("<d", x)


@pytest.fixture(scope="module")
def pairs_df(spark):
    rows = [
        (i, j, va, vb)
        for i, va in enumerate(VECS)
        for j, vb in enumerate(VECS)
    ]
    schema = StructType(
        [
            StructField("i", LongType()),
            StructField("j", LongType()),
            StructField("va", ArrayType(FloatType())),
            StructField("vb", ArrayType(FloatType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_unrolled_bit_identical_to_fold(pairs_df):
    out = pairs_df.select(
        "i",
        "j",
        F.expr(_dot_sql("va", "vb")).alias("fold_sql"),
        dot_expr(F.col("va"), F.col("vb")).alias("fold_col"),
        F.expr(dot_unrolled_sql("va", "vb", DIM)).alias("unrolled"),
    ).collect()
    assert len(out) == len(VECS) ** 2
    for r in out:
        assert _bits(r.fold_sql) == _bits(r.fold_col), (r.i, r.j)
        assert _bits(r.unrolled) == _bits(r.fold_sql), (
            r.i,
            r.j,
            r.unrolled,
            r.fold_sql,
        )


def test_guard_falls_back_on_non_dim_vectors(pairs_df):
    """Ragged/short/long/empty operands take the fold branch — proven by
    comparing against a DELIBERATELY different unrolled dim: if the
    unrolled branch evaluated for a 3-element vector, get() nulls would
    null the sum while the fold (which zips to the longer operand)
    can still produce numbers."""
    short = pairs_df.filter("size(va) = 3 AND size(vb) = 3").select(
        F.expr(dot_unrolled_sql("va", "vb", DIM)).alias("u"),
        F.expr(_dot_sql("va", "vb")).alias("f"),
    ).collect()
    assert short, "fixture must contain the ragged pair"
    for r in short:
        assert _bits(r.u) == _bits(r.f)
        assert r.u is not None  # the fold DOES score equal-length ragged


def test_near_dup_exact_rows_unchanged(spark):
    """End-to-end pin: the exact near-dup operator (fan_out + unrolled
    scoring) returns the same pairs as a literal HOF re-spelling."""
    from lcr_etl_upgrade_spark.operators.similarity import (
        cosine_near_dup_pairs,
        norm_expr,
    )

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + k * 3) % 11 - 5) / 5.0 for k in range(8)])
         for i in range(60)],
        StructType(
            [
                StructField("vec_id", LongType()),
                StructField("embedding", ArrayType(FloatType())),
            ]
        ),
    )
    got = (
        cosine_near_dup_pairs(emb, threshold=0.3, bits=0, dim=8)
        .orderBy("id_a", "id_b")
        .collect()
    )
    base = (
        emb.withColumn("__n", norm_expr(F.col("embedding")))
        .filter(F.col("__n") > 0)
    )
    a = base.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("__n").alias("na"),
    )
    b = base.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("__n").alias("nb"),
    )
    want = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            dot_expr(F.col("va"), F.col("vb"))
            / (F.col("na") * F.col("nb")),
        )
        .filter(~F.isnan("cosine") & (F.col("cosine") >= 0.3))
        .select("id_a", "id_b", "cosine")
        .orderBy("id_a", "id_b")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got, "fixture threshold must admit pairs"
