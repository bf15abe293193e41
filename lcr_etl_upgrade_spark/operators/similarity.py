"""L3 similarity search over embedding columns (array<float>).

- brute-force cosine top-k: broadcast the (small) query set, score every
  corpus row with built-in higher-order array functions (all double math,
  JVM-side), rank with a per-query window. This is the exact baseline.
- LSH-bucketed variant: random-hyperplane signs bucket the corpus; queries
  probe only their bucket — the 100 TB scale path (candidates shrink by
  ~2^bits) with identical scoring afterwards.

No UDFs anywhere: zip_with/aggregate compile to Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-order double dot product (deterministic accumulation)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k per query (exact)."""
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.select(F.col(corpus_id), F.col(vec_col)).crossJoin(
        F.broadcast(q)
    )
    scored = scored.withColumn(
        "cosine", cosine_expr(F.col(vec_col), F.col("__qvec"))
    )
    w = W.partitionBy(query_id).orderBy(F.desc("cosine"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def hyperplane_signature(
    df: DataFrame, vec_col: str = "embedding", bits: int = 8, dim: int = 64
) -> DataFrame:
    """Random-hyperplane LSH bucket id: sign pattern against `bits` fixed
    pseudo-random hyperplanes (deterministic — generated from xxhash64 of
    (bit, coordinate), so the 'random' planes are reproducible with no
    driver-side state and no data shuffle)."""
    v = _to_double(F.col(vec_col))

    def plane_for(b: int) -> Column:
        # Factory closure (not a `b=b` default arg — that changes the lambda
        # arity and PySpark binds the 2-arg (element, index) form instead).
        # Coefficients pseudo-random in [-1, 1), reproducible from (b, i).
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                (F.xxhash64(F.lit(b), i) % F.lit(10_000)).cast("double")
                / F.lit(5_000.0)
            ),
        )

    bucket = F.lit(0).cast("long")
    for b in range(bits):
        proj = F.aggregate(
            F.zip_with(v, plane_for(b), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(
            F.when(proj >= 0, F.lit(1 << b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return df.withColumn("lsh_bucket", bucket)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    bits: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only corpus rows sharing the query's
    hyperplane bucket. Recall < 1.0 by construction; the scale path."""
    from pyspark.sql import Window as W

    c = hyperplane_signature(corpus, vec_col, bits, dim)
    q = hyperplane_signature(queries, vec_col, bits, dim).select(
        F.col(query_id),
        F.col(vec_col).alias("__qvec"),
        F.col("lsh_bucket").alias("__qbucket"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("lsh_bucket") == F.col("__qbucket"))
        .withColumn("cosine", cosine_expr(F.col(vec_col), F.col("__qvec")))
    )
    w = W.partitionBy(query_id).orderBy(F.desc("cosine"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )
