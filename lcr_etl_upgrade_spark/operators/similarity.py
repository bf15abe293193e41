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
    """Brute-force cosine top-k per query (exact). NULL vectors are
    unscorable and excluded on both sides (the shared ANN contract —
    see ivf_topk / cosine_topk_vectorized)."""
    from pyspark.sql import Window as W

    q = queries.filter(F.col(vec_col).isNotNull()).select(
        F.col(query_id), F.col(vec_col).alias("__qvec")
    )
    scored = (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(F.col(corpus_id), F.col(vec_col))
        .crossJoin(F.broadcast(q))
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


def _bucket_expr(vec_col: str, bits: int, dim: int, table: int = 0) -> Column:
    """One hyperplane-LSH bucket id: sign pattern against ``bits`` fixed
    pseudo-random hyperplanes. Plane coefficients derive from
    xxhash64(table*bits + bit, coordinate) — deterministic, reproducible,
    no driver-side state; distinct ``table`` values give independent
    plane sets (the multi-table OR-amplification lever)."""
    v = _to_double(F.col(vec_col))

    def plane_for(b: int) -> Column:
        # Factory closure (not a `b=b` default arg — that changes the lambda
        # arity and PySpark binds the 2-arg (element, index) form instead).
        # Coefficients pseudo-random in [-1, 1), reproducible from (b, i).
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                (F.xxhash64(F.lit(table * bits + b), i) % F.lit(10_000)).cast(
                    "double"
                )
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
    return bucket


def hyperplane_signature(
    df: DataFrame, vec_col: str = "embedding", bits: int = 8, dim: int = 64
) -> DataFrame:
    """Random-hyperplane LSH bucket id (single table; see _bucket_expr)."""
    return df.withColumn("lsh_bucket", _bucket_expr(vec_col, bits, dim))


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    bits: int = 8,
    dim: int = 64,
    tables: int = 1,
) -> DataFrame:
    """Approximate top-k: score only corpus rows sharing a hyperplane
    bucket with the query in at least one of ``tables`` independent
    tables. Recall < 1.0 by construction; the scale path.

    Multi-table is the recall lever (OR-amplification): each table
    shrinks candidates ~2^bits-fold, and a true neighbor is found if ANY
    table buckets it with the query. Candidates duplicated across tables
    are deduped before ranking. Per-table buckets are computed in ONE
    projection each side (no shuffle); the only shuffles are the
    candidate dedup and the final per-query top-k window."""
    from pyspark.sql import Window as W

    corpus = corpus.filter(F.col(vec_col).isNotNull())
    queries = queries.filter(F.col(vec_col).isNotNull())
    bucket_arr = F.array(
        *[_bucket_expr(vec_col, bits, dim, t) for t in range(tables)]
    )
    c = corpus.select(
        F.col(corpus_id),
        F.col(vec_col),
        F.posexplode(bucket_arr).alias("__t", "__bucket"),
    )
    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("__qvec"),
        F.posexplode(bucket_arr).alias("__t", "__bucket"),
    )
    scored = (
        c.join(F.broadcast(q), ["__t", "__bucket"])
        .dropDuplicates([query_id, corpus_id])
        .withColumn("cosine", cosine_expr(F.col(vec_col), F.col("__qvec")))
    )
    w = W.partitionBy(query_id).orderBy(F.desc("cosine"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    bits: int = 0,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    bits=0: exact all-pairs scoring (self-join on nothing — quadratic; the
    small-corpus / verification baseline). bits>0: hyperplane-LSH bucketed —
    only same-bucket pairs are scored, the 100 TB path (near-identical
    vectors land in the same bucket with high probability; recall < 1).

    Norms are computed once per row before pairing so the pair join does a
    dot product only, not three.
    """
    base = df.select(F.col(id_col), F.col(vec_col)).withColumn(
        "__norm", norm_expr(F.col(vec_col))
    )
    if bits > 0:
        base = hyperplane_signature(base, vec_col, bits, dim)
    a_cols = [
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__norm").alias("__na"),
    ]
    b_cols = [
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__norm").alias("__nb"),
    ]
    if bits > 0:
        a_cols.append(F.col("lsh_bucket").alias("__ba"))
        b_cols.append(F.col("lsh_bucket").alias("__bb"))
    a, b = base.select(*a_cols), base.select(*b_cols)
    cond = F.col("id_a") < F.col("id_b")
    if bits > 0:
        joined = a.join(b, (F.col("__ba") == F.col("__bb")) & cond)
    else:
        joined = a.join(b, cond)
    return (
        joined.withColumn(
            "cosine",
            dot_expr(F.col("__va"), F.col("__vb"))
            / (F.col("__na") * F.col("__nb")),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-style approximate top-k: KMeans (Spark ML) partitions the corpus
    into inverted lists; each query scores only the n_probe nearest lists.

    The scale shape: centroids are tiny (driver-side model broadcast by
    Spark ML), assignment is one map pass, and the probe join fans each
    query out to n_probe cells — candidate count drops by
    ~n_centroids/n_probe versus brute force, with the same exact scoring
    afterwards.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.sql import Window as W

    # a NULL vector can be neither indexed nor scored: drop such rows
    # up front (KMeans.fit dies on null features), then handle the
    # now-possibly-empty sides below
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    queries = queries.filter(F.col(vec_col).isNotNull())
    # totality at the edges: KMeans.fit throws on an empty corpus, and an
    # empty query side would pay the fit for nothing — both yield the
    # empty result a filter-to-nothing pipeline stage expects
    if corpus.isEmpty() or queries.isEmpty():
        q_t = queries.schema[query_id].dataType.simpleString()
        c_t = corpus.schema[corpus_id].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [], f"{query_id} {q_t}, {corpus_id} {c_t}, cosine double, rank int"
        )

    train = corpus.select(array_to_vector(_to_double(F.col(vec_col))).alias("features"))
    model = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(train)

    assigned = model.transform(
        corpus.withColumn("features", array_to_vector(_to_double(F.col(vec_col))))
    ).select(F.col(corpus_id), F.col(vec_col), F.col("prediction").alias("cell"))

    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        centroids, f"cell int, centroid array<double>"
    )

    q = queries.select(F.col(query_id), F.col(vec_col).alias("__qvec"))
    # each query x centroid -> keep n_probe nearest cells
    probe_w = W.partitionBy(query_id).orderBy(F.desc("cent_sim"), F.col("cell"))
    probes = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("cent_sim", cosine_expr(F.col("__qvec"), F.col("centroid")))
        .withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= n_probe)
        .select(query_id, "cell", "__qvec")
    )
    scored = assigned.join(F.broadcast(probes), "cell").withColumn(
        "cosine", cosine_expr(F.col(vec_col), F.col("__qvec"))
    )
    w = W.partitionBy(query_id).orderBy(F.desc("cosine"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


MAX_QUERY_ROWS = 65_536


def cosine_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    max_queries: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Brute-force cosine top-k via an Arrow-batched numpy matmul
    (mapInPandas): the vectorized alternative to the expression-based
    cosine_topk.

    The query matrix is captured in the task closure (small — it is
    collected once on the driver and shipped with the serialized function,
    the same distribution model as a broadcast variable) and each corpus
    Arrow batch is scored as one (batch x dim) @ (dim x n_queries) matmul.
    ~10-100x less per-element overhead than interpreted higher-order
    expressions; numpy's SIMD/pairwise summation makes results differ from
    sequential accumulation in the last ulp, so this variant is rows-only
    for the oracle (the expression form is the hash-checked baseline).

    SIZE CONTRACT (same model as MAX_BOUNDARY_KEYS in incremental.py):
    the query side is driver-collected, so it must be broadcast-sized.
    More than ``max_queries`` (default 65,536 ≈ 34 MB of 64-dim float64
    plus ids) raises ValueError with a remedy instead of OOMing the
    driver or shipping a multi-GB closure to every task. For a large
    query side, use cosine_topk_lsh / ivf_topk (both keep the query side
    distributed), or chunk the queries and union the results.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import Window as W

    q_t = queries.schema[query_id].dataType.simpleString()
    c_t = corpus.schema[corpus_id].dataType.simpleString()
    # NULL vectors are unscorable and would turn the numpy matrices into
    # ragged object arrays — drop them on both sides (same contract as
    # ivf_topk)
    q_rows = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(query_id, vec_col)
        .limit(max_queries + 1)
        .collect()
    )
    if len(q_rows) > max_queries:
        raise ValueError(
            f"cosine_topk_vectorized collects the query side to the driver; "
            f"got more than max_queries={max_queries} rows. Use "
            f"cosine_topk_lsh or ivf_topk for a distributed query side, "
            f"chunk the queries and union the results, or raise max_queries "
            f"explicitly if the driver can hold the matrix."
        )
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    if not q_rows:
        # an empty query matrix has no axis-1 to norm over; return the
        # empty result rather than an executor-side numpy shape error
        return corpus.sparkSession.createDataFrame(
            [], f"{query_id} {q_t}, {corpus_id} {c_t}, cosine double, rank int"
        )
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1)
            sims = (c_mat @ q_mat.T) / np.outer(c_norm, q_norm)
            n_c, n_q = sims.shape
            yield pd.DataFrame(
                {
                    query_id: np.repeat(q_ids, n_c),
                    corpus_id: np.tile(pdf[corpus_id].to_numpy(), n_q),
                    "cosine": sims.T.ravel(),
                }
            )

    scored = corpus.select(corpus_id, vec_col).mapInPandas(
        score, f"{query_id} {q_t}, {corpus_id} {c_t}, cosine double"
    )
    w = W.partitionBy(query_id).orderBy(F.desc("cosine"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )
