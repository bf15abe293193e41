"""LLM-data-pipeline queries (SURVEY.md §2.11): text analysis, dedup,
fingerprinting, embedding similarity — over documents/embeddings testdata.

Exact/SQL-expressible ops carry DuckDB oracles; sketch-based ops (MinHash
LSH, SimHash, hyperplane LSH) are engine-specific and exposed rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.functions.numeric import davg, dsum
from lcr_etl_upgrade_spark.plans.registry import query
from lcr_etl_upgrade_spark.sources.testdata import load_table


# --------------------------------------------------------------------------
# L4: per-document text statistics
# --------------------------------------------------------------------------
@query(
    "doc_text_stats",
    oracle="""
    -- tokenization MUST match operators/text.py::tokens_expr: \\s+ split
    -- with empty tokens dropped (the old space-split restatement kept
    -- empties and used the length-arithmetic avg shortcut, so the
    -- REGISTERED query was gating an inline reimplementation instead of
    -- the operator library)
    WITH t AS (
      SELECT doc_id, lang, source, text,
             list_filter(
               regexp_split_to_array(text, '\\s+'), x -> x <> ''
             ) AS w
      FROM documents
    )
    SELECT doc_id, lang, source,
           LENGTH(text) AS n_chars_measured,
           CAST(LEN(w) AS BIGINT) AS n_tokens,
           CASE WHEN w IS NULL THEN NULL
                ELSE CAST(COALESCE(
                       list_sum(list_transform(w, x -> LENGTH(x))), 0
                     ) AS DOUBLE) / GREATEST(LEN(w), 1) END AS avg_token_len
    FROM t
    ORDER BY doc_id
    """,
)
def doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 text stats THROUGH the operator library (text.quality_features)
    — the oracle now gates the operator's own tokenization, not an
    inline twin."""
    from lcr_etl_upgrade_spark.operators.text import quality_features

    docs = load_table(spark, sf_dir, "documents")
    return (
        quality_features(docs)
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars_measured",
            "n_tokens",
            "avg_token_len",
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# L4: corpus summary by language/source
# --------------------------------------------------------------------------
@query(
    "doc_lang_summary",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) / COUNT(n_chars) AS avg_chars,
           CAST(SUM(LEN(list_filter(
               regexp_split_to_array(text, '\\s+'), x -> x <> ''
           ))) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def doc_lang_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lcr_etl_upgrade_spark.operators.text import token_count_expr

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg("n_chars", "avg_chars"),
            F.sum(token_count_expr(F.col("text"))).alias("total_tokens"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# L1: exact dedup via content hash (hash-groupBy, deterministic survivor)
# --------------------------------------------------------------------------
@query(
    "doc_dedup_exact",
    oracle="""
    -- COALESCE restates exact_dedup's NULL sentinel ('\\x00' || 'N'):
    -- md5(NULL) is NULL here, but the operator keys NULL text
    -- deterministically so NULL-text rows form one dup group
    SELECT md5(COALESCE(text, chr(0) || 'N')) AS content_md5,
           MIN(doc_id) AS doc_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY 1
    ORDER BY doc_id
    """,
)
def doc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lcr_etl_upgrade_spark.operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    return (
        exact_dedup(docs, ["text"], "doc_id")
        .select(F.col("__dupkey").alias("content_md5"), "doc_id", "dup_count")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# L4: document fingerprinting (content md5 + normalized prefix fp)
# --------------------------------------------------------------------------
@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text) AS content_md5,
           -- TRIM(x, ' ') pins DuckDB to Spark's ASCII-space-only trim
           -- (DuckDB's default set strips unicode spaces like NBSP)
           SUBSTRING(md5(regexp_replace(LOWER(TRIM(text, ' ')), '\\s+', ' ', 'g')), 1, 16)
             AS normalized_fp
    FROM documents
    ORDER BY doc_id
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lcr_etl_upgrade_spark.operators.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    return fingerprint(docs).select(
        "doc_id", "content_md5", "normalized_fp"
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# L4: heuristic language ID (engine-specific scoring — rows-only check)
# --------------------------------------------------------------------------
@query(
    "doc_language_id",
    oracle="""
    WITH toks AS (
      -- COALESCE: NULL text scores zero stopword hits -> 'und' (the
      -- operator's behavior); without it the NULL scores fall through
      -- every CASE arm to the 'zh' ELSE
      SELECT doc_id, lang,
             string_split_regex(trim(lower(COALESCE(text, '')), ' '), '\\s+') AS t
      FROM documents
    ), scores AS (
      SELECT doc_id, lang,
        len(list_filter(t, x -> list_contains(
          ['der','die','und','das','ist','nicht','ein'], x))) AS s_de,
        len(list_filter(t, x -> list_contains(
          ['the','and','of','to','in','is','a'], x))) AS s_en,
        len(list_filter(t, x -> list_contains(
          ['el','la','los','que','es','una','por'], x))) AS s_es,
        len(list_filter(t, x -> list_contains(
          ['le','la','et','les','des','est','une'], x))) AS s_fr,
        len(list_filter(t, x -> list_contains(
          ['的','是','了','在','我','有','和'], x))) AS s_zh
      FROM toks
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(s_de,s_en,s_es,s_fr,s_zh) = 0 THEN 'und'
                WHEN s_de >= greatest(s_en,s_es,s_fr,s_zh) THEN 'de'
                WHEN s_en >= greatest(s_es,s_fr,s_zh) THEN 'en'
                WHEN s_es >= greatest(s_fr,s_zh) THEN 'es'
                WHEN s_fr >= s_zh THEN 'fr'
                ELSE 'zh' END AS lang_pred
    FROM scores
    ORDER BY doc_id
    """,
)
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit argmax over whitespace tokens; ties resolve to the
    alphabetically-first language, zero hits -> 'und' — the oracle states
    the same fold as a prioritized CASE."""
    from lcr_etl_upgrade_spark.operators.dedup import fan_out
    from lcr_etl_upgrade_spark.operators.text import language_id

    docs = load_table(spark, sf_dir, "documents")
    # fan_out (r13, §2.5 1-split scan): five stopword-alternation regex
    # scans per document are heavy enough to amortize one narrow 7 MB
    # exchange — unlike doc_text_stats' cheap length exprs, where the
    # same widening measured slower and was rejected (batch 3). The
    # final orderBy's range-sampling job re-executes the scoring
    # projection too, so both executions parallelize. Same-session A/B:
    # 0.89-0.98 -> 0.55-0.64 s; rows identical. No-op at cluster scale.
    return (
        language_id(fan_out(docs.select("doc_id", "lang", "text")))
        .select("doc_id", "lang", "lang_pred")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# L2: MinHash-LSH near-duplicate candidates (sketch — rows-only check)
# --------------------------------------------------------------------------
@query("doc_minhash_near_dup")
def doc_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lcr_etl_upgrade_spark.operators.dedup import near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    # persist the threshold-bounded pair set before the deterministic
    # output sort: the range exchange's sampling job re-executes the
    # sort's child down to the nearest exchange — the whole
    # Jaccard-verify join ran twice (see embedding_cosine_near_dup)
    pairs = near_dup_pairs(
        docs, "text", "doc_id", num_hashes=16, bands=4, threshold=0.5
    ).persist()
    return pairs.orderBy("doc_a", "doc_b")


# --------------------------------------------------------------------------
# L2: n-gram Jaccard similarity on a deterministic pair set (exact — oracled)
# Pairs: consecutive doc_ids within the same language.
# --------------------------------------------------------------------------
@query(
    "doc_ngram_jaccard",
    oracle="""
    WITH toks AS (
      -- \\s+ split with empty tokens dropped: MUST match the Spark
      -- side's tokenization (shingle_tokens splits on \\s+ and filters
      -- ''); the old space-only string_split kept empty tokens, so any
      -- tab/newline/double-space in a paired document produced a
      -- different shingle set than the engine under test
      SELECT doc_id, lang,
             list_filter(
               regexp_split_to_array(LOWER(text), '\\s+'), t -> t <> ''
             ) AS w
      FROM documents
    ), sh AS (
      SELECT doc_id, lang,
             list_distinct(
               list_transform(
                 range(1, GREATEST(LEN(w) - 2, 0) + 1),
                 i -> array_to_string(w[i:i+2], ' ')
               )
             ) AS shingle_set
      FROM toks
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.shingle_set AS sa, b.shingle_set AS sb
      FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1 AND a.lang = b.lang
    )
    SELECT doc_a, doc_b,
           CAST(LEN(list_intersect(sa, sb)) AS DOUBLE)
             / GREATEST(LEN(list_distinct(sa || sb)), 1) AS jaccard
    FROM pairs
    ORDER BY doc_a
    """,
)
def doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lcr_etl_upgrade_spark.operators.dedup import jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"))
    pairs = a.join(
        b, (F.col("doc_b") == F.col("doc_a") + 1) & (F.col("lang_a") == F.col("lang_b"))
    ).select("doc_a", "doc_b")
    # no persist before the output sort here: measured flat (r13 — the
    # jaccard_pairs subtree the range sampling re-runs is one cheap
    # cached-sets join, unlike the near-dup pipelines)
    return jaccard_pairs(docs, "doc_id", "text", pairs).orderBy("doc_a")


# --------------------------------------------------------------------------
# L2: SimHash signatures (sketch — rows-only check)
# --------------------------------------------------------------------------
@query("doc_simhash")
def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lcr_etl_upgrade_spark.operators.dedup import simhash

    docs = load_table(spark, sf_dir, "documents")
    # no persist before the output sort here: measured +0.2 s (r13) —
    # the re-sampled final aggregate reads already-shuffled partials,
    # cheaper than materializing the signature relation into the cache
    return simhash(docs, "text", "doc_id").orderBy("doc_id")


# --------------------------------------------------------------------------
# L3: brute-force cosine top-k (exact baseline — oracled via rounded score)
# --------------------------------------------------------------------------
@query(
    "embedding_cosine_topk",
    oracle="""
    -- IS NOT NULL restates the shared ANN contract (NULL vectors are
    -- unscorable and excluded); list_cosine_similarity also ERRORS on
    -- NULL where Spark's expression would yield NULL
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
      WHERE vec_id < 3 AND embedding IS NOT NULL
    ), scored AS (
      SELECT q.query_id, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.qvec AS DOUBLE[])) AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.embedding IS NOT NULL
    ), ranked AS (
      SELECT query_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine_r, rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lcr_etl_upgrade_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return (
        cosine_topk(emb, queries, k=5, query_id="query_id")
        .select(
            "query_id",
            "vec_id",
            F.round("cosine", 6).alias("cosine_r"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------------
# L3: LSH-bucketed approximate top-k (scale path — rows-only check)
# --------------------------------------------------------------------------
@query("embedding_cosine_topk_lsh")
def embedding_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8 tables x 4 bits x 4 probes — chosen by the round-4 sweep
    (tools/ann_sweep.py): multi-probe lifts min recall@10 from 0.50 to
    0.90 (sf0.1) / 1.00 (sf0.01) at ~the projection cost of the old
    4-table single-probe config (probes share each table's projections;
    only the tiny query side fans out 4x)."""
    from lcr_etl_upgrade_spark.operators.similarity import cosine_topk_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return (
        cosine_topk_lsh(
            emb, queries, k=5, query_id="query_id", bits=4, tables=8, probes=4
        )
        .select(
            "query_id",
            "vec_id",
            F.round("cosine", 6).alias("cosine_r"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------------
# L2: embedding-cosine near-duplicate pairs (exact all-pairs — oracled;
# threshold tuned to the synthetic corpus where max pairwise cosine ~0.51)
# --------------------------------------------------------------------------
@query(
    "embedding_cosine_near_dup",
    oracle="""
    WITH p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) AS cosine
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, ROUND(cosine, 6) AS cosine_r
    FROM p WHERE cosine >= 0.4
    ORDER BY id_a, id_b
    """,
)
def embedding_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lcr_etl_upgrade_spark.operators.similarity import cosine_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    # persist the threshold-bounded pair set before the deterministic
    # output sort: RangePartitioning's sampling job re-executes the
    # sort's child down to the nearest exchange — here the whole
    # all-pairs scoring pass ran TWICE (r13: 3.5 s -> 1.5 s on the LSH
    # twin; same shape). Bounded by threshold selectivity, same caches
    # contract as the operators' internal persists.
    pairs = (
        cosine_near_dup_pairs(emb, threshold=0.4, bits=0)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine_r"))
        .persist()
    )
    return pairs.orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# L2: LSH-bucketed cosine near-dup (scale path — rows-only)
# --------------------------------------------------------------------------
@query("embedding_cosine_near_dup_lsh")
def embedding_cosine_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lcr_etl_upgrade_spark.operators.similarity import cosine_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    # persist before the output sort — see embedding_cosine_near_dup
    pairs = (
        cosine_near_dup_pairs(emb, threshold=0.4, bits=4)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine_r"))
        .persist()
    )
    return pairs.orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# L3: IVF-style ANN (spherical-k-means inverted lists + n_probe — rows-only;
# the cell assignment is engine-specific)
# --------------------------------------------------------------------------
@query("embedding_ivf_topk")
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16 cells x 8 probes x 2-way redundant assignment — chosen by the
    round-4 sweep (tools/ann_sweep.py): the config whose cross-seed min
    recall@10 is 0.80 at EVERY fixture SF (sf0.001/sf0.01/sf0.1), at
    candidate volume ~= N (2 replicas x 8/16 cells). n_assign=2 is the
    lever: assignment redundancy rescues exactly the
    boundary-straddling rows that probing misses (without it the same
    volume measures min 0.5). On this uniform synthetic corpus the
    probed fraction is necessarily large; at real scale n_centroids
    grows ~sqrt(N) and the fraction collapses toward
    n_probe/n_centroids."""
    from lcr_etl_upgrade_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return (
        ivf_topk(
            emb,
            queries,
            k=5,
            n_centroids=16,
            n_probe=8,
            n_assign=2,
            query_id="query_id",
        )
        .select(
            "query_id",
            "vec_id",
            F.round("cosine", 6).alias("cosine_r"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------------
# L4: BPE-ish token counting (regex word/punct chunks, chars/4 floor)
# --------------------------------------------------------------------------
@query(
    "doc_token_bpe",
    oracle="""
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ ]')) AS BIGINT)
             AS n_chunks,
           CAST(GREATEST(LEN(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ ]')),
                         CEIL(LENGTH(text) / 4.0)) AS BIGINT) AS n_tokens_bpe_ish
    FROM documents
    WHERE lang = 'en'
    ORDER BY doc_id
    """,
)
def doc_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ASCII word class in both engines (Java \\w is unicode-aware,
    RE2's is not — spelling the class keeps the oracle exact)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    chunks = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z0-9_]+|[^A-Za-z0-9_ ]"), 0)
    )
    return docs.select(
        "doc_id",
        chunks.cast("long").alias("n_chunks"),
        F.greatest(chunks, F.ceil(F.length("text") / 4.0))
        .cast("long")
        .alias("n_tokens_bpe_ish"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# L4: quality scoring (length/punct/stopword features, oracled)
# --------------------------------------------------------------------------
@query(
    "doc_quality_scores",
    oracle="""
    WITH t AS (
      -- same tokenization as operators/text.py::tokens_expr (\\s+ split,
      -- empties dropped) so the oracle gates the operator, not a twin
      SELECT doc_id, text,
             list_filter(
               regexp_split_to_array(LOWER(text), '\\s+'), x -> x <> ''
             ) AS toks
      FROM documents
    )
    SELECT doc_id,
           LENGTH(text) AS n_chars_measured,
           CAST(LEN(toks) AS BIGINT) AS n_tokens,
           LEN(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','a'], x)))
             / GREATEST(LEN(toks), 1) AS stopword_ratio,
           LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g'))
             / GREATEST(LENGTH(text), 1) AS punct_ratio
    FROM t
    ORDER BY doc_id
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 quality scoring THROUGH the operator library."""
    from lcr_etl_upgrade_spark.operators.text import quality_features

    docs = load_table(spark, sf_dir, "documents")
    return (
        quality_features(docs)
        .select(
            "doc_id",
            "n_chars_measured",
            "n_tokens",
            "stopword_ratio",
            "punct_ratio",
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# L3: vectorized (Arrow + numpy matmul) cosine top-k — the high-throughput
# path; rows-only (SIMD summation differs from sequential in the last ulp)
# --------------------------------------------------------------------------
@query("embedding_cosine_topk_vectorized")
def embedding_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lcr_etl_upgrade_spark.operators.similarity import cosine_topk_vectorized

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return (
        cosine_topk_vectorized(emb, queries, k=5, query_id="query_id")
        .select(
            "query_id",
            "vec_id",
            F.round("cosine", 6).alias("cosine_r"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------------
# L3: recall contracts for the approximate paths — recall@k of LSH / IVF
# against the exact baseline, computed INSIDE Spark so the rows-only
# sketches carry a checkable invariant (meets_floor must be true for every
# query row; the floor is part of the declared contract).
# --------------------------------------------------------------------------
def _recall_vs_exact(
    spark: SparkSession, sf_dir: str, approx_fn, k: int, floor: float
) -> DataFrame:
    from lcr_etl_upgrade_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=k, query_id="query_id").select(
        "query_id", "vec_id"
    )
    approx = approx_fn(emb, queries, k).select("query_id", "vec_id")
    hits = (
        exact.join(approx, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    base = queries.select("query_id")
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(k)).alias("recall_at_k"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(k) >= F.lit(floor)
            ).alias("meets_floor"),
        )
        .orderBy("query_id")
    )


@query("embedding_lsh_recall")
def embedding_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH top-k recall@10 vs exact, floor 0.8 per query —
    the registered embedding_cosine_topk_lsh config (8 tables x 4 bits
    x 4 multi-probes).

    The planes are fully deterministic (Mersenne-Twister literals seeded
    by (table, bit) — no seed dimension), so the measured per-query
    minimum on this corpus is a constant: round-4 sweep
    (tools/ann_sweep.py) measured min 1.00 at
    sf0.01 and 0.90 at sf0.1 (avg 1.00/0.99). Floor 0.8 sits one
    neighbor-at-k=10 below the sf0.1 minimum — any regression in
    bucketing or probing shows up as a meets_floor=false row. Every
    result row must report meets_floor=true. (Raised from 0.6 this
    round: multi-probe querying — Hamming-1 flips of the lowest-|proj|
    bits — buys the recall of ~3x the tables at ~1x the projection
    cost, so the contract tightened at HALF the old table count.)"""
    from lcr_etl_upgrade_spark.operators.similarity import cosine_topk_lsh

    return _recall_vs_exact(
        spark,
        sf_dir,
        lambda emb, q, k: cosine_topk_lsh(
            emb, q, k=k, query_id="query_id", bits=4, tables=8, probes=4
        ),
        k=10,
        floor=0.8,
    )


@query("embedding_ivf_recall")
def embedding_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (16 cells, 8 probes, 2-way redundant assignment) top-k
    recall@10 vs exact, floor 0.7 per query — the registered
    embedding_ivf_topk config.

    The clustering is seeded, so the floor must hold across seeds, not
    just the pinned one: round-4 sweep (tools/ann_sweep.py) measured
    per-query min recall across seeds {1,7,42} of 0.80 at ALL of
    sf0.001, sf0.01 and sf0.1 (avg 0.95-0.98); floor 0.7 sits one
    neighbor-at-k=10 below. Raised from 0.5 this round: n_assign=2
    (each corpus row indexed into its 2 nearest cells — the classic
    space-for-recall trade) lifts the cross-seed min at EQUAL candidate
    volume, where raising n_probe alone bought less recall for more
    volume. The 8/16 probe fraction is fixture-scaled: at corpus scale
    n_centroids grows ~sqrt(n) and the probed fraction shrinks toward
    n_probe/n_centroids ~ 1%."""
    from lcr_etl_upgrade_spark.operators.similarity import ivf_topk

    return _recall_vs_exact(
        spark,
        sf_dir,
        lambda emb, q, k: ivf_topk(
            emb,
            q,
            k=k,
            n_centroids=16,
            n_probe=8,
            n_assign=2,
            query_id="query_id",
        ),
        k=10,
        floor=0.7,
    )


# --------------------------------------------------------------------------
# L2-adjacent: edit-distance near-dup signal on a deterministic pair set
# (consecutive doc_ids in the same language) — levenshtein is the classic
# short-text dedup metric; exact, so fully oracled.
# --------------------------------------------------------------------------
@query(
    "doc_edit_distance",
    oracle="""
    WITH pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             substr(a.text, 1, 80) AS ta, substr(b.text, 1, 80) AS tb
      FROM documents a JOIN documents b
        ON b.doc_id = a.doc_id + 1 AND a.lang = b.lang
      WHERE a.doc_id < 100
    )
    SELECT doc_a, doc_b,
           levenshtein(ta, tb) AS edit_dist,
           ROUND(1.0 - levenshtein(ta, tb)
                 / GREATEST(LENGTH(ta), LENGTH(tb), 1), 6) AS similarity
    FROM pairs
    ORDER BY doc_a
    """,
)
def doc_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein over 80-char prefixes of language-adjacent doc pairs
    (prefix-capped: edit distance is O(len^2) per pair — at corpus scale
    cap the operand length and use it as a VERIFY step after candidate
    generation, never all-pairs)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 101)
    a = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("lang_a"),
        F.substring("text", 1, 80).alias("ta"),
    ).filter(F.col("doc_a") < 100)
    b = docs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.substring("text", 1, 80).alias("tb"),
    )
    dist = F.levenshtein("ta", "tb")
    return (
        a.join(
            b,
            (F.col("doc_b") == F.col("doc_a") + 1)
            & (F.col("lang_a") == F.col("lang_b")),
        )
        .select(
            "doc_a",
            "doc_b",
            dist.alias("edit_dist"),
            F.round(
                1.0
                - dist
                / F.greatest(F.length("ta"), F.length("tb"), F.lit(1)),
                6,
            ).alias("similarity"),
        )
        .orderBy("doc_a")
    )


@query(
    "doc_heavy_hitter_tokens",
    oracle=r"""
    WITH toks AS (
      -- tokenization MUST match operators/text.py::tokens_expr: \s+
      -- split with empty tokens dropped
      SELECT unnest(list_filter(
               regexp_split_to_array(text, '\s+'), x -> x <> ''
             )) AS token
      FROM documents
    )
    SELECT token, COUNT(*) AS cnt
    FROM toks
    GROUP BY token
    -- relative threshold, EXACT: f > floor(phi * n), phi = 0.003
    HAVING COUNT(*) > (
      SELECT CAST(FLOOR(0.003 * COUNT(*)) AS BIGINT) FROM toks
    )
    ORDER BY token
    """,
)
def doc_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy-hitter tokens via the two-pass sketch pattern
    (operators/frequent.py): per-partition Misra-Gries summaries (at
    most k counters each, no shuffle of the vocabulary), merged into a
    GUARANTEED candidate superset, then an exact broadcast-semi-join
    recount of candidates only. The oracle is the plain HAVING
    spelling — the sketch path must land on the identical exact answer.

    Registered on the RELATIVE threshold (phi = 0.003: tokens covering
    >0.3% of the corpus), the spelling that scales: k = ceil(1/phi) *
    safety = 668 counters per partition — CONSTANT sketch memory at any
    corpus size, with the superset guarantee holding BY CONSTRUCTION
    (D <= n/(k+1) < phi*n/2), so the valve that forced the pre-r11
    absolute registration (threshold=900, k=16384) to refuse past ~27M
    tokens (SCALE.md) is unreachable here. n is counted inside the same
    sketch pass; both runtimes compute floor(phi*n) in IEEE double, so
    the threshold is bit-identical to the oracle's."""
    from lcr_etl_upgrade_spark.operators.frequent import heavy_hitters
    from lcr_etl_upgrade_spark.operators.text import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    # NO fan_out before the sketch (measured r13, same lesson as the
    # vectorized-cosine probe): the single-split sketch pass is already
    # batch-vectorized (value_counts per Arrow batch — 0.36 s for 1.4M
    # tokens), so widening to 32 partitions pays 32 Python-worker
    # spin-ups plus a repartition exchange for ~10 ms of work each
    # (sketch 0.36 -> 0.60 s, full query 1.59 -> 1.72 s same-session).
    # Result-invariant either way (superset + exact recount), so the
    # cluster case needs no valve: inputs there arrive multi-split and
    # the sketch parallelizes naturally.
    toks = docs.select(
        F.explode(tokens_expr(F.col("text"))).alias("token")
    )
    return heavy_hitters(toks, "token", phi=0.003).orderBy("token")


@query("doc_bpe_train_stats")  # rows-only: BPE training is not SQL-expressible
def doc_bpe_train_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a real BPE tokenizer on the corpus (operators/bpe.py:
    distributed word counts -> vocab-bounded driver merge loop) and
    apply it: per-language totals with an IN-RESULT contract column —
    every word encodes to between 1 and len(word)+1 symbols, so
    ``contract_ok`` (ws_tokens <= bpe_tokens <= word_chars + ws_tokens)
    must be true on every row; a violation marks a broken merge table
    or encoder, visible to the rows-only driver check."""
    from lcr_etl_upgrade_spark.operators.bpe import (
        bpe_token_count,
        train_bpe,
    )
    from lcr_etl_upgrade_spark.operators.text import token_count_expr

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, "text", num_merges=60, max_words=10_000)
    counted = bpe_token_count(docs, "text", merges).select(
        "lang",
        "bpe_tokens",
        token_count_expr(F.col("text")).alias("ws"),
        F.length(F.regexp_replace(F.coalesce("text", F.lit("")), r"\s", ""))
        .cast("long")
        .alias("chars"),
    )
    return (
        counted.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("bpe_tokens").alias("bpe_tokens"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("chars").alias("word_chars"),
        )
        .select(
            "*",
            (
                (F.col("ws_tokens") <= F.col("bpe_tokens"))
                & (
                    F.col("bpe_tokens")
                    <= F.col("word_chars") + F.col("ws_tokens")
                )
            ).alias("contract_ok"),
        )
        .orderBy("lang")
    )
