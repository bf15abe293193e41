"""L3 similarity search over embedding columns (array<float>).

- brute-force cosine top-k: broadcast the (small) query set, score every
  corpus row with built-in higher-order array functions (all double math,
  JVM-side), rank with a per-query window. This is the exact baseline.
- LSH-bucketed variant: random-hyperplane signs bucket the corpus; queries
  probe only their bucket — the 100 TB scale path (candidates shrink by
  ~2^bits) with identical scoring afterwards.

Engine split (deliberate): relational structure — filters, joins,
windows, dedup — is Catalyst expressions; DENSE LINEAR ALGEBRA — the
hyperplane projections (_buckets_udf) and the vectorized scorer
(cosine_topk_vectorized) — is Arrow-batched numpy, because interpreted
higher-order array functions evaluate multiply-adds ~3 orders of
magnitude slower than a BLAS matmul (measured round 4: 4s vs <0.1s for
32 planes x 2000 rows) and unrolled expression trees are no better.
Scoring in the oracled exact paths stays expression-based
(zip_with/aggregate) so DuckDB hash-parity is bit-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.operators.dedup import _bt


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _dot_sql(a: str, b: str) -> str:
    """SQL-text twin of dot_expr over column NAMES: the identical
    zip_with/aggregate fold (same operations, same sequential order →
    bit-identical doubles), parsed in one py4j call instead of ~40
    stacked-Column calls (r13 driver-overhead rule; the hash-green
    oracle on ROUND(cosine, 6) pins the equivalence). CAST(0 AS DOUBLE)
    keeps the accumulator double — a bare 0.0 literal would parse as
    DECIMAL and change the fold type."""
    return (
        f"aggregate(zip_with(transform({a}, x -> CAST(x AS DOUBLE)),"
        f" transform({b}, x -> CAST(x AS DOUBLE)), (x, y) -> x * y),"
        f" CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def safe_cosine_sql(a: str, b: str) -> str:
    """SQL-text twin of safe_cosine_expr (see _dot_sql)."""
    return (
        f"try_divide({_dot_sql(a, b)},"
        f" sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"
    )


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-order double dot product (deterministic accumulation)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_unrolled_sql(a: str, b: str, dim: int) -> str:
    """Codegen-able twin of _dot_sql for vectors of a KNOWN dimension.

    The zip_with/aggregate fold is a CodegenFallback expression: every
    multiply-add runs through interpreted lambda eval (~10 us per
    64-dim fold), which is what made the exact all-pairs near-dup query
    single-digit-minutes (r13 sweep: 77 s for 2000 vectors = 4M ordered
    pairs x up to 3 fold evaluations). This spelling unrolls the SAME
    fold — CAST(0 AS DOUBLE) + p0 + p1 + ... left-associated, each
    p_i = CAST(get(a,i) AS DOUBLE) * CAST(get(b,i) AS DOUBLE) — into a
    flat expression tree WholeStageCodegen compiles to straight-line
    multiply-adds (measured ~20x per pair; r4's "unrolled is no better"
    note measured the INTERPRETED tree, which codegen bypasses).

    Bit-identical to _dot_sql on every input, enforced by construction:

    - equal-length dim vectors: same casts, same multiplies, same
      left-assoc additions from the same double-zero accumulator
      (0.0 + p0 keeps the fold's -0.0/NaN semantics exactly);
    - NULL / NaN / inf elements: null or NaN products poison the sum in
      the same positions (get() is OOB-safe, never an ANSI error);
    - anything whose max length is NOT dim (ragged, truncated, longer):
      the CASE guard routes to the _dot_sql fold itself — the unrolled
      branch never evaluates (CASE branches are lazy in both codegen
      and interpreted eval), so exotic shapes keep exact-fold results.

    Pinned by tests/test_dot_unrolled_equiv.py (binary-double equality
    over adversarial vectors).
    """
    terms = " + ".join(
        f"(CAST(get({a}, {i}) AS DOUBLE) * CAST(get({b}, {i}) AS DOUBLE))"
        for i in range(dim)
    )
    return (
        f"CASE WHEN greatest(size({a}), size({b})) = {dim} "
        f"THEN CAST(0 AS DOUBLE) + {terms} "
        f"ELSE {_dot_sql(a, b)} END"
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    """Precondition: both vectors have positive norm. Under ANSI mode
    (Spark 4 default) a zero-norm operand is not a NaN, it is a
    DIVIDE_BY_ZERO *error* (found by the vectorized/exact rank-set
    property test, round 4) — hot paths score with safe_cosine_expr
    (NULL on zero norm, no extra pass); paths that must guarantee
    positive norms up front filter via scorable()."""
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def safe_cosine_expr(a: Column, b: Column) -> Column:
    """cosine_expr made total: try_divide yields NULL where either norm
    is zero (and NaN where a coordinate is NaN). Callers filter
    ``isNotNull & !isnan`` on the RESULT — the zero-norm exclusion
    contract at zero additional passes, since the norms are computed for
    the division anyway. (A standalone pre-filter on dot(v,v) > 0
    measured +0.5s per side at sf0.1: interpreted higher-order dot, paid
    per row per relation on the bench-headline exact paths.)"""
    return F.try_divide(dot_expr(a, b), norm_expr(a) * norm_expr(b))


def _drop_unscorable(scored: DataFrame) -> DataFrame:
    """Filter applied AFTER safe_cosine_expr scoring: NULL cosine = a
    zero-norm side (no direction), NaN = a NaN coordinate. Both are
    unscorable by the shared ANN contract."""
    c = F.col("cosine")
    return scored.filter(c.isNotNull() & ~F.isnan(c))


def _rank_topk(
    scored: DataFrame, query_id: str, corpus_id: str, k: int
) -> DataFrame:
    """The shared per-query top-k epilogue over scored (query, corpus,
    cosine) rows, delegated to operators.topk.topk_per_group (window
    strategy — the measured local winner; a deployment whose exchange is
    network-bound can flip the strategy in ONE place now instead of
    four)."""
    from lcr_etl_upgrade_spark.operators.topk import topk_per_group

    return topk_per_group(
        scored,
        [query_id],
        [("cosine", False), (corpus_id, True)],
        k,
        rank_col="rank",
    ).select(query_id, corpus_id, "cosine", "rank")


def scorable(df: DataFrame, vec_col: str) -> DataFrame:
    """The shared ANN scorability contract: NULL vectors and zero-norm
    vectors are unscorable under cosine (no direction) and are excluded
    on both sides of every similarity operator. Zero-norm additionally
    matters for totality: ANSI division makes 0/0 an error, not NaN.

    This standalone filter costs an interpreted dot product per row —
    use it only where positive norms must hold BEFORE scoring (ivf_topk
    normalizes vectors for training/assignment); scoring paths get the
    same exclusion for free via safe_cosine_expr + _drop_unscorable."""
    c = F.col(vec_col)
    return df.filter(c.isNotNull() & (dot_expr(c, c) > 0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k per query (exact). NULL and zero-norm
    vectors are unscorable and excluded on both sides (the shared ANN
    contract — fused into scoring, see safe_cosine_expr)."""

    from lcr_etl_upgrade_spark.operators.dedup import fan_out

    q = queries.filter(F.col(vec_col).isNotNull()).select(
        F.col(query_id), F.col(vec_col).alias("__qvec")
    )
    # fan_out: a narrow local scan (1-2 splits) would score every
    # corpus x query dot product on one core; widened only when the scan
    # is provably narrow AND below session parallelism, a no-op at
    # cluster scale (measured 0.65 s -> 0.45 s on the sf0.1 headline
    # query, r13)
    scored = (
        fan_out(
            corpus.filter(F.col(vec_col).isNotNull()).select(
                F.col(corpus_id), F.col(vec_col)
            )
        )
        .crossJoin(F.broadcast(q))
    )
    scored = _drop_unscorable(
        scored.withColumn(
            "cosine", F.expr(safe_cosine_sql(_bt(vec_col), "__qvec"))
        )
    )
    return _rank_topk(scored, query_id, corpus_id, k)


def _plane_lits(bits: int, dim: int, table: int) -> list[list[float]]:
    """Plane coefficients for one table: ``bits`` rows of ``dim`` uniform
    [-1, 1) floats from a Mersenne-Twister stream seeded by (table, bit)
    — deterministic across runs, machines and Python versions (the MT
    algorithm is specified), no driver-side state to ship. Distinct
    ``table`` values give independent plane sets (the multi-table
    OR-amplification lever).

    Computed in PYTHON and embedded as literals: the previous
    formulation derived each coefficient per row with
    sequence->transform->xxhash64 — row-independent constants that
    Catalyst does not constant-fold through a higher-order function, so
    every row re-built every plane array interpreted (measured 5.4s for
    the 8-table registered top-k at sf0.1; literal planes cut the
    per-row work to just the multiply-adds)."""
    import random

    planes = []
    for b in range(bits):
        rng = random.Random(table * 1_000_003 + b)  # one stream per plane
        planes.append([rng.uniform(-1.0, 1.0) for _ in range(dim)])
    return planes


def _buckets_udf(bits: int, dim: int, tables: int, probes: int):
    """Arrow-vectorized hyperplane bucketing: a pandas UDF mapping an
    embedding to its ``tables x probes`` bucket ids (flattened
    table-major: element ``t*probes + p`` is table t's p-th probe; probe
    0 is the base bucket).

    WHY A UDF when the rest of this module brags about expressions: the
    projection V @ P.T is dense linear algebra — tables*bits*dim
    multiply-adds PER ROW. Spark's higher-order array functions evaluate
    it interpreted (~4s for 32 planes over 2000 rows at sf0.1), and an
    unrolled element_at expression tree (4K nodes) measured no better
    cold or warm. One numpy matmul per Arrow batch does the same work in
    microseconds and is exactly the cosine_topk_vectorized precedent:
    Python in the plan, but Arrow-batched and BLAS-backed, never
    per-row. The bucketing stays map-side (no shuffle, no state); only
    the relational steps around it are expressions.

    Multi-probe (probes > 1): each extra probe is the base bucket with
    one of the ``probes - 1`` LOWEST-|projection| bits flipped — the
    planes the vector sits closest to, exactly the sign flips a true
    near-neighbor is most likely to differ by (Lv et al.'s multi-probe
    LSH insight). Probing 3-4 buckets per table buys roughly the recall
    of 3-4x the tables at ~1x the projection cost, because the
    projections are shared by every variant. Bit ties on |proj| break by
    bit index ascending (stable argsort) — deterministic.

    NULL embeddings map to NULL (callers exclude them via scorable();
    the guard keeps the UDF total anyway).

    ``probes`` is clamped to ``bits + 1`` (the base bucket plus one
    Hamming-1 flip per plane — there are no further distinct single-bit
    variants to probe); callers deriving a table id from a flattened
    position must apply the same clamp (see cosine_topk_lsh)."""
    probes = min(probes, bits + 1)
    mat = np.array(
        [p for t in range(tables) for p in _plane_lits(bits, dim, t)],
        dtype=np.float64,
    )  # (tables*bits, dim)
    weights = 1 << np.arange(bits, dtype=np.int64)

    @F.pandas_udf("array<bigint>")
    def _udf(vecs: pd.Series) -> pd.Series:
        # wrong-dimension vectors are unscorable like NULLs: they would
        # turn the batch matrix into a ragged object array (matmul
        # crash), where the expression paths degrade them to NULL cosine
        mask = vecs.map(lambda x: x is not None and len(x) == dim)
        if not mask.any():
            return pd.Series([None] * len(vecs), index=vecs.index, dtype=object)
        v = np.array(list(vecs[mask]), dtype=np.float64)  # (m, dim)
        proj = v @ mat.T  # (m, tables*bits)
        sgn = (proj >= 0).reshape(-1, tables, bits)
        base = (sgn * weights).sum(axis=2, dtype=np.int64)  # (m, tables)
        if probes <= 1:
            res = base[:, :, None]
        else:
            absr = np.abs(proj).reshape(-1, tables, bits)
            order = np.argsort(absr, axis=2, kind="stable")[:, :, : probes - 1]
            flips = base[:, :, None] ^ weights[order]  # (m, tables, probes-1)
            res = np.concatenate([base[:, :, None], flips], axis=2)
        rows = iter(r.tolist() for r in res.reshape(len(v), tables * probes))
        data = [next(rows) if ok else None for ok in mask.tolist()]
        return pd.Series(data, index=vecs.index, dtype=object)

    return _udf


def hyperplane_signature(
    df: DataFrame, vec_col: str = "embedding", bits: int = 8, dim: int = 64
) -> DataFrame:
    """Random-hyperplane LSH bucket id (single table; see _buckets_udf)."""
    return df.withColumn(
        "lsh_bucket", F.element_at(_buckets_udf(bits, dim, 1, 1)(F.col(vec_col)), 1)
    )


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
    probes: int = 1,
) -> DataFrame:
    """Approximate top-k: score only corpus rows sharing a hyperplane
    bucket with the query in at least one of ``tables`` independent
    tables. Recall < 1.0 by construction; the scale path.

    Two recall levers, both shuffle-free map-side work:
    - ``tables`` (OR-amplification): each table shrinks candidates
      ~2^bits-fold; a true neighbor is found if ANY table buckets it
      with the query. Costs ``tables x bits`` projections PER ROW on
      BOTH sides.
    - ``probes`` (multi-probe, query side only): each query additionally
      probes the Hamming-1 buckets of its ``probes - 1``
      lowest-|projection| bits. Near-free (projections are shared), and
      only the tiny query side fans out — the corpus index stays one
      entry per table. Measured round 4 (tools/ann_sweep.py): 8 tables x
      3 probes beats 16 single-probe tables on recall at roughly half
      the projection cost.

    Candidates duplicated across tables/probes are deduped before
    ranking. Per-table buckets are computed in ONE Arrow-batched matmul
    each side (no shuffle; see _buckets_udf); the only shuffles are the
    candidate dedup and the final per-query top-k window."""

    # NULL vectors need no explicit filter: _buckets_udf maps them to a
    # NULL bucket array and posexplode emits no rows for it. Zero-norm /
    # NaN vectors get buckets but their candidate pairs score NULL/NaN
    # under safe_cosine_expr and are dropped there — exclusion fused
    # into scoring instead of a per-row interpreted-dot pre-filter.
    # corpus: one bucket per table -> posexplode position IS the table id
    c = corpus.select(
        F.col(corpus_id),
        F.col(vec_col),
        F.posexplode(_buckets_udf(bits, dim, tables, 1)(F.col(vec_col))).alias(
            "__t", "__bucket"
        ),
    )
    # queries: tables*probes buckets, table-major -> table id = pos / probes
    # (same clamp as _buckets_udf: the flattened array really is
    # tables*min(probes, bits+1) wide, and the position->table division
    # must use that width or every table id past the first would be off)
    probes = min(probes, bits + 1)
    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("__qvec"),
        F.posexplode(
            _buckets_udf(bits, dim, tables, probes)(F.col(vec_col))
        ).alias("__pos", "__bucket"),
    ).select(
        query_id,
        "__qvec",
        F.floor(F.col("__pos") / probes).cast("int").alias("__t"),
        "__bucket",
    )
    # Dedup-THEN-score kept deliberately (r13, measured): the score-first
    # restructure that paid off in ivf_topk (narrow dedup exchange) was
    # tried here too and REJECTED — a pair matched in several
    # (table, bucket) combinations re-evaluates the 3-fold interpreted
    # safe_cosine per duplicate (duplication bounded by tables x probes),
    # and the fan_out needed to keep that scoring parallel adds its own
    # exchange: paired A/B over 5 rounds measured +13% on the registered
    # 8-table x 4-probe config (min 0.961 -> 1.086 s) and flat on the
    # recall query. Post-dedup scoring runs 32-way after the exchange.
    #
    # Also measured and REJECTED (r14): ids-only dedup BEFORE vector
    # attachment (dedup exchange carries (query_id, corpus_id) only,
    # then join corpus vectors back and broadcast-attach query vectors,
    # scoring once per deduped pair). Rows identical; paired A/B over 6
    # alternating rounds: min 0.809 vs 0.813 s, med 0.879 vs 0.934 s —
    # the ~1 KB/candidate shuffle saving is noise at bounded candidate
    # counts while the join-back adds a stage, and at large corpus the
    # join-back re-shuffles the FULL corpus by id (the exact §8 trap:
    # the attach join sneaks the payload shuffle back in), so the shape
    # is not the scale answer either.
    scored = _drop_unscorable(
        c.join(F.broadcast(q), ["__t", "__bucket"])
        .dropDuplicates([query_id, corpus_id])
        .withColumn("cosine", F.expr(safe_cosine_sql(_bt(vec_col), "__qvec")))
    )
    return _rank_topk(scored, query_id, corpus_id, k)


def cosine_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    bits: int = 0,
    dim: int = 64,
    caches: list | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    bits=0: exact all-pairs scoring (self-join on nothing — quadratic; the
    small-corpus / verification baseline). bits>0: hyperplane-LSH bucketed —
    only same-bucket pairs are scored, the 100 TB path (near-identical
    vectors land in the same bucket with high probability; recall < 1).

    Norms are computed once per row before pairing so the pair join does a
    dot product only, not three — and double as the scorability filter:
    a zero-norm or NaN-coordinate vector fails ``__norm > 0`` (NaN
    compares false) at no extra pass, so the ANSI pair division below is
    safe without try_divide. INFINITE coordinates pass the norm filter
    (norm = inf) and surface as NaN pair cosines instead — the threshold
    filter explicitly drops NaN (Spark orders NaN above every number, so
    a bare ``>=`` would emit them).
    """
    base = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col), F.col(vec_col))
        .withColumn("__norm", norm_expr(F.col(vec_col)))
        .filter(F.col("__norm") > 0)
    )
    if bits > 0:
        # the signed relation feeds BOTH pair sides and Spark does not
        # share common subplans — without the persist the
        # norm-filter + ArrowEvalPython signature subtree executes twice
        # (two ArrowEvalPython chains in the r13 before-plan; measured
        # 2.9 s -> 2.0 s at sf0.1). Bounded by the corpus row count the
        # caller already accepted for bucketing; pass ``caches`` to
        # receive it for unpersist (same contract as the Jaccard sets
        # relation in operators.dedup).
        base = hyperplane_signature(base, vec_col, bits, dim).persist()
        if caches is not None:
            caches.append(base)
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
        # exact path: the `<` join has no equi key, so Spark picks a
        # broadcast nested-loop join that streams the LEFT side — off a
        # 1-split local scan EVERY pair scored on one core (r13 sweep:
        # 77 s). fan_out widens provably-narrow scans to session
        # parallelism, a no-op at cluster scale (same rationale as
        # cosine_topk above; measured 77 s -> ~4 s before the unrolled
        # dot below, ~1.8 s with it).
        from lcr_etl_upgrade_spark.operators.dedup import fan_out

        joined = fan_out(a).join(b, cond)
    return (
        joined.withColumn(
            "cosine",
            # codegen-able unrolled fold (bit-identical; see
            # dot_unrolled_sql) — the pushed-down threshold filter makes
            # this expression part of the join condition evaluated per
            # ORDERED pair, where an interpreted fold is the whole cost
            F.expr(dot_unrolled_sql(_bt("__va"), _bt("__vb"), dim))
            / (F.col("__na") * F.col("__nb")),
        )
        # ~isnan: an INFINITE coordinate passes __norm > 0 (norm = inf)
        # and its pair cosine is inf/inf = NaN — which Spark's
        # NaN-greater-than-everything ordering would pass through
        # `>= threshold`, emitting the row as a near-dup of EVERYTHING
        .filter(~F.isnan("cosine") & (F.col("cosine") >= threshold))
        .select("id_a", "id_b", "cosine")
    )


def _spherical_kmeans(
    v: np.ndarray, k: int, seed: int, iters: int = 8
) -> np.ndarray:
    """Seeded spherical k-means on unit-normalized rows: k-means++
    seeding over cosine distance, then Lloyd's with mean-renormalized
    centroids. Deterministic per (v, seed) — numpy's Generator stream is
    specified. iters=8: an inverted-list index needs rough cells, not
    converged ones; the sweep re-verifies recall floors. Empty clusters
    keep their previous centroid; k is capped at len(v). Returned rows
    are unit-norm (or the seed vector if a mean degenerated to zero)."""
    n = len(v)
    k = min(k, n)
    rng = np.random.default_rng(seed)
    idx = [int(rng.integers(n))]
    d = np.full(n, np.inf)
    for _ in range(1, k):
        d = np.minimum(d, np.clip(1.0 - v @ v[idx[-1]], 0.0, None))
        tot = d.sum()
        if tot <= 0:
            idx.append(int(rng.integers(n)))
        else:
            idx.append(int(rng.choice(n, p=d / tot)))
    c = v[idx].copy()
    for _ in range(iters):
        assign = (v @ c.T).argmax(axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                mean = v[m].mean(axis=0)
                nm = np.linalg.norm(mean)
                if nm > 0:
                    c[j] = mean / nm
    return c


def _top_cells_udf(cents: np.ndarray, n: int):
    """Arrow-vectorized cell chooser: embedding -> its ``n`` nearest
    centroid ids by cosine, descending (ties by cell id ascending —
    stable argsort on the negated sims). Centroid rows are unit-norm, so
    cosine ranking needs only the dot products (the row's own norm is a
    positive constant factor). Same engine rationale as _buckets_udf.

    The UDF also OWNS the scorable() contract for the assignment/probe
    paths (r13): NULL, wrong-dimension (would make the batch matrix
    ragged), zero-norm and NaN-coordinate embeddings all map to NULL
    cells, vectorized in the numpy pass the rows already take instead
    of an extra per-row fold over the scan. NaN caveat (r13 ADVICE):
    this ``sq > 0`` mask is STRICTER than the interpreted
    ``dot_expr(c, c) > 0`` filter it replaced, not identical — numpy's
    NaN > 0 is False, but Spark SQL orders NaN ABOVE every numeric, so
    scorable() PASSES a NaN-coordinate row where this UDF nulls it.
    End-to-end results match because scorable()-passed NaN rows score
    NaN cosines that _drop_unscorable discards later; any refactor
    moving this mask back to SQL must not rely on filter identity (and
    note the kmeans TRAINING path still uses scorable(), so the two
    paths genuinely differ on NaN rows before that final drop)."""
    cmat = cents.astype(np.float64)
    n = min(n, len(cmat))
    dim = cmat.shape[1]

    @F.pandas_udf("array<int>")
    def _udf(vecs: pd.Series) -> pd.Series:
        mask = vecs.map(lambda x: x is not None and len(x) == dim)
        if not mask.any():
            return pd.Series([None] * len(vecs), index=vecs.index, dtype=object)
        v = np.array(list(vecs[mask]), dtype=np.float64)
        with np.errstate(invalid="ignore", over="ignore"):
            sq = np.einsum("ij,ij->i", v, v)
            sims = v @ cmat.T
        top = np.argsort(-sims, axis=1, kind="stable")[:, :n]
        # NaN > 0 is False, inf > 0 is True — dot(v,v) > 0 exactly
        scorable_rows = sq > 0
        rows = iter(
            (r.tolist() if ok else None)
            for r, ok in zip(top.astype(np.int32), scorable_rows)
        )
        data = [next(rows) if ok else None for ok in mask.tolist()]
        return pd.Series(data, index=vecs.index, dtype=object)

    return _udf


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
    n_assign: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: seeded spherical k-means (trained
    driver-side on a bounded sample — see _spherical_kmeans and the
    comments below) partitions the corpus into inverted lists; each
    query scores only the n_probe nearest lists.

    The scale shape: centroids are tiny closure state, assignment is one
    Arrow-batched map pass, and the probe join fans each query out to
    n_probe cells — candidate count drops by ~n_centroids/n_probe versus
    brute force, with the same exact scoring afterwards.

    Metric coherence (round 4): training, assignment and probing all use
    COSINE against unit-normalized vectors/centroids — the same metric
    the scorer uses. Euclidean assignment on raw vectors put long
    vectors in cells their direction never probes.

    ``n_assign`` > 1 is redundant assignment: each corpus row is indexed
    into its n_assign nearest cells. The index grows n_assign-fold (the
    classic space-for-recall trade; a neighbor is found if ANY of its
    cells is probed) while queries still probe n_probe cells. Measured
    round 4 (tools/ann_sweep.py): n_assign=2 lifts cross-seed min
    recall@10 well above what doubling n_probe buys at equal candidate
    volume, because assignment redundancy helps exactly the
    boundary-straddling rows that probing misses.
    """

    def _empty() -> DataFrame:
        q_t = queries.schema[query_id].dataType.simpleString()
        c_t = corpus.schema[corpus_id].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [], f"{query_id} {q_t}, {corpus_id} {c_t}, cosine double, rank int"
        )

    # totality at the edges: an empty corpus cannot train centroids, and
    # an empty query side would pay the training for nothing. The count
    # runs on the RAW corpus — it only feeds the sampling fraction, so
    # paying the interpreted-dot scorable() filter for an exact filtered
    # count was a whole wasted corpus pass (the all-unscorable edge is
    # caught below when the training sample comes back empty). The two
    # probes are independent actions — overlapped on driver threads
    # (guide §2.6), they cost one job latency instead of two.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    # inheritable_thread_target (r13 ADVICE): plain pool threads do not
    # inherit PySpark's JVM thread-locals (job group/tags, scheduler
    # pool), so a caller's cancelJobGroup or pool assignment would not
    # cover the overlapped jobs without the wrapper.
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_count = pool.submit(inheritable_thread_target(corpus.count))
        f_qempty = pool.submit(inheritable_thread_target(queries.isEmpty))
        n_corpus, q_empty = f_count.result(), f_qempty.result()
    if n_corpus == 0 or q_empty:
        return _empty()
    # a NULL or zero-norm vector can be neither indexed nor scored. The
    # TRAINING sample keeps the explicit scorable() chain (the Bernoulli
    # draw sequence — and therefore the centroids and the pinned results
    # — depends on the exact filtered row stream); the assignment/probe
    # paths get the identical exclusion from _top_cells_udf itself
    # (NULL cells -> explode emits nothing), vectorized in the numpy
    # pass instead of an interpreted dot fold per scanned row (r13).
    train_corpus = scorable(corpus, vec_col)

    # Centroid TRAINING is deliberately a driver-scale problem, not a
    # Spark job: the fit sees a bounded SAMPLE (~256 rows per centroid,
    # the standard IVF training heuristic — k-means on the full corpus
    # is the 100 TB anti-pattern; cell quality saturates long before
    # that, and recall is governed by n_probe/n_assign anyway), which at
    # 256*k*dim*8 bytes is broadcast-sized state exactly like
    # cosine_topk_vectorized's query matrix. Training in numpy on that
    # sample replaces a Spark ML KMeans fit whose ~10 driver-coordinated
    # jobs (k-means|| init + one job per iteration) cost 4-8s of pure
    # scheduling at small SF — FAISS draws the same line: train
    # in-process, index distributed. Seeded + Lloyd's on unit vectors
    # (spherical k-means) = deterministic per (sample, seed).
    n_train_target = 256 * n_centroids
    frac = min(1.0, n_train_target / n_corpus)
    train_src = (
        train_corpus.sample(withReplacement=False, fraction=frac, seed=seed)
        if frac < 1.0
        else train_corpus
    )
    rows = train_src.select(vec_col).collect()
    if not rows:
        # Bernoulli sampling CAN return zero rows (P ~ e^-4096, but a
        # crash path is a crash path); fall back to an arbitrary bounded
        # prefix — seeding quality is irrelevant in a regime this small
        rows = train_corpus.select(vec_col).limit(n_train_target).collect()
        if not rows:
            # raw corpus was non-empty but EVERY row is unscorable
            return _empty()
    # the index dimension: the explicit ``dim`` argument when given,
    # else the MODAL length of the sampled rows (ties -> the smaller).
    # Rows of any other length would make the training matrix ragged —
    # they are excluded from training and masked to NULL cells by
    # _top_cells_udf, the same unscorable contract as NULL vectors.
    # (Round 10, found by tools/similarity_fuzz.py: inferring from the
    # FIRST sampled row made the choice depend on physical partition
    # order — one stray wrong-dimension row sampled first silently
    # emptied the result for an entire valid query set.)
    if dim is not None:
        index_dim = dim
        if not any(len(r[0]) == index_dim for r in rows):
            # the Bernoulli sample can miss every dim-length row when
            # stray wrong-dimension rows dominate the corpus — a
            # nondeterministic silent-empty would be the same bug class
            # the explicit dim exists to close; fetch a bounded
            # dim-filtered training set before giving up
            rows = (
                train_corpus.filter(F.size(F.col(vec_col)) == index_dim)
                .select(vec_col)
                .limit(n_train_target)
                .collect()
            )
            if not rows:
                return _empty()
    else:
        counts: dict[int, int] = {}
        for r in rows:
            counts[len(r[0])] = counts.get(len(r[0]), 0) + 1
        index_dim = min(
            counts, key=lambda length: (-counts[length], length)
        )
    sample = np.array(
        [r[0] for r in rows if len(r[0]) == index_dim], dtype=np.float64
    )
    # scorable() passes INFINITE coordinates (dot(v,v) = inf > 0); their
    # normalized rows are NaN and poison k-means++ sampling weights —
    # exclude them from training (assignment/scoring drops them via
    # _drop_unscorable)
    sample = sample[np.isfinite(sample).all(axis=1)]
    if not len(sample):
        return _empty()
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)  # scorable: >0
    cents = _spherical_kmeans(sample, n_centroids, seed)

    # ASSIGNMENT and PROBING are one Arrow-batched numpy pass each side
    # (the centroid matrix rides in the task closure): no crossJoin, no
    # window, no shuffle — a corpus row maps to its n_assign nearest
    # cells, a query to its n_probe nearest, by cosine against the SAME
    # centroids (metric coherence: Euclidean assignment on raw vectors
    # put long vectors in cells their direction never probes).
    # fan_out (r13): with scoring now fused into the map side BEFORE the
    # dedup exchange (below), a 1-2 split local scan would evaluate every
    # candidate's interpreted cosine fold on one core; widen provably-
    # narrow scans to session parallelism — a no-op at cluster scale
    # (same guard as cosine_topk / the near-dup paths).
    from lcr_etl_upgrade_spark.operators.dedup import fan_out

    assigned = fan_out(
        corpus.select(F.col(corpus_id), F.col(vec_col))
    ).select(
        F.col(corpus_id),
        F.col(vec_col),
        F.explode(_top_cells_udf(cents, n_assign)(F.col(vec_col))).alias("cell"),
    )
    probes = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("__qvec"),
        F.explode(_top_cells_udf(cents, n_probe)(F.col(vec_col))).alias("cell"),
    )
    # Score BEFORE the duplicate-candidate dedup and project the vectors
    # away (r13, guide §2.3 "shuffle fewer bytes"): duplicates of a
    # (query, corpus) pair carry the SAME two vectors, so their cosines
    # are identical and dedup-then-score == score-then-dedup row for
    # row — but scored-first the dedup exchange moves (ids, cosine)
    # instead of two dim-length arrays through first(array) sort-agg
    # buffers (the r13 before-plan shuffled both full vectors per
    # candidate). The cosine division is safe without try_divide:
    # _top_cells_udf masks zero-norm rows to NULL cells on both sides.
    # _drop_unscorable: an INFINITE coordinate passes dot(v,v) > 0 and
    # yields a NaN cosine — which desc-sorts FIRST in Spark and would
    # displace a true neighbor at rank 1 (every other top-k path already
    # drops NaN)
    scored = _drop_unscorable(
        assigned.join(F.broadcast(probes), "cell")
        .withColumn("cosine", cosine_expr(F.col(vec_col), F.col("__qvec")))
        .select(query_id, corpus_id, "cosine")
    )
    if n_assign > 1:
        # a corpus row indexed into several probed cells would otherwise
        # occupy several top-k ranks with the same cosine
        scored = scored.dropDuplicates([query_id, corpus_id])
    return _rank_topk(scored, query_id, corpus_id, k)


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

    q_t = queries.schema[query_id].dataType.simpleString()
    c_t = corpus.schema[corpus_id].dataType.simpleString()
    # NULL vectors are unscorable and would turn the numpy matrices into
    # ragged object arrays — drop them on both sides; zero-norm / NaN
    # rows are masked in numpy where the norms are computed anyway (a
    # JVM-side interpreted-dot pre-filter measured +0.5s per relation
    # at sf0.1)
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
    # scoring dimension = the first query row's; any other length on
    # either side would make its matrix ragged (object-dtype, matmul
    # crash) — such rows are unscorable, the same contract under which
    # the expression paths NULL their cosine
    dim = len(q_rows[0][1]) if q_rows else 0
    q_rows = [r for r in q_rows if len(r[1]) == dim]
    q_ids_all = np.array([r[0] for r in q_rows])
    q_mat_all = np.array(
        [r[1] for r in q_rows], dtype=np.float64
    ) if q_rows else np.zeros((0, 1))
    q_norm_all = np.linalg.norm(q_mat_all, axis=1) if q_rows else np.zeros(0)
    q_ok = np.isfinite(q_norm_all) & (q_norm_all > 0)
    if not q_ok.any():
        # no scorable query: empty typed result rather than an
        # executor-side numpy shape error on a zero-row matrix
        return corpus.sparkSession.createDataFrame(
            [], f"{query_id} {q_t}, {corpus_id} {c_t}, cosine double, rank int"
        )
    q_ids, q_mat, q_norm = q_ids_all[q_ok], q_mat_all[q_ok], q_norm_all[q_ok]

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                pdf = pdf[pdf[vec_col].map(len) == dim]
            if not len(pdf):
                continue
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1)
            c_ok = np.isfinite(c_norm) & (c_norm > 0)
            if not c_ok.any():
                continue
            c_mat, c_norm = c_mat[c_ok], c_norm[c_ok]
            c_ids = pdf[corpus_id].to_numpy()[c_ok]
            sims = (c_mat @ q_mat.T) / np.outer(c_norm, q_norm)
            n_c, n_q = sims.shape
            yield pd.DataFrame(
                {
                    query_id: np.repeat(q_ids, n_c),
                    corpus_id: np.tile(c_ids, n_q),
                    "cosine": sims.T.ravel(),
                }
            )

    # NO fan_out here (measured r13): the matmul is microseconds per
    # batch, so widening a narrow scan to session parallelism just pays
    # 30+ Python-worker spin-ups and a shuffle for work one worker
    # finishes faster (0.4-0.5 s -> 0.7-0.9 s on the sf0.1 headline
    # query when widened).
    scored = corpus.select(corpus_id, vec_col).mapInPandas(
        score, f"{query_id} {q_t}, {corpus_id} {c_t}, cosine double"
    )
    return _rank_topk(scored, query_id, corpus_id, k)
