"""L1/L2 deduplication operators.

- exact_dedup: content-hash groupBy (one shuffle on the hash — the 100 TB
  pattern; never a full-text sort).
- shingle_tokens / shingle_hashes: exploded n-gram relations (posexplode +
  window lead — fully codegen'd; the hashes variant carries one long per
  shingle, the near-dup fast path).
- minhash_signatures / minhash_lsh_candidates: k min-hashes via groupBy
  with map-side partial aggregation -> banded bucket groupBy with
  in-bucket pair expansion (no self-join, max_bucket skew guard).
- simhash: sign-aggregated token-hash bits via explode + groupBy.
- jaccard_pairs / near_dup_pairs: exact shingle-set Jaccard restricted to
  candidate documents; the composite pipeline persists the shared shingle
  relation so MinHash and verification compute it once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bt(name: str) -> str:
    """Backtick-quote an identifier for parsed-SQL expression text."""
    return "`" + name.replace("`", "``") + "`"


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep the lowest-id row per duplicate group (deterministic winner).

    Hash-groupBy, not dropDuplicates, so the survivor choice is explicit
    and stable across partitionings.

    NULLs are encoded with an explicit sentinel before concatenation —
    concat_ws silently skips NULLs, which would merge ('a', NULL, 'b')
    with ('a', 'b', NULL). A real value equal to the sentinel ("\\x00N")
    would still collide with NULL; acceptable for content keys.
    """
    encoded = [
        F.when(F.col(c).isNull(), F.lit("\x00N")).otherwise(F.col(c).cast("string"))
        for c in cols
    ]
    key = F.md5(F.concat_ws("\x1f", *encoded))
    return (
        df.withColumn("__dupkey", key)
        .groupBy("__dupkey")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )


def shingles_expr(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (distinct, full n-grams).

    NOTE: higher-order array functions are interpreted (CodegenFallback) —
    fine for a single column, but for whole-corpus shingling prefer
    ``shingle_tokens`` (posexplode + window lead, fully codegen'd; measured
    several times faster at corpus scale)."""
    toks = F.split(F.trim(F.lower(text)), "\\s+")
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )
    )


# Analyzed-plan node heads that are provably NARROW (no exchange when the
# plan is finalized): probing .rdd under such a plan never executes a
# shuffle stage. A WHITELIST, not a blacklist — any node not listed
# (Join, Aggregate, Window, Sort, set-ops, shuffling Repartition, and
# anything future Spark versions add) means "can't prove the probe is
# free", which only skips the widening optimization, never executes
# anything.
_SCAN_SAFE_NODE_HEADS = frozenset(
    {
        "Relation",  # file/datasource scan
        "LogicalRDD",  # createDataFrame
        "LocalRelation",
        "Project",
        "Filter",
        "SubqueryAlias",
        "Generate",  # explode/posexplode — narrow
        "View",
    }
)


def _is_scan_shaped(df: DataFrame) -> bool:
    """True when every node of the analyzed logical plan is provably
    narrow — i.e. probing ``df.rdd`` is free (a leaf scan / pure
    projection+filter lineage). Inspecting the ANALYZED plan triggers
    analysis only, never execution. ``Repartition ..., false`` (coalesce)
    is narrow and accepted; ``Repartition ..., true`` shuffles and is
    not."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return False  # can't prove it's a scan -> don't probe
    for line in plan.splitlines():
        stripped = line.lstrip(" :+-|")
        if not stripped:
            continue
        head = stripped.split(" ", 1)[0].rstrip(",")
        if head == "Repartition":
            if stripped.rstrip().endswith("false"):  # coalesce: narrow
                continue
            return False
        if head not in _SCAN_SAFE_NODE_HEADS:
            return False
    return True


def _fan_out(df: DataFrame) -> DataFrame:
    """Widen narrow inputs to the session's parallelism before the
    CPU-heavy tokenize/hash step: a small-file scan (1-2 splits) would
    otherwise shingle every document on one core (measured 2.9s -> 0.65s
    on the 500-doc fixture). No-op when the scan already carries >=
    defaultParallelism splits — the 100 TB case, where inputs arrive
    with thousands of splits and a repartition would be a pointless
    full-corpus shuffle.

    The ``.rdd`` partition-count probe is free on a leaf scan, but under
    AQE it must EXECUTE any upstream exchange stages to finalize the
    plan — probing a post-join DataFrame would run (and then discard)
    the join's shuffles just to read a number. That hazard is closed
    STRUCTURALLY here: the analyzed logical plan is walked first
    (analysis-only, no execution) and any shuffle-inducing node —
    join/aggregate/window/sort/repartition/set-op — disables the probe
    entirely, because shuffle output already arrives at
    spark.sql.shuffle.partitions-way parallelism by construction. The
    ``widen=False`` flag on callers remains as an explicit opt-out, but
    a caller that forgets it can no longer trigger exchange execution."""
    if not _is_scan_shaped(df):
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# Public alias: the adaptive widen-after-narrow-scan guard is useful to any
# operator whose per-row compute is heavy enough to starve on a 1-2 split
# local scan (similarity ops import it); the probe/scale semantics are
# documented on _fan_out.
fan_out = _fan_out


def shingle_tokens(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, widen: bool = True
) -> DataFrame:
    """Exploded word n-gram shingles: one (id, shingle) row per occurrence
    — a MULTISET (duplicates kept; min-hash is duplicate-invariant, and set
    consumers dedupe with ``dedup_shingles`` which reuses this relation's
    partitioning instead of paying a second shuffle).

    posexplode + window lead() keeps every step inside whole-stage codegen
    (the array-lambda formulation falls back to interpreted eval). One
    shuffle, partitioned by document id — which also co-locates the rows
    for every downstream per-document aggregation.
    """
    from pyspark.sql import Window as W

    toks = (_fan_out(df) if widen else df).select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.lower(F.col(text_col))), "\\s+")).alias(
            "__pos", "__tok"
        ),
    ).filter(F.col("__tok") != "")  # split("") yields [""]: degenerate docs -> 0 rows
    w = W.partitionBy(id_col).orderBy("__pos")
    parts = [F.col("__tok")] + [
        F.lead("__tok", i).over(w).alias(f"__t{i}") for i in range(1, n)
    ]
    labeled = toks.select(F.col(id_col), *parts)
    full = labeled.filter(F.col(f"__t{n-1}").isNotNull()) if n > 1 else labeled
    return full.select(
        F.col(id_col),
        F.concat_ws(
            " ", "__tok", *[f"__t{i}" for i in range(1, n)]
        ).alias("shingle"),
    )


def shingle_hashes(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, widen: bool = True
) -> DataFrame:
    """Like shingle_tokens, but emits a 64-bit shingle HASH instead of the
    shingle string: per-token xxhash64 over the tokenized array, then
    shingle i = xxhash64 of the n consecutive token hashes — ALL
    MAP-SIDE (array transform over sequence indices; no window, no
    shuffle). The windowed formulation this replaces shuffled every
    token row of the corpus by document id just to line up the leads —
    at 100 TB that's a full-corpus token shuffle spent on something a
    row-local array expression computes for free.

    Hash values are identical to the windowed form (same
    xxhash64(token) -> xxhash64(h_i..h_{i+n-1}) composition). For
    MinHash/LSH/Jaccard-counting purposes hash identity is equivalent
    to string identity up to 64-bit collisions (~n²/2⁶⁵ — irrelevant
    against MinHash's own error), and every downstream persist /
    shuffle / join carries one long instead of a text column. This is
    the near-dup pipeline's fast path; use shingle_tokens when the
    actual shingle strings are needed.

    Expressions are built as parsed SQL text, not stacked Column calls:
    the Column spelling cost ~150 py4j round-trips here (every lambda/
    element_at/lit is a JVM call) — one parsed string is one call with
    an identical analyzed plan (r13 guide §1/§4 driver-overhead rule;
    same treatment as plans/conformance).
    """
    # '\\s+' in SQL-literal escaping == the "\\s+" Java regex the Column
    # form passed verbatim
    tok_sql = (
        f"transform(array_remove(split(trim(lower({_bt(text_col)})),"
        f" '\\\\s+'), ''), t -> xxhash64(t))"
    )
    hash_args = ", ".join(f"element_at(__h, i + {j + 1})" for j in range(n))
    # CASE -> NULL (-> explode drops the doc) when fewer than n tokens
    sh_sql = (
        f"CASE WHEN size(__h) >= {n} THEN "
        f"transform(sequence(0, size(__h) - {n}), i -> xxhash64({hash_args})) END"
    )
    hashed = (_fan_out(df) if widen else df).selectExpr(
        _bt(id_col), f"{tok_sql} AS __h"
    )
    return hashed.select(
        F.col(id_col), F.explode(F.expr(sh_sql)).alias("shingle")
    )


def dedup_shingles(st: DataFrame, id_col: str) -> DataFrame:
    """Multiset -> set on an (id, shingle) relation WITHOUT a new shuffle:
    the input is already hash-partitioned by id (shingle_tokens' window),
    so a window sorted by shingle within the same partitioning plus a
    lag-equality filter dedupes with only an in-partition sort."""
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy("shingle")
    return (
        st.withColumn("__prev", F.lag("shingle").over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("shingle")))
        .drop("__prev")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_n: int = 3,
    widen: bool = True,
) -> DataFrame:
    """One min-hash per seed over the shingle set (array<bigint> signature).

    Formulated as explode(shingles) -> groupBy(id).agg(min(xxhash64(seed,
    shingle)) per seed): each shingle is materialized and hashed exactly
    once, the mins combine map-side (partial aggregation), and the shuffle
    carries only (id, num_hashes longs) — the shape that survives 100 TB.
    (A per-row aggregate() over the shingle array re-evaluates the shingle
    expression per seed — measured ~30s vs ~2s at sf0.01.)

    Shingle identity is the 64-bit token-hash n-gram (shingle_hashes), so
    the shuffle carries longs only.

    Pass ``widen=False`` when ``df`` sits behind a shuffle (join/agg
    output): the _fan_out partition probe would execute those exchanges
    once just to read a count (see _fan_out's docstring).
    """
    return minhash_from_tokens(
        shingle_hashes(df, text_col, id_col, shingle_n, widen=widen),
        id_col,
        num_hashes,
    )


def minhash_from_tokens(
    tokens: DataFrame, id_col: str, num_hashes: int = 16
) -> DataFrame:
    """Signatures from an (id, shingle) relation (see shingle_tokens).

    Aggregates are parsed SQL text (one py4j call each vs ~5 for the
    stacked-Column form; SQL integer literals are IntegerType exactly
    like F.lit(seed), so the xxhash64 seeds hash identically)."""
    aggs = [
        F.expr(f"min(xxhash64({seed}, shingle)) AS __h{seed}")
        for seed in range(num_hashes)
    ]
    sig = ", ".join(f"__h{seed}" for seed in range(num_hashes))
    return (
        tokens.groupBy(id_col)
        .agg(*aggs)
        .selectExpr(_bt(id_col), f"array({sig}) AS minhash_sig")
    )


def _lsh_buckets(
    sigs: DataFrame,
    id_col: str,
    bands: int = 4,
    num_hashes: int = 16,
    max_bucket: int = 10_000,
) -> DataFrame:
    """LSH bucket relation: one row per (band, bucket) holding the sorted
    doc-id array of its members — the shared upstream of both the
    candidate-pair expansion and the candidate-id set (near_dup_pairs
    persists THIS relation: one row per bucket, instead of the pair
    relation that is quadratic in bucket size).

    ONE shuffle (groupBy band/bucket with collect_list of ids); the
    signature pipeline is computed once and the shuffle carries only
    (band, bucket, id). Buckets larger than ``max_bucket`` are dropped
    (a degenerate bucket of size B would emit B²/2 pairs — at 100 TB
    that's the skew guard; near-identical floods should be caught by
    exact dedup first) and singleton buckets pair with nothing.
    """
    if bands > num_hashes:
        # bands beyond the signature would hash EMPTY slices
        # (getItem(out-of-range) = NULL, concat_ws skips NULLs -> '') and
        # put the whole corpus into one bucket per extra band — O(N²)
        # candidates on small corpora, silently-discarded giant buckets
        # on large ones; a misconfiguration, not a degrade
        raise ValueError(
            f"bands ({bands}) cannot exceed num_hashes ({num_hashes}); "
            "each band needs at least one signature row"
        )
    rows_per_band = max(1, num_hashes // bands)
    # parsed SQL text: minhash_sig[i] == getItem(i), same IntegerType
    # band literal as F.lit(b); one py4j call instead of ~15 per band
    band_structs = F.expr(
        "array(" + ", ".join(
            f"struct({b} AS band, xxhash64(concat_ws(',', " + ", ".join(
                f"cast(minhash_sig[{b * rows_per_band + i}] AS string)"
                for i in range(rows_per_band)
            ) + ")) AS bucket)"
            for b in range(bands)
        ) + ")"
    )
    banded = sigs.select(
        F.col(id_col).alias("doc"), F.explode(band_structs).alias("bb")
    ).select("doc", "bb.band", "bb.bucket")
    return (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("doc")).alias("docs"))
        .filter((F.size("docs") > 1) & (F.size("docs") <= max_bucket))
    )


def _bucket_pairs(buckets: DataFrame) -> DataFrame:
    """In-bucket pair expansion over a ``_lsh_buckets`` relation: for each
    i, pair docs[i] with every later element (a < b by the bucket sort) —
    row-local higher-order array functions, no self-join; then one
    distinct to dedupe pairs co-bucketed in several bands."""
    pairs = F.expr(
        "flatten(transform(docs, (x, i) -> "
        "transform(slice(docs, i + 2, greatest(size(docs) - i - 1, 0)), "
        "y -> struct(x AS doc_a, y AS doc_b))))"
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str,
    bands: int = 4,
    num_hashes: int = 16,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Classic LSH candidate generation: band the signature, bucket on
    (band, hash(band slice)), emit all in-bucket pairs (a < b). See
    ``_lsh_buckets`` (the one shuffle + skew guard) and ``_bucket_pairs``
    (row-local pair expansion)."""
    return _bucket_pairs(
        _lsh_buckets(sigs, id_col, bands, num_hashes, max_bucket)
    )


def _bit_lit(b: int):
    """2^b as a Spark long literal. Bit 63 is the SIGN bit: 1 << 63
    exceeds Long.MAX_VALUE and fails literal construction, so it goes in
    as its signed two's-complement value (same bit pattern) — making the
    canonical 64-bit SimHash configuration actually constructible."""
    v = 1 << b
    return F.lit(v - (1 << 64) if b == 63 else v).cast("long")


def simhash(
    df: DataFrame, text_col: str, id_col: str, bits: int = 32
) -> DataFrame:
    """SimHash as explode(tokens) -> groupBy(id) with one signed-bit SUM per
    bit, folded into a bigint signature. Tokens are hashed once; partial
    aggregation combines map-side; the shuffle carries (id, bits ints)."""
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in [1, 64], got {bits}")
    exploded = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), "\\s+")).alias("__t"),
        )
        # split("") yields [""]: drop empty tokens so whitespace-only/empty
        # docs contribute no bits (they get no signature row at all)
        .filter(F.col("__t") != "")
        .select(F.col(id_col), F.xxhash64(F.col("__t")).alias("__h"))
    )
    # SQL-text twins of the per-bit aggregates and the signature fold
    # (r13, the batch-4 driver-overhead rule): the stacked-Column
    # spelling was ~8 py4j round-trips per bit for the aggs plus ~4 per
    # bit for the fold (~0.3 s of build time at bits=32); each parsed
    # expression is ONE call. sum(CASE ...) == sum(when(...).otherwise())
    # exactly (integer arithmetic, same bitwise ops); the fold is the
    # same left-associated bitwise-OR chain over the same contributions
    # (b=63's two's-complement literal spelled as the same signed value
    # _bit_lit computes).
    aggs = [
        F.expr(
            f"sum(CASE WHEN (shiftright(__h, {b}) & 1) = 1"
            " THEN 1 ELSE -1 END)"
        ).alias(f"__b{b}")
        for b in range(bits)
    ]

    def _bit_sql(b: int) -> str:
        v = 1 << b
        lit = v - (1 << 64) if b == 63 else v
        return (
            f"(CASE WHEN __b{b} > 0 THEN CAST({lit} AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END)"
        )

    sig_sql = " | ".join(_bit_sql(b) for b in range(bits))
    return exploded.groupBy(id_col).agg(*aggs).select(
        F.col(id_col), F.expr(sig_sql).alias("simhash")
    )


def simhash_expr(text: Column, bits: int = 32) -> Column:
    """SimHash over word tokens: per bit, sum the +1/-1 signs of that bit
    across token hashes; the signature sets the bit where the sum is
    positive.

    One pass over the token array per bit, all static expressions (shift
    amounts must be Python ints in Spark), folded into a single bigint.
    Hash the token array ONCE into an array<long> first so the xxhash64
    isn't recomputed per bit.
    """
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in [1, 64], got {bits}")
    toks = F.filter(F.split(F.trim(F.lower(text)), "\\s+"), lambda t: t != "")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_contrib(b: int) -> Column:
        count = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )
        return F.when(count > 0, _bit_lit(b)).otherwise(
            F.lit(0).cast("long")
        )

    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out.bitwiseOR(bit_contrib(b))
    return out


def _jaccard_from_tokens(
    st: DataFrame, candidates: DataFrame, id_col: str,
    caches: list | None = None,
) -> DataFrame:
    """Jaccard for candidate pairs from an (id, shingle) relation
    (multiset fine — set semantics come from collect_set).

    ONE shuffle: groupBy(id).collect_set builds the per-candidate-doc
    shingle sets; the two pair joins probe that small relation (bounded
    by 2x|candidate pairs| docs — AQE broadcasts it at runtime) and
    |A∩B| is a row-local array_intersect (JVM hash-set, O(|A|+|B|)).
    The pairwise (pair, shingle) equi-join formulation this replaces
    shuffled the candidate shingle relation three times (intersection
    join + two size joins).

    Assumes a single document's shingle set fits in a row (~1.6 MB of
    longs for a 1 MB document) — the bounded-document contract every
    collect-per-doc operator here shares; for unbounded blobs fall back
    to a pairwise equi-join on (pair, shingle).

    ``sets`` is persisted: the plan references it TWICE (once per pair
    side) and Spark does not share common subplans, so without the
    persist the semi-join + collect_set subtree executes twice (visible
    as two ObjectHashAggregate+Exchange subtrees in the r13 before-plan;
    measured 1.62 s -> 1.47 s on the sf0.1 headline query). Bounded by
    the candidate-doc count, so safe to pin at scale; pass ``caches`` to
    receive it for unpersist (same contract as near_dup_pairs).
    """
    sets = st.groupBy(id_col).agg(
        F.collect_set("shingle").alias("__sh")
    ).persist()
    if caches is not None:
        caches.append(sets)
    a = sets.selectExpr(f"{_bt(id_col)} AS doc_a", "__sh AS __sh_a")
    b = sets.selectExpr(f"{_bt(id_col)} AS doc_b", "__sh AS __sh_b")
    # LEFT joins + empty-set coalesce: a candidate doc with fewer than n
    # tokens (or NULL text) produces ZERO shingle rows and is absent from
    # `sets` — an inner join would silently DROP the requested pair,
    # where the contract (and the doc_ngram_jaccard DuckDB oracle) says
    # jaccard = 0.0 against an empty shingle set
    elem_t = sets.schema["__sh"].dataType.simpleString()
    return (
        candidates.join(a, "doc_a", "left")
        .join(b, "doc_b", "left")
        .selectExpr(
            "doc_a",
            "doc_b",
            f"size(array_intersect(coalesce(__sh_a, cast(array() AS {elem_t})),"
            f" coalesce(__sh_b, cast(array() AS {elem_t})))) AS __n_int",
            f"size(coalesce(__sh_a, cast(array() AS {elem_t}))) AS __sz_a",
            f"size(coalesce(__sh_b, cast(array() AS {elem_t}))) AS __sz_b",
        )
        .selectExpr(
            "doc_a",
            "doc_b",
            "cast(__n_int AS double)"
            " / greatest(__sz_a + __sz_b - __n_int, 1) AS jaccard",
        )
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    candidates: DataFrame,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs.

    Computed on the exploded (id, shingle) relation restricted to candidate
    documents (semi-join first — shingling the full corpus to verify a few
    pairs is the 100 TB anti-pattern), then set-collected per doc and
    intersected row-locally; see ``_jaccard_from_tokens`` for the
    bounded-document contract that per-doc collect implies.

    ``widen=False``: probing partition counts on a post-join plan would
    execute the join twice (AQE materializes upstream stages for .rdd),
    and the probe buys little here — the verify workload is bounded by
    the candidate set, small relative to the corpus by construction
    (measured: widen=False is net faster at the 500-doc fixture, 1.8s vs
    3.6s cold / 1.75s vs 1.90s warm). Note the semi-join typically
    BROADCASTS the tiny candidate-id side, so shingling inherits the
    scan's partitioning — at cluster scale that's thousands of splits;
    only a narrow local scan serializes it, and there the work is small.
    """
    # Duplicate ids in the probe side are fine (semi join is
    # duplicate-invariant); skipping the distinct saves a shuffle stage.
    cand_ids = candidates.select(F.col("doc_a").alias(id_col)).union(
        candidates.select(F.col("doc_b").alias(id_col))
    )
    st = shingle_tokens(
        df.join(cand_ids, id_col, "left_semi"),
        text_col,
        id_col,
        shingle_n,
        widen=False,
    )
    return _jaccard_from_tokens(st, candidates, id_col)


def near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    widen: bool = True,
    caches: list | None = None,
) -> DataFrame:
    """Composite L2 pipeline: shingle once -> MinHash -> LSH candidates ->
    exact-Jaccard verify -> threshold.

    The shingle relation and the (tiny) candidate set are persisted so the
    consumers share one computation instead of re-deriving the whole
    lineage per branch. MEMORY_AND_DISK, so at cluster scale this spills
    rather than OOMs; unpersist is the caller's choice — pass ``caches``
    (a list) to receive the persisted DataFrames so a long-lived driver
    (curate_corpus, a multi-corpus loop) can unpersist once the pair
    relation's consumers have run.

    Pass ``widen=False`` when ``df`` sits behind a shuffle (join/agg
    output): the _fan_out partition probe would execute those exchanges
    once just to read a count (see _fan_out's docstring).
    """
    st = shingle_hashes(df, text_col, id_col, shingle_n, widen=widen).persist()
    if caches is not None:
        caches.append(st)
    sigs = minhash_from_tokens(st, id_col, num_hashes)
    # Persist the BUCKET relation (one row per bucket), not the pair
    # relation: pairs are quadratic in bucket size, and both consumers —
    # the pair expansion and the candidate-id set — are row-local
    # transforms of the buckets. Deriving cand_ids by exploding bucket
    # members also keeps the distinct's input at O(bucket entries) where
    # the old union(pairs.doc_a, pairs.doc_b) formulation fed it
    # O(pairs) = O(B²) rows per bucket.
    buckets = _lsh_buckets(
        sigs, id_col, bands=bands, num_hashes=num_hashes
    ).persist()
    if caches is not None:
        caches.append(buckets)
    candidates = _bucket_pairs(buckets)
    # No distinct on the candidate-id probe side: a left-semi join is
    # duplicate-invariant, so deduping here would spend a whole shuffle
    # stage to shrink a relation that is at most ``bands``× its set size
    # (measured 1.54s -> 1.25s on the sf0.1 headline query).
    cand_ids = buckets.select(F.explode("docs").alias(id_col))
    # Jaccard verification touches only candidate documents' shingles.
    # The candidate-id set scales with the corpus duplicate rate, so it
    # takes NO forced broadcast: AQE broadcasts the semi-join side while
    # it fits the threshold and falls back to a shuffled semi-join when a
    # duplicate-heavy corpus makes it large. Set semantics and sizes both
    # come from _jaccard_from_tokens' one collect_set pass.
    st_cand = st.join(cand_ids, id_col, "left_semi")
    return _jaccard_from_tokens(st_cand, candidates, id_col, caches).filter(
        F.col("jaccard") >= threshold
    )


def _canonical_edges(
    pairs: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Undirected edge set as distinct ``(u, v)`` with ``u > v``
    (greatest/least), self-loops and null endpoints dropped.

    A null endpoint carries no identity to connect, and every pair
    producer in this module (near_dup_pairs, cosine_near_dup_pairs)
    emits non-null ids — dropping is a hygiene rule, not a semantics
    choice."""
    u, v = F.col(src_col), F.col(dst_col)
    return (
        pairs.filter(u.isNotNull() & v.isNotNull() & (u != v))
        .select(F.greatest(u, v).alias("u"), F.least(u, v).alias("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round: every node strictly larger than its neighbor u
    is re-pointed at ``m = min(N(u) + {u})``.

    Kiveris et al., "Connected Components in MapReduce and Beyond"
    (SoCC'14) — the published alternating algorithm; no reference
    counterpart (the reference has no dedup at all, /root/reference/
    ingest.py passim). One undirected edge {a, b} (a < b) is processed
    exactly once, from its smaller endpoint's neighborhood, emitting
    (b, m(a)); m <= a < b keeps the output loop-free. min() is map-side
    combinable, so the giant-star (skewed-degree) node costs one
    combiner cell per map partition, never a collected neighbor list;
    the join back onto the symmetric relation is AQE skew-splittable."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient every edge toward its larger endpoint;
    each node u then re-points ALL its smaller neighbors (and itself) at
    ``m = min(smaller neighbors)``. Output edges keep u > v."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    j = edges.join(mins, "u")
    rewired = j.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    centers = mins.select(F.col("u"), F.col("m").alias("v"))
    return rewired.union(centers).distinct()


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    *,
    max_iter: int = 25,
    _stats: dict | None = None,
) -> DataFrame:
    """Resolve a candidate-pair relation into connected components:
    returns ``(id, component)`` with one row per distinct id appearing in
    ``pairs``, where ``component`` is the MINIMUM id of the node's
    component (deterministic canonical label).

    This is the step every published training-data dedup pipeline runs
    between "candidate pairs" and "deduped corpus" (near-dup relations
    are transitive in effect: A~B, B~C means two of the three go):
    alternating large-star / small-star label contraction (Kiveris et
    al., SoCC'14), which converges in O(log^2 n) rounds on ANY graph —
    a path graph contracts in ~log rounds where naive neighbor-min
    propagation needs diameter rounds (iteration counts pinned by
    tests/test_components.py on a 64-chain).

    Scale shape: each round is two groupBy-min aggregations (map-side
    combinable — a skewed giant star costs one combiner cell per map
    partition) plus their joins back, all on the EDGE relation, whose
    size is bounded by the candidate-pair count and shrinks toward one
    edge per non-canonical node. Lineage is truncated every round with
    ``localCheckpoint`` (iterative plans otherwise grow exponentially
    and re-execute from the source each round); on a cluster that
    trades executor-loss resilience for speed — acceptable for a
    bounded-round batch job, and a retry restarts from the pairs
    relation.

    Convergence is detected by count + order-independent xxhash64-sum
    fingerprint of the edge set (a fixpoint of small-star . large-star);
    ``max_iter`` (default 25) is a safety valve far above the log-bound
    of any feasible graph, raising RuntimeError rather than returning a
    partially-contracted (WRONG) labeling."""
    # ONE execution of the pairs lineage: checkpoint a minimal
    # projection first and derive both the edge set and the id universe
    # from the checkpointed rows. pairs is typically the UN-persisted
    # output of near_dup_pairs (only its shingle/bucket stages cache),
    # so scanning it once for edges and twice for the ids union re-ran
    # the candidate semi-join + Jaccard-verify tail three times per call.
    raw = pairs.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("d")
    ).localCheckpoint()
    edges = _canonical_edges(raw, "s", "d").localCheckpoint()
    # ids come from the RAW relation so a doc appearing only in a
    # (dropped) self-loop pair still labels as its own singleton
    ids = (
        raw.select(F.col("s").alias("u"))
        .union(raw.select(F.col("d").alias("u")))
        .filter(F.col("u").isNotNull())
        .distinct()
        .select(F.col("u").alias("id"))
        .localCheckpoint()
    )

    def fingerprint(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0) sum: a long sum of xxhash64 values overflows
            # (and under ANSI mode throws) on a handful of rows
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = fingerprint(edges)
    iterations = 0
    converged = prev[0] == 0
    while not converged:
        if iterations >= max_iter:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "rounds; the alternating algorithm needs ~log^2(n) — "
                "raise max_iter only after checking the pair relation "
                "for pathological size"
            )
        edges = _small_star(_large_star(edges)).localCheckpoint()
        iterations += 1
        cur = fingerprint(edges)
        converged = cur == prev
        prev = cur
    if _stats is not None:
        _stats["iterations"] = iterations

    # At the fixpoint every component is a star centered at its minimum:
    # the edge set is exactly {(member, min) : member != min}, so each
    # non-canonical id appears as "u" exactly once. The groupBy-min is
    # belt-and-braces determinism, not a correctness need.
    labels = edges.groupBy("u").agg(F.min("v").alias("component"))
    return ids.join(labels, ids["id"] == labels["u"], "left").select(
        "id", F.coalesce("component", "id").alias("component")
    )


def drop_near_dups(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str,
    *,
    quality_col: str | None = None,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """Keep ONE canonical document per near-duplicate component.

    ``pairs`` is any candidate/verified pair relation (near_dup_pairs,
    cosine_near_dup_pairs, ...); components come from
    ``connected_components``. Keeper per component: the minimum id
    (default), or with ``quality_col`` the row with the HIGHEST quality,
    ties broken by minimum id — both deterministic under repartitioning.
    Documents in no pair survive untouched; pair ids absent from the
    corpus select no victim AND are never elected keeper — the labeling
    is first semi-joined to the corpus, so a component whose minimum id
    was filtered out upstream (pairs computed on a superset corpus)
    still keeps exactly one PRESENT member instead of losing all of
    them. Rows are preserved verbatim (no projection, no reorder
    guarantees).

    Scale shape: the label relation is bounded by ids-in-pairs (corpus
    duplicate rate x corpus), not the corpus; losers are everything but
    row_number()==1 over (component, keeper order) — ONE window on the
    small label relation, so the corpus lineage behind the presence
    semi-join executes once, not once per keeper/loser branch (the
    groupBy-then-join formulation re-derived it; measured on the 100x
    curate_corpus composition). The final exclusion is a left-anti join
    on the LOSER id set, which AQE broadcasts while small and shuffles
    when a duplicate-heavy corpus makes it large — the same sizing
    argument as near_dup_pairs' candidate semi-join."""
    from pyspark.sql.window import Window

    ids_present = corpus.select(F.col(id_col).alias("id"))
    labels = connected_components(pairs, src_col, dst_col).join(
        ids_present, "id", "left_semi"
    )
    if quality_col is None:
        order = [F.col("id").asc()]
        scored = labels
    else:
        # ONE quality row per id: a corpus holding duplicate rows for an
        # id (exact dedup not yet applied) would otherwise fan the label
        # relation out through this join, and the elected keeper's
        # rn>1 duplicates would land its id in the loser set — deleting
        # the WHOLE component. Max = the best evidence for the doc,
        # cast first so the aggregate orders like the window below.
        q = corpus.groupBy(F.col(id_col).alias("id")).agg(
            F.max(F.col(quality_col).cast("double")).alias("__q")
        )
        scored = labels.join(q, "id", "left")
        # max quality first, min id on ties; nulls_last so a
        # null-quality member never wins against a scored one
        order = [
            F.col("__q").desc_nulls_last(),
            F.col("id").asc(),
        ]
    w = Window.partitionBy("component").orderBy(*order)
    losers = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select("id")
    )
    return corpus.join(
        losers, corpus[id_col] == losers["id"], "left_anti"
    )
