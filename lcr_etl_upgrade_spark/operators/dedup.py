"""L1/L2 deduplication operators.

- exact_dedup: content-hash groupBy (one shuffle on the hash — the 100 TB
  pattern; never a full-text sort).
- minhash_signatures / minhash_lsh_candidates: shingle -> k minhashes ->
  band-bucket join. Everything is built-in higher-order functions
  (transform/aggregate/xxhash64); candidate verification joins only within
  LSH buckets, never O(n^2).
- simhash: 64-bit sign-aggregated token hash, hamming-near pairs within
  bucketed prefixes.
- ngram_jaccard_pairs: exact Jaccard on shingle sets for candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep the lowest-id row per duplicate group (deterministic winner).

    Hash-groupBy, not dropDuplicates, so the survivor choice is explicit
    and stable across partitionings.
    """
    key = F.md5(F.concat_ws("\x1f", *[F.col(c) for c in cols]))
    return (
        df.withColumn("__dupkey", key)
        .groupBy("__dupkey")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )


def shingles_expr(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (distinct)."""
    toks = F.split(F.trim(F.lower(text)), "\\s+")
    k = F.size(toks) - (n - 1)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 16, shingle_n: int = 3
) -> DataFrame:
    """One min-hash per seed over the shingle set (array<bigint> signature).

    Seeded hashing via xxhash64(seed, shingle) — built-in, 64-bit,
    JVM-side. num_hashes columns of aggregate(min) over the array.
    """
    sh = shingles_expr(F.col(text_col), shingle_n)

    def min_hash(seed: int):
        # NB: close over `seed` via factory — a `seed=seed` default arg would
        # change the lambda's arity and PySpark would bind it as the (acc, x,
        # idx) 3-arg higher-order form.
        return F.aggregate(
            sh,
            F.lit(2**63 - 1).cast("long"),
            lambda acc, s: F.least(acc, F.xxhash64(F.lit(seed), s)),
        )

    sig = F.array(*[min_hash(seed) for seed in range(num_hashes)])
    return df.select(F.col(id_col), sig.alias("minhash_sig"))


def minhash_lsh_candidates(
    sigs: DataFrame, id_col: str, bands: int = 4
) -> DataFrame:
    """Band the signature, bucket-join within (band, band_hash) — the
    classic LSH candidate generation; output is distinct candidate pairs
    (a < b). The join key is (band_idx, hash(band slice)), so the shuffle
    is on small long keys and never touches text."""
    n = sigs.select(F.size("minhash_sig")).first()[0]
    rows_per_band = max(1, n // bands)
    banded = sigs.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                F.transform(
                                    F.slice(
                                        "minhash_sig", b * rows_per_band + 1, rows_per_band
                                    ),
                                    lambda x: x.cast("string"),
                                ),
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .distinct()
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
    toks = F.split(F.trim(F.lower(text)), "\\s+")
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
        return F.when(count > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out.bitwiseOR(bit_contrib(b))
    return out


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    candidates: DataFrame,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification step
    after LSH; joins shingle arrays in, computes |∩|/|∪| with array ops)."""
    sh = df.select(
        F.col(id_col), shingles_expr(F.col(text_col), shingle_n).alias("sh")
    )
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
        )
        .select("doc_a", "doc_b", "jaccard")
    )
