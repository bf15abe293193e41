"""Skew-resilient join/aggregation utilities.

AQE's skew-join splitting (on in `session.py`) handles most skew at
runtime; these explicit salting operators cover the cases AQE can't —
skewed AGGREGATION keys, and joins where one hot key dwarfs every split
threshold. Both are pure DataFrame transforms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT side's hot keys spread over ``salt`` buckets.

    left rows get a random-ish salt (deterministic: hash of the full row's
    monotonic id is unavailable without an action, so we hash the key plus
    a per-partition counter via spark_partition_id — uniform enough to
    split a hot key across reducers); right rows are replicated ``salt``
    times so every (key, salt) bucket finds its match. Use when ONE side
    is skewed and the other is small enough to replicate (but too big to
    broadcast outright).

    Only left-preserving joins are valid: the right side is replicated
    ``salt`` times, so right/full outer would emit each unmatched right
    row once per salt bucket.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; got {how!r} — the "
            "exploded right side would duplicate unmatched right rows"
        )
    salted_left = left.withColumn(
        "__salt",
        (F.pmod(F.xxhash64(F.col(key), F.spark_partition_id(), F.monotonically_increasing_id()), F.lit(salt))).cast("int"),
    )
    exploded_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_left.join(exploded_right, [key, "__salt"], how)
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    partial_aggs: list[Column],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys: stage 1 aggregates
    (keys + salt) — spreading a hot key over ``salt`` reducers — stage 2
    merges the partials per key.

    ``aggs`` run against the raw rows in stage 1; ``partial_aggs`` merge
    stage-1 outputs (e.g. stage 1 `count(*) as n`, stage 2 `sum(n) as n`).
    For algebraic aggregates Spark's own map-side partial aggregation
    usually suffices — reach for this when a single reducer key still
    overflows (e.g. collect-heavy or high-cardinality-distinct per key).
    """
    salted = df.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(salt),
        ).cast("int"),
    )
    stage1 = salted.groupBy(*keys, "__salt").agg(*aggs)
    return stage1.groupBy(*keys).agg(*partial_aggs)
