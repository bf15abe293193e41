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


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    allow_exact_match: bool = True,
) -> DataFrame:
    """J5 as-of join, scale-safe formulation: for each left row, the
    LATEST right row of the same ``key`` with ``right_ts <= left_ts``
    (strict < when ``allow_exact_match=False``).

    Shape: union both sides into one event stream, one window
    ``last(value, ignoreNulls)`` over ``partitionBy(key).orderBy(ts,
    side)`` running unbounded-preceding -> current row. LINEAR in total
    events with exactly one shuffle (the window's) — unlike the
    range-join + row_number formulation, which materializes
    |left_per_key| x |right_per_key| pairs before discarding all but one
    per left row (quadratic for a hot key; see tests/test_joins_skew.py
    for the cross-check and the hot-key case).

    Output: every left column, plus ``right_ts`` and each of
    ``value_cols`` from the matched right row (NULL when no prior right
    event exists — semi-join afterwards if inner semantics are wanted).
    Ties among right rows at the same instant resolve to the one latest
    in (ts, value_cols) sort order, deterministically.

    The matched row travels ATOMICALLY: all carried right-side columns
    ride in one struct and a single ``last(struct, ignoreNulls)`` picks
    the whole row. (A per-column ``last`` would, for a matched row with
    a NULL in one value column, backfill that column from an OLDER right
    row while ``right_ts`` came from the newer one — a frankenrow no
    as-of join formulation should emit.)
    """
    carried_names = [right_ts] + value_cols
    clash = [c for c in carried_names if c in left.columns]
    if clash:
        # the output would carry BOTH the left column and the matched
        # right column under the same name — every downstream reference
        # then dies with AMBIGUOUS_REFERENCE (and writes fail on
        # duplicate columns); refuse up front with the remedy
        raise ValueError(
            f"right-side columns {clash} collide with left columns; "
            "rename one side before the as-of join (e.g. "
            f"right.withColumnRenamed('{clash[0]}', 'r_{clash[0]}'))"
        )
    # side ordering encodes the <= vs < boundary: with exact match the
    # right event at ts == left_ts must sort BEFORE the left row so the
    # running last() sees it; with strict <, after.
    right_side, left_side = (0, 1) if allow_exact_match else (2, 1)
    carried = [right_ts] + value_cols
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in carried]).alias("__r"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}")
            for c in left.columns
            if c != key
        ],
    )
    r_struct_type = r.schema["__r"].dataType
    l = left.select(  # noqa: E741
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(left_side).alias("__side"),
        F.lit(None).cast(r_struct_type).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns if c != key],
    )
    from pyspark.sql import Window as W

    # structs order lexicographically by field, so ordering by __r keeps
    # the same (ts, value_cols) tie-break as the old per-column form;
    # left rows' NULL struct never ties (distinct __side).
    w = (
        W.partitionBy(key)
        .orderBy("__ts", "__side", "__r")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = r.unionByName(l).select(
        F.col(key),
        F.col("__side"),
        *[F.col(f"__l_{c}") for c in left.columns if c != key],
        F.last("__r", ignorenulls=True).over(w).alias("__m"),
    )
    return matched.filter(F.col("__side") == left_side).select(
        F.col(key),
        *[F.col(f"__l_{c}").alias(c) for c in left.columns if c != key],
        *[F.col("__m").getField(c).alias(c) for c in carried],
    )


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


def hot_key_salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    threshold: int,
    salt: int = 8,
    how: str = "inner",
    k: int = 4096,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Targeted skew join: salt ONLY the measured hot keys.

    Blanket ``salted_join`` replicates the whole right side ``salt``
    times — at 100 TB that multiplies a big shuffle to fix a few keys.
    This operator runs the Misra-Gries heavy-hitter sketch over the
    left key column (operators/frequent.py: the vocabulary never
    shuffles, only ~partitions x k counter rows), broadcasts the
    detected hot-key set, splits BOTH sides into hot/cold partitions of
    the key space, joins the cold majority with the plain (AQE-managed)
    join, salts only the hot slice, and unions. Each key lives in
    exactly one branch, so the union of the two joins is exactly the
    plain join (pinned by tests/test_joins_skew.py against the
    unsplit join on data with a planted hot key).

    ``hot_keys`` (a 1-column DataFrame of key values) overrides the
    sketch when the caller already knows the skew — e.g. from a
    previous run's detection, the nightly profile, or AQE skew stats.

    Same how-restriction as ``salted_join`` (left-preserving only),
    plus the same exactness argument applied per key-partition: the
    hot/cold split is a partition of the key space, each side's rows
    land in the branch their key belongs to, and unmatched left rows
    are preserved by their own branch.
    """
    if hot_keys is None:
        from lcr_etl_upgrade_spark.operators.frequent import heavy_hitters

        hot_keys = heavy_hitters(
            left.select(key), key, threshold=threshold, k=k
        ).select(key)
    hot = F.broadcast(hot_keys.select(key))
    left_hot = left.join(hot, key, "left_semi")
    left_cold = left.join(hot, key, "left_anti")
    right_hot = right.join(hot, key, "left_semi")
    right_cold = right.join(hot, key, "left_anti")
    cold = left_cold.join(right_cold, key, how)
    hot_joined = salted_join(left_hot, right_hot, key, salt=salt, how=how)
    return cold.unionByName(hot_joined)
