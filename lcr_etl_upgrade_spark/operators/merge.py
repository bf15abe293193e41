"""Upsert / SCD2 merge operators (batch MERGE-INTO emulation).

Delta's MERGE INTO isn't available in this environment, so these implement
the same semantics with public DataFrame ops — the documented public
pattern: anti-join + union for upsert; window + union for SCD2. On a real
cluster with Delta these swap to `DeltaTable.merge` behind the same
signatures; the logical outcome is identical.

Scale notes: both operators shuffle once on the merge keys; the updates
side is usually the small one — pass `broadcast_updates=True` to pin it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    broadcast_updates: bool = False,
) -> DataFrame:
    """MERGE: update matched rows, insert unmatched (last-write-wins on the
    updates side is the caller's responsibility — dedupe first)."""
    upd = F.broadcast(updates) if broadcast_updates else updates
    kept = current.join(upd, keys, "left_anti")
    return kept.unionByName(updates)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    as_of: str,
    valid_from: str = "VALID_FROM",
    valid_to: str = "VALID_TO",
    current_flag: str = "IS_CURRENT",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the current version of every
    updated key (VALID_TO = as_of, IS_CURRENT = false) and append the new
    version (VALID_FROM = as_of, open-ended).

    ``dim`` must already carry the three SCD columns; ``updates`` carries
    business columns only. Deterministic given a pinned as_of.

    ONE pass over ``dim`` (left join against the distinct update keys
    with a match marker, then conditional columns): the previous
    three-branch formulation (semi/anti/semi + union) scanned the full
    dimension three times AND silently dropped rows whose
    ``current_flag`` was NULL (they failed both the ``flag`` and
    ``~flag`` filters). NULL-flag rows now pass through unchanged —
    they are not current, so an update never closes them, and a merge
    operator must never lose rows.
    """
    ts = F.lit(as_of).cast("timestamp_ntz")
    upd_keys = updates.select(*keys).distinct()

    marked = dim.join(
        upd_keys.withColumn("__upd", F.lit(True)), keys, "left"
    )
    hit = F.coalesce(F.col("__upd"), F.lit(False)) & F.coalesce(
        F.col(current_flag), F.lit(False)
    )
    adjusted = marked.withColumns(
        {
            valid_to: F.when(hit, ts).otherwise(F.col(valid_to)),
            current_flag: F.when(hit, F.lit(False)).otherwise(
                F.col(current_flag)
            ),
        }
    ).drop("__upd")

    fresh = updates.withColumns(
        {
            valid_from: ts,
            valid_to: F.lit(None).cast("timestamp_ntz"),
            current_flag: F.lit(True),
        }
    )
    return adjusted.unionByName(fresh)
