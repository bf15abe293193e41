"""Upsert / SCD2 merge operators.

Two execution paths behind the same signatures (r12):

- DataFrame target -> pure DataFrame emulation (anti-join + union for
  upsert; single-pass marked join for SCD2) — the public pattern for
  engines without a transactional MERGE, and the spelling the oracled
  ``merge_upsert``/``merge_scd2`` queries pin.
- ``str`` target (a delta_lite table path) -> TRANSACTIONAL
  ``delta_lite.merge_rows``: ONE commit with authoritative CDF change
  rows, rowTracking preservation, and the multiple-source-rows-match
  refusal — the production spelling of the reference's incremental
  upsert load (/root/reference/ingest.py:802-822). SCD2 uses the
  public staged-source trick (each updated key's row appears twice in
  the source: once keyed, to CLOSE the current version; once
  null-keyed, to INSERT the new version).

Scale notes: the emulation shuffles once on the merge keys — pass
``broadcast_updates=True`` to pin the small side; the transactional
path costs one match pass plus a rewrite of TOUCHED files only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bt(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def apply_changes(
    target: str,
    changes: DataFrame,
    keys: list[str],
    sequence_col: str = "_commit_version",
) -> int:
    """APPLY CHANGES INTO (the declarative-pipelines CDC-apply shape):
    route a change-feed batch into the delta_lite table at ``target``
    through ONE transactional merge — the consumer half of the CDC loop
    whose producer half is ``read_delta_changes`` /
    ``consume_delta_changes``. Returns the committed version.

    ``changes`` carries the business columns plus ``_change_type``
    (protocol domain: insert / delete / update_preimage /
    update_postimage) and a monotone ``sequence_col`` (the change
    feed's ``_commit_version`` by default). Semantics:

    - ``update_preimage`` rows are dropped (old values, not changes);
    - per key, the row with the HIGHEST sequence wins; on a sequence
      tie an upsert beats a delete (a same-commit delete+insert of one
      key replays as the insert — the replication-safe order). Keys are
      assumed unique in the target, the standard CDC-apply contract;
    - the winner applies as: delete -> WHEN MATCHED DELETE, upsert ->
      WHEN MATCHED UPDATE all business columns / WHEN NOT MATCHED
      INSERT. A delete for an absent key is a no-op, so whole-window
      replays (the consume_delta_changes crash contract is
      at-least-once in whole commits) are idempotent.

    One shuffle on the keys (the dedupe window), then merge_rows' one
    match pass + touched-file rewrites. Business columns are the
    intersection of the target schema and ``changes`` (change-feed
    metadata columns never land)."""
    from lcr_etl_upgrade_spark.delta_lite import merge_rows, replay_log

    spark = changes.sparkSession
    tgt_cols = [f.name for f in replay_log(spark, target).schema.fields]
    # only the PROTOCOL metadata columns are excluded; a sequence
    # column that is also a real target column (e.g. sequencing by a
    # business timestamp) must land like any other business column —
    # target-schema intersection already keeps feed-only sequence
    # columns out (r13 ADVICE low)
    meta = {"_change_type", "_commit_version", "_commit_timestamp"}
    business = [
        c for c in changes.columns if c in set(tgt_cols) and c not in meta
    ]
    missing = [k for k in keys if k not in business]
    if missing:
        raise ValueError(
            f"apply_changes: key column(s) {missing} absent from the "
            "change batch / target schema intersection"
        )
    ranked = (
        changes.filter(F.col("_change_type") != "update_preimage")
        .withColumn(
            "__is_delete", (F.col("_change_type") == "delete").cast("int")
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(*keys).orderBy(
                    F.col(sequence_col).desc(), F.col("__is_delete").asc()
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .select(*business, "__is_delete")
    )
    on = " AND ".join(f"t.{_bt(k)} = s.{_bt(k)}" for k in keys)
    non_keys = [c for c in business if c not in keys]
    matched = [("delete", "s.__is_delete = 1")]
    if non_keys:
        matched.append(
            ("update", None, {c: f"s.{_bt(c)}" for c in non_keys})
        )
    return merge_rows(
        spark,
        target,
        ranked,
        on,
        matched=tuple(matched),
        not_matched=(
            (
                "insert",
                "s.__is_delete = 0",
                {c: f"s.{_bt(c)}" for c in business},
            ),
        ),
    )


def upsert(
    current: DataFrame | str,
    updates: DataFrame,
    keys: list[str],
    broadcast_updates: bool = False,
) -> DataFrame:
    """MERGE: update matched rows, insert unmatched. ``current`` may be
    a DataFrame (emulation; last-write-wins on duplicate update keys is
    the caller's responsibility — dedupe first) or a delta_lite table
    path (transactional single commit; duplicate update keys RAISE,
    delta-spark's rule). Returns the post-merge relation either way."""
    if isinstance(current, str):
        from lcr_etl_upgrade_spark.delta_lite import (
            merge_rows,
            read_delta_lite,
        )

        spark = updates.sparkSession
        on = " AND ".join(f"t.{_bt(k)} = s.{_bt(k)}" for k in keys)
        non_keys = [c for c in updates.columns if c not in keys]
        merge_rows(
            spark,
            current,
            updates,
            on,
            matched=(
                (("update", None, {c: f"s.{_bt(c)}" for c in non_keys}),)
                if non_keys
                else ()
            ),
            not_matched=(
                (
                    "insert",
                    None,
                    {c: f"s.{_bt(c)}" for c in updates.columns},
                ),
            ),
        )
        return read_delta_lite(spark, current)
    upd = F.broadcast(updates) if broadcast_updates else updates
    kept = current.join(upd, keys, "left_anti")
    return kept.unionByName(updates)


def scd2_apply(
    dim: DataFrame | str,
    updates: DataFrame,
    keys: list[str],
    as_of: str,
    valid_from: str = "VALID_FROM",
    valid_to: str = "VALID_TO",
    current_flag: str = "IS_CURRENT",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the current version of
    every updated key (VALID_TO = as_of, IS_CURRENT = false) and append
    the new version (VALID_FROM = as_of, open-ended).

    ``dim`` must already carry the three SCD columns (a DataFrame, or a
    delta_lite path whose table does); ``updates`` carries business
    columns only. Deterministic given a pinned as_of.

    DataFrame path: ONE pass over ``dim`` (left join against the
    distinct update keys with a match marker, then conditional
    columns): the previous three-branch formulation (semi/anti/semi +
    union) scanned the full dimension three times AND silently dropped
    rows whose ``current_flag`` was NULL (they failed both the ``flag``
    and ``~flag`` filters). NULL-flag rows pass through unchanged —
    they are not current, so an update never closes them, and a merge
    operator must never lose rows.

    Path target (r12): the public staged-source MERGE pattern — the
    source is ``updates`` twice: keyed rows close the matching CURRENT
    dimension row (``ON t.key = s.__mk AND t.IS_CURRENT``), and
    null-keyed duplicates (staged only for keys that currently HAVE an
    open version) never match, so they insert the new version; keys
    with no open version insert via their keyed row failing the match.
    One transactional commit, authoritative CDF rows."""
    ts = F.lit(as_of).cast("timestamp_ntz")
    if isinstance(dim, str):
        from lcr_etl_upgrade_spark.delta_lite import (
            merge_rows,
            read_delta_lite,
        )

        spark = updates.sparkSession
        cur_keys = (
            read_delta_lite(spark, dim)
            .filter(F.coalesce(F.col(current_flag), F.lit(False)))
            .select(*keys)
            .distinct()
        )
        mk = {k: f"__mk_{i}" for i, k in enumerate(keys)}
        keyed = updates.select(
            "*", *[F.col(k).alias(m) for k, m in mk.items()]
        )
        null_keyed = updates.join(cur_keys, keys, "left_semi").select(
            "*",
            *[
                F.lit(None).cast(updates.schema[k].dataType).alias(m)
                for k, m in mk.items()
            ],
        )
        staged = keyed.unionByName(null_keyed)
        on = (
            " AND ".join(f"t.{_bt(k)} = s.{_bt(m)}" for k, m in mk.items())
            + f" AND t.{_bt(current_flag)} = true"
        )
        insert_vals = {c: f"s.{_bt(c)}" for c in updates.columns}
        insert_vals[valid_from] = ts
        insert_vals[valid_to] = F.lit(None).cast("timestamp_ntz")
        insert_vals[current_flag] = F.lit(True)
        merge_rows(
            spark,
            dim,
            staged,
            on,
            matched=(
                ("update", None, {valid_to: ts, current_flag: F.lit(False)}),
            ),
            not_matched=(("insert", None, insert_vals),),
        )
        return read_delta_lite(spark, dim)

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
