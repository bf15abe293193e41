"""Incremental (CDC-lite) load pattern: persisted watermark + delta filter.

Reference semantics (SURVEY.md §2.10, §3.3): read last-runtime watermark
(default 1900-01-01 on any failure => full reload, ingest.py:475-492),
backfill MODIFY_DATE from CREATE_DATE, filter >= watermark, short-circuit
on empty, process, persist the new watermark.

Two deliberate fixes over the reference:
- the new watermark is max(MODIFY_DATE) of the processed batch, not the
  driver's wall clock (the reference's datetime.now() skips rows modified
  between job start and watermark write, ingest.py:821);
- emptiness probe is df.isEmpty() (ingest.py:807 spins up an RDD job).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "1900-01-01 00:00:00"


class WatermarkStore:
    """One-line-text-file watermark persistence (the reference stores a
    single line in DBFS, ingest.py:481-483; locally a plain file — a Delta
    table or any KV store slots in behind the same interface)."""

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.directory, f"last_runtime_{table}.txt")

    def read(self, table: str) -> str:
        """Returns the stored watermark, or 1900-01-01 on any failure
        (=> full reload, mirroring ingest.py:488-492)."""
        return self.read_state(table)[0]

    def write(self, table: str, value: str) -> None:
        self.write_state(table, value, [])

    def read_state(self, table: str) -> tuple[str, list[str]]:
        """(watermark, boundary_keys): the keys of rows written AT the
        watermark instant last run — excluded on re-filter so a plain
        append sink stays idempotent with >= semantics.

        Line 1 is the plain watermark (the reference's whole format,
        ingest.py:481-483); line 2, when present, is the boundary-key
        list as ONE JSON array — newline-separated keys would let a key
        containing a newline shear into two phantom keys on reread."""
        import json

        try:
            with open(self._path(table)) as fh:
                lines = fh.read().split("\n", 1)
        except OSError:
            return DEFAULT_WATERMARK, []
        if not lines or not lines[0].strip():
            return DEFAULT_WATERMARK, []
        keys: list[str] = []
        if len(lines) > 1 and lines[1].strip():
            try:
                parsed = json.loads(lines[1])
            except ValueError:
                parsed = None  # unreadable state -> plain >= re-select semantics
            # Only a JSON *array* is the boundary-key format. A scalar second
            # line (legacy single-key formats: a bare number raised TypeError
            # on iteration; a quoted string sheared into per-character phantom
            # keys that could wrongly exclude live rows) degrades to plain >=.
            if isinstance(parsed, list):
                keys = [str(k) for k in parsed]
        return lines[0].strip(), keys

    def write_state(self, table: str, value: str, boundary_keys: list[str]) -> None:
        import json
        import uuid as _uuid

        # temp + os.replace: an in-place write that crashes after the
        # watermark line but before the key line would persist a
        # valid-looking state with NO keys — silently degrading to
        # duplicate-producing >= semantics; atomic replace makes the
        # state all-or-nothing
        path = self._path(table)
        tmp = f"{path}.{_uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as fh:
            fh.write(value)
            if boundary_keys:
                fh.write("\n" + json.dumps(boundary_keys))
        os.replace(tmp, path)


def incremental_filter(
    df: DataFrame,
    watermark: str,
    modify_col: str = "MODIFY_DATE",
    create_col: str | None = "CREATE_DATE",
    key_col: str | None = None,
    boundary_keys: list[str] | None = None,
) -> DataFrame:
    """C10 backfill + F1 filter (ingest.py:802-805). The predicate lands
    directly above the scan, so parquet/Delta data skipping applies.

    ``>=`` is kept (a row modified exactly at the watermark is never
    silently skipped), which re-selects boundary-timestamp rows on the
    next run. With ``key_col``/``boundary_keys`` those already-written
    rows are excluded — `ts > wm OR (ts == wm AND key NOT IN boundary)`
    — making a plain append sink idempotent. Without them, pair with an
    idempotent (merge/upsert) sink or dedupe downstream.

    A NULL key at the watermark instant is KEPT (the NOT-IN is wrapped
    in coalesce(.., False) so three-valued logic can't silently drop the
    row); NULL keys are never recorded as boundary keys, so such rows
    re-select next run — exact append idempotence requires a non-null
    ``key_col`` (document'd contract, same as any merge key).
    """
    eff = (
        F.coalesce(F.col(modify_col), F.col(create_col))
        if create_col
        else F.col(modify_col)
    )
    wm = F.lit(watermark).cast("timestamp_ntz")
    out = df.withColumn(modify_col, eff)
    if key_col is not None and boundary_keys:
        pred = (F.col(modify_col) > wm) | (
            (F.col(modify_col) == wm)
            & ~F.coalesce(
                F.col(key_col).cast("string").isin(boundary_keys), F.lit(False)
            )
        )
        return out.filter(pred)
    return out.filter(F.col(modify_col) >= wm)


MAX_BOUNDARY_KEYS = 10_000


def run_incremental(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    store: WatermarkStore,
    sink,
    modify_col: str = "MODIFY_DATE",
    create_col: str | None = "CREATE_DATE",
    key_col: str | None = None,
    persist_batch: bool = True,
) -> int:
    """Full incremental cycle; returns rows written (0 => short-circuit).

    ``sink`` is a callable DataFrame -> None. The batch max(MODIFY_DATE)
    is computed with observe() on the write pass — no extra scan.

    With ``key_col`` the keys of rows written AT the new watermark are
    persisted alongside it and excluded on the next run, so >= semantics
    and a plain append sink together stay duplicate-free. NULL keys are
    skipped (see incremental_filter's contract). The boundary fetch is
    capped at MAX_BOUNDARY_KEYS; above the cap (a degenerate all-one-
    timestamp batch) it falls back to plain >= re-select semantics.

    The SOURCE is traversed exactly once: the filtered batch is persisted
    (MEMORY_AND_DISK) before the sink pass, and the boundary-key fetch
    reads the cached blocks — not a re-scan. This also closes the
    non-repeatable-read hazard: without the cache, a row appearing in the
    source at ts == new_wm *between* the write job and the key fetch
    would be recorded as a boundary key without ever having been written,
    and permanently skipped next run. Pass ``persist_batch=False`` to
    trade that guarantee for zero cache footprint when the source is a
    snapshot (e.g. an immutable parquet partition) and the delta is huge;
    the follow-up fetch's `ts == max` predicate is pushdown-friendly.
    """
    from pyspark.sql import Observation

    watermark, boundary = store.read_state(table)
    filtered = incremental_filter(
        df, watermark, modify_col, create_col, key_col=key_col, boundary_keys=boundary
    )
    if persist_batch:
        filtered = filtered.persist()
    try:
        if filtered.isEmpty():
            return 0
        obs = Observation(f"wm_{table}")
        observed = filtered.observe(
            obs, F.max(modify_col).alias("max_modify"), F.count(F.lit(1)).alias("n")
        )
        sink(observed)
        result = obs.get
        new_wm = result["max_modify"]
        if new_wm is not None:
            new_wm_str = str(new_wm)
            new_boundary: list[str] = []
            if key_col is not None:
                boundary_rows = (
                    filtered.filter(
                        (F.col(modify_col) == F.lit(new_wm))
                        & F.col(key_col).isNotNull()
                    )
                    .select(F.col(key_col).cast("string"))
                    .limit(MAX_BOUNDARY_KEYS + 1)
                    .collect()
                )
                # Truncate, never clear — uniformly: every key kept here
                # WAS written, so keeping any subset only prevents
                # duplicates, while clearing would re-admit ALL
                # watermark-instant rows next run. This applies to the
                # fetch itself exceeding the cap too (it used to fall
                # through to an empty list, erasing PRIOR runs' keys
                # under a standing watermark — the exact hazard).
                fetched = [
                    r[0] for r in boundary_rows[:MAX_BOUNDARY_KEYS]
                ]
                if new_wm_str == watermark:
                    # Watermark stood still: this batch's boundary rows
                    # were written IN ADDITION to the ones recorded at
                    # this instant by prior runs (which the filter just
                    # excluded, so they can't be in the fetch) — union,
                    # prior keys first so they survive truncation.
                    new_boundary = list(dict.fromkeys(boundary + fetched))
                else:
                    new_boundary = fetched
                if (
                    len(boundary_rows) > MAX_BOUNDARY_KEYS
                    or len(new_boundary) > MAX_BOUNDARY_KEYS
                ):
                    # The dropped tail re-selects next run: duplicates
                    # possible for those keys only, never data loss.
                    import logging

                    logging.getLogger(__name__).warning(
                        "boundary keys for %s exceed MAX_BOUNDARY_KEYS "
                        "(> %d); truncating — append idempotence is "
                        "partial for this table until the watermark "
                        "advances",
                        table,
                        MAX_BOUNDARY_KEYS,
                    )
                    new_boundary = new_boundary[:MAX_BOUNDARY_KEYS]
            store.write_state(table, new_wm_str, new_boundary)
        return int(result["n"])
    finally:
        if persist_batch:
            filtered.unpersist()


def consume_delta_changes(spark, path, store, name, process):
    """CDC consumption loop: compose the change-feed reader with the
    reference's watermark pattern (F1/F2 shape, a VERSION cursor instead
    of a timestamp). The watermark stores the last PROCESSED commit;
    each cycle reads ``read_delta_changes(last+1, latest)``, hands the
    frame to ``process(df, (lo, hi))``, and advances the watermark only
    AFTER process returns — so a crash replays the whole window
    (at-least-once in whole commits; consumers needing exactly-once
    dedup on ``_commit_version``, which is monotone and gap-free).

    Returns the (lo, hi) window processed, or None when there was
    nothing new. At 100 TB this is the consumption shape that replaces
    full-table diffs: each cycle scans only the files the window's
    commits touched.
    """
    from lcr_etl_upgrade_spark.delta_lite import (
        latest_version,
        read_delta_changes,
    )

    raw = store.read(name)
    last = int(raw) if raw.strip().lstrip("-").isdigit() else -1
    latest = latest_version(path)
    if latest <= last:
        return None
    lo, hi = last + 1, latest
    process(read_delta_changes(spark, path, lo, hi), (lo, hi))
    store.write(name, str(hi))
    return (lo, hi)
