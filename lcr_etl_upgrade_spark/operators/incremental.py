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
        try:
            with open(self._path(table)) as fh:
                value = fh.read().strip()
            return value or DEFAULT_WATERMARK
        except OSError:
            return DEFAULT_WATERMARK

    def write(self, table: str, value: str) -> None:
        with open(self._path(table), "w") as fh:
            fh.write(value)


def incremental_filter(
    df: DataFrame,
    watermark: str,
    modify_col: str = "MODIFY_DATE",
    create_col: str | None = "CREATE_DATE",
) -> DataFrame:
    """C10 backfill + F1 filter (ingest.py:802-805). The predicate lands
    directly above the scan, so parquet/Delta data skipping applies."""
    eff = (
        F.coalesce(F.col(modify_col), F.col(create_col))
        if create_col
        else F.col(modify_col)
    )
    return df.withColumn(modify_col, eff).filter(
        F.col(modify_col) >= F.lit(watermark).cast("timestamp_ntz")
    )


def run_incremental(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    store: WatermarkStore,
    sink,
    modify_col: str = "MODIFY_DATE",
    create_col: str | None = "CREATE_DATE",
) -> int:
    """Full incremental cycle; returns rows written (0 => short-circuit).

    ``sink`` is a callable DataFrame -> None. The batch max(MODIFY_DATE)
    is computed with observe() on the write pass — no extra scan.
    """
    from pyspark.sql import Observation

    watermark = store.read(table)
    filtered = incremental_filter(df, watermark, modify_col, create_col)
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
        store.write(table, str(new_wm))
    return int(result["n"])
