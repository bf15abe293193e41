"""EL (sync) stage: source -> audit-enriched storage with reconciliation.

Reproduces the reference's sync flow (SURVEY.md §3.1; reference
sync.py:57-129): read source table, append the 5 audit columns, write to
the raw zone, and reconcile row counts 3 ways (source vs written vs
re-read). Two structural fixes over the reference:

- the reference re-reads the source for every action (count, write,
  verify => 3 full JDBC scans per table, sync.py:90,112,117-118); here the
  write-side count rides the single write pass via ``observe()`` and only
  the cheap verification re-read scans storage;
- the reference imports concurrent.futures but loops tables sequentially
  (sync.py:5,169-179); ``sync_tables_parallel`` actually submits per-table
  Spark jobs from a thread pool (safe — Spark schedules concurrent jobs
  from one session, and a FAIR scheduler pool shares the cluster).

Errors follow the reference's log-and-continue policy per table
(sync.py:177-179): one failed table doesn't abort the batch.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.operators.conform import add_audit_columns

log = logging.getLogger(__name__)


@dataclass
class SyncResult:
    table: str
    source_count: int | None
    written_count: int
    verified_count: int | None
    error: str | None = None

    @property
    def reconciliation(self) -> str:
        """'3-way' (source+written+verified), '2-way', or 'none'.

        The written count alone is never evidence of reconciliation —
        at least one independent count (source or re-read) must agree."""
        if self.error is not None:
            return "none"
        independent = [
            c for c in (self.source_count, self.verified_count) if c is not None
        ]
        if not independent:
            return "none"
        if any(c != self.written_count for c in independent):
            return "none"
        return "3-way" if len(independent) == 2 else "2-way"

    @property
    def reconciled(self) -> bool:
        return self.reconciliation != "none"


def sync_table(
    df: DataFrame,
    table: str,
    sink,
    verify_reader=None,
    source_count: int | None = None,
    as_of: str | None = None,
) -> SyncResult:
    """One table: enrich with audit columns, write once (count observed on
    the same pass), optionally verify by re-reading storage.

    ``sink``: DataFrame -> None writer. ``verify_reader``: () -> DataFrame
    re-reading what the sink wrote (reference sync.py:117-119).
    ``source_count``: out-of-band count (the reference's SQL COUNT(*)
    pushed to Postgres, sync.py:45-55). When omitted it stays None —
    reconciliation then requires the verify re-read; with neither,
    ``reconciliation`` reports 'none' rather than silently passing.
    """
    enriched = add_audit_columns(df, as_of=as_of)
    obs = Observation(f"sync_{table}")
    observed = enriched.observe(obs, F.count(F.lit(1)).alias("n"))
    sink(observed)
    written = int(obs.get["n"])
    verified = None
    if verify_reader is not None:
        verified = verify_reader().count()
    return SyncResult(
        table=table,
        source_count=source_count,
        written_count=written,
        verified_count=verified,
    )


def sync_tables_parallel(
    jobs: dict[str, tuple[DataFrame, object]],
    max_workers: int = 4,
    as_of: str | None = None,
    verify_readers: dict[str, object] | None = None,
    source_counts: dict[str, int] | None = None,
) -> dict[str, SyncResult]:
    """Run sync_table for several tables concurrently.

    ``jobs`` maps table name -> (source DataFrame, sink callable).
    ``verify_readers`` / ``source_counts`` optionally supply the
    per-table reconciliation inputs sync_table takes — without them the
    parallel path could only ever report reconciliation='none', forcing
    callers who want reconciled counts back to sequential sync_table
    calls. Per-table failures are captured in the result
    (log-and-continue), never raised — matching the reference's
    orchestration contract.
    """

    def run(item) -> SyncResult:
        name, (df, sink) = item
        try:
            return sync_table(
                df,
                name,
                sink,
                verify_reader=(verify_readers or {}).get(name),
                source_count=(source_counts or {}).get(name),
                as_of=as_of,
            )
        except Exception as exc:  # noqa: BLE001 — per-table isolation
            log.exception("sync failed for table %s", name)
            return SyncResult(name, None, -1, None, error=str(exc))

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        results = list(pool.map(run, jobs.items()))
    return {r.table: r for r in results}
