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
    source_count: int
    written_count: int
    verified_count: int | None
    error: str | None = None

    @property
    def reconciled(self) -> bool:
        if self.error is not None:
            return False
        counts = {self.source_count, self.written_count}
        if self.verified_count is not None:
            counts.add(self.verified_count)
        return len(counts) == 1


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
    pushed to Postgres, sync.py:45-55); defaults to the observed count —
    passing it enables true 3-way reconciliation against the source
    system.
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
        source_count=written if source_count is None else source_count,
        written_count=written,
        verified_count=verified,
    )


def sync_tables_parallel(
    jobs: dict[str, tuple[DataFrame, object]],
    max_workers: int = 4,
    as_of: str | None = None,
) -> dict[str, SyncResult]:
    """Run sync_table for several tables concurrently.

    ``jobs`` maps table name -> (source DataFrame, sink callable).
    Per-table failures are captured in the result (log-and-continue),
    never raised — matching the reference's orchestration contract.
    """

    def run(item) -> SyncResult:
        name, (df, sink) = item
        try:
            return sync_table(df, name, sink, as_of=as_of)
        except Exception as exc:  # noqa: BLE001 — per-table isolation
            log.exception("sync failed for table %s", name)
            return SyncResult(name, -1, -1, None, error=str(exc))

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        results = list(pool.map(run, jobs.items()))
    return {r.table: r for r in results}
