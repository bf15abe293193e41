"""``delta_cdf_lite``: Structured Streaming over the delta_lite change
feed via Spark 4's Python Data Source API.

    spark.dataSource.register(DeltaCdfLiteDataSource)
    stream = (spark.readStream.format("delta_cdf_lite")
              .option("path", table_path)
              .option("startingVersion", "0")   # default 0
              .load())

Offsets are COMMIT VERSIONS — the natural exactly-once cursor the
checkpoint persists: every micro-batch covers a contiguous commit
window, a restart replays from the checkpointed version via
``readBetweenOffsets`` (the rows are re-derived from the immutable log,
so replays are deterministic), and the change rows carry
``_change_type`` / ``_commit_version`` / ``_commit_timestamp`` exactly
like the batch reader.

Rows materialize through cdf_arrow (pure pyarrow). Two readers share
that code: the PARTITION-PLANNED DataSourceStreamReader (the default —
the driver plans one InputPartition per changed file carrying
descriptors only, executors expand deletion vectors and read parquet
in parallel: the shape that scales to wide commit windows) and a
SimpleDataSourceStreamReader fallback kept for engines that ask for
it (driver-funnel; right for change-rate-bounded CDC only).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _CdfSimpleReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self._path = options["path"]
        self._start = int(options.get("startingVersion", 0))

    def initialOffset(self) -> dict:
        return {"version": self._start - 1}

    def read(self, start: dict):
        from lcr_etl_upgrade_spark.cdf_arrow import arrow_changes
        from lcr_etl_upgrade_spark.delta_lite import latest_version

        last = int(start["version"])
        latest = latest_version(self._path)
        if latest <= last:
            return iter([]), start
        rows = arrow_changes(self._path, last + 1, latest)
        return iter(rows), {"version": latest}

    def readBetweenOffsets(self, start: dict, end: dict):
        from lcr_etl_upgrade_spark.cdf_arrow import arrow_changes

        lo, hi = int(start["version"]) + 1, int(end["version"])
        if hi < lo:
            return iter([])
        return iter(arrow_changes(self._path, lo, hi))

    def commit(self, end: dict) -> None:
        pass  # the log is the source of truth; nothing to acknowledge


class _CdfPartitionedReader(DataSourceStreamReader):
    """The scale path: the driver plans ONE InputPartition per changed
    file (descriptors only — deletion vectors expand executor-side),
    and executors materialize rows in parallel. This is what replaces
    the simple reader's driver funnel when a commit window touches many
    files."""

    def __init__(self, options):
        self._path = options["path"]
        self._start = int(options.get("startingVersion", 0))

    def initialOffset(self) -> dict:
        return {"version": self._start - 1}

    def latestOffset(self) -> dict:
        from lcr_etl_upgrade_spark.delta_lite import latest_version

        return {"version": latest_version(self._path)}

    def partitions(self, start: dict, end: dict):
        from lcr_etl_upgrade_spark.cdf_arrow import change_plan

        lo, hi = int(start["version"]) + 1, int(end["version"])
        if hi < lo:
            return [InputPartition(None)]  # Spark requires >=1 partition
        tasks = change_plan(self._path, lo, hi)
        if not tasks:
            return [InputPartition(None)]
        return [InputPartition(t) for t in tasks]

    def read(self, partition: InputPartition):
        if partition.value is None:
            return iter([])
        from lcr_etl_upgrade_spark.cdf_arrow import materialize_rows

        return iter(materialize_rows(self._path, partition.value))

    def commit(self, end: dict) -> None:
        pass


class DeltaCdfLiteDataSource(DataSource):
    """Python Data Source wrapper (register with
    ``spark.dataSource.register``)."""

    @classmethod
    def name(cls) -> str:
        return "delta_cdf_lite"

    def schema(self):
        from lcr_etl_upgrade_spark.cdf_arrow import change_schema

        if "path" not in self.options:
            raise ValueError("delta_cdf_lite requires .option('path', ...)")
        return change_schema(self.options["path"])

    def simpleStreamReader(self, schema):
        return _CdfSimpleReader(self.options)

    def streamReader(self, schema):
        # Spark picks this over simpleStreamReader when present: the
        # partition-planned reader distributes row materialization
        # across executors, one task per changed file
        return _CdfPartitionedReader(self.options)
