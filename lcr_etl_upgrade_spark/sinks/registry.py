"""Sink abstraction (reference SURVEY.md §2.2, K1-K5).

The reference writes Delta (overwrite-with-schema, sync.py:112-114) and
Snowflake (append / truncate-then-append with name-based column mapping,
ingest.py:782-820). Neither connector ships in this environment, so the
registry exposes the same write *semantics* over local formats and gates
the connector-backed sinks behind import-tries:

- overwrite            == K1 (overwriteSchema=true semantics)
- append               == K2/K4 (name-based mapping = select target order first)
- truncate-then-append == K3 (emulated as overwrite of the new batch —
  identical end state without writing an empty frame first)
- single-file text     == K5 watermark write (coalesce(1))
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class Sink:
    """A named writer: format + mode + options, callable on a DataFrame."""

    fmt: str
    mode: str = "append"
    options: dict[str, str] = field(default_factory=dict)
    partition_by: tuple[str, ...] = ()
    zorder_by: tuple[str, ...] = ()   # K6 layout directive: cluster on
    zorder_files: int = 32            # the Morton curve before writing

    def __call__(self, df: DataFrame, path: str | None = None) -> None:
        if self.zorder_by:
            from lcr_etl_upgrade_spark.operators.layout import (
                optimize_layout,
            )

            df = optimize_layout(
                df, list(self.zorder_by), self.zorder_files
            )
        writer = df.write.format(self.fmt).mode(self.mode).options(**self.options)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        if path is None:
            writer.save()
        else:
            writer.save(path)


_REGISTRY: dict[str, Callable[..., Sink]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


@register("parquet_append")
def _parquet_append(**options) -> Sink:
    return Sink("parquet", "append", options)


@register("parquet_overwrite")
def _parquet_overwrite(**options) -> Sink:
    """K1: full overwrite incl. schema (parquet overwrite rewrites all)."""
    return Sink("parquet", "overwrite", options)


@register("parquet_truncate_load")
def _parquet_truncate(**options) -> Sink:
    """K3 truncate-then-load: end state == overwrite of the new batch."""
    return Sink("parquet", "overwrite", options)


@register("parquet_zorder")
def _parquet_zorder(**options) -> Sink:
    """K6 [EXT, r10]: overwrite write clustered on the Z-order curve of
    ``zorder_by`` (comma-separated) into ``zorder_files`` files —
    OPTIMIZE-at-write-time so footer stats prune on every listed column
    (operators/layout.py; quantile bucketing, skew-robust)."""
    cols = tuple(c for c in options.pop("zorder_by", "").split(",") if c)
    if not cols:
        raise ValueError("parquet_zorder requires zorder_by=<col,...>")
    n = int(options.pop("zorder_files", "32"))
    return Sink("parquet", "overwrite", options, zorder_by=cols,
                zorder_files=n)


@register("csv")
def _csv(**options) -> Sink:
    return Sink("csv", options.pop("mode", "overwrite"), {"header": "true", **options})


@register("json")
def _json(**options) -> Sink:
    return Sink("json", options.pop("mode", "overwrite"), options)


@register("orc_append")
def _orc_append(**options) -> Sink:
    return Sink("orc", "append", options)


@register("orc_overwrite")
def _orc_overwrite(**options) -> Sink:
    """K1 semantics over ORC (built-in columnar format, zlib default)."""
    return Sink("orc", "overwrite", options)


@register("avro_overwrite")
def _avro_overwrite(**options) -> Sink:
    """Avro write — the spark-avro module when on the classpath, else the
    container-format-native ``avro_lite`` writer (one container file per
    non-empty partition via foreachPartition; see sources.read_avro for
    the matching read path)."""
    return _AvroSink("avro", "overwrite", options)


class _AvroSink(Sink):
    def __call__(self, df: DataFrame, path: str | None = None) -> None:
        from lcr_etl_upgrade_spark.sources.registry import raise_if_missing_avro

        try:
            super().__call__(df, path)
        except Exception as exc:
            try:
                raise_if_missing_avro(exc)
            except NotImplementedError:
                from lcr_etl_upgrade_spark.avro_lite import write_avro_lite

                if path is None:
                    raise ValueError(
                        "avro-lite sink requires an explicit path"
                    ) from exc
                import shutil

                local = path.removeprefix("file:")
                if self.mode == "overwrite" and os.path.isdir(local):
                    shutil.rmtree(local)
                write_avro_lite(df, path)
                return
            raise


@register("noop")
def _noop(**options) -> Sink:
    """Benchmark sink: full materialization, no output."""
    return Sink("noop", "overwrite", options)


def _pop_partition_by(options: dict[str, str]) -> tuple[str, ...]:
    """``partition_by`` is a layout directive, not a datasource option —
    pop it on BOTH delta paths so delta-spark and delta_lite produce the
    same table layout from identical sink configs (it used to pass
    through as an ignored option on the delta-spark path)."""
    return tuple(p for p in options.pop("partition_by", "").split(",") if p)


@register("delta_overwrite")
def _delta_overwrite(**options) -> Sink:
    """K1 verbatim (overwriteSchema semantics, sync.py:112-114). Uses the
    delta-spark datasource when importable, else the protocol-native
    ``delta_lite`` writer (valid reader-v1/writer-v2 tables)."""
    part = _pop_partition_by(options)
    try:
        import delta  # noqa: F401
    except ImportError:
        return _DeltaLiteSink("overwrite", options, part)
    return Sink(
        "delta", "overwrite", {"overwriteSchema": "true", **options}, part
    )


@register("delta_append")
def _delta_append(**options) -> Sink:
    """K2/K4 semantics on a Delta table (name-mapped append)."""
    part = _pop_partition_by(options)
    try:
        import delta  # noqa: F401
    except ImportError:
        return _DeltaLiteSink("append", options, part)
    return Sink("delta", "append", options, part)


class _DeltaLiteSink(Sink):
    def __init__(
        self,
        mode: str,
        options: dict[str, str],
        partition_by: tuple[str, ...] = (),
    ):
        # delta-spark's mergeSchema write option, honored on this path
        # too so the SAME sink config evolves the schema under either
        # runtime (on the delta-spark path it stays in options and the
        # datasource handles it natively)
        self._merge_schema = (
            str(options.pop("mergeSchema", "")).lower() == "true"
        )
        super().__init__("delta-lite", mode, options, partition_by)

    def __call__(self, df: DataFrame, path: str | None = None) -> None:
        from lcr_etl_upgrade_spark.delta_lite import write_delta_lite

        if path is None:
            raise ValueError("delta-lite sink requires an explicit path")
        write_delta_lite(
            df,
            path,
            self.mode,
            self.partition_by,
            merge_schema=self._merge_schema,
        )


@register("jdbc_append")
def _jdbc_append(**options) -> Sink:
    """JDBC sink (needs a driver jar on the classpath, e.g. postgres)."""
    required = {"url", "dbtable"}
    if not required <= options.keys():  # pragma: no cover
        raise ValueError(f"jdbc sink requires options {sorted(required)}")
    return Sink("jdbc", "append", options)


def get_sink(name: str, **options) -> Sink:
    if name not in _REGISTRY:
        raise KeyError(f"unknown sink '{name}'; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**options)


def write(df: DataFrame, name: str, path: str | None = None, **options) -> None:
    get_sink(name, **options)(df, path)


def write_bucketed(
    df: DataFrame,
    table: str,
    num_buckets: int,
    bucket_cols: tuple[str, ...] | list[str],
    sort_cols: tuple[str, ...] | list[str] = (),
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table write — the storage-side lever for
    co-located joins at scale: two tables bucketed into the SAME bucket
    count on their join keys sort-merge-join with NO exchange on either
    side (pinned by tests/test_scale_layout.py). Spark's bucketBy only
    works through ``saveAsTable`` (the bucket spec lives in the catalog),
    hence a table name, not a path. ``sort_cols`` additionally pre-sorts
    within buckets so the SMJ skips its sort."""
    writer = df.write.format(fmt).mode(mode).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_single_text_file(df: DataFrame, path: str) -> None:
    """K5 watermark-file write: one value, one partition, one file
    (sync/ingest write a 1-row text file via coalesce(1), ingest.py:499-502).
    coalesce(1) is ONLY acceptable because the frame is known to be tiny."""
    df.coalesce(1).write.mode("overwrite").text(path)


def exactly_once_delta_sink(path: str, app_id: str):
    """foreachBatch factory for EXACTLY-ONCE streaming appends into a
    delta_lite table: each micro-batch commits with the protocol's
    setTransaction stamp ``(app_id, batch_id)``, so a batch replayed
    after a crash between the table commit and the stream checkpoint —
    the window at-least-once sinks duplicate in — is recognized by the
    table's own txn watermark and skipped without staging a byte.

        q = (stream.writeStream
             .foreachBatch(exactly_once_delta_sink(out_path, "my-app"))
             .option("checkpointLocation", ckpt).start())

    Composes with the ``delta_cdf_lite`` source into an end-to-end
    exactly-once delta->delta CDC pipeline (tests/test_delta_txn.py).
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        from lcr_etl_upgrade_spark.delta_lite import write_delta_lite

        write_delta_lite(
            df, path, mode="append", txn=(app_id, int(batch_id))
        )

    return write_batch
