"""Source abstraction (reference SURVEY.md §2.1, S1-S8).

The reference reads PostgreSQL over JDBC (fetchsize-tuned full-table scans,
sync.py:68-82), Delta (plain + JSON-safe variants, ingest.py:633-650), and
one-line text watermark files. Locally, parquet/CSV/JSON stand in for
Delta; the JDBC source keeps the reference's tuning and adds partitioned
reads (partitionColumn/lowerBound/upperBound/numPartitions) — a single
unpartitioned JDBC scan is the first thing that dies at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class JdbcSource:
    """S1: partitioned JDBC table scan with fetch tuning.

    The reference uses fetchsize=10000 and no partitioning (sync.py:74);
    here numPartitions splits the read across executors when a numeric
    partition column is declared.
    """

    url: str
    table: str
    properties: dict[str, str] = field(default_factory=dict)
    fetchsize: int = 10_000
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int | None = None

    def load(self, spark: SparkSession) -> DataFrame:
        if self.partition_column is not None and (
            self.lower_bound is None or self.upper_bound is None
        ):
            # str(None) would ship the literal string 'None' as the
            # bound and die in the JVM with a cryptic
            # NumberFormatException at load time
            raise ValueError(
                "partition_column requires lower_bound and upper_bound "
                f"(got {self.lower_bound!r}/{self.upper_bound!r})"
            )
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
            .option("fetchsize", str(self.fetchsize))
        )
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        if self.partition_column is not None:
            reader = (
                reader.option("partitionColumn", self.partition_column)
                .option("lowerBound", str(self.lower_bound))
                .option("upperBound", str(self.upper_bound))
                .option("numPartitions", str(self.num_partitions or 8))
            )
        return reader.load()

    def count_pushdown(self, spark: SparkSession) -> int:
        """S6: push COUNT(*) into the database (the reference does this
        driver-side via psycopg2, sync.py:45-55; a pushdown subquery keeps
        it in one connection stack)."""
        q = f"(SELECT COUNT(*) AS c FROM {self.table}) t"
        reader = (
            spark.read.format("jdbc").option("url", self.url).option("dbtable", q)
        )
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        row = reader.load().first()
        # column case depends on the database's identifier folding
        return int(row[0])

    def probe(self, spark: SparkSession, probe_query: str | None = None) -> bool:
        """Liveness probe before orchestration — the reference runs
        SELECT 1 and aborts the batch if it fails (sync.py:34-43).

        The default constant subquery works on engines that allow
        FROM-less SELECT (PostgreSQL, MySQL); pass ``probe_query`` for
        dialects with a dummy table (Derby/DB2: ``(SELECT 1 AS ok FROM
        SYSIBM.SYSDUMMY1) t``, Oracle: DUAL). Any exception => not live.
        """
        q = probe_query or "(SELECT 1 AS probe_ok) t"
        reader = (
            spark.read.format("jdbc").option("url", self.url).option("dbtable", q)
        )
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        try:
            return reader.load().first() is not None
        except Exception:  # noqa: BLE001 — any failure means "not live"
            return False


def read_parquet(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


CORRUPT_COL = "_corrupt_record"


def with_corrupt_capture(schema: T.StructType) -> T.StructType:
    """Append the PERMISSIVE-mode corrupt-record column to a declared
    schema: malformed rows land whole in ``_corrupt_record`` instead of
    being silently nulled — the error-tolerance upgrade SURVEY.md §4
    calls for over the reference's bare PERMISSIVE reads."""
    if CORRUPT_COL in [f.name for f in schema.fields]:
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    capture_corrupt: bool = False,
) -> DataFrame:
    """S8: CSV scan — schema declared, never inferred (the reference sets
    inferSchema=false everywhere, ingest.py:639,648).

    ``capture_corrupt=True`` adds ``_corrupt_record``: malformed lines
    arrive intact there for quarantine instead of vanishing."""
    if capture_corrupt and schema is None:
        # PERMISSIVE corrupt capture only exists relative to a DECLARED
        # schema; silently skipping it would drop the very quarantine the
        # caller asked for
        raise ValueError("capture_corrupt=True requires a declared schema")
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(
            with_corrupt_capture(schema) if capture_corrupt else schema
        )
    return reader.option("mode", "PERMISSIVE").csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    multi_line: bool = False,
    capture_corrupt: bool = False,
) -> DataFrame:
    """S3-flavored JSON-safe scan: PERMISSIVE + optional multiLine, the
    options the reference applies to its JSON-bearing table
    (ingest.py:633-643). ``capture_corrupt`` quarantines malformed
    records into ``_corrupt_record`` (see read_csv)."""
    if capture_corrupt and schema is None:
        # PERMISSIVE corrupt capture only exists relative to a DECLARED
        # schema; silently skipping it would drop the very quarantine the
        # caller asked for
        raise ValueError("capture_corrupt=True requires a declared schema")
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "multiLine", str(multi_line).lower()
    )
    if schema is not None:
        reader = reader.schema(
            with_corrupt_capture(schema) if capture_corrupt else schema
        )
    return reader.json(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """S8: ORC scan (built-in columnar format — vectorized reader,
    predicate pushdown and column pruning, same as parquet). Schema
    declared, never inferred, matching the registry's contract."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def raise_if_missing_avro(exc: Exception) -> None:
    """spark-avro is an external module (NOT bundled with pyspark, unlike
    ORC); its absence surfaces as an AnalysisException naming the missing
    datasource. Rewrap that one failure as the documented
    NotImplementedError seam — shared by read_avro and the avro sink so
    the match and the remedy text can't drift apart.

    The match is the SPECIFIC missing-datasource condition — the
    DATA_SOURCE_NOT_FOUND error class when the exception carries one,
    else Spark's exact "Failed to find the data source: avro" message —
    never a loose substring test, so an unrelated Avro failure whose text
    happens to contain 'find' is re-raised untouched instead of being
    masked with a misleading classpath remedy."""
    condition = None
    for probe in ("getCondition", "getErrorClass"):
        getter = getattr(exc, probe, None)
        if callable(getter):
            try:
                condition = getter()
            except Exception:
                condition = None
            if condition:
                break
    msg = str(exc).lower()
    is_missing_datasource = (
        condition == "DATA_SOURCE_NOT_FOUND"
        or "failed to find the data source: avro" in msg
        or "failed to find data source: avro" in msg  # pre-3.5 wording
    )
    if is_missing_datasource and "avro" in msg:
        raise NotImplementedError(
            "spark-avro is not on the classpath; add "
            "org.apache.spark:spark-avro_2.13 via spark.jars.packages"
        ) from exc


def read_avro(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """S8: Avro scan. Uses the spark-avro datasource when it is on the
    classpath; when the specific missing-datasource condition fires, the
    protocol-native ``avro_lite`` reader (public container-file spec,
    binaryFile + mapInPandas decode) carries the runtime path — slower
    per row than the JVM datasource (its error messages say so) but
    executable and tested here. Any OTHER Avro failure is re-raised
    untouched. An explicit ``schema`` applies a post-read cast/projection
    on the lite path (the writer schema still drives the decode)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.format("avro").load(path)
    except Exception as exc:  # AnalysisException: failed to find data source
        try:
            raise_if_missing_avro(exc)
        except NotImplementedError:
            from lcr_etl_upgrade_spark.avro_lite import read_avro_lite

            df = read_avro_lite(spark, path)
            if schema is not None:
                df = df.select(
                    *[F.col(f.name).cast(f.dataType) for f in schema.fields]
                )
            return df
        raise


def read_text_documents(
    spark: SparkSession, path: str, whole_file: bool = True
) -> DataFrame:
    """LLM-corpus text ingestion: ``whole_file=True`` reads ONE ROW PER
    FILE (wholetext — a document corpus laid out as one file per doc),
    else one row per line. Adds the source file URI as ``doc_path`` so
    documents stay identifiable after unions/repartitions. NOTE:
    input_file_name() yields a scheme-prefixed, percent-encoded URI
    (``file:/.../my%20doc.txt``) — stable as a grouping/join key within
    the corpus, but unquote it before handing it to filesystem APIs or
    joining against raw-path manifests (url_decode's form-encoding
    semantics would corrupt literal ``+``; use urllib.parse.unquote).

    At 100 TB the one-row-per-file shape is driven by file count, not
    bytes: each file must fit in one task's memory (the same bounded-
    document contract the dedup operators state); shard oversized docs
    upstream."""
    return (
        spark.read.text(path, wholetext=whole_file)
        .select(
            F.input_file_name().alias("doc_path"),
            F.col("value").alias("text"),
        )
    )


def read_delta(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    prune: dict[str, tuple] | None = None,
    timestamp=None,
) -> DataFrame:
    """S2: Delta scan (reference reads Delta RAW, ingest.py:644-650).

    Uses the delta-spark datasource when importable; otherwise falls back
    to the protocol-native log-replay reader (``delta_lite`` — public
    PROTOCOL.md semantics over plain parquet scans, incl. time travel
    via ``version`` or ``timestamp``), so the Delta runtime path
    executes here even though the package cannot be installed in this
    container.

    ``prune`` (log-level data skipping on per-file stats, see
    ``read_delta_lite``) is a delta_lite-path optimization: on the
    delta-spark path the datasource performs its own stats skipping
    from the pushed-down predicate, so the hint is simply ignored
    there — callers always apply the real filter either way.

    ``timestamp`` (TIMESTAMP AS OF) accepts epoch milliseconds
    (int/float), a datetime (naive = UTC), or an ISO-8601 string
    (naive = UTC) and is NORMALIZED HERE, once, before dispatch: the
    two runtimes natively accept different spellings (delta_lite takes
    epoch-ms/ISO-as-UTC; delta-spark parses option("timestampAsOf") as
    a session-timezone timestamp STRING and rejects epoch-ms), so
    without this the same call could resolve different snapshots — or
    error — depending on which runtime is importable. delta_lite gets
    the instant as epoch-ms; delta-spark gets it rendered in the
    session timezone."""
    try:
        import delta  # noqa: F401
    except ImportError:
        from lcr_etl_upgrade_spark.delta_lite import read_delta_lite

        ts_ms = (
            None
            if timestamp is None
            else _timestamp_as_of_epoch_ms(timestamp)
        )
        return read_delta_lite(
            spark, path, version, prune=prune, timestamp=ts_ms
        )
    reader = spark.read.format("delta").option("inferSchema", "false")
    if version is not None:
        reader = reader.option("versionAsOf", str(version))
    if timestamp is not None:
        reader = reader.option(
            "timestampAsOf",
            _timestamp_as_of_session_str(spark, timestamp),
        )
    return reader.load(path)


def _timestamp_as_of_epoch_ms(timestamp) -> int:
    """Canonicalize a TIMESTAMP AS OF input (epoch-ms int/float,
    datetime, ISO-8601 string; naive forms are UTC) to one instant as
    epoch milliseconds."""
    import datetime as _dt

    ts = (
        _dt.datetime.fromisoformat(timestamp)
        if isinstance(timestamp, str)
        else timestamp
    )
    if isinstance(ts, _dt.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return int(ts.timestamp() * 1000)
    return int(ts)


def _timestamp_as_of_session_str(spark: SparkSession, timestamp) -> str:
    """Render the same instant as the 'yyyy-MM-dd HH:mm:ss.SSS' string
    delta-spark will parse in the SESSION timezone — so both runtimes
    resolve the identical snapshot for any accepted input form."""
    import datetime as _dt
    from zoneinfo import ZoneInfo

    ms = _timestamp_as_of_epoch_ms(timestamp)
    tz = ZoneInfo(spark.conf.get("spark.sql.session.timeZone", "UTC"))
    local = _dt.datetime.fromtimestamp(ms / 1000.0, tz)
    return local.strftime("%Y-%m-%d %H:%M:%S.") + f"{ms % 1000:03d}"


def read_watermark_text(spark: SparkSession, path: str) -> str | None:
    """S4: one-line text scan (ingest.py:481-483)."""
    row = spark.read.text(path).first()
    return row[0] if row is not None else None
