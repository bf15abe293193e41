"""Schema-conformance operators (reference SURVEY.md §2.3).

The reference conforms raw tables with a chain of per-column
``withColumnRenamed``/``withColumn`` calls (ingest.py:652-668) followed by a
final reordering select (ingest.py:758-760). Here the whole conformance is a
SINGLE projection: one Project node for Catalyst, one pass over the data,
column pruning visible to the scan — the shape you want when the input is
100 TB of parquet and the target schema needs 3 of 80 columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Audit constants mirror the reference's metadata enrichment
# (ingest.py:686-692, sync.py:97-105).
CREATED_BY = "ETL_PROCESS"
SOURCE_SYSTEM = "LeadCustodyRepository"
AUDIT_COLUMNS = (
    "ETL_CREATED_DATE",
    "ETL_LAST_UPDATE_DATE",
    "CREATED_BY",
    "TO_PROCESS",
    "EDW_EXTERNAL_SOURCE_SYSTEM",
)


def conform_columns(
    df: DataFrame,
    mapping: dict[str, str],
    target: list[tuple[str, str]],
) -> DataFrame:
    """Rename + add-missing-as-typed-null + reorder in one projection.

    ``mapping`` maps source names (matched case-insensitively, reference
    ingest.py:656-662) to target names; ``target`` is the ordered list of
    ``(column_name, spark_type_ddl)``. Source columns not in the target are
    dropped; target columns with no source arrive as typed nulls
    (ingest.py:664-668).
    """
    lower_to_actuals: dict[str, list[str]] = {}
    for c in df.columns:
        lower_to_actuals.setdefault(c.lower(), []).append(c)

    def resolve(name_lower: str) -> str | None:
        """Case-insensitive lookup; a REFERENCED collision ('Id' and 'ID'
        both present, e.g. from JSON ingestion) raises a precise error
        here instead of an opaque ambiguous-reference AnalysisException
        at select time. Unreferenced collisions stay harmless — those
        columns are dropped by the projection anyway."""
        actuals = lower_to_actuals.get(name_lower, [])
        if len(actuals) > 1:
            raise ValueError(
                f"cannot conform case-insensitively: source columns "
                f"{actuals} collide on {name_lower!r}"
            )
        return actuals[0] if actuals else None

    target_to_source: dict[str, str] = {}
    for src_lower, tgt in mapping.items():
        actual = resolve(src_lower.lower())
        if actual is not None:
            target_to_source[tgt] = actual
    # Unmapped source columns that already carry a target name pass through.
    for name, _ in target:
        if name not in target_to_source:
            actual = resolve(name.lower())
            if actual is not None:
                target_to_source[name] = actual

    # SQL-text projection: one selectExpr round-trip instead of 3 py4j
    # calls per column (~0.09 s -> ~0.03 s for the 101-column LEAD spec).
    from lcr_etl_upgrade_spark.functions.cleansing import quote_ident

    exprs: list[str] = []
    for name, dtype in target:
        src = target_to_source.get(name)
        if src is not None:
            exprs.append(
                f"CAST({quote_ident(src)} AS {dtype}) AS {quote_ident(name)}"
            )
        else:
            exprs.append(f"CAST(NULL AS {dtype}) AS {quote_ident(name)}")
    return df.selectExpr(*exprs)


def _as_of_col(as_of: str | None) -> Column:
    """The injectable 'now' as TIMESTAMP_NTZ in BOTH modes: the default
    used to be current_timestamp() (LTZ), so a replay run (pinned as_of)
    and a live run wrote DIFFERENT audit-column types to the same sink —
    appends then failed on schema mismatch and validate_schema's
    full-type check passed in one mode only. localtimestamp() is the NTZ
    wall-clock (identical instant under the UTC session session.py
    pins)."""
    return (
        F.lit(as_of).cast("timestamp_ntz")
        if as_of is not None
        else F.localtimestamp()
    )


def add_audit_columns(df: DataFrame, as_of: str | None = None) -> DataFrame:
    """P4 metadata enrichment (reference ingest.py:681-700).

    One consistent timestamp across both ETL date columns; ``as_of`` is
    injectable so pipelines are replayable/deterministic (the reference's
    wall-clock ``current_timestamp()`` is the default).
    """
    ts = _as_of_col(as_of)
    return df.withColumns(
        {
            "ETL_CREATED_DATE": ts,
            "ETL_LAST_UPDATE_DATE": ts,
            "CREATED_BY": F.lit(CREATED_BY),
            "TO_PROCESS": F.lit(True),
            "EDW_EXTERNAL_SOURCE_SYSTEM": F.lit(SOURCE_SYSTEM),
        }
    )


def validate_schema(df: DataFrame, target: T.StructType) -> None:
    """Presence + FULL type equality check (tightened vs the reference).

    The reference compares only type classes, so DecimalType(10,2) passes
    for DecimalType(38,0) (ingest.py:445-473 — noted as a deliberate
    tightening target in SURVEY.md §1.3). Raises ValueError listing every
    violation.
    """
    actual = {f.name: f.dataType for f in df.schema.fields}
    errors: list[str] = []
    for field in target.fields:
        if field.name not in actual:
            errors.append(f"missing column: {field.name}")
        elif actual[field.name] != field.dataType:
            errors.append(
                f"type mismatch for {field.name}: "
                f"expected {field.dataType.simpleString()}, "
                f"got {actual[field.name].simpleString()}"
            )
    if errors:
        raise ValueError("schema validation failed: " + "; ".join(errors))


def select_target(df: DataFrame, target: T.StructType) -> DataFrame:
    """P3 final projection: fix order, drop extras (ingest.py:758-760)."""
    return df.select(*[f.name for f in target.fields])
