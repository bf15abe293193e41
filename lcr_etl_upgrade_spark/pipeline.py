"""Config-driven table pipeline runner.

Generalizes the reference's hard-coded three-table flow (ingest.py:41-388,
process_table at ingest.py:702-832) into a declarative registry:

    TableSpec(name, mapping, target_schema, json_columns,
              boolean_string_columns, cap_future_columns) ->
    run_pipeline(spark, raw_df, spec, sink, as_of=...)

Stage order mirrors the reference lifecycle (SURVEY.md §3.2):
conform (rename/add-missing as ONE projection) -> cleanse/coerce ->
future-cap -> audit enrichment -> final projection -> residual scrub ->
validate -> sink.

Scale decisions vs the reference:
- audit row-counts ride the write job via Dataset.observe() — the
  reference recomputes the whole lineage for each of its 3-4 count()
  actions per table (ingest.py:715,720,727,812);
- every per-column loop is folded into single select() projections;
- wall-clock points take an injectable ``as_of`` so runs are replayable
  and oracle-comparable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lcr_etl_upgrade_spark.operators.cleanse import cleanse_to_schema
from lcr_etl_upgrade_spark.operators.conform import (
    AUDIT_COLUMNS,
    conform_columns,
    validate_schema,
)


@dataclass
class TableSpec:
    """Declarative description of one conformed table (the generalization
    of the reference's schema dict ingest.py:58-231 + mapping dict
    ingest.py:234-383 + special-case column sets ingest.py:51-55,386-388,
    733-748)."""

    name: str
    mapping: dict[str, str]
    target_schema: T.StructType
    json_columns: set[str] = field(default_factory=set)
    boolean_string_columns: set[str] = field(default_factory=set)
    cap_future_columns: tuple[str, ...] = ()

    def target_ddl(self) -> list[tuple[str, str]]:
        return [
            (f.name, f.dataType.simpleString()) for f in self.target_schema.fields
        ]


@dataclass
class PipelineResult:
    table: str
    rows_in: int
    rows_out: int


def transform_table(
    raw: DataFrame, spec: TableSpec, as_of: str | None = None, fuzzy: bool = True
) -> DataFrame:
    """The pure transform: raw source frame -> conformed, cleansed,
    enriched, validated frame (no actions triggered)."""
    conformed = conform_columns(
        raw,
        spec.mapping,
        [
            (f.name, "string")
            for f in spec.target_schema.fields
            if f.name not in AUDIT_COLUMNS
        ],
    )
    cleansed = cleanse_to_schema(
        conformed,
        T.StructType(
            [
                f
                for f in spec.target_schema.fields
                if f.name not in AUDIT_COLUMNS
            ]
        ),
        json_columns=spec.json_columns,
        boolean_string_columns=spec.boolean_string_columns,
        as_of=as_of,
        fuzzy=fuzzy,
    )
    # Future-cap (F5), audit enrichment (P4, dtype-aligned) and the final
    # ordered projection (P3) folded into ONE selectExpr: each chained
    # DataFrame op re-runs the analyzer over the whole accumulated plan
    # (~0.04-0.07 s per op at 101 columns, measured r13), and the audit
    # values are constants — semantics identical to cap_future_timestamps
    # + add_audit_columns + the dtype-align withColumns + select_target,
    # which remain the standalone operators for non-TableSpec callers.
    from lcr_etl_upgrade_spark.operators.cleanse import as_of_sql
    from lcr_etl_upgrade_spark.operators.conform import CREATED_BY, SOURCE_SYSTEM
    from lcr_etl_upgrade_spark.functions.cleansing import quote_ident

    aof = as_of_sql(as_of)
    cleansed_ddl = {f.name: f.dataType.simpleString() for f in cleansed.schema.fields}
    audit_sql = {
        "ETL_CREATED_DATE": aof,
        "ETL_LAST_UPDATE_DATE": aof,
        "CREATED_BY": f"'{CREATED_BY}'",
        "TO_PROCESS": "true",
        "EDW_EXTERNAL_SOURCE_SYSTEM": f"'{SOURCE_SYSTEM}'",
    }
    exprs: list[str] = []
    for f in spec.target_schema.fields:
        n = quote_ident(f.name)
        if f.name in AUDIT_COLUMNS:
            exprs.append(
                f"CAST({audit_sql[f.name]} AS {f.dataType.simpleString()}) AS {n}"
            )
        elif f.name in spec.cap_future_columns:
            exprs.append(
                f"(CASE WHEN {n} > {aof} THEN CAST({aof} AS "
                f"{cleansed_ddl[f.name]}) ELSE {n} END) AS {n}"
            )
        else:
            exprs.append(n)
    final = cleansed.selectExpr(*exprs)
    # NOTE: no scrub_residual_garbage stage here — on columns already
    # CAST to timestamp types its predicate is a provable no-op (a
    # rendered timestamp contains only the characters the residue regex
    # strips), so the F4 semantics live where they can fire: scrub_expr
    # inside timestamp_expr on the raw STRINGS, plus the standalone
    # scrub_residual_garbage operator for string-typed staging columns
    # (the reference applied F4 pre-cast, ingest.py:765-778).
    validate_schema(final, spec.target_schema)
    return final


def run_pipeline(
    spark: SparkSession,
    raw: DataFrame,
    spec: TableSpec,
    sink,
    as_of: str | None = None,
    fuzzy: bool = True,
) -> PipelineResult:
    """Transform + write, with audit counts observed on the single write
    pass (one full computation per table, not four)."""
    final = transform_table(raw, spec, as_of=as_of, fuzzy=fuzzy)
    obs = Observation(f"audit_{spec.name}")
    observed = final.observe(obs, F.count(F.lit(1)).alias("rows_out"))
    sink(observed)
    rows_out = int(obs.get["rows_out"])
    # Conformance is projection-only, so rows_in == rows_out by construction
    # (the reference re-counts to assert this, ingest.py:721-722).
    return PipelineResult(spec.name, rows_out, rows_out)
