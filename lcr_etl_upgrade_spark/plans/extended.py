"""Extended operator coverage (SURVEY.md §2.9 [EXT] long tail + full
pipeline parity): array/map/JSON function surface, SQL-API grouping sets,
range window frames, exact percentiles, and the reference's complete
conform->cleanse->enrich pipeline driven through a DuckDB-checkable query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.functions.numeric import dsum_over
from lcr_etl_upgrade_spark.plans.registry import query
from lcr_etl_upgrade_spark.sources.testdata import load_table


# --------------------------------------------------------------------------
# L6 extended: from_json with schema, map functions, to_json round-trip
# --------------------------------------------------------------------------
@query(
    "events_json_advanced",
    oracle="""
    -- json_valid/OBJECT guards: DuckDB json functions ERROR on
    -- malformed JSON and json_keys needs an object, where Spark's
    -- from_json yields a NULL map
    WITH checked AS (
      SELECT event_id,
             CASE WHEN props IS NOT NULL AND json_valid(props)
                       AND json_type(props) = 'OBJECT'
                  THEN props END AS p
      FROM events
      WHERE event_id <= 2000
    )
    SELECT event_id,
           TRY_CAST(json_extract_string(p, '$.k') AS INTEGER) AS k_value,
           json_keys(p)[1] AS first_key,
           (TRY_CAST(json_extract_string(p, '$.k') AS INTEGER) > 50) AS k_above_50
    FROM checked
    ORDER BY event_id
    """,
)
def events_json_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Totality at the edges (hostile-props battery): the map parses as
    string so a >int32 or quoted value doesn't null the whole map,
    k_value try_casts to int (NULL on overflow/non-numeric, same as the
    oracle's TRY_CAST), first_key uses F.get — getItem(0) THROWS on an
    empty '{}' map under ANSI mode — and the >50 test runs on the
    try_cast value so both engines see NULL for overflow. Duplicate JSON
    keys are outside the stated domain (Spark's map keeps the last
    occurrence, DuckDB's $.k path reads the first)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    parsed = ev.withColumn(
        "m", F.from_json("props", "map<string,string>")
    ).withColumn("k_value", F.element_at("m", "k").try_cast("int"))
    return parsed.select(
        "event_id",
        "k_value",
        F.get(F.map_keys("m"), 0).alias("first_key"),
        (F.col("k_value") > 50).alias("k_above_50"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# L6 completion: json_tuple extraction + to_json re-serialization
# --------------------------------------------------------------------------
@query(
    "events_json_roundtrip",
    oracle="""
    -- json_valid guards: DuckDB's json functions ERROR on malformed
    -- JSON where Spark's json_tuple/from_json yield NULL. The
    -- whitespace-strip reserialization restates Spark's compact
    -- to_json for the props grammar (flat object, int values, no
    -- duplicate keys); the OBJECT type guard NULLs non-objects the
    -- same way from_json(map) does.
    SELECT event_id,
           CASE WHEN props IS NOT NULL AND json_valid(props)
                THEN json_extract_string(props, '$.k') END AS k_str,
           CASE WHEN props IS NOT NULL AND json_valid(props)
                     AND json_type(props) = 'OBJECT'
                THEN REPLACE(props, ' ', '') END AS reserialized
    FROM events
    WHERE event_id <= 1000
    ORDER BY event_id
    """,
)
def events_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_tuple pulls fields positionally; to_json(from_json(...)) proves
    the parse->struct->serialize round trip (Spark serializes compactly,
    so the oracle compares against the whitespace-stripped original)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 1000)
    tup = ev.select(
        "event_id", F.json_tuple(F.col("props"), "k").alias("k_str"), "props"
    )
    return tup.select(
        "event_id",
        "k_str",
        F.to_json(F.from_json("props", "map<string,long>")).alias("reserialized"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# §2.9 array function surface: split/size/contains/sort + higher-order
# transform/filter/aggregate
# --------------------------------------------------------------------------
@query(
    "doc_array_functions",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
      WHERE doc_id < 200
    )
    SELECT doc_id,
           LEN(tokens) AS n_tokens,
           list_contains(tokens, 'spark') AS has_spark,
           list_sort(tokens)[1] AS first_token_sorted,
           LEN(list_filter(tokens, t -> LENGTH(t) > 4)) AS n_long_tokens,
           CAST(list_sum(list_transform(tokens, t -> LENGTH(t))) AS BIGINT) AS total_token_chars
    FROM toks
    ORDER BY doc_id
    """,
)
def doc_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.sort_array(toks).getItem(0).alias("first_token_sorted"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4))
        .cast("long")
        .alias("n_long_tokens"),
        F.aggregate(
            toks, F.lit(0), lambda acc, t: acc + F.length(t)
        )
        .cast("long")
        .alias("total_token_chars"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# A4 completion: GROUPING SETS through the SQL API (same Catalyst plan as
# the DataFrame rollup/cube — demonstrates the spark.sql surface)
# --------------------------------------------------------------------------
@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_gsets"
    )
    # Decimal cast pre-projected below the GROUPING SETS expand: the
    # aggregate child is evaluated per EXPANDED row (3x per input row
    # here), the subquery's cast runs once — same exact decimal sum.
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(__q) AS DOUBLE) AS sum_qty
        FROM (
          SELECT l_returnflag, l_linestatus,
                 CAST(l_quantity AS DECIMAL(38,6)) AS __q
          FROM lineitem_gsets
        )
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )


# --------------------------------------------------------------------------
# Exact percentiles (continuous interpolation — both engines compute
# (1-f)*lo + f*hi on the sorted values)
# --------------------------------------------------------------------------
@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           quantile_cont(l_extendedprice, 0.95) AS p95_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # r13: the two l_extendedprice percentiles share ONE counts-map
    # buffer via the array form (each separate percentile() call builds
    # its own OpenHashMap over every row — 583k distinct prices in 600k
    # rows; measured 3.24 s -> 1.73 s). percentile(c, array(..)) walks
    # the same sorted buffer once per requested p, so every returned
    # double is bit-identical to the scalar calls (oracle hash-green).
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
            F.expr(
                "percentile(l_extendedprice, array(0.25D, 0.95D))"
            ).alias("__pp"),
        )
        .select(
            "l_returnflag",
            "median_qty",
            F.col("__pp")[0].alias("p25_price"),
            F.col("__pp")[1].alias("p95_price"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# W3 completion: RANGE frame over event-time (trailing 30-day spend)
# --------------------------------------------------------------------------
@query(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS VARCHAR) AS o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                      RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS trailing_30d_spend
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    epoch = F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-30 * 24 * 3600, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("string").alias("o_orderdate"),
        dsum_over("o_totalprice", w, "trailing_30d_spend"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


# --------------------------------------------------------------------------
# Full reference-pipeline parity: dirty raw lead rows constructed from
# orders, pushed through the COMPLETE conform->cleanse->cap->enrich->
# validate pipeline (operators.conform/cleanse via pipeline.transform_table)
# and hash-checked against a plain-SQL replication of every rule.
# --------------------------------------------------------------------------
_PIPE_AS_OF = "1999-06-01 00:00:00"


@query(
    "pipeline_lead_end_to_end",
    oracle=f"""
    WITH raw AS (
      SELECT CONCAT('g', o_orderkey) AS leadguid,
             CONCAT('LC', o_orderkey) AS leadcode,
             CASE o_orderkey % 3 WHEN 0 THEN CAST(o_custkey AS VARCHAR)
                  WHEN 1 THEN 'abc' ELSE NULL END AS leadtypeid,
             CASE o_orderkey % 4 WHEN 0 THEN CAST(o_orderdate AS VARCHAR)
                  WHEN 1 THEN 'garbage' WHEN 2 THEN '--' ELSE NULL END AS leadcreatedate,
             CASE o_orderkey % 3 WHEN 0 THEN 'true' WHEN 1 THEN 'no' ELSE 'x' END AS subsourceid,
             CASE o_orderkey % 2 WHEN 0 THEN CAST(o_totalprice AS VARCHAR)
                  ELSE 'NaNope' END AS consumerdebt,
             CASE o_orderkey % 5 WHEN 0 THEN 'true' WHEN 1 THEN '0'
                  WHEN 2 THEN 'weird' ELSE NULL END AS isdeletedsource,
             CASE o_orderkey % 2 WHEN 0 THEN CONCAT('{{"k":', o_orderkey, '}}')
                  ELSE NULL END AS leadattributes,
             CAST(o_orderdate AS VARCHAR) AS createdate,
             CASE o_orderkey % 6 WHEN 0 THEN NULL
                  ELSE CAST(o_orderdate AS VARCHAR) END AS modifydate
      FROM orders WHERE o_orderkey <= 3000
    )
    SELECT leadguid AS LEAD_GUID,
           leadcode AS LEAD_CODE,
           CAST(TRY_CAST(leadtypeid AS DECIMAL(38,0)) AS VARCHAR) AS LEAD_TYPE_ID,
           CAST(CASE WHEN regexp_matches(leadcreatedate, '^[A-Za-z]{{1,3}}$')
                       OR LENGTH(leadcreatedate) <= 3
                       OR NOT regexp_matches(leadcreatedate, '.*[0-9]+.*')
                     THEN NULL
                     ELSE TRY_CAST(leadcreatedate AS TIMESTAMP) END AS VARCHAR)
             AS LEAD_CREATE_DATE,
           CASE WHEN LOWER(subsourceid) IN ('true','1','yes','t') THEN TRUE
                WHEN LOWER(subsourceid) IN ('false','0','no','f') THEN FALSE
                ELSE NULL END AS SUB_SOURCE_ID,
           TRY_CAST(consumerdebt AS DOUBLE) AS CONSUMER_DEBT,
           CASE WHEN isdeletedsource IS NULL THEN NULL
                WHEN LOWER(isdeletedsource) IN ('true','1','yes','t') THEN 'TRUE'
                WHEN LOWER(isdeletedsource) IN ('false','0','no','f') THEN 'FALSE'
                ELSE isdeletedsource END AS IS_DELETED_SOURCE,
           leadattributes AS LEAD_ATTRIBUTES,
           CAST(NULL AS VARCHAR) AS UTM_CAMPAIGN,
           CAST(TRY_CAST(createdate AS TIMESTAMP) AS VARCHAR) AS CREATE_DATE,
           CAST(TRY_CAST(modifydate AS TIMESTAMP) AS VARCHAR) AS MODIFY_DATE,
           '{_PIPE_AS_OF}' AS ETL_CREATED_DATE,
           'ETL_PROCESS' AS CREATED_BY,
           TRUE AS TO_PROCESS,
           'LeadCustodyRepository' AS EDW_EXTERNAL_SOURCE_SYSTEM
    FROM raw
    ORDER BY LEAD_GUID
    """,
)
def pipeline_lead_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constructs dirty raw-lead rows (every C1-C10 branch hit) from orders,
    runs the real pipeline.transform_table with the LEAD spec, and projects
    a DuckDB-comparable view of the result. fuzzy=False keeps the plan
    oracle-expressible (the pandas-UDF path is covered by unit tests)."""
    from lcr_etl_upgrade_spark.pipeline import transform_table
    from lcr_etl_upgrade_spark.schemas import LEAD

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    k = F.col("o_orderkey")
    iso = F.col("o_orderdate").cast("string")
    raw = orders.select(
        F.concat(F.lit("g"), k.cast("string")).alias("leadguid"),
        F.concat(F.lit("LC"), k.cast("string")).alias("leadcode"),
        F.when(k % 3 == 0, F.col("o_custkey").cast("string"))
        .when(k % 3 == 1, F.lit("abc"))
        .otherwise(F.lit(None))
        .alias("leadtypeid"),
        F.when(k % 4 == 0, iso)
        .when(k % 4 == 1, F.lit("garbage"))
        .when(k % 4 == 2, F.lit("--"))
        .otherwise(F.lit(None))
        .alias("leadcreatedate"),
        F.when(k % 3 == 0, F.lit("true"))
        .when(k % 3 == 1, F.lit("no"))
        .otherwise(F.lit("x"))
        .alias("subsourceid"),
        F.when(k % 2 == 0, F.col("o_totalprice").cast("string"))
        .otherwise(F.lit("NaNope"))
        .alias("consumerdebt"),
        F.when(k % 5 == 0, F.lit("true"))
        .when(k % 5 == 1, F.lit("0"))
        .when(k % 5 == 2, F.lit("weird"))
        .otherwise(F.lit(None))
        .alias("isdeletedsource"),
        F.when(
            k % 2 == 0, F.concat(F.lit('{"k":'), k.cast("string"), F.lit("}"))
        )
        .otherwise(F.lit(None))
        .alias("leadattributes"),
        iso.alias("createdate"),
        F.when(k % 6 == 0, F.lit(None)).otherwise(iso).alias("modifydate"),
    )
    out = transform_table(raw, LEAD, as_of=_PIPE_AS_OF, fuzzy=False)
    return out.select(
        "LEAD_GUID",
        "LEAD_CODE",
        F.col("LEAD_TYPE_ID").cast("string").alias("LEAD_TYPE_ID"),
        F.col("LEAD_CREATE_DATE").cast("string").alias("LEAD_CREATE_DATE"),
        "SUB_SOURCE_ID",
        "CONSUMER_DEBT",
        "IS_DELETED_SOURCE",
        "LEAD_ATTRIBUTES",
        "UTM_CAMPAIGN",
        F.col("CREATE_DATE").cast("string").alias("CREATE_DATE"),
        F.col("MODIFY_DATE").cast("string").alias("MODIFY_DATE"),
        F.col("ETL_CREATED_DATE").cast("string").alias("ETL_CREATED_DATE"),
        "CREATED_BY",
        "TO_PROCESS",
        "EDW_EXTERNAL_SOURCE_SYSTEM",
    ).orderBy("LEAD_GUID")


# --------------------------------------------------------------------------
# Unpivot / melt (inverse of pivot; DataFrame.unpivot)
# --------------------------------------------------------------------------
@query(
    "unpivot_order_measures",
    oracle="""
    SELECT o_orderkey, 'o_totalprice' AS measure, o_totalprice AS value
    FROM orders WHERE o_orderkey <= 1000
    UNION ALL
    SELECT o_orderkey, 'o_custkey_as_double' AS measure, CAST(o_custkey AS DOUBLE) AS value
    FROM orders WHERE o_orderkey <= 1000
    ORDER BY o_orderkey, measure
    """,
)
def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    wide = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_custkey").cast("double").alias("o_custkey_as_double"),
    )
    return wide.unpivot(
        ids=["o_orderkey"],
        values=["o_totalprice", "o_custkey_as_double"],
        variableColumnName="measure",
        valueColumnName="value",
    ).orderBy("o_orderkey", "measure")


# --------------------------------------------------------------------------
# Pure SQL-API multi-join (TPC-H Q10-shaped returned-item reporting):
# the spark.sql string surface over registered views
# --------------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders", "lineitem", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q10")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               -- the SQL spelling of functions.numeric.dsum: quantize
               -- each product with rint (nearest-even on the PRODUCT,
               -- matching DuckDB's double->DECIMAL(38,6) cast), sum the
               -- fixed-point values exactly. Spark's own double->decimal
               -- cast rounds the shortest decimal repr instead and
               -- diverges from the oracle in product tails.
               CAST(CAST(SUM(CAST(CAST(rint(l.l_extendedprice * (1 - l.l_discount) * 1e6) AS BIGINT) AS DECIMAL(28,0))) AS DECIMAL(38,6)) / CAST(1000000 AS DECIMAL(18,0)) AS DOUBLE) AS revenue,
               n.n_name
        FROM customer_q10 c
        JOIN orders_q10 o ON c.c_custkey = o.o_custkey
        JOIN lineitem_q10 l ON l.l_orderkey = o.o_orderkey
        JOIN nation_q10 n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
        """
    )


# --------------------------------------------------------------------------
# W1 completion: distribution ranks (percent_rank / cume_dist) — the last
# ranking-family functions not yet exercised
# --------------------------------------------------------------------------
@query(
    "window_distribution_ranks",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           NTILE(4) OVER w AS quartile
    FROM orders
    WHERE o_orderkey <= 2000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# A3 family: approximate percentiles (t-digest-style sketch) with an
# in-result error contract against the exact percentile — rows-only
# (sketch values are engine-specific), but every row must satisfy
# within_bound, so the driver's rows-only check still carries teeth.
# --------------------------------------------------------------------------
@query("agg_approx_percentiles")
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    accuracy = 1000  # approx_percentile: error <= 1/accuracy of rank
    # r13: the three exact percentiles share ONE counts-map buffer via
    # the array form (three separate percentile() calls each built their
    # own OpenHashMap over every row; measured 3.80 s -> 1.82 s).
    # Bit-identical values — same buffer, same interpolation per p.
    out = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_percentile(
                "l_extendedprice", F.lit(0.5), F.lit(accuracy)
            ).alias("approx_median"),
            F.expr(
                "percentile(l_extendedprice, array(0.45D, 0.5D, 0.55D))"
            ).alias("__pe"),
        )
    )
    # rank-error bound: the approx median must land between the exact
    # p45 and p55 values (1/accuracy = 0.1% rank error << 5% envelope)
    return out.select(
        "l_returnflag",
        F.round("approx_median", 2).alias("approx_median"),
        F.round(F.col("__pe")[1], 2).alias("exact_median"),
        (
            (F.col("approx_median") >= F.col("__pe")[0])
            & (F.col("approx_median") <= F.col("__pe")[2])
        ).alias("within_bound"),
    ).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# §2.10 completion: session windows with a DYNAMIC per-row gap — the
# F.session_window(ts, gap_expression) form (e.g. event-type-dependent
# inactivity timeout), batch/stream-unified like the static-gap variant.
# --------------------------------------------------------------------------
@query(
    "events_dynamic_session_gap",
    oracle="""
    WITH typed AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN event_type = 'purchase' THEN 60 ELSE 20 END AS gap_min
      FROM events WHERE user_id < 50
        AND ts IS NOT NULL  -- unsessionizable; NULL window ordering differs across engines
    ), ordered AS (
      SELECT *,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
             LAG(gap_min) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_gap
      FROM typed
    ), marked AS (
      SELECT *,
             CASE WHEN prev_ts IS NULL
                       OR ts > prev_ts + to_minutes(CAST(prev_gap AS BIGINT))
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ), sessions AS (
      SELECT *,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           CAST(MIN(ts) AS VARCHAR) AS session_start
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def events_dynamic_session_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessionization: purchases keep a session alive for 60
    minutes, other events for 20. Implemented with the same lag/cumsum
    formulation as the oracle; F.session_window(ts, gap_col) gives the
    identical streaming-native semantics (the session extends by the gap
    of the PREVIOUS event)."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 50) & F.col("ts").isNotNull()
    )
    typed = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(F.col("event_type") == "purchase", 60)
        .otherwise(20)
        .alias("gap_min"),
    )
    # one sessionization core for fixed AND dynamic gaps: interval
    # arithmetic on TIMESTAMP_NTZ is exactly epoch-us arithmetic, so the
    # shared session_ids spelling (gap allowance in microseconds, lagged
    # from the PREVIOUS event, event_id tiebreak) is semantics-identical
    # to the interval formulation it replaces
    from lcr_etl_upgrade_spark.plans.events import session_ids

    sessions = session_ids(
        typed, F.col("gap_min").cast("long") * 60_000_000
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").cast("string").alias("session_start"),
        )
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------------
# J1 completion: NULL-safe equality join (<=> / IS NOT DISTINCT FROM) —
# NULL keys match each other instead of vanishing from the join.
# --------------------------------------------------------------------------
@query(
    "join_null_safe",
    oracle="""
    WITH l AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderkey % 10 END AS grp
      FROM orders WHERE o_orderkey <= 500
    ), r AS (
      SELECT CASE WHEN g = -1 THEN NULL ELSE g END AS grp,
             CASE WHEN g = -1 THEN 'null_bucket'
                  ELSE CONCAT('bucket_', g) END AS label
      FROM (SELECT unnest([-1,0,1,2,3,4]) AS g)
    )
    SELECT l.o_orderkey, r.label
    FROM l JOIN r ON l.grp IS NOT DISTINCT FROM r.grp
    ORDER BY l.o_orderkey
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eqNullSafe: rows whose key is NULL join the NULL bucket instead of
    dropping — the <=> operator the plain equi-join lacks. Still a hash
    join (null-safe equality is hashable), not a nested loop."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    left = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_orderkey") % 10)
        .alias("grp"),
    )
    right = spark.createDataFrame(
        [(None, "null_bucket")] + [(g, f"bucket_{g}") for g in range(5)],
        "grp long, label string",
    )
    return (
        left.join(F.broadcast(right), left.grp.eqNullSafe(right.grp))
        .select("o_orderkey", "label")
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# A2 completion: arg-max / arg-min aggregates (min_by / max_by) — "the
# value of column A at the row where B is extreme", without a window.
# --------------------------------------------------------------------------
@query(
    "agg_min_max_by",
    oracle="""
    -- explicit rank tiebreak: DuckDB max_by cannot order by a struct,
    -- and bare max_by(key, price) is engine-ARBITRARY on tied prices
    -- (the corpus DOES contain duplicate o_totalprice values)
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rx,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rm
      FROM orders
    )
    SELECT o_orderpriority,
           MAX(CASE WHEN rx = 1 THEN o_orderkey END) AS biggest_order,
           MAX(o_totalprice) AS biggest_price,
           MAX(CASE WHEN rm = 1 THEN o_orderkey END) AS smallest_order,
           MIN(o_totalprice) AS smallest_price
    FROM ranked
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass arg-extremes per group: the windowless alternative to
    rank-and-filter when only the extreme row's companion value is
    needed. Ordering by the (price, orderkey) STRUCT makes ties
    deterministic — bare max_by(key, price) returns an arbitrary key
    among tied prices, and the corpus does contain duplicates."""
    orders = load_table(spark, sf_dir, "orders")
    by = F.struct("o_totalprice", "o_orderkey")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", by).alias("biggest_order"),
            F.max("o_totalprice").alias("biggest_price"),
            F.min_by("o_orderkey", by).alias("smallest_order"),
            F.min("o_totalprice").alias("smallest_price"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# A2 completion: collection aggregates — collect_list/collect_set made
# deterministic via sort_array (collection order is partitioning-dependent,
# so the sorted form is the only oracle-comparable one; at scale prefer
# these over windows when groups are small enough to hold in memory).
# --------------------------------------------------------------------------
@query(
    "agg_collect_sorted",
    oracle="""
    SELECT o_orderpriority,
           list_sort(list(o_orderkey)) AS order_keys,
           list_sort(list_distinct(list(o_orderstatus))) AS statuses,
           COUNT(*) AS n
    FROM orders
    WHERE o_orderkey <= 200
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.sort_array(F.collect_list("o_orderkey")).alias("order_keys"),
            F.sort_array(F.collect_set("o_orderstatus")).alias("statuses"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )
