"""Relational operator queries (SURVEY.md §2.7–§2.9 [EXT] surface).

Each query is declared with the DataFrame API (Catalyst plans the physical
strategy), aliases every computed column to match its oracle SQL, and uses
the decimal-routed double aggregation from ``functions.numeric`` so results
are bit-identical across engines and partitionings.

Scale notes baked into each plan:
- only FIXED-size dims (region: 5 rows, nation: 25) and one-row
  aggregates carry explicit broadcast hints; customer/supplier/part
  -derived sides scale with SF, so they take no hint — AQE broadcasts
  them while they fit the threshold and switches to a shuffled join
  beyond (observed flipping in SCALE.md's 30x run);
- fact-fact joins are plain equi-joins so AQE can pick SMJ/shuffled-hash
  and split skewed partitions;
- filters sit directly on the scan so parquet pushdown/pruning applies;
- top-k uses orderBy().limit() which Spark plans as TakeOrderedAndProject
  (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.functions.numeric import (
    davg,
    dquantize,
    dsum,
    dsum_final,
    dsum_over,
    dsum_partial,
)
from lcr_etl_upgrade_spark.operators.topk import topk_per_group
from lcr_etl_upgrade_spark.plans.registry import query
from lcr_etl_upgrade_spark.sources.testdata import load_table


# --------------------------------------------------------------------------
# A2: group-by aggregates — the flagship (TPC-H Q1-shaped pricing summary)
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # SQL text (left-assoc parse == the Column tree's Multiply nesting,
    # identical double ops) — the d-aggs take the one-round-trip path
    disc_price = "l_extendedprice * (1 - l_discount)"
    charge = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# J1+J2+O1: fact-fact join + broadcast dim + group + top-k
# (TPC-H Q3-shaped shipping priority)
# --------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(
            orders.join(
                # customer-derived (scales with SF): no forced broadcast —
                # AQE broadcasts while under threshold, shuffles beyond
                cust.select("c_custkey"),
                orders.o_custkey == F.col("c_custkey"),
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum("l_extendedprice * (1 - l_discount)", "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# J1+J2: snowflake join through broadcast dims (TPC-H Q5-shaped)
# --------------------------------------------------------------------------
@query(
    "q5_nation_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        cust.join(
            F.broadcast(
                nation.join(region, nation.n_regionkey == region.r_regionkey)
            ),
            cust.c_nationkey == F.col("n_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    # dims is CUSTOMER-sized (grows with SF) — no broadcast hint: AQE
    # broadcasts it while it fits the threshold and shuffles beyond,
    # unlike the tiny nation x region side which is always-broadcast.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(dsum("l_extendedprice * (1 - l_discount)", "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------------
# A2 extended: min/max/count-distinct/variance spelled deterministically
# --------------------------------------------------------------------------
@query(
    "agg_order_stats",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            dsum("o_totalprice", "sum_price"),
            davg("o_totalprice", "avg_price"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# A3: approximate distinct (HLL) — engine-specific sketch, rows-only check,
# but carrying a checkable contract: relative error vs the exact count must
# stay within the declared rsd bound on every group row.
# --------------------------------------------------------------------------
@query("agg_approx_distinct")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    rsd = 0.05
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .withColumn(
            "rel_error",
            F.round(
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                / F.col("exact_parts"),
                4,
            ),
        )
        # HLL++ rsd is a standard deviation, not a hard bound; 4x rsd is a
        # conservative always-true envelope that still catches a broken sketch
        .withColumn("within_bound", F.col("rel_error") <= 4 * rsd)
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# A4: rollup / cube / grouping sets
# --------------------------------------------------------------------------
@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Quantize BEFORE the rollup: Expand evaluates aggregate children per
    # expanded row (3x per input row for a 2-column rollup); the
    # pre-projection runs the quantize chain once and Expand copies a
    # compact decimal. dsum(c) ≡ dsum_final(dquantize(c)) — same exact
    # sum, hash-identical (see functions/numeric.dquantize).
    return (
        li.select(
            "l_returnflag", "l_linestatus", dquantize("l_quantity", "__q")
        )
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum_final("__q", "sum_qty"), F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Same Expand-aware pre-quantize as agg_rollup (4x for a 2-col cube).
    return (
        li.select(
            "l_returnflag", "l_linestatus", dquantize("l_extendedprice", "__q")
        )
        .cube("l_returnflag", "l_linestatus")
        .agg(dsum_final("__q", "sum_price"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# J1 outer joins: customers with (possibly zero) orders
# --------------------------------------------------------------------------
@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))), 0) AS DOUBLE) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    ORDER BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            # dsum: quantize-then-exact-sum — Spark's per-row
            # double->decimal cast rounds the shortest repr and can
            # diverge from the oracle's decimal cast in value tails
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias(
                "total_spent"
            ),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# J3 semi/anti joins
# --------------------------------------------------------------------------
@query(
    "join_semi",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    ORDER BY o_orderkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no large order (non-empty at every SF — a plain
    no-orders anti-join matches zero rows in this data, which would make
    the oracle check trivially true)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# J4 theta/range join: equi key + non-equi residual
# --------------------------------------------------------------------------
@query(
    "join_range",
    oracle="""
    SELECT p.p_brand, COUNT(*) AS n_premium_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
               AND l.l_extendedprice > 2.0 * p.p_retailprice
    GROUP BY p.p_brand
    ORDER BY p_brand
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(
            part,  # scales with SF: AQE decides (equi key keeps SMJ viable)
            (li.l_partkey == part.p_partkey)
            & (li.l_extendedprice > 2.0 * part.p_retailprice),
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_premium_lines"))
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# W1: top-k per group via ranking window
# --------------------------------------------------------------------------
@query(
    "window_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    ORDER BY c_custkey, rn
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via operators.topk.topk_per_group.

    strategy="window" (bare ranking window) is the MEASURED local[32]
    winner at 1x and 100x in both group regimes; the prefilter strategy
    (mapInArrow partial top-k that cuts exchange input ~30x for large
    groups) exists for network-shuffle clusters — full experiment in
    SCALE.md "topk strategy experiment" and operators/topk.py.
    """
    orders = load_table(spark, sf_dir, "orders")
    proj = orders.select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    return topk_per_group(
        proj,
        ["c_custkey"],
        [("o_totalprice", False), ("o_orderkey", True)],
        k=3,
        strategy="window",
        rank_col="rn",
    ).orderBy("c_custkey", "rn")


# --------------------------------------------------------------------------
# W2+W3: analytic windows (lag/lead) + frame-spec running aggregate
# --------------------------------------------------------------------------
@query(
    "window_running_analytics",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS VARCHAR) AS o_orderdate,
           o_totalprice,
           CAST(LAG(o_totalprice) OVER w AS DOUBLE) AS prev_price,
           CAST(LEAD(o_totalprice) OVER w AS DOUBLE) AS next_price,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spent
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def window_running_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrank = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("string").alias("o_orderdate"),
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.rank().over(wrank).alias("price_rank"),
        dsum_over(
            "o_totalprice",
            w.rowsBetween(W.unboundedPreceding, W.currentRow),
            "running_spent",
        ),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


# --------------------------------------------------------------------------
# E1: set operations
# --------------------------------------------------------------------------
@query(
    "setops_customers",
    oracle="""
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         big_spenders AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                          WHERE o_totalprice > 300000),
         in_either AS (SELECT * FROM building UNION SELECT * FROM big_spenders),
         in_both AS (SELECT * FROM building INTERSECT SELECT * FROM big_spenders),
         only_bldg AS (SELECT * FROM building EXCEPT SELECT * FROM big_spenders)
    SELECT 'union' AS op, COUNT(*) AS n FROM in_either
    UNION ALL SELECT 'intersect' AS op, COUNT(*) AS n FROM in_both
    UNION ALL SELECT 'except' AS op, COUNT(*) AS n FROM only_bldg
    ORDER BY op
    """,
)
def setops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    spenders = (
        orders.filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    union_n = building.union(spenders).distinct().select(
        F.lit("union").alias("op"), F.count(F.lit(1)).alias("n")
    )
    inter_n = building.intersect(spenders).select(
        F.lit("intersect").alias("op"), F.count(F.lit(1)).alias("n")
    )
    # subtract() IS SQL EXCEPT (set semantics) unconditionally;
    # exceptAll().distinct() only coincides while the left side happens
    # to be duplicate-free
    except_n = building.subtract(spenders).select(
        F.lit("except").alias("op"), F.count(F.lit(1)).alias("n")
    )
    return except_n.union(inter_n).union(union_n).orderBy("op")


# --------------------------------------------------------------------------
# O2: distinct / dedup-by-key
# --------------------------------------------------------------------------
@query(
    "distinct_keys",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
)
def distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# O1: global top-k (TakeOrderedAndProject — no full sort at scale)
# --------------------------------------------------------------------------
@query(
    "orderby_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def orderby_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


# --------------------------------------------------------------------------
# Pivot (conditional aggregation)
# --------------------------------------------------------------------------
@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE) AS open_total,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE) AS finished_total,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE) AS partial_total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def status_total(code: str, alias: str):
        return dsum(
            F.when(
                F.col("o_orderstatus") == code, F.col("o_totalprice")
            ).otherwise(F.lit(0.0)),
            alias,
        )

    return (
        orders.groupBy("o_orderpriority")
        .agg(
            status_total("O", "open_total"),
            status_total("F", "finished_total"),
            status_total("P", "partial_total"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# §2.9 scalar function surface: string / math / date-time expressions
# --------------------------------------------------------------------------
@query(
    "scalar_functions",
    oracle="""
    SELECT o_orderkey,
           UPPER(o_orderpriority) AS prio_upper,
           LOWER(o_orderstatus) AS status_lower,
           SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
           CONCAT(o_orderstatus, '-', o_orderpriority) AS status_prio,
           TRIM(o_orderpriority, ' ') AS prio_trim,  -- ' ': Spark trims ASCII space only
           LENGTH(o_orderpriority) AS prio_len,
           REPLACE(o_orderpriority, '-', '_') AS prio_repl,
           (o_orderpriority LIKE '%URGENT%') AS is_urgent,
           ROUND(o_totalprice, 1) AS price_round,
           ABS(o_totalprice - 200000.0) AS price_dev,
           CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_k,
           CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
           CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
           CAST(o_orderdate + INTERVAL 30 DAY AS VARCHAR) AS due_date,
           DATEDIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch,
           CAST(CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS VARCHAR) AS order_month_start
    FROM orders
    WHERE o_orderkey <= 1000
    ORDER BY o_orderkey
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return orders.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.lower("o_orderstatus").alias("status_lower"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        # concat (with coalesce-to-'') not concat_ws: DuckDB CONCAT
        # keeps the '-' literal when an operand is NULL, concat_ws
        # drops operand AND separator — a latent divergence on NULLs
        F.concat(
            F.coalesce(F.col("o_orderstatus"), F.lit("")),
            F.lit("-"),
            F.coalesce(F.col("o_orderpriority"), F.lit("")),
        ).alias("status_prio"),
        F.trim("o_orderpriority").alias("prio_trim"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias("prio_repl"),
        F.col("o_orderpriority").like("%URGENT%").alias("is_urgent"),
        F.round("o_totalprice", 1).alias("price_round"),
        F.abs(F.col("o_totalprice") - 200000.0).alias("price_dev"),
        F.floor(F.col("o_totalprice") / 1000).alias("price_k"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
        .cast("string")
        .alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        )
        .cast("long")
        .alias("days_since_epoch"),
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("timestamp_ntz")
        .cast("string")
        .alias("order_month_start"),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# J1 completion: full outer join (both-sides-preserved semantics)
# --------------------------------------------------------------------------
@query(
    "join_full_outer",
    oracle="""
    WITH big_cust AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
         big_ord AS (SELECT o_custkey, COUNT(*) AS n_big_orders FROM orders
                     WHERE o_totalprice > 350000 GROUP BY o_custkey)
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
           c.c_acctbal, o.n_big_orders,
           (c.c_custkey IS NULL) AS only_orders,
           (o.o_custkey IS NULL) AS only_customer
    FROM big_cust c FULL OUTER JOIN big_ord o ON c.c_custkey = o.o_custkey
    ORDER BY custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 9000
    ).select("c_custkey", "c_acctbal")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 350000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big_orders"))
    )
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer")
    return joined.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_acctbal",
        "n_big_orders",
        F.col("c_custkey").isNull().alias("only_orders"),
        F.col("o_custkey").isNull().alias("only_customer"),
    ).orderBy("custkey")


# --------------------------------------------------------------------------
# W2 completion: first/last value over window frames
# --------------------------------------------------------------------------
@query(
    "window_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(FIRST_VALUE(o_totalprice) OVER w AS DOUBLE) AS first_price,
           CAST(LAST_VALUE(o_totalprice) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE)
             AS last_price,
           NTILE(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


# --------------------------------------------------------------------------
# E1 completion: multiset set operations (ALL variants)
# --------------------------------------------------------------------------
@query(
    "setops_multiset",
    oracle="""
    WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
         b AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    SELECT 'union_all' AS op, COUNT(*) AS n FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
    UNION ALL
    SELECT 'intersect_all' AS op, COUNT(*) AS n FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
    UNION ALL
    SELECT 'except_all' AS op, COUNT(*) AS n FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    ORDER BY op
    """,
)
def setops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_totalprice") > 200000).select("o_custkey")

    def count_of(op: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(op).alias("op"), F.count(F.lit(1)).alias("n"))

    return (
        count_of("except_all", a.exceptAll(b))
        .union(count_of("intersect_all", a.intersectAll(b)))
        .union(count_of("union_all", a.unionAll(b)))
        .orderBy("op")
    )


# --------------------------------------------------------------------------
# A2 completion: variance/stddev spelled deterministically (decimal-routed
# sum and sum-of-squares; final arithmetic identical double ops)
# --------------------------------------------------------------------------
@query(
    "agg_variance_manual",
    oracle="""
    SELECT l_returnflag,
           COUNT(l_quantity) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s2,
           (CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE)
            - CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
              * CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity))
             / (COUNT(l_quantity) - 1) AS sample_variance
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_variance_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    s1 = dsum(q)
    s2 = dsum(q * q)
    n = F.count(q)
    return (
        li.groupBy("l_returnflag")
        .agg(
            n.alias("n"),
            s1.alias("s1"),
            s2.alias("s2"),
            ((s2 - s1 * s1 / n) / (n - F.lit(1))).alias("sample_variance"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Skew-resilient variants (operators/joins.py): salted execution must be
# RESULT-IDENTICAL to the plain formulation — the oracle is the plain SQL.
# --------------------------------------------------------------------------
@query(
    "join_salted",
    oracle="""
    SELECT o.o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'MACHINERY'
    GROUP BY o.o_custkey
    ORDER BY o_custkey
    """,
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lcr_etl_upgrade_spark.operators.joins import salted_join

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    ).select(F.col("c_custkey").alias("o_custkey"))
    joined = salted_join(orders, cust, "o_custkey", salt=8)
    return (
        joined.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total"))
        .orderBy("o_custkey")
    )


@query(
    "agg_salted_two_stage",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_salted_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lcr_etl_upgrade_spark.operators.joins import salted_aggregate

    orders = load_table(spark, sf_dir, "orders")
    return salted_aggregate(
        orders,
        ["o_orderpriority"],
        aggs=[
            F.count(F.lit(1)).alias("pn"),
            dsum_partial("o_totalprice", "ps"),
        ],
        partial_aggs=[
            F.sum("pn").alias("n"),
            dsum_final("ps", "total"),
        ],
        salt=8,
    ).orderBy("o_orderpriority")
