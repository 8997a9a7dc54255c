"""Tier B — the relational / streaming query surface (SURVEY.md §2.B).

These are the Flink-SQL capabilities the reference exercises over its
changelog sources (its ITCase queries, tutorial joins, and the SQL surface
documented in README.md:27-56), implemented with the DataFrame API so
Catalyst owns physical planning. Each builder is paired with DuckDB oracle
SQL over the same parquet views.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_cdc_connectors_spark.operators.cdc import global_running_max
from flink_cdc_connectors_spark.registry import query
from flink_cdc_connectors_spark.sources.loaders import load_table


def _fmt(c):
    """Timestamp -> 'yyyy-MM-dd HH:mm:ss' string (cross-engine stable)."""
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


# ---------------------------------------------------------------------------
# Projection / filter / scalar functions
# ---------------------------------------------------------------------------


@query(
    "scan_project",
    tier="B",
    oracle="""
    SELECT p_partkey, upper(p_name) AS p_name_upper, p_type, p_retailprice
    FROM part
    """,
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection over a source (reference README.md:56:
    ``SELECT id, UPPER(name), description, weight FROM mysql_binlog``).
    Catalyst prunes the scan to the four referenced columns (ReadSchema)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("p_name_upper"),
        "p_type",
        "p_retailprice",
    )


@query(
    "filter_pred",
    tier="B",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      AND l_quantity < 25
      AND (l_returnflag IN ('A', 'N') OR l_linestatus = 'F')
      AND l_discount IS NOT NULL
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicates: comparison, AND/OR, BETWEEN, IN, IS NULL — the stream
    predicate surface (reference SeekBinlogToTimestampFilter.java and
    BinlogSplitReader.shouldEmit:222-254). All push down to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
        & (F.col("l_quantity") < 25)
        & (F.col("l_returnflag").isin("A", "N") | (F.col("l_linestatus") == "F"))
        & F.col("l_discount").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@query(
    "scalar_string",
    tier="B",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                         AS name_upper,
           lower(c_mktsegment)                   AS seg_lower,
           concat(c_name, ':', c_mktsegment)     AS name_seg,
           substring(c_name, 1, 8)               AS name_prefix,
           trim(c_name)                          AS name_trim,
           CAST(length(c_name) AS INT)           AS name_len
    FROM customer
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPPER/LOWER/CONCAT/SUBSTRING/TRIM/LENGTH (reference README.md:56 and
    the charset ITs)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.concat_ws(":", "c_name", "c_mktsegment").alias("name_seg"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.trim(F.col("c_name")).alias("name_trim"),
        F.length("c_name").alias("name_len"),
    )


@query(
    "scalar_date",
    tier="B",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)    AS o_year,
           CAST(month(o_orderdate) AS INT)   AS o_month,
           CAST(day(o_orderdate) AS INT)     AS o_day,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_1995
    FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YEAR/MONTH/DAY extraction, date_trunc, date arithmetic (reference
    temporal surface: TemporalConversions.java; all-types IT
    MySqlConnectorITCase.java:366-500)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        _fmt(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_1995"
        ),
    )


@query(
    "scalar_math",
    tier="B",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4))), 2)
                AS DOUBLE)                               AS net_price,
           abs(l_discount - 0.05)                        AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT)              AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT)             AS qty_floor,
           l_orderkey % 7                                AS key_mod,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUND/ABS/CEIL/FLOOR/MOD and DECIMAL-precision casts (reference
    decimal converters: RowDataDebeziumDeserializeSchema.createDecimalConverter)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)")),
            2,
        )
        .cast("double")
        .alias("net_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.col("l_extendedprice").cast("decimal(12,2)").cast("double").alias("price_dec"),
    )


@query(
    "scalar_conditional",
    tier="B",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END                  AS bal_band,
           coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'OTHER') AS seg_or_other,
           CASE WHEN c_nationkey % 2 = 0 THEN c_acctbal ELSE -c_acctbal END AS signed_bal
    FROM customer
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / COALESCE / NULLIF and NULL semantics (reference
    default-value ITs MySqlConnectorITCase.java:1116,1223,1719)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.when(F.col("c_nationkey") % 2 == 0, F.col("c_acctbal"))
        .otherwise(-F.col("c_acctbal"))
        .alias("signed_bal"),
    )


@query(
    "scalar_typecast",
    tier="B",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderkey AS DECIMAL(20,0)) AS VARCHAR)       AS key_dec20,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)      AS price_dec,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')          AS order_date,
           o_orderkey % 2 = 0                                       AS key_even,
           CAST(octet_length(encode(o_orderpriority)) AS INT)       AS prio_bytes,
           CAST(
             date_part('hour', o_orderdate) * 3600000
             + date_part('minute', o_orderdate) * 60000
             + date_part('second', o_orderdate) * 1000 AS INT)      AS time_millis
    FROM orders
    """,
)
def scalar_typecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-lattice conversion coverage (SURVEY §1.2, sources/types.py):
    BIGINT->DECIMAL(20,0) (the BIGINT UNSIGNED convention), DOUBLE->
    DECIMAL(12,2) precision cast, TIMESTAMP->DATE, int->BOOLEAN parity,
    STRING->BINARY byte length, and the TIME-as-millis-of-day convention —
    every converter family exercised against the DuckDB oracle (the
    fixture-gap closure promised in FIXTURES.md)."""
    o = load_table(spark, sf_dir, "orders")
    millis = (
        F.hour("o_orderdate") * 3_600_000
        + F.minute("o_orderdate") * 60_000
        + F.second("o_orderdate") * 1_000
    )
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("decimal(20,0)").cast("string").alias("key_dec20"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("double").alias("price_dec"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("order_date"),
        (F.col("o_orderkey") % 2 == 0).alias("key_even"),
        F.octet_length(F.encode("o_orderpriority", "UTF-8")).alias("prio_bytes"),
        millis.cast("int").alias("time_millis"),
    )


@query(
    "scalar_json",
    tier="B",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar extraction from a JSON string column (reference maps MySQL
    JSON -> STRING: MySqlTypeUtils.java:85,170-171; queried with JSON fns)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@query(
    "agg_global",
    tier="B",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)              AS n_rows,
           CAST(count(l_quantity) AS BIGINT)     AS n_qty,
           round(sum(l_quantity), 2)             AS sum_qty,
           round(avg(l_extendedprice), 2)        AS avg_price,
           round(min(l_extendedprice), 2)        AS min_price,
           round(max(l_extendedprice), 2)        AS max_price
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global COUNT/SUM/AVG/MIN/MAX (sink-count assertions in every
    reference IT, e.g. MySqlConnectorITCase.waitForSinkSize)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@query(
    "agg_groupby",
    tier="B",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_discount), 4)                                   AS avg_disc,
           CAST(count(*) AS BIGINT)                                    AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregation with keys — the TPC-H Q1 shape of the reference's
    flagship ``SELECT name, SUM(weight) ... GROUP BY name`` ITCase
    (MySqlConnectorITCase.java:215-241). Map-side partial aggregation +
    one shuffle on the (low-cardinality) keys."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_distinct",
    tier="B",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_suppkey) AS BIGINT)  AS n_supp,
           CAST(count(DISTINCT l_partkey) AS BIGINT)  AS n_part,
           CAST(count(*) AS BIGINT)                   AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT ...) per group (reference e2e verification distinct
    counts, JdbcProxy.java). Catalyst expands to a two-phase distinct agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_having",
    tier="B",
    oracle="""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT)       AS n_orders,
           round(sum(o_totalprice), 2)    AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) > 5 AND sum(o_totalprice) > 100000
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING) — reference aggregate-sink
    assertions (MySqlConnectorITCase.java:243-275)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.sum("o_totalprice").alias("__raw_spend"),
        )
        .filter((F.col("n_orders") > 5) & (F.col("__raw_spend") > 100000))
        .drop("__raw_spend")
    )


@query(
    "agg_rollup",
    tier="B",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL')  AS returnflag,
           coalesce(l_linestatus, 'ALL')  AS linestatus,
           CAST(count(*) AS BIGINT)       AS n_rows,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the changelog-derived table (capability of the SQL
    runtime the reference targets, README.md:27-56)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_price",
        )
    )


@query(
    "agg_cube",
    tier="B",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL')  AS returnflag,
           coalesce(l_linestatus, 'ALL')  AS linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
                                          AS gid,
           CAST(count(*) AS BIGINT)       AS n_rows,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 2^n grouping combinations (SURVEY §2 agg_rollup row names
    ROLLUP/CUBE/GROUPING SETS; SQL-runtime capability, README.md:27-56).
    ``gid`` is the grouping id so subtotal rows are unambiguous even if the
    data ever contained real NULL keys."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id("l_returnflag", "l_linestatus").cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "n_rows",
            "sum_price",
        )
    )


@query(
    "agg_grouping_sets",
    tier="B",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL')  AS returnflag,
           coalesce(l_linestatus, 'ALL')  AS linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
                                          AS gid,
           CAST(count(*) AS BIGINT)       AS n_rows,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the two single-column marginals plus the
    grand total, one Expand + one hash aggregate (no self-union of scans)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id("l_returnflag", "l_linestatus").cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "n_rows",
            "sum_price",
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "join_full_outer",
    tier="B",
    oracle="""
    SELECT coalesce(c.c_custkey, o.o_custkey)      AS custkey,
           CAST(count(o.o_orderkey) AS BIGINT)     AS n_orders,
           CAST(max(c.c_custkey IS NOT NULL) AS BOOLEAN) AS has_customer
    FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN — the reconciliation shape (customers with no
    orders AND orders with unknown customers both surface). Part of the
    Flink SQL surface the reference's changelogs feed (README.md:27-56);
    the sink-vs-source diff of JdbcProxy verification is this join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.groupBy(
        F.coalesce(c.c_custkey, o.o_custkey).alias("custkey")
    ).agg(
        F.count(o.o_orderkey).alias("n_orders"),
        F.max(c.c_custkey.isNotNull()).alias("has_customer"),
    )


@query(
    "join_inner",
    tier="B",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT)    AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join fact⋈dim — the tutorial enrichment pattern
    (docs/content/quickstart/mysql-postgres-tutorial.md:263-267)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "join_left_multi",
    tier="B",
    oracle="""
    SELECT n.n_name,
           CAST(count(*) AS BIGINT)                              AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    LEFT JOIN orders o   ON l.l_orderkey = o.o_orderkey
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_left_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way LEFT JOIN enrichment across sources (reference tutorial:
    MySQL orders ⟕ products ⟕ Postgres shipments,
    mysql-postgres-tutorial.md:263-267). The dim joins broadcast; the
    fact⋈orders join shuffles once on the order key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "left")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@query(
    "join_broadcast",
    tier="B",
    oracle="""
    SELECT r.r_name,
           CAST(count(*) AS BIGINT)   AS n_customers,
           round(sum(c.c_acctbal), 2) AS sum_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dimension broadcast join (region/nation). Explicit
    ``broadcast()`` hints — no shuffle for the dim sides at any scale."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )


@query(
    "join_semi",
    tier="B",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE EXISTS -> left-semi join (Flink SQL capability parity)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    tier="B",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE NOT EXISTS -> left-anti join (Flink SQL capability parity).

    The anti side is the high-value-orders subset ("customers with no
    order over 400k"): in the fixtures EVERY customer has at least one
    order, so an unfiltered NOT EXISTS is structurally empty — the round-1
    vacuous 0=0 pass. The filtered build side keeps the operator identical
    (null-safe left-anti hash join) while the check compares real rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_range",
    tier="B",
    oracle="""
    SELECT b.label,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 2)   AS sum_value
    FROM events e
    JOIN (VALUES ('p00', 0.0, 50.0), ('p50', 50.0, 150.0), ('p150', 150.0, 300.0),
                 ('p300', 300.0, 1000.0)) AS b(label, lo, hi)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.label
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range-containment join — the same shape as the reference's
    chunk-containment emit filter (BinlogSplitReader.java:240-248,
    RecordUtils.splitKeyRangeContains). The tiny range table is broadcast,
    so the theta-join is a broadcast nested loop, never a shuffle."""
    e = load_table(spark, sf_dir, "events")
    buckets = spark.createDataFrame(
        [("p00", 0.0, 50.0), ("p50", 50.0, 150.0), ("p150", 150.0, 300.0), ("p300", 300.0, 1000.0)],
        "label string, lo double, hi double",
    )
    return (
        e.join(F.broadcast(buckets), (e.value >= buckets.lo) & (e.value < buckets.hi))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# Sort / window
# ---------------------------------------------------------------------------


@query(
    "sort_limit",
    tier="B",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 50
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT (top-k). Catalyst compiles this to
    TakeOrderedAndProject — per-partition top-k then a k-row merge on the
    driver, never a global sort. Tie-broken to be fully deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(50)
    )


@query(
    "topk_per_group",
    tier="B",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per key via ranking window — the changelog-normalize shape
    (rank-1-per-key) generalized to k (SURVEY §2.B)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_ranking",
    tier="B",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS INT) AS rn,
           CAST(rank() OVER w AS INT)       AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK / ROW_NUMBER ranking windows."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "window_analytic",
    tier="B",
    oracle="""
    SELECT user_id, event_id,
           round(value, 2)                  AS value_r,
           round(lag(value) OVER w, 2)      AS prev_value,
           round(lead(value) OVER w, 2)     AS next_value,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                                            AS running_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD and a running SUM frame over the offset order — event
    sequencing semantics per key (BinlogOffset.compareTo:173-255)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("value_r"),
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
        F.round(F.sum("value").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2).alias(
            "running_sum"
        ),
    )


# ---------------------------------------------------------------------------
# Set operations (the sharding-merge patterns)
# ---------------------------------------------------------------------------


@query(
    "set_union_all",
    tier="B",
    oracle="""
    SELECT * FROM (
      SELECT 'shard_0' AS shard, c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0
      UNION ALL
      SELECT 'shard_1' AS shard, c_custkey, c_name FROM customer WHERE c_custkey % 2 = 1
    )
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of shard tables into one logical table — the reference's
    sharding-merge tutorial (build-real-time-data-lake-tutorial.md:124-230,
    user_1 ∪ user_2 -> all_users_sink)."""
    c = load_table(spark, sf_dir, "customer")
    s0 = c.filter(F.col("c_custkey") % 2 == 0).select(
        F.lit("shard_0").alias("shard"), "c_custkey", "c_name"
    )
    s1 = c.filter(F.col("c_custkey") % 2 == 1).select(
        F.lit("shard_1").alias("shard"), "c_custkey", "c_name"
    )
    return s0.unionByName(s1)


@query(
    "set_distinct_union",
    tier="B",
    oracle="""
    SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0
    UNION
    SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0
    """,
)
def set_distinct_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with dedup across shards with overlapping keys (reference
    user_1/user_2 fixtures carry overlapping PKs)."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_custkey") % 2 == 0).select("c_custkey", "c_name")
    b = c.filter(F.col("c_custkey") % 3 == 0).select("c_custkey", "c_name")
    return a.union(b).distinct()


@query(
    "set_except",
    tier="B",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — the sink-vs-source verification shape (JdbcProxy.java).

    Right side = custkeys holding an URGENT order: every custkey appears in
    unfiltered orders, so the unfiltered EXCEPT was structurally empty
    (round-1 vacuous pass). The subset keeps the set-difference operator
    while making the comparison non-trivial on both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.select("c_custkey")
        .exceptAll(o.select(F.col("o_custkey").alias("c_custkey")))
        .distinct()
    )


@query(
    "set_intersect",
    tier="B",
    oracle="""
    SELECT c_custkey FROM customer
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — same verification family."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.select("c_custkey").intersect(o.select(F.col("o_custkey").alias("c_custkey")))


@query(
    "array_ops",
    tier="B",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS INT)                  AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4)       AS first_val,
           round(CAST(embedding[64] AS DOUBLE), 4)      AS last_val
    FROM embeddings
    WHERE label % 2 = 0
    """,
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY element access and size (reference: MongoDB ARRAY converters,
    MongoDBConnectorDeserializationSchema.java:261-265; MySQL SET->ARRAY,
    MySqlDeserializationConverterFactory.java:118-139)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("label") % 2 == 0).select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        F.round(F.element_at("embedding", 64).cast("double"), 4).alias("last_val"),
    )


# ---------------------------------------------------------------------------
# Event-time windows (batch-checkable; streaming versions in streaming/)
# ---------------------------------------------------------------------------


@query(
    "stream_tumbling_window",
    tier="B",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2)     AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window aggregation over the change stream
    (event-time = op_ts per MySqlReadableMetadata.java:68). Uses the same
    ``window()`` expression Structured Streaming plans incrementally."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(_fmt(F.col("w.start")).alias("window_start"), "event_type", "n", "sum_value")
    )


@query(
    "stream_sliding_window",
    tier="B",
    oracle="""
    SELECT strftime(to_timestamp((epoch_ms(ts) // 1000 - k.off) // 3600 * 3600 + k.off),
                    '%Y-%m-%d %H:%M:%S')   AS window_start,
           CAST(count(*) AS BIGINT)        AS n,
           round(sum(value), 2)            AS sum_value
    FROM events
    CROSS JOIN (VALUES (0), (900), (1800), (2700)) AS k(off)
    GROUP BY 1
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding/hopping window (1 hour, slide 15 min). Each event lands in 4
    windows; Spark's ``window()`` expands them natively, the oracle unions
    the 4 epoch-aligned shifted tumbles."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(_fmt(F.col("w.start")).alias("window_start"), "n", "sum_value")
    )


@query(
    "stream_session_window",
    tier="B",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(count(*) AS BIGINT)               AS n,
           round(sum(value), 2)                   AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (30-minute gap) per user. Spark's ``session_window``
    merges adjacent events; the oracle reconstructs sessions with the
    classic lag + cumulative-sum islands technique."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            _fmt(F.col("w.start")).alias("session_start"),
            "n",
            "sum_value",
        )
    )


@query(
    "stream_watermark_late",
    tier="B",
    oracle="""
    SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM (
      SELECT event_id, user_id, ts,
             max(ts) OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS wm_high
      FROM events)
    WHERE ts >= wm_high - INTERVAL 10 MINUTE
    """,
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics as a deterministic batch check: the watermark is
    the running max event time over arrival order (event_id) minus 10
    minutes; events older than it are dropped — exactly what
    ``withWatermark('ts', '10 minutes')`` does in the streaming layer
    (signals own the consistency window: SignalEventDispatcher.java:78-112).

    Arrival order is one global sequence, but the running max is computed
    with :func:`global_running_max` — bucketed prefix-max, one hash shuffle,
    no single-partition window (the round-1 WindowExec warning is gone; the
    plan audit asserts it stays gone)."""
    e = load_table(spark, sf_dir, "events")
    r = global_running_max(e, "event_id", "ts", out_col="wm_high")
    return (
        r.filter(F.col("ts") >= F.col("wm_high") - F.expr("INTERVAL 10 MINUTES"))
        .select("event_id", "user_id", _fmt("ts").alias("ts_s"))
    )


@query(
    "udf_scalar",
    tier="B",
    oracle="""
    SELECT event_id,
           round(least(greatest(value, 25.0), 400.0) * 1.5 + 1.0, 4) AS adjusted
    FROM events
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User code applied per record — the reference's user-defined
    converter/deserializer hook (RowDataDebeziumDeserializeSchema.java:262-268,
    custom DebeziumDeserializationSchema README.md:83). Implemented as an
    Arrow-vectorized Pandas UDF (the fast Python path); the oracle states the
    same arithmetic in SQL."""
    e = load_table(spark, sf_dir, "events")

    @F.pandas_udf("double")
    def adjust(v: pd.Series) -> pd.Series:
        return (v.clip(lower=25.0, upper=400.0) * 1.5 + 1.0).round(4)

    return e.select("event_id", adjust("value").alias("adjusted"))


# ---------------------------------------------------------------------------
# Subqueries / pivot / percentiles / range frames (Flink-SQL surface parity)
# ---------------------------------------------------------------------------


@query(
    "subquery_scalar",
    tier="B",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 2) AS DOUBLE) AS price
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (orders above 1.5x the global
    average — 2x selected ZERO rows at sf>=0.01's price distribution,
    which would have made the driver comparison a vacuous 0=0 pass)
    — Catalyst plans the subquery as a one-row broadcast, the shape Flink
    SQL's single-row subquery rewrite produces. Spark-first: spark.sql over
    a registered temp view so the sub-plan flows through the same
    optimizer rewrites the reference's SQL surface relies on."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_sq")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 2) AS DOUBLE) AS price
        FROM __orders_sq
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM __orders_sq)
        """
    )


@query(
    "subquery_in_correlated",
    tier="B",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
)
def subquery_in_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated IN subquery (customers holding a >300k order) — the
    decorrelation rewrite (subquery -> left-semi join) both engines share;
    Flink SQL documents the same IN/EXISTS rewrites over CDC tables."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    c.createOrReplaceTempView("__cust_sq")
    o.createOrReplaceTempView("__orders_sq2")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM __cust_sq c
        WHERE c_custkey IN (
          SELECT o_custkey FROM __orders_sq2 o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        """
    )


@query(
    "pivot_agg",
    tier="B",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
           CAST(count(*) FILTER (WHERE o_orderpriority = '2-HIGH')   AS BIGINT) AS n_high,
           CAST(count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS n_medium
    FROM orders GROUP BY 1
    """,
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (priority columns per status) as conditional-count aggregation
    — the wide-format reporting shape. With a KNOWN pivot-value list this
    compiles to ONE hash aggregate (count-if per value, map-side combined);
    `df.groupBy().pivot()` would plan a two-phase aggregate (an extra
    shuffle on (status, priority)) that only pays off when the value list
    must be discovered from the data."""
    o = load_table(spark, sf_dir, "orders")

    def n(val: str, alias: str):
        return F.count(F.when(F.col("o_orderpriority") == val, 1)).alias(alias)

    return o.groupBy("o_orderstatus").agg(
        n("1-URGENT", "n_urgent"), n("2-HIGH", "n_high"), n("3-MEDIUM", "n_medium")
    )


@query(
    "agg_percentiles",
    tier="B",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
           round(max(o_totalprice), 4)                 AS p_max
    FROM orders GROUP BY 1
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`: linear interpolation over the sorted group).
    The exact form shuffles each group's values once; at 100 TB the
    drop-in is `approx_percentile` (t-digest sketch, map-side combined) —
    same call shape, bounded memory."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
        F.round(F.max("o_totalprice"), 4).alias("p_max"),
    )


@query(
    "window_range_frame",
    tier="B",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(count(*) OVER (
             PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate)
             RANGE BETWEEN 7776000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_last_90d
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per customer, orders in the trailing 90 days —
    a VALUE-based frame (rangeBetween over epoch millis), not a row count.
    The event-time trailing-window shape streaming deployments express
    with OVER ... RANGE in Flink SQL."""
    o = load_table(spark, sf_dir, "orders")
    ms = F.unix_millis(F.to_timestamp("o_orderdate"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy(ms)
        .rangeBetween(-90 * 24 * 3600 * 1000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_last_90d"),
    )
