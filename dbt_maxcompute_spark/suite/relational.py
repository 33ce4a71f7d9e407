"""Relational operator suite (SURVEY.md §2.5) + the flagship query.

Each entry proves one operator class the reference's generated SQL
relies on: scan/project/filter, equi joins (inner/left), anti/semi
joins, cartesian, hash aggregation, conditional agg, any_value,
listagg, window functions, set ops, sort/limit, scalar subquery,
tuple-IN subquery, generate_series/date_spine.

Scale notes are inline per query; the global rules: broadcast fixed-
size dims (region/nation/supplier), aggregate before join when the
join key is the group key (shuffle reuse), never collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dbt_maxcompute_spark.sources.registry import load_table


def _dsum(col, scale=6):
    """Order-independent sum of a double expression (see suite/__init__)."""
    return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# Flagship: the Tutorial `customers` model (reference docs/Tutorial.md:92-120)
# staging projections -> groupBy(min/max/count) -> left join -> coalesce.
# ---------------------------------------------------------------------------

def q_flagship_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customers = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderdate").alias("order_date"),
    )
    # Aggregate BEFORE the join: groupBy key == join key, so the shuffle
    # hash-partitioning on customer_id is computed once and reused by the
    # sort-merge join; at 100 TB this halves shuffle volume vs join-first.
    customer_orders = orders.groupBy("customer_id").agg(
        F.min("order_date").alias("first_order_date"),
        F.max("order_date").alias("most_recent_order_date"),
        F.count("order_id").alias("number_of_orders"),
    )
    return (
        customers.join(customer_orders, "customer_id", "left")
        .select(
            "customer_id",
            "customer_name",
            "first_order_date",
            "most_recent_order_date",
            F.coalesce("number_of_orders", F.lit(0)).alias("number_of_orders"),
        )
    )


ORACLE_FLAGSHIP = """
WITH customers AS (
  SELECT c_custkey AS customer_id, c_name AS customer_name FROM customer
), ord AS (
  SELECT o_orderkey AS order_id, o_custkey AS customer_id, o_orderdate AS order_date
  FROM orders
), customer_orders AS (
  SELECT customer_id,
         min(order_date) AS first_order_date,
         max(order_date) AS most_recent_order_date,
         count(order_id) AS number_of_orders
  FROM ord GROUP BY customer_id
)
SELECT c.customer_id, c.customer_name, o.first_order_date,
       o.most_recent_order_date,
       coalesce(o.number_of_orders, 0) AS number_of_orders
FROM customers c LEFT JOIN customer_orders o ON c.customer_id = o.customer_id
"""


# ---------------------------------------------------------------------------
# Hash aggregation + conditional aggregation (orders_daily_mv.sql pattern:
# count/sum/conditional-sum by day — reference examples/.../orders_daily_mv.sql)
# ---------------------------------------------------------------------------

def q_agg_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        # cast to date: matches DuckDB's date_trunc('day') return type
        orders.groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("order_day"))
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            _dsum(F.col("o_totalprice")).alias("total_amount"),
            _dsum(
                F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(F.lit(0.0))
            ).alias("fulfilled_amount"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("order_day")
    )


ORACLE_AGG_DAILY = """
SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS order_day,
       count(*) AS order_cnt,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_amount,
       CAST(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END
                AS DECIMAL(28,6))) AS DOUBLE) AS fulfilled_amount,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
FROM orders GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary: the canonical wide hash-agg.
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Multi-way join with broadcast dims: revenue by nation (TPC-H Q5 shape).
# nation/region are fixed-size -> broadcast; the lineitem<->orders join is
# the only real shuffle. Filters pushed to the parquet scans.
# ---------------------------------------------------------------------------

def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


ORACLE_REVENUE_NATION = """
SELECT n_name, r_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name, r_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# Anti/semi join semantics (reference merge.sql:75-78 tuple-IN deletes;
# orders_merge.sql NOT IN subquery).
# ---------------------------------------------------------------------------

def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


ORACLE_ANTI = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
ORDER BY c_custkey
"""


def q_parts_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


ORACLE_SEMI = """
SELECT p_partkey, p_name, p_brand
FROM part
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# Cartesian product (reference allows via odps.sql.allow.cartesian hint).
# Kept intentionally tiny (region x region) — a cross join of fact tables
# would be a design bug at any scale.
# ---------------------------------------------------------------------------

def q_cartesian_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    r1 = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("r1"))
    r2 = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("r2"))
    return r1.crossJoin(r2).orderBy("r1", "r2")


ORACLE_CARTESIAN = """
SELECT a.r_name AS r1, b.r_name AS r2 FROM region a CROSS JOIN region b
ORDER BY r1, r2
"""


# ---------------------------------------------------------------------------
# Window functions: row_number / rank / lag / running sum
# (reference date_spine.sql:56 uses row_number(); windows are core SQL surface).
# Top-K per group: top 3 orders per customer segment.
# ---------------------------------------------------------------------------

def q_window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        cust.select("c_custkey", "c_mktsegment"),
        orders.o_custkey == F.col("c_custkey"),
    )
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
        .orderBy("c_mktsegment", "rn")
    )


ORACLE_WINDOW_TOPK = """
SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rn <= 3 ORDER BY c_mktsegment, rn
"""


def q_window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("d")).agg(
        _dsum(F.col("o_totalprice")).alias("day_total")
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    # NOTE: single unbounded window = single partition; acceptable because
    # the input is pre-aggregated to one row per day (bounded domain).
    return (
        daily.withColumn(
            "running_total",
            F.sum(F.col("day_total").cast("decimal(28,6)")).over(w).cast("double"),
        )
        .withColumn("prev_day_total", F.lag("day_total").over(W.orderBy("d")))
        .orderBy("d")
    )


ORACLE_WINDOW_RUNNING = """
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
         CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS day_total
  FROM orders GROUP BY 1
)
SELECT d, day_total,
       CAST(sum(CAST(day_total AS DECIMAL(28,6))) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       lag(day_total) OVER (ORDER BY d) AS prev_day_total
FROM daily ORDER BY d
"""


# ---------------------------------------------------------------------------
# Set operations: UNION ALL / INTERSECT / EXCEPT (reference test_utils.py
# BaseUnion/BaseIntersect/BaseExcept).
# ---------------------------------------------------------------------------

def q_setops_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust_nations = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp_nations = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    both = cust_nations.intersect(supp_nations).withColumn("src", F.lit("both"))
    cust_only = cust_nations.distinct().exceptAll(supp_nations.distinct()).withColumn(
        "src", F.lit("customer_only")
    )
    return both.unionByName(cust_only).orderBy("src", "nationkey")


ORACLE_SETOPS = """
SELECT nationkey, 'both' AS src FROM
  (SELECT c_nationkey AS nationkey FROM customer
   INTERSECT
   SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'customer_only' AS src FROM
  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
   EXCEPT ALL
   SELECT DISTINCT s_nationkey FROM supplier)
ORDER BY src, nationkey
"""


# ---------------------------------------------------------------------------
# Sort / limit (reference test_dbt_show.py) + distinct count forms.
# ---------------------------------------------------------------------------

def q_top10_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # orderBy+limit compiles to TakeOrderedAndProject — O(n) scan with a
    # per-partition top-K heap, no global sort. Exactly what you want at scale.
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    )


ORACLE_TOP10 = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("distinct_orders"),
        F.countDistinct("l_partkey", "l_suppkey").alias("distinct_part_supp"),
        F.count(F.lit(1)).alias("n_rows"),
    ).orderBy("l_returnflag")


ORACLE_DISTINCT = """
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS distinct_orders,
       count(DISTINCT (l_partkey, l_suppkey)) AS distinct_part_supp,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Scalar subquery (reference orders_maxqa_incremental.sql:18-20:
# `where order_ts > (select max(order_ts) from {{ this }})`).
# ---------------------------------------------------------------------------

def q_scalar_subquery_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_orders_ssq")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
        FROM _orders_ssq
        WHERE o_orderdate > (SELECT date_add(max(o_orderdate), -30) FROM _orders_ssq)
        ORDER BY o_orderkey
        """
    )


ORACLE_SCALAR_SUBQ = """
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
FROM orders
WHERE o_orderdate > (SELECT max(o_orderdate) - INTERVAL 30 DAY FROM orders)
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# Tuple-IN subquery (reference merge.sql:75-78 delete+insert key matching).
# ---------------------------------------------------------------------------

def q_tuple_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_li_tin")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM _li_tin
        WHERE (l_orderkey, l_partkey) IN (
            SELECT l_orderkey, l_partkey FROM _li_tin WHERE l_quantity >= 49
        )
        ORDER BY l_orderkey, l_linenumber
        """
    )


ORACLE_TUPLE_IN = """
SELECT a.l_orderkey, a.l_linenumber, a.l_quantity
FROM lineitem a
WHERE EXISTS (
    SELECT 1 FROM lineitem b
    WHERE b.l_quantity >= 49
      AND b.l_orderkey = a.l_orderkey AND b.l_partkey = a.l_partkey
)
ORDER BY a.l_orderkey, a.l_linenumber
"""


# ---------------------------------------------------------------------------
# generate_series / date_spine (reference macros/utils/date_spine.sql):
# spark.range replaces the power-of-two cross-join construct entirely.
# ---------------------------------------------------------------------------

def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # day spine over 1995-01-01 .. 1995-03-01 (exclusive end, per dbt
    # date_spine contract: start inclusive, end exclusive).
    n_days = 59
    return (
        spark.range(n_days)
        .select(
            F.date_add(F.lit("1995-01-01").cast("date"), F.col("id").cast("int")).alias(
                "date_day"
            )
        )
        .orderBy("date_day")
    )


ORACLE_DATE_SPINE = """
SELECT CAST(DATE '1995-01-01' + INTERVAL (i) DAY AS DATE) AS date_day
FROM generate_series(0, 58) AS t(i)
ORDER BY date_day
"""


QUERIES = {
    "flagship_customers": q_flagship_customers,
    "agg_daily_orders": q_agg_daily_orders,
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "anti_join_customers_without_orders": q_customers_without_orders,
    "semi_join_parts_with_lineitems": q_parts_with_lineitems,
    "cartesian_regions": q_cartesian_regions,
    "window_top_orders_per_segment": q_window_top_orders,
    "window_running_revenue": q_window_running_revenue,
    "setops_nationkeys": q_setops_nationkeys,
    "top10_expensive_orders": q_top10_expensive_orders,
    "distinct_counts": q_distinct_counts,
    "scalar_subquery_recent_orders": q_scalar_subquery_recent,
    "tuple_in_subquery": q_tuple_in_subquery,
    "date_spine": q_date_spine,
}

ORACLES = {
    "flagship_customers": ORACLE_FLAGSHIP,
    "agg_daily_orders": ORACLE_AGG_DAILY,
    "pricing_summary": ORACLE_PRICING,
    "revenue_by_nation": ORACLE_REVENUE_NATION,
    "anti_join_customers_without_orders": ORACLE_ANTI,
    "semi_join_parts_with_lineitems": ORACLE_SEMI,
    "cartesian_regions": ORACLE_CARTESIAN,
    "window_top_orders_per_segment": ORACLE_WINDOW_TOPK,
    "window_running_revenue": ORACLE_WINDOW_RUNNING,
    "setops_nationkeys": ORACLE_SETOPS,
    "top10_expensive_orders": ORACLE_TOP10,
    "distinct_counts": ORACLE_DISTINCT,
    "scalar_subquery_recent_orders": ORACLE_SCALAR_SUBQ,
    "tuple_in_subquery": ORACLE_TUPLE_IN,
    "date_spine": ORACLE_DATE_SPINE,
}
