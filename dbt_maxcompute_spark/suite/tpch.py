"""TPC-H-shaped deep-plan suite (SURVEY.md §2.5 stress set).

The reference's tutorial runs against the TPC-H 10 GB public dataset
(reference docs/Tutorial.md:24); its generated models exercise multi-way
joins, conditional aggregation, and subqueries.  This suite re-creates
the classic TPC-H plan shapes (Q3/Q4/Q7/Q8/Q9/Q10/Q13/Q14/Q15/Q17/
Q18/Q19/Q20/Q22) adapted to the driver's synthetic star schema (no
partsupp table, single-word p_type values, NATION_k names).

Each query carries a scale note: what the plan must look like on a
1000-executor cluster at 100 TB, and why this formulation gets there.
Global rules: broadcast the fixed-cardinality dims (region=5,
nation=25, and any filtered dim under the 10 MB AQE threshold),
aggregate before joining whenever the group key contains the join key,
express correlated-aggregate subqueries as groupBy+join (one scan each
side) rather than per-row re-scans.

Numeric determinism: double sums go through decimal(28,6)
(`_dsum`) so the Spark and DuckDB value-hashes agree (see
suite/__init__.py); ratios divide two such sums; `year()` is cast to
int on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_maxcompute_spark.sources.registry import load_table


def _dsum(col, scale=6):
    return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q3: shipping priority — 3-way join, agg, top-K.
# Scale: both filters cut before the joins (predicate pushdown into the
# parquet scans); TakeOrderedAndProject keeps the top-10 per partition so
# no global sort materializes.
# ---------------------------------------------------------------------------

def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(_rev()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


ORACLE_Q3 = """
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q4: order-priority checking — EXISTS with a cross-table predicate
# (l_shipdate > o_orderdate + 60 days; the synthetic schema has no
# commitdate/receiptdate pair).  Spark plans the compound-condition
# left-semi join directly; no correlated re-scan.
# Scale: the semi join shuffles only (orderkey, orderdate) + lineitem's
# (orderkey, shipdate) — narrow projections, pruned at the scan.
# ---------------------------------------------------------------------------

def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q7: volume shipping — supplier-nation x customer-nation trade lanes.
# Scale: nation is 25 rows — broadcast twice (two aliases); the only
# shuffles are the three fact-side equi-joins, all on pruned columns.
# ---------------------------------------------------------------------------

def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cust_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("supp_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cust_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(_dsum(_rev()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


ORACLE_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q8: market share — ratio of one brand's revenue to total per year.
# Scale: the share is two partial sums in ONE aggregation pass
# (conditional agg), not two scans joined back.
# ---------------------------------------------------------------------------

def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    vol = _rev()
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "REGION_0")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            _dsum(F.when(F.col("p_brand") == "Brand#13", vol).otherwise(F.lit(0.0))).alias(
                "brand_volume"
            ),
            _dsum(vol).alias("total_volume"),
        )
        .select(
            "o_year",
            (F.col("brand_volume") / F.col("total_volume")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


ORACLE_Q8 = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(sum(CAST(CASE WHEN p_brand = 'Brand#13'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                AS DECIMAL(28,6))) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
         AS mkt_share
FROM lineitem
JOIN part     ON l_partkey  = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'REGION_0'
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q9: product-type profit — no partsupp in the synthetic schema, so
# supply cost is modeled as 60% of p_retailprice.
# Scale: part/supplier join keys are the fact table's own columns;
# nation broadcast; the groupBy runs on the already-joined narrow rows.
# ---------------------------------------------------------------------------

def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey", "p_retailprice"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _rev() - F.col("p_retailprice") * F.lit(0.6) * F.col("l_quantity")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(_dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


ORACLE_Q9 = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     - p_retailprice * 0.6 * l_quantity AS DECIMAL(28,6))) AS DOUBLE)
         AS sum_profit
FROM lineitem
JOIN part     ON l_partkey  = p_partkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_type = 'PROMO'
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q10: returned-item reporting — top 20 customers by lost revenue.
# Scale: returnflag filter prunes ~75% of lineitem at the scan; the
# customer join AGGREGATES FIRST on custkey (join key == group key) so
# the expensive join moves the 20-row side... no — the agg is on the
# joined rows, but grouping key includes only customer attrs, so we
# aggregate lineitem x orders down to custkey BEFORE joining customer
# and nation: the final join is #customers-sized, not #lineitems-sized.
# ---------------------------------------------------------------------------

def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(_dsum(_rev()).alias("revenue"))
    )
    return (
        per_cust.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", F.col("n_name").alias("nation"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_Q10 = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate <  TIMESTAMP '1997-07-01'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, revenue, c_acctbal, n_name AS nation
FROM per_cust JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey ASC LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution — left outer join + two-level
# aggregation (count per customer, then histogram of counts).
# Scale: both aggs are hash aggs with map-side partials; the second agg's
# input is #customers rows, tiny.  Left join keeps 0-order customers.
# ---------------------------------------------------------------------------

def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q14: promo revenue ratio — conditional agg over a part join, one pass.
# ---------------------------------------------------------------------------

def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            _dsum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))).alias(
                "promo_rev"
            ),
            _dsum(_rev()).alias("total_rev"),
        )
        .select(
            (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias("promo_pct"),
            "promo_rev",
            "total_rev",
        )
    )


ORACLE_Q14 = """
SELECT 100.0 * promo_rev / total_rev AS promo_pct, promo_rev, total_rev
FROM (
  SELECT CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                  AS DECIMAL(28,6))) AS DOUBLE) AS promo_rev,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS total_rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-02-01'
)
"""


# ---------------------------------------------------------------------------
# Q15: top supplier — agg then keep rows equal to the global max
# (scalar subquery over an aggregate).
# Scale: revenue-per-supplier is one shuffle; the max is a 1-row
# broadcast back into the filter — Spark runs the subquery once, not
# per row.
# ---------------------------------------------------------------------------

def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(_rev()).alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


ORACLE_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue — correlated aggregate subquery
# (per-part avg quantity) expressed as groupBy + join: ONE scan computes
# the per-part thresholds, ONE scan probes them.  The classic correlated
# form would re-aggregate per outer row.
# Scale: the threshold side is #parts rows — broadcastable after agg.
# ---------------------------------------------------------------------------

def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13").select(
        "p_partkey"
    )
    # decimal-exact avg so Spark and DuckDB agree on boundary rows
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(28,6)"))
                / F.count(F.lit(1))
            ).cast("double")
        ).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (_dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


ORACLE_Q17 = """
WITH thresholds AS (
  SELECT l_partkey AS t_partkey,
         0.2 * CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) / count(*) AS DOUBLE)
           AS qty_threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0 AS avg_yearly,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN thresholds ON l_partkey = t_partkey
WHERE p_brand = 'Brand#13' AND l_quantity < qty_threshold
"""


# ---------------------------------------------------------------------------
# Q18: large-volume customers — HAVING over a big agg, joined back to
# the dimension tables; top 20.
# Scale: the HAVING filter runs map-side-combined on lineitem before any
# join; the surviving orderkeys are few → the orders/customer joins are
# small-side broadcasts under AQE.
# ---------------------------------------------------------------------------

def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


ORACLE_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) > 250
)
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q19: disjunctive predicate pushdown — OR of three (brand, size, qty)
# envelopes.  Catalyst pushes the whole disjunction to both scans
# (common conjuncts extracted) and plans one hash join.
# ---------------------------------------------------------------------------

def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        _dsum(_rev()).alias("revenue"), F.count(F.lit(1)).alias("n_lines")
    )


ORACLE_Q19 = """
SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q20: nested IN subqueries — suppliers who shipped > 300 units of
# SMALL-type parts.  Two semi-join levels, both expressed as joins over
# pre-aggregated sides (no correlated re-scan).
# ---------------------------------------------------------------------------

def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL").select(
        "p_partkey"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    shipped = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double").alias("small_qty"))
        .filter(F.col("small_qty") > 300)
    )
    return (
        supp.join(shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


ORACLE_Q20 = """
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
  GROUP BY l_suppkey
  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) > 300
)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q22: global sales opportunity — above-average-balance customers with
# no orders, bucketed.  Scalar aggregate subquery + anti join.
# Scale: the avg is a 1-row broadcast; the anti join shuffles only keys.
# ---------------------------------------------------------------------------

def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(28,6)")) / F.count(F.lit(1)))
        .cast("double")
        .alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.pmod(F.col("c_custkey"), F.lit(5)).cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal"), scale=2).alias("totacctbal"),
        )
        .orderBy("bucket")
    )


ORACLE_Q22 = """
SELECT CAST(c_custkey % 5 AS INT) AS bucket,
       count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) / count(*) AS DOUBLE)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "tpch_q3_shipping_priority": q_tpch_q3,
    "tpch_q4_late_order_priority": q_tpch_q4,
    "tpch_q7_volume_shipping": q_tpch_q7,
    "tpch_q8_market_share": q_tpch_q8,
    "tpch_q9_profit_by_nation": q_tpch_q9,
    "tpch_q10_returned_items": q_tpch_q10,
    "tpch_q13_customer_distribution": q_tpch_q13,
    "tpch_q14_promo_revenue": q_tpch_q14,
    "tpch_q15_top_supplier": q_tpch_q15,
    "tpch_q17_small_qty_revenue": q_tpch_q17,
    "tpch_q18_large_volume_customers": q_tpch_q18,
    "tpch_q19_disjunctive_filter": q_tpch_q19,
    "tpch_q20_small_part_suppliers": q_tpch_q20,
    "tpch_q22_idle_customers": q_tpch_q22,
}

ORACLES = {
    "tpch_q3_shipping_priority": ORACLE_Q3,
    "tpch_q4_late_order_priority": ORACLE_Q4,
    "tpch_q7_volume_shipping": ORACLE_Q7,
    "tpch_q8_market_share": ORACLE_Q8,
    "tpch_q9_profit_by_nation": ORACLE_Q9,
    "tpch_q10_returned_items": ORACLE_Q10,
    "tpch_q13_customer_distribution": ORACLE_Q13,
    "tpch_q14_promo_revenue": ORACLE_Q14,
    "tpch_q15_top_supplier": ORACLE_Q15,
    "tpch_q17_small_qty_revenue": ORACLE_Q17,
    "tpch_q18_large_volume_customers": ORACLE_Q18,
    "tpch_q19_disjunctive_filter": ORACLE_Q19,
    "tpch_q20_small_part_suppliers": ORACLE_Q20,
    "tpch_q22_idle_customers": ORACLE_Q22,
}
