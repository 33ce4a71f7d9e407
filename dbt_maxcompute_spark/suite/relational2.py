"""Relational suite, part 2: multi-dimensional aggregation (rollup /
cube / grouping sets), pivot, correlated EXISTS / NOT EXISTS,
array+struct explode, and decimal-precision fidelity (SURVEY.md §7
watch-list item e).

Scale notes: rollup/cube over LOW-cardinality keys are computed as
base-aggregate-then-re-rollup — Spark's native rollup/cube runs the
Expand operator on every input row (fan-out x grouping-set count
BEFORE the shuffle); pre-aggregating on the full key first means the
fact table crosses the shuffle once, partially aggregated map-side,
and the Expand touches only #distinct-groups rows.  Valid because
count and decimal-sum partials re-aggregate exactly (associative).
Pivot with an explicit value list stays one aggregation (no
distinct-values probe job); EXISTS decorrelates to a semi join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_maxcompute_spark.sources.registry import load_table


def _dsum(col, scale=6):
    return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# rollup
# ---------------------------------------------------------------------------


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Pre-aggregate on the full key (1 shuffle, map-side combine), then
    # rollup the ~6-row result: count/decimal-sum partials recombine
    # exactly, so this matches the single-pass rollup bit-for-bit while
    # the Expand fan-out touches 6 rows instead of the whole fact table.
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")).alias(
            "_rev"
        ),
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("_n").alias("n"),
            F.sum("_rev").cast("double").alias("revenue"),
            F.grouping_id("l_returnflag", "l_linestatus").alias("gid"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


ORACLE_ROLLUP = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
       GROUPING(l_returnflag, l_linestatus) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# cube
# ---------------------------------------------------------------------------


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # Same base-aggregate-then-re-cube trick as q_rollup_revenue: the
    # Expand fan-out (x4 grouping sets for a 2-col cube) runs over the
    # ~15 distinct (status, priority) pairs, not every order row.
    base = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("_tot"),
    )
    return (
        base.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum("_n").alias("n"),
            F.sum("_tot").cast("double").alias("total"),
            F.grouping_id("o_orderstatus", "o_orderpriority").alias("gid"),
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


ORACLE_CUBE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total,
       GROUPING(o_orderstatus, o_orderpriority) AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus, o_orderpriority
"""


# ---------------------------------------------------------------------------
# pivot (explicit value list -> single aggregation pass)
# ---------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
        .orderBy("o_orderstatus")
    )
    renames = {p: f"p{p[0]}" for p in _PRIORITIES}
    for old, new in renames.items():
        piv = piv.withColumnRenamed(old, new)
    # count-pivot yields NULL for empty cells; normalize to 0
    return piv.select(
        "o_orderstatus", *[F.coalesce(F.col(n), F.lit(0)).alias(n) for n in renames.values()]
    )


ORACLE_PIVOT = """
SELECT o_orderstatus,
       count(*) FILTER (o_orderpriority = '1-URGENT') AS p1,
       count(*) FILTER (o_orderpriority = '2-HIGH') AS p2,
       count(*) FILTER (o_orderpriority = '3-MEDIUM') AS p3,
       count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4,
       count(*) FILTER (o_orderpriority = '5-LOW') AS p5
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# correlated EXISTS / NOT EXISTS (decorrelated by Catalyst to semi/anti)
# ---------------------------------------------------------------------------


def q_exists_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_maxcompute_spark.sources.registry import register_views

    register_views(spark, sf_dir, ("supplier", "lineitem"))
    return spark.sql(
        """
        SELECT s_suppkey, s_name,
               EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
                 AS has_bulk
        FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
        ORDER BY s_suppkey
        """
    )


ORACLE_EXISTS = """
SELECT s_suppkey, s_name,
       EXISTS (SELECT 1 FROM lineitem l
               WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45) AS has_bulk
FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# array + struct build / explode round-trip
# ---------------------------------------------------------------------------


def q_explode_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("ln"), F.col("l_quantity").alias("qty")
                )
            )
        ).alias("lines")
    )
    ex = nested.select(
        "l_orderkey",
        F.posexplode("lines").alias("pos", "line"),
    )
    return ex.select(
        "l_orderkey",
        "pos",
        F.col("line.ln").alias("ln"),
        F.col("line.qty").alias("qty"),
    ).orderBy("l_orderkey", "pos")


ORACLE_EXPLODE = """
WITH nested AS (
  SELECT l_orderkey,
         list_sort(list({'ln': l_linenumber, 'qty': l_quantity})) AS lines
  FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey
), ex AS (
  SELECT l_orderkey,
         generate_subscripts(lines, 1) AS pos1,
         unnest(lines) AS line
  FROM nested
)
SELECT l_orderkey, CAST(pos1 - 1 AS INT) AS pos,
       line.ln AS ln, line.qty AS qty
FROM ex ORDER BY l_orderkey, pos
"""


# ---------------------------------------------------------------------------
# decimal precision/scale fidelity through aggregation
# ---------------------------------------------------------------------------


def q_decimal_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            # Decimal math internally; DOUBLE at the output boundary so the
            # driver's pandas-level value hash sees float64 on both sides
            # (DuckDB surfaces every DECIMAL as float64 via .df()).
            F.sum(d).cast("decimal(38,4)").cast("double").alias("sum_price"),
            F.sum(d * (F.lit(1).cast("decimal(18,4)") - disc))
            .cast("decimal(38,8)")
            .cast("double")
            .alias("sum_disc_price"),
            F.min(d).cast("double").alias("min_price"),
            F.max(d).cast("double").alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_DECIMAL = """
SELECT l_returnflag,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_price,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
            AS DECIMAL(38,8)) AS DOUBLE) AS sum_disc_price,
       CAST(min(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS min_price,
       CAST(max(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS max_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


QUERIES = {
    "rollup_revenue": q_rollup_revenue,
    "cube_orders": q_cube_orders,
    "pivot_status_priority": q_pivot_status_priority,
    "exists_suppliers": q_exists_suppliers,
    "explode_order_lines": q_explode_order_lines,
    "decimal_fidelity": q_decimal_fidelity,
}

ORACLES = {
    "rollup_revenue": ORACLE_ROLLUP,
    "cube_orders": ORACLE_CUBE,
    "pivot_status_priority": ORACLE_PIVOT,
    "exists_suppliers": ORACLE_EXISTS,
    "explode_order_lines": ORACLE_EXPLODE,
    "decimal_fidelity": ORACLE_DECIMAL,
}
