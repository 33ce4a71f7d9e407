"""Relational suite, part 3: statistical aggregates (stddev / var /
corr / covar), exact percentiles, the full ranking-function family
(rank / dense_rank / percent_rank / cume_dist / ntile), and regexp
operators (extract / replace / rlike).

Determinism notes: moment aggregates over doubles are order-dependent
in the last bits — results round to 6 places on both engines; exact
percentiles (Spark `percentile` == DuckDB `quantile_cont`, linear
interpolation) are deterministic given the value multiset; ranking
windows order with an id tiebreak so ntile/cume_dist are total-order
stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dbt_maxcompute_spark.sources.registry import load_table


# ---------------------------------------------------------------------------
# statistical moments per group
# ---------------------------------------------------------------------------


def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    p = F.col("l_extendedprice").cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp(p), 6).alias("sd_price"),
            F.round(F.var_samp(q), 6).alias("var_qty"),
            F.round(F.corr(q, p), 6).alias("corr_qty_price"),
            F.round(F.covar_samp(q, p), 6).alias("covar_qty_price"),
            F.round(F.avg(p), 6).alias("avg_price"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_MOMENTS = """
SELECT l_returnflag,
       round(stddev_samp(CAST(l_extendedprice AS DOUBLE)), 6) AS sd_price,
       round(var_samp(CAST(l_quantity AS DOUBLE)), 6) AS var_qty,
       round(corr(CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE)), 6)
         AS corr_qty_price,
       round(covar_samp(CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE)), 6)
         AS covar_qty_price,
       round(avg(CAST(l_extendedprice AS DOUBLE)), 6) AS avg_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# exact percentiles (interpolated)
# ---------------------------------------------------------------------------


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast("double")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile(p, F.lit(0.25)), 4).alias("p25"),
            F.round(F.percentile(p, F.lit(0.5)), 4).alias("median"),
            F.round(F.percentile(p, F.lit(0.75)), 4).alias("p75"),
            F.round(F.percentile(p, F.lit(0.99)), 4).alias("p99"),
        )
        .orderBy("o_orderstatus")
    )


ORACLE_PERCENTILES = """
SELECT o_orderstatus,
       round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.25), 4) AS p25,
       round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5), 4) AS median,
       round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.75), 4) AS p75,
       round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.99), 4) AS p99
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# ranking family over a total order
# ---------------------------------------------------------------------------


def q_ranking_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    win = W.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderstatus",
            "o_orderkey",
            F.rank().over(win).alias("rnk"),
            F.dense_rank().over(win).alias("drnk"),
            F.round(F.percent_rank().over(win), 6).alias("prnk"),
            F.round(F.cume_dist().over(win), 6).alias("cdist"),
            F.ntile(4).over(win).alias("quartile"),
        )
        .filter(F.col("rnk") <= 50)
        .orderBy("o_orderstatus", "rnk")
    )


ORACLE_RANKING = """
WITH w AS (
  SELECT o_orderstatus, o_orderkey,
         rank() OVER win AS rnk,
         dense_rank() OVER win AS drnk,
         round(percent_rank() OVER win, 6) AS prnk,
         round(cume_dist() OVER win, 6) AS cdist,
         ntile(4) OVER win AS quartile
  FROM orders
  WHERE o_orderkey < 2000
  WINDOW win AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey)
)
SELECT * FROM w WHERE rnk <= 50 ORDER BY o_orderstatus, rnk
"""


# ---------------------------------------------------------------------------
# regexp operators
# ---------------------------------------------------------------------------


def q_regexp_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").rlike(r"^(red|blue)\s"))
        .select(
            "p_partkey",
            F.regexp_extract("p_name", r"^(\w+)\s+(\w+)$", 1).alias("color"),
            F.regexp_extract("p_name", r"^(\w+)\s+(\w+)$", 2).alias("item"),
            F.regexp_replace("p_brand", r"#\d+", "#X").alias("brand_masked"),
            F.regexp_extract("p_brand", r"#(\d+)", 1).cast("int").alias("brand_num"),
        )
        .orderBy("p_partkey")
    )


ORACLE_REGEXP = r"""
SELECT p_partkey,
       regexp_extract(p_name, '^(\w+)\s+(\w+)$', 1) AS color,
       regexp_extract(p_name, '^(\w+)\s+(\w+)$', 2) AS item,
       regexp_replace(p_brand, '#\d+', '#X') AS brand_masked,
       CAST(regexp_extract(p_brand, '#(\d+)', 1) AS INT) AS brand_num
FROM part
WHERE regexp_matches(p_name, '^(red|blue)\s')
ORDER BY p_partkey
"""


QUERIES = {
    "stats_moments": q_stats_moments,
    "percentiles_exact": q_percentiles,
    "ranking_family": q_ranking_family,
    "regexp_ops": q_regexp_ops,
}

ORACLES = {
    "stats_moments": ORACLE_MOMENTS,
    "percentiles_exact": ORACLE_PERCENTILES,
    "ranking_family": ORACLE_RANKING,
    "regexp_ops": ORACLE_REGEXP,
}
