"""Function-library suite (SURVEY.md §2.6) — each query exercises a
group of scalar/aggregate functions over the fixture tables with a
DuckDB oracle. The reference's golden-seed pattern (test_utils.py) is
reproduced as unit tests in tests/test_functions.py; these queries
prove the same semantics at table scale through the driver gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_maxcompute_spark.functions import scalar as fn
from dbt_maxcompute_spark.sources.registry import load_table


# ---------------------------------------------------------------------------
# strings: length/right/split_part/position/replace/concat/hash/
# cast_bool_to_text/safe_cast/equals — reference macros/utils/*.sql
# ---------------------------------------------------------------------------

def q_fn_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    text, lang, source = F.col("text"), F.col("lang"), F.col("source")
    return docs.select(
        "doc_id",
        fn.length(text).alias("len_text"),
        fn.right(source, 2).alias("src_last2"),
        fn.right(source, 0).alias("src_right0"),
        fn.split_part(source, "rc", 1).alias("src_first"),
        fn.split_part(source, "rc", -1).alias("src_last"),
        fn.position("data", text).alias("pos_data"),
        fn.replace(lang, "en", "english").alias("lang_replaced"),
        fn.concat(lang, F.lit(":"), source).alias("lang_source"),
        fn.hash_(F.nullif(lang, F.lit("en"))).alias("lang_hash"),
        fn.cast_bool_to_text(F.col("n_chars") > 300).alias("is_long"),
        fn.safe_cast(lang, "int").alias("lang_as_int"),
        fn.equals(F.nullif(lang, F.lit("en")), F.nullif(source, F.lit("src1"))).alias(
            "weird_eq"
        ),
    ).orderBy("doc_id")


ORACLE_FN_STRING = """
SELECT doc_id,
       length(text) AS len_text,
       right(source, 2) AS src_last2,
       '' AS src_right0,
       split_part(source, 'rc', 1) AS src_first,
       coalesce(list_extract(string_split(source, 'rc'), -1), '') AS src_last,
       strpos(text, 'data') AS pos_data,
       replace(lang, 'en', 'english') AS lang_replaced,
       lang || ':' || source AS lang_source,
       CASE WHEN nullif(lang, 'en') IS NULL THEN md5('')
            ELSE md5(nullif(lang, 'en')) END AS lang_hash,
       lower(CAST(n_chars > 300 AS VARCHAR)) AS is_long,
       try_cast(lang AS INT) AS lang_as_int,
       nullif(lang, 'en') IS NOT DISTINCT FROM nullif(source, 'src1') AS weird_eq
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# date/time: date_trunc alias map, dateadd unit algebra, boundary-counting
# datediff, last_day — reference macros/utils/date*.sql, last_day.sql
# ---------------------------------------------------------------------------

def q_fn_datetime_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    anchor = F.lit("1995-06-15 12:00:00").cast("timestamp")
    return orders.select(
        "o_orderkey",
        fn.date_trunc("month", od).cast("date").alias("month_start"),
        fn.date_trunc("quarter", od).cast("date").alias("quarter_start"),
        fn.date_trunc("week", od).cast("date").alias("week_start"),
        fn.dateadd("day", 7, od).alias("plus_7d"),
        fn.dateadd("week", 2, od).alias("plus_2w"),
        fn.dateadd("quarter", 1, od).alias("plus_1q"),
        fn.dateadd("hour", 36, od).alias("plus_36h"),
        fn.datediff(anchor, od, "day").alias("dd_day"),
        fn.datediff(anchor, od, "month").alias("dd_month"),
        fn.datediff(anchor, od, "week").alias("dd_week"),
        fn.datediff(anchor, od, "year").alias("dd_year"),
        fn.last_day(od, "month").alias("eom"),
        fn.last_day(od, "year").alias("eoy"),
    ).orderBy("o_orderkey")


ORACLE_FN_DATETIME = """
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
       CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
       o_orderdate + INTERVAL 7 DAY AS plus_7d,
       o_orderdate + INTERVAL 14 DAY AS plus_2w,
       o_orderdate + INTERVAL 3 MONTH AS plus_1q,
       o_orderdate + INTERVAL 36 HOUR AS plus_36h,
       date_diff('day', TIMESTAMP '1995-06-15 12:00:00', o_orderdate) AS dd_day,
       date_diff('month', TIMESTAMP '1995-06-15 12:00:00', o_orderdate) AS dd_month,
       date_diff('week', TIMESTAMP '1995-06-15 12:00:00', o_orderdate) AS dd_week,
       date_diff('year', TIMESTAMP '1995-06-15 12:00:00', o_orderdate) AS dd_year,
       last_day(CAST(o_orderdate AS DATE)) AS eom,
       make_date(CAST(year(o_orderdate) AS INT), 12, 31) AS eoy
FROM orders ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# aggregates: listagg (ordered), bool_or, any_value — reference
# macros/utils/{listagg,bool_or,any_value}.sql
# ---------------------------------------------------------------------------

def q_fn_listagg_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            fn.listagg(
                F.col("l_linenumber"), ",", order_by=F.col("l_linenumber")
            ).alias("line_numbers"),
            fn.bool_or(F.col("l_returnflag") == "R").alias("any_returned"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_orderkey")
    )


ORACLE_FN_LISTAGG = """
SELECT l_orderkey,
       string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS line_numbers,
       bool_or(l_returnflag = 'R') AS any_returned,
       count(*) AS n_lines
FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey
"""


def q_fn_any_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # any_value over a functionally-dependent column (deterministic)
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_custkey")
        .agg(
            fn.any_value(F.col("c_name")).alias("name"),
            fn.bool_or(F.col("c_acctbal") > 0).alias("positive_bal"),
        )
        .orderBy("c_custkey")
    )


ORACLE_FN_ANY_VALUE = """
SELECT c_custkey, any_value(c_name) AS name, bool_or(c_acctbal > 0) AS positive_bal
FROM customer GROUP BY c_custkey ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# arrays: array_construct / array_append / array_concat — reference
# macros/utils/array_*.sql (incl. typed-empty trick)
# ---------------------------------------------------------------------------

def q_fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    base = fn.array_construct([F.col("l_orderkey"), F.col("l_partkey")])
    appended = fn.array_append(base, F.col("l_suppkey"))
    full = fn.array_concat(appended, fn.array_construct([F.col("l_linenumber").cast("bigint")]))
    empty = fn.array_construct([], "bigint")
    # Array kept internal; JSON-stringified at the output boundary — the
    # driver's pandas-level hasher cannot hash list cells.
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.to_json(full).alias("keys_arr"),
        F.size(full).alias("arr_len"),
        F.element_at(full, 3).alias("third"),
        F.size(empty).alias("empty_len"),
    ).orderBy("l_orderkey", "l_linenumber")


ORACLE_FN_ARRAY = """
SELECT l_orderkey, l_linenumber,
       CAST(to_json([l_orderkey, l_partkey, l_suppkey, CAST(l_linenumber AS BIGINT)]) AS VARCHAR) AS keys_arr,
       4 AS arr_len,
       l_suppkey AS third,
       0 AS empty_len
FROM lineitem ORDER BY l_orderkey, l_linenumber
"""


QUERIES = {
    "fn_string_ops": q_fn_string_ops,
    "fn_datetime_ops": q_fn_datetime_ops,
    "fn_listagg_lineitems": q_fn_listagg_lineitems,
    "fn_any_value": q_fn_any_value,
    "fn_array_ops": q_fn_array_ops,
}

ORACLES = {
    "fn_string_ops": ORACLE_FN_STRING,
    "fn_datetime_ops": ORACLE_FN_DATETIME,
    "fn_listagg_lineitems": ORACLE_FN_LISTAGG,
    "fn_any_value": ORACLE_FN_ANY_VALUE,
    "fn_array_ops": ORACLE_FN_ARRAY,
}
