"""Round-9 suite: the last reference-parity corners — model hooks
(``pre_hook``/``post_hook``) and ``sql_header``/``sql_hints`` wired
into ``run_model`` (reference ``macros/materializations/hooks.sql``,
``macros/relations/table/create.sql:122-133``) — plus the next rung of
the 100 TB ANN story (stats-triggered IVF coarse-quantizer rebalance)
and MV auto-rewrite through catalog views.

Oracle conventions as elsewhere: exact sums through DECIMAL(28,6)
cast to DOUBLE at the edge, counts as BIGINT, explicit ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_maxcompute_spark.sources.registry import load_table


def q_model_hooks_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-9 (verdict item 1): a hooked incremental run. The pre-hook
    # audits the PRE-run table state and the post-hook the post-run
    # state (reference test_hooks.py's on_model_hook start/end rows);
    # sql_header + sql_hints become a SET preamble whose confs scope to
    # the materialization (reference merge_sql_hints_and_header) —
    # observable in the DATA via current_timezone(): rows written by
    # the hooked run carry the header's zone, rows from the unhooked
    # initial build carry the session default, and the session conf is
    # restored afterwards (the conf_restored column).
    import tempfile

    from dbt_maxcompute_spark.catalog import EngineCatalog
    from dbt_maxcompute_spark.runner import run_model

    cat = EngineCatalog(spark, tempfile.mkdtemp(prefix="hooks_wh_"))
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 4 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    cat.create_table("ord_src", base)
    cat.create_table(
        "on_model_hook",
        spark.createDataFrame([], "test_state string, n bigint"),
    )
    tz_before = spark.conf.get("spark.sql.session.timeZone")

    # initial build (no hooks): the even-custkey slice; tz records the
    # session zone at write time
    run_model(
        cat,
        {"name": "hk", "materialized": "incremental", "strategy": "append"},
        "SELECT o_orderkey, o_custkey, o_totalprice, current_timezone() AS tz "
        "FROM ord_src WHERE o_custkey % 2 = 0",
    )
    # hooked + header-scoped merge: doubles the price of the
    # %3-custkey slice and upserts it by key
    run_model(
        cat,
        {
            "name": "hk",
            "materialized": "incremental",
            "strategy": "merge",
            "unique_key": "o_orderkey",
            "pre_hook": "INSERT INTO on_model_hook SELECT 'start', count(*) FROM hk",
            "post_hook": [
                {"sql": "INSERT INTO on_model_hook SELECT 'end', count(*) FROM hk"}
            ],
            "sql_hints": {"odps.sql.allow.fullscan": "true"},  # inert hint shape
            "sql_header": "set spark.sql.session.timeZone=Asia/Tokyo;",
        },
        "SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice, "
        "current_timezone() AS tz FROM ord_src WHERE o_custkey % 3 = 0",
    )
    conf_restored = spark.conf.get("spark.sql.session.timeZone") == tz_before

    final = cat.read("hk")
    audit = cat.read("on_model_hook")
    dsum = F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double")
    hook_rows = audit.select(
        F.concat(F.lit("hook_"), F.col("test_state")).alias("state"),
        F.col("n"),
        F.lit(0.0).alias("total"),
    )
    tz_rows = final.groupBy("tz").agg(
        F.count("*").alias("n"), dsum.alias("total")
    ).select(
        F.when(F.col("tz") == "Asia/Tokyo", F.lit("rows_tokyo"))
        .otherwise(F.lit("rows_session_default"))
        .alias("state"),
        "n",
        "total",
    )
    return (
        hook_rows.unionByName(tz_rows)
        .withColumn("conf_restored", F.lit(bool(conf_restored)))
        .orderBy("state")
    )


ORACLE_MODEL_HOOKS_SCRIPT = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 4 = 0
),
init AS (SELECT * FROM base WHERE o_custkey % 2 = 0),
src AS (
  SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
  FROM base WHERE o_custkey % 3 = 0
),
kept AS (
  SELECT * FROM init WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
)
SELECT state, n, total, TRUE AS conf_restored FROM (
  SELECT 'hook_start' AS state, (SELECT CAST(count(*) AS BIGINT) FROM init) AS n,
         0.0 AS total
  UNION ALL
  SELECT 'hook_end',
         (SELECT CAST(count(*) AS BIGINT) FROM kept)
           + (SELECT CAST(count(*) AS BIGINT) FROM src),
         0.0
  UNION ALL
  SELECT 'rows_session_default', CAST(count(*) AS BIGINT),
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
  FROM kept
  UNION ALL
  SELECT 'rows_tokyo', CAST(count(*) AS BIGINT),
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
  FROM src
) ORDER BY state
"""


QUERIES = {
    "model_hooks_script": q_model_hooks_script,
}

ORACLES = {
    "model_hooks_script": ORACLE_MODEL_HOOKS_SCRIPT,
}
