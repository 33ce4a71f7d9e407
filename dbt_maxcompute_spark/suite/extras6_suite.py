"""Round-7 suite: join-rollup IVM (rollup over fact JOIN dim with
BOTH sides mutable, maintained from two change feeds under one
two-cursor exactly-once commit) plus SQL-DDL statement routing
(CREATE VIEW / CREATE MATERIALIZED VIEW / RENAME / CLONE / comment
DDL — the statement forms the reference's macros emit).

Oracle conventions as elsewhere: exact sums through DECIMAL(28,6)
cast to DOUBLE at the edge, counts as BIGINT, explicit ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_maxcompute_spark.sources.registry import load_table


def q_mv_join_cdf_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Join-rollup IVM (DBSP bag algebra, Budiu et al. VLDB 2023):
    # revenue-by-market-segment over orders ⋈ customer, bootstrapped
    # once, then maintained from the TWO change feeds after a fact
    # DELETE, a dim segment re-assignment (delete+insert pair -> the
    # F₀⋈ΔD term MOVES contributions between groups), and a fact
    # append (the ΔF⋈D₁ term, including ΔF⋈ΔD interaction). The two
    # cursors ride ONE target commit, so the replayed sync applies
    # nothing — replay_noop is the exactly-once invariant, equality
    # with the oracle's final-state recompute is the IVM invariant.
    import tempfile

    from dbt_maxcompute_spark.materializations.materialized_view import (
        sync_join_rollup_exactly_once,
    )
    from dbt_maxcompute_spark.txnlog import TxnTable

    fact0 = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 == 0)
        .select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("price"),
        )
    )
    dim0 = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("seg")
    )
    tmp = tempfile.mkdtemp(prefix="jivm_")
    fact = TxnTable(spark, tmp + "/fact")
    fact.create(fact0)
    dim = TxnTable(spark, tmp + "/dim")
    dim.create(dim0)
    tgt = TxnTable(spark, tmp + "/rollup")

    def sync():
        return sync_join_rollup_exactly_once(
            fact, dim, tgt,
            on=["custkey"], keys=["seg"], sums={"sum_price": "price"},
            count_col="n",
        )

    sync()  # bootstrap: full join-aggregate + both cursors in ONE commit
    # fact: row-level DELETE via deletion vectors
    fact.delete_where_dv("custkey % 5 = 0")
    # dim: segment re-assignment as a key upsert (delete+insert pair)
    moved = dim0.filter(F.col("custkey") % 4 == 1).withColumn(
        "seg", F.lit("MOVED")
    )
    dim.delete_insert_dv(moved, ["custkey"])
    # fact: append a disjoint slice
    fact.append(
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 == 3)
        .select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("price"),
        )
    )
    applied = sync()   # fact 2 versions + dim 1 version, one target commit
    replayed = sync()  # exactly-once: nothing to apply
    return (
        tgt.read()
        .select(
            "seg",
            F.col("n").alias("n_orders"),
            F.col("sum_price").cast("double").alias("total_price"),
            F.lit(applied == 3 and replayed == 0).alias("replay_noop"),
        )
        .orderBy("seg")
    )


ORACLE_MV_JOIN_CDF_MAINTENANCE = """
WITH f1 AS (
  SELECT o_orderkey AS okey, o_custkey AS custkey, o_totalprice AS price
  FROM orders WHERE o_orderkey % 7 = 0
),
fact AS (
  SELECT * FROM f1 WHERE custkey % 5 <> 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice
  FROM orders WHERE o_orderkey % 7 = 3
),
dim AS (
  SELECT c_custkey AS custkey,
         CASE WHEN c_custkey % 4 = 1 THEN 'MOVED' ELSE c_mktsegment END AS seg
  FROM customer
)
SELECT seg, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(price AS DECIMAL(28,6))) AS DOUBLE) AS total_price,
       TRUE AS replay_noop
FROM fact JOIN dim USING (custkey)
GROUP BY seg ORDER BY seg
"""


def q_sql_ddl_statement_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-7 statement routing: the DDL forms the reference's macros
    # emit, end-to-end through the SQL router — CREATE OR REPLACE VIEW
    # (view/create.sql:1-14, the single most common generated DDL),
    # CLONE TABLE (clone.sql:6-11), ALTER TABLE RENAME TO
    # (adapters.sql:14-26, dbt's backup/swap), comment persistence
    # (persist_docs.sql / impl.py:629-669) and CREATE MATERIALIZED VIEW
    # (_materialized_view.py:98-128). The view must RESOLVE in later
    # statements (registered over its defining SQL, seeing base-table
    # mutations), the clone+rename chain must carry the data, and the
    # recorded comments ride the result as a metadata column. A second
    # INSERT after the MV create plus ALTER MATERIALIZED VIEW REBUILD
    # (refresh.sql:1-3) proves the refresh path: mv_f reflects BOTH
    # slices while the clone-then-renamed archive pins the first.
    import tempfile

    from dbt_maxcompute_spark.catalog import EngineCatalog

    cat = EngineCatalog(spark, tempfile.mkdtemp(prefix="ddl_wh_"))
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("r7_orders_src")
    df, _hints, errors = cat.execute_script(
        """
        CREATE TABLE fact (k bigint, status string, price double);
        INSERT INTO fact
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM r7_orders_src WHERE o_orderkey % 5 = 0;
        CREATE OR REPLACE VIEW fact_f AS (
            SELECT k, price FROM fact WHERE status = 'F'
        );
        ALTER TABLE fact SET COMMENT 'facts';
        ALTER TABLE fact CHANGE COLUMN price COMMENT 'total price';
        CLONE TABLE fact TO fact_bak;
        ALTER TABLE fact_bak RENAME TO fact_archive;
        CREATE MATERIALIZED VIEW IF NOT EXISTS mv_status LIFECYCLE 7 AS (
            SELECT status, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(price AS DECIMAL(28,6))) AS DOUBLE) AS total
            FROM fact GROUP BY status
        );
        INSERT INTO fact
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM r7_orders_src WHERE o_orderkey % 5 = 2;
        ALTER MATERIALIZED VIEW mv_status REBUILD;
        SELECT 'archive' AS src, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(price AS DECIMAL(28,6))) AS DOUBLE) AS total
        FROM fact_archive
        UNION ALL
        SELECT 'mv_f', n, total FROM mv_status WHERE status = 'F'
        UNION ALL
        SELECT 'view_f', CAST(count(*) AS BIGINT),
               CAST(sum(CAST(price AS DECIMAL(28,6))) AS DOUBLE)
        FROM fact_f
        """
    )
    if errors or df is None:
        raise RuntimeError(f"ddl script failed: {errors}")
    meta = cat.meta("fact")
    doc = f"{meta.comment}|{meta.column_comments.get('price')}"
    # round-8 statement routing: schema DDL + listing/introspection
    # forms resolve against the ENGINE catalog (impl.py:217-248,
    # 250-297) — results folded into a deterministic literal column.
    cat.execute("CREATE SCHEMA IF NOT EXISTS aux")
    facts = ",".join(
        r.table_name for r in cat.execute("SHOW TABLES LIKE 'fact%'").collect()
    )
    schemas = ",".join(
        r.schema_name for r in cat.execute("SHOW SCHEMAS LIKE 'au_'").collect()
    )
    price_comment = {
        r.col_name: r.comment for r in cat.execute("DESCRIBE fact").collect()
    }["price"]
    cat.execute("DROP SCHEMA aux CASCADE")
    after = ",".join(
        r.schema_name for r in cat.execute("SHOW SCHEMAS LIKE 'au_'").collect()
    ) or "absent"
    ddl8 = f"{facts}|{schemas}|{price_comment}|{after}"
    return (
        df.withColumn("doc", F.lit(doc))
        .withColumn("ddl8", F.lit(ddl8))
        .orderBy("src")
    )


ORACLE_SQL_DDL_STATEMENT = """
WITH fact1 AS (
  SELECT o_orderkey AS k, o_orderstatus AS status, o_totalprice AS price
  FROM orders WHERE o_orderkey % 5 = 0
),
fact2 AS (
  SELECT o_orderkey AS k, o_orderstatus AS status, o_totalprice AS price
  FROM orders WHERE o_orderkey % 5 IN (0, 2)
)
SELECT 'archive' AS src, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(price AS DECIMAL(28,6))) AS DOUBLE) AS total,
       'facts|total price' AS doc,
       'fact,fact_archive,fact_f|aux|total price|absent' AS ddl8
FROM fact1
UNION ALL
SELECT 'mv_f', CAST(count(*) AS BIGINT),
       CAST(sum(CAST(price AS DECIMAL(28,6))) AS DOUBLE),
       'facts|total price',
       'fact,fact_archive,fact_f|aux|total price|absent'
FROM fact2 WHERE status = 'F'
UNION ALL
SELECT 'view_f', CAST(count(*) AS BIGINT),
       CAST(sum(CAST(price AS DECIMAL(28,6))) AS DOUBLE),
       'facts|total price',
       'fact,fact_archive,fact_f|aux|total price|absent'
FROM fact2 WHERE status = 'F'
ORDER BY src
"""


QUERIES = {
    "mv_join_cdf_maintenance": q_mv_join_cdf_maintenance,
    "sql_ddl_statement_script": q_sql_ddl_statement_script,
}

ORACLES = {
    "mv_join_cdf_maintenance": ORACLE_MV_JOIN_CDF_MAINTENANCE,
    "sql_ddl_statement_script": ORACLE_SQL_DDL_STATEMENT,
}
