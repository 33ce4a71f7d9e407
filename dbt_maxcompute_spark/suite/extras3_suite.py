"""Round-5 suite: SQL-surface DML + time travel, indexed ANN, MV
predicate-containment rewrite — each driver-checked against a DuckDB
oracle (same numeric-determinism conventions as the other suites).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_maxcompute_spark.sources.registry import load_table
from dbt_maxcompute_spark.localframe import local_frame


def q_sql_dml_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference's raw-materialization posture: a user drives
    # row-level DML as PLAIN SQL against a transactional table
    # (raw.sql:1-6; showcase 04_operations/*.sql issues DELETE/UPDATE/
    # MERGE server-side). Here the same script runs through
    # catalog.execute_script: DV delete (no file rewrite), COW update,
    # a MERGE whose source time-travels to version 0, and a final
    # SELECT mixing current state with pinned-version row counts.
    # The whole ledger is predicted by the DuckDB oracle.
    from dbt_maxcompute_spark.catalog import EngineCatalog

    cat = EngineCatalog(spark, tempfile.mkdtemp(prefix="sqldml_wh_"))
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 == 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    cat.create_table(
        "ord", base, transactional=True, primary_keys=["o_orderkey"]
    )
    df, _hints, errors = cat.execute_script(
        """
        SET spark.sql.shuffle.partitions=16;
        DELETE FROM ord WHERE o_orderstatus = 'F';
        UPDATE ord SET o_totalprice = o_totalprice * 2 WHERE o_custkey % 10 = 0;
        MERGE INTO ord USING (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
            FROM ord FOR VERSION AS OF 0
            WHERE o_custkey % 5 = 0
        ) AS up
        ON ord.o_orderkey = up.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = up.o_totalprice + 1
        WHEN NOT MATCHED THEN INSERT (o_orderkey, o_custkey, o_orderstatus, o_totalprice)
            VALUES (up.o_orderkey, up.o_custkey, 'R', up.o_totalprice);
        SELECT status, n, total FROM (
            SELECT o_orderstatus AS status, count(*) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
            FROM ord GROUP BY o_orderstatus
            UNION ALL
            SELECT 'v0_rows', count(*), CAST(NULL AS DOUBLE) FROM ord FOR VERSION AS OF 0
            UNION ALL
            SELECT 'v1_rows', count(*), CAST(NULL AS DOUBLE) FROM ord FOR VERSION AS OF 1
        ) ORDER BY status
        """
    )
    if errors or df is None:
        raise RuntimeError(f"sql dml script failed: {errors}")
    return df


ORACLE_SQL_DML_SCRIPT = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 7 = 0
),
v1 AS (SELECT * FROM base WHERE o_orderstatus <> 'F'),
v2 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_custkey % 10 = 0 THEN o_totalprice * 2
              ELSE o_totalprice END AS o_totalprice
  FROM v1
),
src AS (SELECT * FROM base WHERE o_custkey % 5 = 0),
final AS (
  SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus,
         CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice + 1
              ELSE t.o_totalprice END AS o_totalprice
  FROM v2 t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
  UNION ALL
  SELECT s.o_orderkey, s.o_custkey, 'R', s.o_totalprice
  FROM src s LEFT JOIN v2 t ON s.o_orderkey = t.o_orderkey
  WHERE t.o_orderkey IS NULL
)
SELECT status, n, total FROM (
  SELECT o_orderstatus AS status, count(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
  FROM final GROUP BY o_orderstatus
  UNION ALL SELECT 'v0_rows', (SELECT count(*) FROM base), CAST(NULL AS DOUBLE)
  UNION ALL SELECT 'v1_rows', (SELECT count(*) FROM v1), CAST(NULL AS DOUBLE)
) ORDER BY status
"""


def q_ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The materialized form of IVF (SCALE.md's promised artifact): the
    # assignment pass runs ONCE at build time, written partitioned by
    # centroid cell with the centroid matrix in a sidecar; a query
    # resolves probe cells driver-side and scans only those hive
    # partitions (plan-pinned in tests/test_ivf_index.py). The driver
    # claim is twofold: (a) the indexed path returns BIT-IDENTICAL
    # rows to the inline ivf_topk (matches_inline), and (b) the same
    # bounded-recall contract as ann_ivf_topk vs exact brute force.
    from dbt_maxcompute_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    k = 10
    idx_path = tempfile.mkdtemp(prefix="ivf_idx_") + "/index"
    similarity.build_ivf_index(
        emb, "vec_id", "embedding", idx_path, num_centroids=16
    )
    indexed = similarity.ivf_indexed_topk(spark, idx_path, queries, k=k, nprobe=12)
    # the search frame feeds BOTH the recall/mismatch check and the
    # returned agg below — a lazy localCheckpoint materializes the
    # k*|queries|-row result at its first action so the full search
    # pipeline (corpus-scale assign/encode/score) executes once, not
    # per consumer (guide §5; same device as the CC label rounds)
    indexed = indexed.localCheckpoint(eager=False)
    inline = similarity.ivf_topk(
        emb, queries, "vec_id", "embedding", k=k, num_centroids=16, nprobe=12
    )
    # multiset symmetric-difference size in ONE pass per side: the
    # exceptAll-both-ways form evaluates BOTH topk subtrees twice
    # (~half this query's cost); signed counts per distinct row give
    # the same number with each side evaluated once
    _cols = indexed.columns
    n_mismatch = (
        indexed.withColumn("__s", F.lit(1))
        .unionByName(inline.withColumn("__s", F.lit(-1)))
        .groupBy(*_cols)
        .agg(F.sum("__s").alias("__net"))
        .filter(F.col("__net") != 0)
        .agg(F.coalesce(F.sum(F.abs(F.col("__net"))), F.lit(0)).alias("m"))
        .first()["m"]
    )
    brute = similarity.brute_force_topk(emb, queries, "vec_id", "embedding", k=k)
    hits = (
        indexed.join(
            brute.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    return (
        indexed.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_results"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_results",
            (F.coalesce("__hits", F.lit(0)) >= F.lit(int(0.5 * k))).alias("recall_ok"),
            F.lit(n_mismatch == 0).alias("matches_inline"),
        )
        .orderBy("query_id")
    )


ORACLE_ANN_IVF_INDEXED = """
SELECT vec_id AS query_id,
       CAST(10 AS BIGINT) AS n_results,
       TRUE AS recall_ok,
       TRUE AS matches_inline
FROM embeddings WHERE vec_id < 5 ORDER BY vec_id
"""


def q_mv_rewrite_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Predicate-containment MV rewrite (round-4 verdict item 6): the
    # MV is a FILTERED rollup; a user query whose WHERE contains every
    # MV conjunct plus a residual on a grouping key is answered from
    # the MV with the residual re-applied (plan-pinned: MV scanned,
    # fact absent; literal case preserved — 'R' stays 'R'). A user
    # query MISSING one MV conjunct needs rows the MV never stored, so
    # it must fall back to the base table (negative plan-pin). Values
    # hash-checked against DuckDB computing from the base table.
    from dbt_maxcompute_spark.catalog import EngineCatalog
    from dbt_maxcompute_spark.materializations.materialized_view import (
        create_materialized_view,
    )

    cat = EngineCatalog(spark, tempfile.mkdtemp(prefix="mvc_wh_"))
    cat.create_table("lineitem", load_table(spark, sf_dir, "lineitem"))
    create_materialized_view(
        cat,
        "mv_filtered",
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
                  CAST(sum(CAST(l_quantity AS decimal(28,6))) AS double) AS qty
           FROM lineitem
           WHERE l_shipdate >= '1995-01-01' AND l_discount > 0.02
           GROUP BY l_returnflag, l_linestatus""",
    )

    def plan_of(df: DataFrame) -> str:
        return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    served = cat.sql(
        """SELECT l_returnflag, count(*) AS n_rows,
                  CAST(sum(CAST(l_quantity AS decimal(28,6))) AS double) AS qty
           FROM lineitem
           WHERE l_shipdate >= '1995-01-01' AND l_discount > 0.02
             AND l_returnflag = 'R'
           GROUP BY l_returnflag"""
    )
    p1 = plan_of(served)
    used_mv = ("mv_filtered" in p1) and ("default/lineitem" not in p1)

    p2 = plan_of(
        cat.sql(
            """SELECT l_returnflag, count(*) AS n
               FROM lineitem WHERE l_shipdate >= '1995-01-01'
               GROUP BY l_returnflag"""
        )
    )
    fell_back = ("mv_filtered" not in p2) and ("default/lineitem" in p2)

    return (
        served.withColumn("used_mv", F.lit(bool(used_mv)))
        .withColumn("weaker_filter_fell_back", F.lit(bool(fell_back)))
        .orderBy("l_returnflag")
    )


ORACLE_MV_CONTAINMENT = """
SELECT l_returnflag, count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS qty,
       TRUE AS used_mv, TRUE AS weaker_filter_fell_back
FROM lineitem
WHERE l_shipdate >= '1995-01-01' AND l_discount > 0.02
  AND l_returnflag = 'R'
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_sql_maintenance_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The Delta-style maintenance surface as SQL (round-5 §2.11):
    # OPTIMIZE ... ZORDER BY rewrites the table clustered in ONE commit,
    # DESCRIBE HISTORY exposes the ledger, VACUUM reclaims dead files —
    # and none of it may change visible DATA. The driver-checkable
    # claim: after appends + OPTIMIZE + VACUUM, (a) the ledger has
    # exactly [create, append, optimize] with the optimize replacing
    # every file, (b) vacuum removed at least the pre-optimize files,
    # and (c) the table's aggregate still equals the DuckDB oracle
    # computed from the raw input — maintenance is value-neutral.
    from dbt_maxcompute_spark.catalog import EngineCatalog

    cat = EngineCatalog(spark, tempfile.mkdtemp(prefix="sqlmaint_wh_"))
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 11 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )
    cat.create_table(
        "li", li.filter(F.col("l_linenumber") <= 3),
        transactional=True, primary_keys=["l_orderkey", "l_linenumber"],
    )
    li.createOrReplaceTempView("__maint_src")
    cat.execute("INSERT INTO li SELECT * FROM __maint_src WHERE l_linenumber > 3")
    hist0 = cat.execute("DESCRIBE HISTORY li").collect()
    opt = cat.execute("OPTIMIZE li ZORDER BY (l_orderkey, l_quantity)").collect()[0]
    hist = cat.execute("DESCRIBE HISTORY li").collect()
    vac = cat.execute("VACUUM li RETAIN 0 HOURS").collect()[0]
    agg = cat.execute(
        """SELECT count(*) AS n,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS qty
           FROM li"""
    ).collect()[0]
    last = hist[-1]
    return local_frame(
        spark,
        [
            (
                int(agg.n),
                float(agg.qty),
                bool(len(hist0) == 2 and len(hist) == 3),
                bool(last.n_add >= 1 and last.n_remove >= 1),
                bool(opt.operation == "OPTIMIZE"),
                bool(vac.affected_rows >= 1),
            )
        ],
        "n bigint, qty double, ledger_shape boolean, optimize_rewrote boolean, "
        "optimize_ran boolean, vacuum_reclaimed boolean",
    )


ORACLE_SQL_MAINTENANCE = """
SELECT count(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS qty,
       TRUE AS ledger_shape, TRUE AS optimize_rewrote,
       TRUE AS optimize_ran, TRUE AS vacuum_reclaimed
FROM lineitem WHERE l_orderkey % 11 = 0
"""


def q_stream_txn_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exactly-once streaming KEY-UPSERT (CDC shape): the deletion
    # vector, appended files, and (app_id, batch_id) txn marker land in
    # ONE commit per micro-batch. The stream upserts fresh values over
    # a stale pre-seed, then the ENTIRE stream replays under the same
    # app id with a fresh checkpoint (worst-case at-least-once
    # delivery) — the ledger makes the replay commit NOTHING: version
    # count unchanged, values unchanged. Oracle: the plain batch
    # aggregate of the events table (every stale row refreshed, no
    # duplicates), plus the replay-cleanliness booleans.
    import os
    import tempfile

    from dbt_maxcompute_spark.sources.registry import table_path
    from dbt_maxcompute_spark.streaming import windows as sw
    from dbt_maxcompute_spark.streaming.foreach_batch import stream_upsert_txn_table
    from dbt_maxcompute_spark.txnlog import TxnTable

    base = tempfile.mkdtemp(prefix="stream_upsert_")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    t = TxnTable(spark, os.path.join(base, "tbl"))
    t.create(ev.filter(F.col("event_id") % 2 == 0).withColumn("value", F.lit(-1.0)))

    def run_once(tag: str) -> None:
        d = os.path.join(base, f"src_{tag}")
        os.makedirs(d)
        os.symlink(table_path(sf_dir, "events"), os.path.join(d, "events.parquet"))
        stream = sw.read_events_stream(spark, d, max_files_per_trigger=1).select(
            "event_id", "event_type", "value"
        )
        q = stream_upsert_txn_table(
            stream, t, ["event_id"], app_id="drv_upsert",
            checkpoint_dir=os.path.join(base, f"ckpt_{tag}"),
        )
        q.awaitTermination()

    run_once("a")
    v1 = t.latest_version()
    run_once("b")  # full replay, fresh checkpoint, same app id
    replay_clean = t.latest_version() == v1
    no_stale = t.read().filter(F.col("value") == -1.0).count() == 0
    return (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("total_value"),
        )
        .withColumn("replay_clean", F.lit(bool(replay_clean)))
        .withColumn("no_stale_rows", F.lit(bool(no_stale)))
        .orderBy("event_type")
    )


ORACLE_STREAM_TXN_UPSERT = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value,
       TRUE AS replay_clean, TRUE AS no_stale_rows
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_txn_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Row-level NET change feed between snapshots (Delta CDF shape,
    # round 5): create → append → DV upsert, then feed(v0→latest).
    # An update surfaces as its delete+insert pair; the append-only
    # interval fast path (zero-shuffle scan of just the added files)
    # is plan-pinned in tests/test_txnlog.py. Oracle: DuckDB EXCEPT ALL
    # between the simulated endpoint states.
    import tempfile

    from dbt_maxcompute_spark.txnlog import TxnTable

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 13 == 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    t = TxnTable(spark, tempfile.mkdtemp(prefix="cdf_") + "/t")
    t.create(base.filter(F.col("o_custkey") % 2 == 0))
    t.append(base.filter(F.col("o_custkey") % 2 != 0))
    t.delete_insert_dv(
        base.filter(F.col("o_orderstatus") == "F").withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        ),
        ["o_orderkey"],
    )
    feed = t.change_feed(0)
    return (
        feed.groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("change_type")
    )


ORACLE_TXN_CHANGE_FEED = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 13 = 0
),
v0 AS (SELECT * FROM base WHERE o_custkey % 2 = 0),
final AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
              ELSE o_totalprice END AS o_totalprice
  FROM base
),
ins AS (SELECT * FROM final EXCEPT ALL SELECT * FROM v0),
del AS (SELECT * FROM v0 EXCEPT ALL SELECT * FROM final)
SELECT change_type, n, total FROM (
  SELECT 'insert' AS change_type, count(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
  FROM ins
  UNION ALL
  SELECT 'delete', count(*),
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
  FROM del
) ORDER BY change_type
"""


QUERIES = {
    "sql_dml_script": q_sql_dml_script,
    "ann_ivf_indexed_topk": q_ann_ivf_indexed,
    "mv_rewrite_containment": q_mv_rewrite_containment,
    "sql_maintenance_script": q_sql_maintenance_script,
    "stream_txn_upsert": q_stream_txn_upsert,
    "txn_change_feed": q_txn_change_feed,
}

ORACLES = {
    "sql_dml_script": ORACLE_SQL_DML_SCRIPT,
    "ann_ivf_indexed_topk": ORACLE_ANN_IVF_INDEXED,
    "mv_rewrite_containment": ORACLE_MV_CONTAINMENT,
    "sql_maintenance_script": ORACLE_SQL_MAINTENANCE,
    "stream_txn_upsert": ORACLE_STREAM_TXN_UPSERT,
    "txn_change_feed": ORACLE_TXN_CHANGE_FEED,
}
