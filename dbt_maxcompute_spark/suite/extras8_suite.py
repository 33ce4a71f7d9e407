"""Round-8 suite: incremental IVF index maintenance + the
exactly-once CDF-to-index sync (the churn half of the 100 TB ANN
story — touched-cell rewrites from a keyed change feed, never a
rebuild), normalized join-tree MV auto-rewrite, and Delta-style
RESTORE (rollback as a metadata-only commit) and COPY INTO
(exactly-once per-file landing-zone ingest).

Oracle conventions as elsewhere: exact sums through DECIMAL(28,6)
cast to DOUBLE at the edge, counts as BIGINT, explicit ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_maxcompute_spark.sources.registry import load_table


def q_ann_ivf_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-8 (verdict item 4): a persisted IVF index maintained from
    # a keyed change feed — deletes, vector updates (pre/post pairs,
    # including cross-cell moves) and inserts assign to cells under
    # the SIDECAR centroids and rewrite ONLY the touched cell
    # partitions (untouched cell directories stay byte-identical —
    # checked here and pinned in tests/test_ivf_index.py). The
    # invariant driver-checked: maintained content equals the final
    # corpus assigned under the original centroids (a fresh rebuild
    # with the same coarse quantizer), and search over the maintained
    # artifact still returns full top-k per query.
    import json
    import os
    import tempfile

    from dbt_maxcompute_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    idx_path = tempfile.mkdtemp(prefix="ivfm_") + "/index"
    similarity.build_ivf_index(
        base, "vec_id", "embedding", idx_path, num_centroids=16
    )

    def listing(path: str) -> dict:
        out = {}
        for d in os.listdir(path):
            if d.startswith("centroid_id="):
                p = os.path.join(path, d)
                out[d] = sorted(
                    (f, os.path.getsize(os.path.join(p, f)))
                    for f in os.listdir(p)
                    if f.endswith(".parquet")
                )
        return out

    before = listing(idx_path)

    # keyed-CDF batch: delete %7==0 of the base, negate the vectors of
    # %11==1 (update pair — may move cells), insert the held-out slice
    dels = base.filter(F.col("vec_id") % 7 == 0).withColumn(
        "_change_type", F.lit("delete")
    )
    upd = base.filter((F.col("vec_id") % 7 != 0) & (F.col("vec_id") % 11 == 1))
    pre = upd.withColumn("_change_type", F.lit("update_preimage"))
    post = upd.withColumn(
        "embedding", F.transform("embedding", lambda x: (-x).cast("float"))
    ).withColumn("_change_type", F.lit("update_postimage"))
    ins = emb.filter(F.col("vec_id") % 5 == 4).withColumn(
        "_change_type", F.lit("insert")
    )
    res = similarity.maintain_ivf_index(
        spark, idx_path, dels.unionByName(pre).unionByName(post).unionByName(ins)
    )

    after = listing(idx_path)
    touched = {f"centroid_id={c}" for c in res["touched_cells"]}
    untouched_ok = all(
        after.get(d) == lst for d, lst in before.items() if d not in touched
    )

    # final corpus under the ORIGINAL centroids == maintained content
    kept = emb.filter((F.col("vec_id") % 5 != 4) & (F.col("vec_id") % 7 != 0))
    final = kept.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 11 == 1,
            F.transform("embedding", lambda x: (-x).cast("float")),
        ).otherwise(F.col("embedding")),
    ).unionByName(emb.filter(F.col("vec_id") % 5 == 4))
    with open(os.path.join(idx_path, "_ivf_meta.json")) as fh:
        meta = json.load(fh)
    want = similarity.assign_with_meta(final, meta)
    got = spark.read.parquet(idx_path)

    def keyed(df: DataFrame, s: int) -> DataFrame:
        return df.select(
            "vec_id",
            F.col("centroid_id").cast("string").alias("cell"),
            F.hash("embedding").alias("eh"),
        ).withColumn("__s", F.lit(s))

    # one pass over the maintained index for BOTH checks: the net
    # multiset diff vs the fresh rebuild AND the corpus row count
    # (corpus_n = rows contributed with __s == +1, i.e. got.count()) —
    # previously a second full scan of the index (guide §1.2: don't
    # read what you already read)
    chk = (
        keyed(got, 1)
        .unionByName(keyed(want, -1))
        .groupBy("vec_id", "cell", "eh")
        .agg(
            F.sum("__s").alias("net"),
            F.count(F.when(F.col("__s") == 1, F.lit(1))).alias("got_rows"),
        )
        .agg(
            F.count(F.when(F.col("net") != 0, F.lit(1))).alias("mismatch"),
            F.sum("got_rows").alias("corpus_n"),
        )
        .collect()[0]
    )
    net = int(chk["mismatch"])
    corpus_n = int(chk["corpus_n"] or 0)

    queries = final.filter(F.col("vec_id") < 5)
    out = similarity.ivf_indexed_topk(spark, idx_path, queries, k=10, nprobe=8)
    return (
        out.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_results"))
        .select(
            "query_id",
            "n_results",
            F.lit(net == 0).alias("matches_fresh"),
            F.lit(bool(untouched_ok)).alias("untouched_ok"),
            F.lit(corpus_n).cast("bigint").alias("corpus_n"),
        )
        .orderBy("query_id")
    )


ORACLE_ANN_IVF_INDEX_MAINTENANCE = """
WITH final_ids AS (
  SELECT vec_id FROM embeddings WHERE vec_id % 5 <> 4 AND vec_id % 7 <> 0
  UNION ALL
  SELECT vec_id FROM embeddings WHERE vec_id % 5 = 4
)
SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_results,
       TRUE AS matches_fresh, TRUE AS untouched_ok,
       (SELECT CAST(count(*) AS BIGINT) FROM final_ids) AS corpus_n
FROM embeddings
WHERE vec_id < 5 AND (vec_id % 5 = 4 OR vec_id % 7 <> 0)
ORDER BY vec_id
"""


def q_ann_ivf_cdf_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-8 composition row: the EXACTLY-ONCE churn pipeline for a
    # vector corpus end to end — embeddings live in a transaction
    # table, row-level DML mutates it (DV delete, key upsert, append),
    # and the table's KEYED change feed advances the persisted IVF
    # index through a sidecar version cursor
    # (similarity.sync_ivf_index_from_table): a replayed sync applies
    # nothing, a crash between cell swap and cursor write is healed by
    # the idempotent upsert, and the maintained index equals the final
    # table state assigned under the original centroids. The oracle
    # predicts the feed's four-type counts from the simulated endpoint
    # states.
    import json
    import os
    import tempfile

    from dbt_maxcompute_spark.operators import similarity
    from dbt_maxcompute_spark.txnlog import TxnTable

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    t = TxnTable(spark, tempfile.mkdtemp(prefix="ivfs_") + "/corpus")
    t.create(emb.filter(F.col("vec_id") % 5 != 4))
    idx_path = tempfile.mkdtemp(prefix="ivfs_") + "/index"
    v_build = t.latest_version()
    similarity.build_ivf_index(
        t.read(), "vec_id", "embedding", idx_path,
        num_centroids=16, cursor=v_build,
    )
    t.delete_where_dv("vec_id % 7 = 0")
    upd = t.read().filter(F.col("vec_id") % 11 == 1).withColumn(
        "embedding", F.transform("embedding", lambda x: (x + 1.0).cast("float"))
    )
    t.delete_insert_dv(upd, ["vec_id"])
    t.append(emb.filter(F.col("vec_id") % 5 == 4))

    applied = similarity.sync_ivf_index_from_table(spark, idx_path, t)
    replayed = similarity.sync_ivf_index_from_table(spark, idx_path, t)

    with open(os.path.join(idx_path, "_ivf_meta.json")) as fh:
        meta = json.load(fh)
    want = similarity.assign_with_meta(t.read(), meta)
    got = spark.read.parquet(idx_path)

    def keyed(df: DataFrame, s: int) -> DataFrame:
        return df.select(
            "vec_id",
            F.col("centroid_id").cast("string").alias("cell"),
            F.hash("embedding").alias("eh"),
        ).withColumn("__s", F.lit(s))

    net = (
        keyed(got, 1)
        .unionByName(keyed(want, -1))
        .groupBy("vec_id", "cell", "eh")
        .agg(F.sum("__s").alias("net"))
        .filter(F.col("net") != 0)
        .count()
    )
    counts = (
        t.change_feed_keyed(["vec_id"], v_build)
        .groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.select(
            F.col("_change_type").alias("change_type"),
            "n",
            F.lit(applied > 0 and replayed == 0).alias("exactly_once"),
            F.lit(net == 0).alias("matches_final"),
        )
        .orderBy("change_type")
    )


ORACLE_ANN_IVF_CDF_SYNC = """
WITH base AS (SELECT vec_id FROM embeddings WHERE vec_id % 5 <> 4)
SELECT change_type, n, TRUE AS exactly_once, TRUE AS matches_final FROM (
  SELECT 'insert' AS change_type,
         (SELECT CAST(count(*) AS BIGINT) FROM embeddings WHERE vec_id % 5 = 4) AS n
  UNION ALL
  SELECT 'delete',
         (SELECT CAST(count(*) AS BIGINT) FROM base WHERE vec_id % 7 = 0)
  UNION ALL
  SELECT 'update_preimage',
         (SELECT CAST(count(*) AS BIGINT) FROM base
          WHERE vec_id % 7 <> 0 AND vec_id % 11 = 1)
  UNION ALL
  SELECT 'update_postimage',
         (SELECT CAST(count(*) AS BIGINT) FROM base
          WHERE vec_id % 7 <> 0 AND vec_id % 11 = 1)
) ORDER BY change_type
"""


def q_txn_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-8: Delta-style RESTORE as plain SQL — rollback is a NEW
    # metadata-only commit (no data moves), history stays time-
    # travelable across the rolled-back interval, and the change feed
    # nets the restore out to zero against the restored-to snapshot.
    # The oracle predicts the restored content and the intermediate
    # state from the base table.
    import tempfile

    from dbt_maxcompute_spark.catalog import EngineCatalog

    cat = EngineCatalog(spark, tempfile.mkdtemp(prefix="rst_wh_"))
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 9 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    cat.create_table("rt", base, transactional=True, primary_keys=["o_orderkey"])
    cat.execute("DELETE FROM rt WHERE o_custkey % 2 = 0")          # v1
    t = cat.txn("rt")
    t.append(
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 9 == 1)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )                                                              # v2
    v2_n = t.read().count()
    cat.execute("RESTORE TABLE rt TO VERSION AS OF 0")             # v3
    feed_net = t.change_feed(0).count()
    return (
        cat.read("rt")
        .agg(
            F.count(F.lit(1)).alias("n_restored"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("total_restored"),
        )
        .select(
            "n_restored",
            "total_restored",
            F.lit(v2_n).cast("bigint").alias("n_intermediate"),
            F.lit(feed_net == 0).alias("feed_net_zero"),
        )
    )


ORACLE_TXN_RESTORE = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 9 = 0
),
v2 AS (
  SELECT * FROM base WHERE o_custkey % 2 <> 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 9 = 1
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM base) AS n_restored,
       (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) FROM base)
         AS total_restored,
       (SELECT CAST(count(*) AS BIGINT) FROM v2) AS n_intermediate,
       TRUE AS feed_net_zero
"""


def q_sql_copy_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-8: COPY INTO as the exactly-once ingest primitive — the
    # 100 TB landing-zone pattern (files arrive continuously; the
    # loader must never double-load a file across retries/replays).
    # Each source file rides the snapshot's idempotence ledger as a
    # txn marker: the second COPY applies NOTHING metadata-only, a
    # later file loads ALONE. Oracle predicts the final table from
    # the slices landed.
    import os
    import shutil
    import tempfile

    from dbt_maxcompute_spark.catalog import EngineCatalog

    cat = EngineCatalog(spark, tempfile.mkdtemp(prefix="cpy_wh_"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cat.create_table(
        "cp",
        orders.filter(F.col("o_orderkey") % 10 == 0),
        transactional=True,
        primary_keys=["o_orderkey"],
    )
    landing = tempfile.mkdtemp(prefix="cpy_land_")
    stage = tempfile.mkdtemp(prefix="cpy_stage_")

    def land(name: str, mod: int) -> None:
        d = os.path.join(stage, name)
        orders.filter(F.col("o_orderkey") % 10 == mod).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        shutil.move(os.path.join(d, part), os.path.join(landing, name))

    land("a.parquet", 1)
    land("b.parquet", 2)
    r1 = cat.execute(
        f"COPY INTO cp FROM '{landing}' FILEFORMAT = PARQUET"
    ).collect()[0].affected_rows
    r2 = cat.execute(
        f"COPY INTO cp FROM '{landing}' FILEFORMAT = PARQUET"
    ).collect()[0].affected_rows
    land("c.parquet", 3)
    r3 = cat.execute(
        f"COPY INTO cp FROM '{landing}' FILEFORMAT = PARQUET"
    ).collect()[0].affected_rows
    n_files_loaded = sum(
        1 for k in cat.txn("cp").snapshot().app_versions if k.startswith("copy:")
    )
    return cat.read("cp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .cast("double")
        .alias("total"),
    ).select(
        "n",
        "total",
        F.lit(r1 > 0 and r2 == 0 and 0 < r3 < r1).alias("exactly_once_per_file"),
        F.lit(n_files_loaded).cast("bigint").alias("files_loaded"),
    )


ORACLE_SQL_COPY_INTO = """
WITH landed AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 IN (0, 1, 2, 3)
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total,
       TRUE AS exactly_once_per_file,
       CAST(3 AS BIGINT) AS files_loaded
FROM landed
"""


def q_mv_rewrite_join_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-8 (verdict item 6): MV auto-rewrite over JOIN MVs with
    # NORMALIZED join-tree matching — aliases resolve to table names,
    # inner-join order and ON-conjunct side/order are canonicalized —
    # so a user query written through different aliases and a
    # reordered join still answers from the rollup-cardinality MV
    # (plan-pinned: MV scanned, fact absent). A LEFT JOIN over the
    # same tables is a DIFFERENT relation and must fall back to the
    # base tables (negative plan-pin). Values hash-checked against
    # DuckDB computing from the base tables.
    import tempfile

    from dbt_maxcompute_spark.catalog import EngineCatalog
    from dbt_maxcompute_spark.materializations.materialized_view import (
        create_materialized_view,
    )

    cat = EngineCatalog(spark, tempfile.mkdtemp(prefix="mvj8_wh_"))
    cat.create_table("orders", load_table(spark, sf_dir, "orders"))
    cat.create_table("customer", load_table(spark, sf_dir, "customer"))
    create_materialized_view(
        cat,
        "mv_seg",
        """SELECT c.c_mktsegment AS seg, count(*) AS n,
                  CAST(sum(CAST(o.o_totalprice AS decimal(28,6))) AS double) AS total
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           GROUP BY c.c_mktsegment""",
    )

    def plan_of(df: DataFrame) -> str:
        return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    served = cat.sql(
        """SELECT x.c_mktsegment AS seg, count(*) AS n,
                  CAST(sum(CAST(y.o_totalprice AS decimal(28,6))) AS double) AS total
           FROM customer x JOIN orders y ON y.o_custkey = x.c_custkey
           GROUP BY x.c_mktsegment"""
    )
    p1 = plan_of(served)
    used_mv = ("mv_seg" in p1) and ("default/orders" not in p1)

    p2 = plan_of(
        cat.sql(
            """SELECT x.c_mktsegment AS seg, count(*) AS n
               FROM customer x LEFT JOIN orders y ON y.o_custkey = x.c_custkey
               GROUP BY x.c_mktsegment"""
        )
    )
    outer_fell_back = ("mv_seg" not in p2) and ("default/orders" in p2)

    return (
        served.withColumn("used_mv", F.lit(bool(used_mv)))
        .withColumn("outer_join_fell_back", F.lit(bool(outer_fell_back)))
        .orderBy("seg")
    )


ORACLE_MV_REWRITE_JOIN_ALIAS = """
SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total,
       TRUE AS used_mv, TRUE AS outer_join_fell_back
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY seg
"""


QUERIES = {
    "ann_ivf_index_maintenance": q_ann_ivf_index_maintenance,
    "ann_ivf_cdf_sync": q_ann_ivf_cdf_sync,
    "txn_restore": q_txn_restore,
    "sql_copy_into": q_sql_copy_into,
    "mv_rewrite_join_alias": q_mv_rewrite_join_alias,
}

ORACLES = {
    "ann_ivf_index_maintenance": ORACLE_ANN_IVF_INDEX_MAINTENANCE,
    "ann_ivf_cdf_sync": ORACLE_ANN_IVF_CDF_SYNC,
    "txn_restore": ORACLE_TXN_RESTORE,
    "sql_copy_into": ORACLE_SQL_COPY_INTO,
    "mv_rewrite_join_alias": ORACLE_MV_REWRITE_JOIN_ALIAS,
}
