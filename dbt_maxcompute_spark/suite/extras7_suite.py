"""Round-7 suite, part 2: keyed change-feed classification (the Delta
CDF four-type contract — update_preimage/update_postimage pairs per
entity) and MIN/MAX rollup IVM (bounded group recompute for the
non-invertible aggregates).

Oracle conventions as elsewhere: exact sums through DECIMAL(28,6)
cast to DOUBLE at the edge, counts as BIGINT, explicit ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_maxcompute_spark.sources.registry import load_table


def q_txn_change_feed_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Keyed change feed (Delta CDF's four-type form): a key present at
    # both endpoints with different values emits its update_preimage /
    # update_postimage pair; unchanged keys emit NOTHING (the feed is
    # net); pure adds/removes classify as insert/delete. Built on the
    # net feed (append-only / DV fast paths apply) + ONE feed-sized
    # hash-agg on the key — no join, no window sort
    # (txnlog.change_feed_keyed). Cites the reference's CDC posture:
    # MERGE-based incremental models consume exactly this shape.
    import tempfile

    from dbt_maxcompute_spark.txnlog import TxnTable

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 11 == 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    t = TxnTable(spark, tempfile.mkdtemp(prefix="cfk_") + "/t")
    t.create(base)
    v0 = t.latest_version()
    # row-level deletes
    t.delete_where_dv("o_custkey % 4 = 0")
    # key-upsert UPDATE among survivors (every value genuinely moves)
    upd = (
        base.filter(F.col("o_custkey") % 4 != 0)
        .filter(F.col("o_orderstatus") == "F")
        .withColumn("o_totalprice", F.col("o_totalprice") * 3)
    )
    t.delete_insert_dv(upd, ["o_orderkey"])
    # fresh inserts
    t.append(
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 11 == 5)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    feed = t.change_feed_keyed(["o_orderkey"], v0)
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


ORACLE_TXN_CHANGE_FEED_KEYED = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 11 = 0
),
final AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 3
              ELSE o_totalprice END AS o_totalprice
  FROM base WHERE o_custkey % 4 <> 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 11 = 5
),
j AS (
  SELECT COALESCE(o.o_orderkey, f.o_orderkey) AS k,
         o.o_totalprice AS ov, f.o_totalprice AS fv,
         o.o_orderkey IS NOT NULL AS in_old,
         f.o_orderkey IS NOT NULL AS in_new,
         o.o_custkey = f.o_custkey
           AND o.o_orderstatus = f.o_orderstatus
           AND o.o_totalprice = f.o_totalprice AS same
  FROM base o FULL OUTER JOIN final f ON o.o_orderkey = f.o_orderkey
),
typed AS (
  SELECT 'delete' AS change_type, ov AS price FROM j
  WHERE in_old AND NOT in_new
  UNION ALL
  SELECT 'insert', fv FROM j WHERE in_new AND NOT in_old
  UNION ALL
  SELECT 'update_preimage', ov FROM j
  WHERE in_old AND in_new AND NOT same
  UNION ALL
  SELECT 'update_postimage', fv FROM j
  WHERE in_old AND in_new AND NOT same
)
SELECT change_type, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(price AS DECIMAL(28,6))) AS DOUBLE) AS total
FROM typed GROUP BY change_type ORDER BY change_type
"""


def q_mv_minmax_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MIN/MAX rollup IVM: the non-invertible aggregates maintained by
    # BOUNDED recompute — inserts tighten extremes feed-sized, interior
    # deletes are free, and only groups whose deleted values TOUCH a
    # stored bound re-aggregate, with the source scan semi-joined to
    # exactly those group keys (broadcast; AQE collapses it to empty
    # when nothing was touched). Sums/count stay additive; the cursor
    # rides the target commit (replay applies nothing). Oracle:
    # recompute from the simulated final state.
    import tempfile

    from dbt_maxcompute_spark.materializations.materialized_view import (
        sync_minmax_rollup_exactly_once,
    )
    from dbt_maxcompute_spark.txnlog import TxnTable

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 9 == 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    tmp = tempfile.mkdtemp(prefix="mmivm_")
    t = TxnTable(spark, tmp + "/src")
    t.create(base)
    tgt = TxnTable(spark, tmp + "/rollup")

    def sync():
        return sync_minmax_rollup_exactly_once(
            t,
            tgt,
            ["o_orderstatus"],
            {"sum_total": "o_totalprice"},
            {"min_price": "o_totalprice"},
            {"max_price": "o_totalprice"},
            "n",
        )

    sync()  # bootstrap
    # deletes that (at any realistic SF) remove some group's extreme
    t.delete_where_dv("o_custkey % 6 = 0")
    # key-upsert: halve open-order prices among survivors (moves mins)
    upd = (
        base.filter(F.col("o_custkey") % 6 != 0)
        .filter(F.col("o_orderstatus") == "O")
        .withColumn("o_totalprice", F.col("o_totalprice") * 0.5)
    )
    t.delete_insert_dv(upd, ["o_orderkey"])
    t.append(
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 9 == 4)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    applied = sync()
    replayed = sync()
    return tgt.read().select(
        "o_orderstatus",
        F.col("n").alias("n_orders"),
        F.col("sum_total").cast("double").alias("total_price"),
        F.col("min_price"),
        F.col("max_price"),
        F.lit(applied == 3 and replayed == 0).alias("replay_noop"),
    ).orderBy("o_orderstatus")


ORACLE_MV_MINMAX_MAINTENANCE = """
WITH a AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 9 = 0
),
survivors AS (SELECT * FROM a WHERE o_custkey % 6 <> 0),
updated AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 0.5
              ELSE o_totalprice END AS o_totalprice
  FROM survivors
),
final AS (
  SELECT * FROM updated
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 9 = 4
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       TRUE AS replay_noop
FROM final GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_txn_bloom_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-file BLOOM data skipping: the table is written in 8 files
    # hash-clustered by customer, so every file spans ~the full
    # o_orderkey range and min/max stats can never prune a key lookup.
    # The logged per-file blooms (built executor-side at stage time
    # from one column-pruned read of the just-written file) prune the
    # point lookup to the bloom-hit files — false positives scan,
    # never wrong results (tests/test_bloom_skipping.py pins the
    # pruning; here the oracle pins the ANSWER and bloom_pruned pins
    # that skipping actually engaged).
    import tempfile

    from dbt_maxcompute_spark.txnlog import TxnTable

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = TxnTable(
        spark,
        tempfile.mkdtemp(prefix="bloom_") + "/t",
        bloom_cols=["o_orderkey"],
    )
    t.create(base.repartition(8, F.col("o_custkey")))
    target = base.agg(F.max("o_orderkey")).first()[0]
    snap = t.snapshot()
    scanned = t.files_scanned([("o_orderkey", "=", target)])
    hit = t.read(where=[("o_orderkey", "=", target)])
    return hit.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lit(len(scanned) < len(snap.files)).alias("bloom_pruned"),
    ).orderBy("o_orderkey")


ORACLE_TXN_BLOOM_SKIPPING = """
SELECT o_orderkey, o_custkey, o_totalprice, TRUE AS bloom_pruned
FROM orders
WHERE o_orderkey = (SELECT MAX(o_orderkey) FROM orders)
ORDER BY o_orderkey
"""


def q_sql_merge_dv_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DV-based MERGE driven as PLAIN SQL: the session conf (scoped by
    # the script's SET machinery) forces the stats route at this SF,
    # so the merge commits staged adds + a deletion-vector delta — the
    # no_rewrite column pins that EVERY pre-merge file survived the
    # commit (untouched rows never moved). Clause semantics (ordered
    # first-applicable DELETE/UPDATE/INSERT) are oracle-predicted from
    # the simulated final state.
    import tempfile

    from dbt_maxcompute_spark.catalog import EngineCatalog

    cat = EngineCatalog(spark, tempfile.mkdtemp(prefix="mdv_wh_"))
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 6 == 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    cat.create_table("tgt", base, transactional=True, primary_keys=["o_orderkey"])
    upd = (
        base.filter((F.col("o_orderstatus") == "O") & (F.col("o_custkey") % 3 == 1))
        .withColumn("o_totalprice", F.col("o_totalprice") * 3)
        .withColumn("op", F.lit("upd"))
    )
    dele = base.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_custkey") % 3 == 2)
    ).withColumn("op", F.lit("del"))
    new = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderkey") % 6 == 3) & (F.col("o_custkey") % 9 == 0))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .withColumn("op", F.lit("new"))
    )
    cat.create_table("src_batch", upd.unionByName(dele).unionByName(new))
    pre = cat.txn("tgt").snapshot()
    df, _hints, errors = cat.execute_script(
        """
        SET spark.graft.merge.dvMinRows=0;
        MERGE INTO tgt USING src_batch AS up ON tgt.o_orderkey = up.o_orderkey
        WHEN MATCHED AND up.op = 'del' THEN DELETE
        WHEN MATCHED THEN UPDATE SET o_totalprice = up.o_totalprice
        WHEN NOT MATCHED AND up.op = 'new' THEN INSERT
            (o_orderkey, o_custkey, o_orderstatus, o_totalprice)
            VALUES (up.o_orderkey, up.o_custkey, 'N', up.o_totalprice);
        SELECT o_orderstatus AS status, count(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
        FROM tgt GROUP BY o_orderstatus ORDER BY status
        """
    )
    if errors or df is None:
        raise RuntimeError(f"merge-dv script failed: {errors}")
    cur = cat.txn("tgt").snapshot()
    no_rewrite = set(pre.files) <= set(cur.files) and bool(cur.dv_file)
    return df.withColumn("no_rewrite", F.lit(no_rewrite))


ORACLE_SQL_MERGE_DV = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 6 = 0
),
final AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderstatus = 'O' AND o_custkey % 3 = 1
              THEN o_totalprice * 3 ELSE o_totalprice END AS o_totalprice
  FROM base
  WHERE NOT (o_orderstatus = 'F' AND o_custkey % 3 = 2)
  UNION ALL
  SELECT o_orderkey, o_custkey, 'N', o_totalprice
  FROM orders WHERE o_orderkey % 6 = 3 AND o_custkey % 9 = 0
)
SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total,
       TRUE AS no_rewrite
FROM final GROUP BY o_orderstatus ORDER BY status
"""


def q_sql_cdf_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Delta's CDF read surface as PLAIN SQL: table_changes('t', v0)
    # resolves to the txn log's net change feed inside an ordinary
    # SELECT (joinable, aggregable). The script creates the table with
    # bloom_filter_columns (the property-driven bloom wiring), runs a
    # DV delete + key upsert + append, then aggregates the feed per
    # change type — the oracle predicts the net feed from the
    # simulated endpoint states.
    import tempfile

    from dbt_maxcompute_spark.catalog import EngineCatalog

    cat = EngineCatalog(spark, tempfile.mkdtemp(prefix="tvf_wh_"))
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 8 == 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    cat.create_table(
        "cf",
        base,
        transactional=True,
        primary_keys=["o_orderkey"],
        tblproperties={"bloom_filter_columns": "o_orderkey"},
    )
    t = cat.txn("cf")
    t.delete_where_dv("o_custkey % 3 = 0")
    upd = (
        base.filter(F.col("o_custkey") % 3 != 0)
        .filter(F.col("o_orderstatus") == "F")
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    t.delete_insert_dv(upd, ["o_orderkey"])
    # start version 1 INCLUSIVE (round-10: the integer start matches
    # the timestamp form's from-inclusive rule, like Delta) = every
    # change after the initial load
    df = cat.execute(
        """
        SELECT _change_type AS change_type, count(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
        FROM table_changes('cf', 1)
        GROUP BY _change_type ORDER BY change_type
        """
    )
    # round-8: the TIMESTAMP-bound form (Delta's CDF surface accepts
    # both) — a timestamp between the v0 and v1 commits resolves under
    # Delta's start-bound rule (first commit at or after the instant,
    # here version 1, from-inclusive), so the feed is identical to the
    # version form above; pinned as a column via one signed-count
    # comparison (each side evaluated once).
    from datetime import datetime, timezone

    hist = {e["version"]: e["committed_at"] for e in t.history()}
    ts_mid = (hist[0] + hist[1]) / 2.0
    ts_lit = datetime.fromtimestamp(ts_mid, timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S.%f+00:00"
    )
    df_ts = cat.execute(
        f"""
        SELECT _change_type AS change_type, count(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
        FROM table_changes('cf', '{ts_lit}')
        GROUP BY _change_type
        """
    )
    n_mismatch = (
        df.withColumn("__s", F.lit(1))
        .unionByName(df_ts.withColumn("__s", F.lit(-1)))
        .groupBy("change_type", "n", "total")
        .agg(F.sum("__s").alias("__net"))
        .filter(F.col("__net") != 0)
        .count()
    )
    return df.withColumn("ts_form_matches", F.lit(n_mismatch == 0))


ORACLE_SQL_CDF_TVF = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 8 = 0
),
final AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
              ELSE o_totalprice END AS o_totalprice
  FROM base WHERE o_custkey % 3 <> 0
),
ins AS (SELECT * FROM final EXCEPT ALL SELECT * FROM base),
del AS (SELECT * FROM base EXCEPT ALL SELECT * FROM final)
SELECT change_type, n, total, TRUE AS ts_form_matches FROM (
  SELECT 'insert' AS change_type, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
  FROM ins
  UNION ALL
  SELECT 'delete', CAST(count(*) AS BIGINT),
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
  FROM del
) ORDER BY change_type
"""


def q_stream_cdf_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The 100 TB CDC-pipeline shape end to end: a raw keyed stream
    # upserts into a transaction table (DV + adds + batch marker, ONE
    # commit per trigger) and the SAME trigger advances a downstream
    # rollup by the table's change-feed interval — exactly-once at
    # both stages. Two file-source micro-batches (mtime-ordered,
    # maxFilesPerTrigger=1): inserts, then overlapping updates + new
    # keys. Invariants returned as columns: a replayed sync applies
    # nothing; the rollup equals a full recompute of the final table.
    import os
    import tempfile
    import time as _time

    from dbt_maxcompute_spark.materializations.materialized_view import (
        sync_rollup_exactly_once,
    )
    from dbt_maxcompute_spark.streaming.foreach_batch import stream_cdc_to_rollup
    from dbt_maxcompute_spark.txnlog import TxnTable

    base = tempfile.mkdtemp(prefix="cdfpipe_")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    b0 = ev.filter(F.col("event_id") % 3 == 0)
    b1 = (
        b0.filter(F.col("event_id") % 2 == 0)
        .withColumn("value", F.col("value") * 3)
        .unionByName(ev.filter(F.col("event_id") % 3 == 1))
    )
    src_dir = os.path.join(base, "src")
    os.makedirs(src_dir)
    p0, p1 = os.path.join(src_dir, "b0.parquet"), os.path.join(src_dir, "b1.parquet")
    b0.coalesce(1).write.parquet(p0)
    b1.coalesce(1).write.parquet(p1)
    now = _time.time()
    for root, age in ((p0, 20.0), (p1, 10.0)):  # b0 strictly older
        for f in os.listdir(root):
            os.utime(os.path.join(root, f), (now - age, now - age))
        os.utime(root, (now - age, now - age))
    t = TxnTable(spark, os.path.join(base, "tbl"))
    t.create(b0.limit(0))
    rollup = TxnTable(spark, os.path.join(base, "rollup"))
    stream = (
        spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
    )
    q = stream_cdc_to_rollup(
        stream, t, ["event_id"], rollup, ["event_type"],
        {"sum_val": "value"}, app_id="cdf_pipe",
        checkpoint_dir=os.path.join(base, "ckpt"),
    )
    q.awaitTermination()
    replay_noop = (
        sync_rollup_exactly_once(
            t, rollup, ["event_type"], {"sum_val": "value"}, "n",
            app_id="cdf_pipe_rollup",
        )
        == 0
    )
    recompute = t.read().groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(28,6)"))
        .cast("decimal(28,6)")
        .alias("sum_val"),
        F.count(F.lit(1)).alias("n"),
    )
    matches = rollup.read().exceptAll(recompute).unionAll(
        recompute.exceptAll(rollup.read())
    ).limit(1).count() == 0
    return rollup.read().select(
        "event_type",
        F.col("n").alias("n_events"),
        F.col("sum_val").cast("double").alias("total_value"),
        F.lit(bool(replay_noop and matches)).alias("exactly_once"),
    ).orderBy("event_type")


ORACLE_STREAM_CDF_PIPELINE = """
WITH final AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 6 = 0 THEN value * 3 ELSE value END AS value
  FROM events WHERE event_id % 3 = 0
  UNION ALL
  SELECT event_id, event_type, value FROM events WHERE event_id % 3 = 1
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value,
       TRUE AS exactly_once
FROM final GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "txn_change_feed_keyed": q_txn_change_feed_keyed,
    "mv_minmax_maintenance": q_mv_minmax_maintenance,
    "txn_bloom_skipping": q_txn_bloom_skipping,
    "sql_merge_dv_script": q_sql_merge_dv_script,
    "sql_cdf_tvf": q_sql_cdf_tvf,
    "stream_cdf_pipeline": q_stream_cdf_pipeline,
}

ORACLES = {
    "txn_change_feed_keyed": ORACLE_TXN_CHANGE_FEED_KEYED,
    "mv_minmax_maintenance": ORACLE_MV_MINMAX_MAINTENANCE,
    "txn_bloom_skipping": ORACLE_TXN_BLOOM_SKIPPING,
    "sql_merge_dv_script": ORACLE_SQL_MERGE_DV,
    "sql_cdf_tvf": ORACLE_SQL_CDF_TVF,
    "stream_cdf_pipeline": ORACLE_STREAM_CDF_PIPELINE,
}
