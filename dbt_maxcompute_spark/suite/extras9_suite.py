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
from dbt_maxcompute_spark.localframe import local_frame


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
        local_frame(spark, [], "test_state string, n bigint"),
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


def q_ann_ivf_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-9 (verdict item 5): coarse-quantizer drift repair. The
    # index is skewed by churn (3x the corpus inserted as copies of
    # one vector via maintenance — centroids held fixed, one cell goes
    # hot), the ROW-COUNT skew trigger fires from the index's own
    # parquet footers (no Spark job), and the rebalance re-trains +
    # re-assigns as an exactly-once staged swap. Driver-checked
    # invariants: the trigger fired on the skewed index; the
    # rebalanced index is IDENTICAL to a fresh build of the final
    # corpus (same deterministic centroid pick -> same cells, same
    # search results); the same-threshold second call is a no-op that
    # rewrites no cell directory (the touched-vs-rebuilt cost pin);
    # search over the rebalanced artifact returns full top-k.
    import os
    import tempfile

    from dbt_maxcompute_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    idx = tempfile.mkdtemp(prefix="rebal_") + "/index"
    similarity.build_ivf_index(base, "vec_id", "embedding", idx, num_centroids=8)

    # one pass for both fixture scalars (vec_id is unique, so the
    # ignorenulls-first IS the vec_id==1 embedding): previously a
    # filter+collect scan plus a count scan
    fx = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.first(
            F.when(F.col("vec_id") == 1, F.col("embedding")), ignorenulls=True
        ).alias("v"),
    ).collect()[0]
    v, n = fx["v"], fx["n"]
    dup = spark.range(1_000_000, 1_000_000 + 3 * n).select(
        F.col("id").alias("vec_id"),
        F.lit([float(x) for x in v]).cast("array<float>").alias("embedding"),
    )
    similarity.maintain_ivf_index(
        spark, idx, dup.withColumn("_change_type", F.lit("insert"))
    )

    res1 = similarity.maybe_rebalance_ivf_index(spark, idx, skew_threshold=3.0)

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

    before = listing(idx)
    res2 = similarity.maybe_rebalance_ivf_index(spark, idx, skew_threshold=3.0)
    noop_untouched = (not res2["rebalanced"]) and listing(idx) == before

    fresh = tempfile.mkdtemp(prefix="rebalf_") + "/index"
    similarity.build_ivf_index(
        spark.read.parquet(idx).drop("centroid_id"),
        "vec_id", "embedding", fresh, num_centroids=8,
    )
    queries = base.filter(F.col("vec_id").isin(1, 2, 3))
    got = similarity.ivf_indexed_topk(spark, idx, queries, k=5, nprobe=3)
    # the search frame feeds BOTH the recall/mismatch check and the
    # returned agg below — a lazy localCheckpoint materializes the
    # k*|queries|-row result at its first action so the full search
    # pipeline (corpus-scale assign/encode/score) executes once, not
    # per consumer (guide §5; same device as the CC label rounds)
    got = got.localCheckpoint(eager=False)
    want = similarity.ivf_indexed_topk(spark, fresh, queries, k=5, nprobe=3)
    n_mismatch = (
        got.withColumn("__s", F.lit(1))
        .unionByName(want.withColumn("__s", F.lit(-1)))
        .groupBy("query_id", "neighbor_id", "rank", "cosine")
        .agg(F.sum("__s").alias("__net"))
        .filter(F.col("__net") != 0)
        .count()
    )
    corpus_n = spark.read.parquet(idx).count()
    return (
        got.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_results"))
        .select(
            "query_id",
            "n_results",
            F.lit(bool(res1["rebalanced"])).alias("rebalance_fired"),
            F.lit(bool(noop_untouched)).alias("noop_untouched"),
            F.lit(n_mismatch == 0).alias("matches_fresh"),
            F.lit(corpus_n).cast("bigint").alias("corpus_n"),
        )
        .orderBy("query_id")
    )


ORACLE_ANN_IVF_REBALANCE = """
SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_results,
       TRUE AS rebalance_fired, TRUE AS noop_untouched, TRUE AS matches_fresh,
       (SELECT CAST(4 * count(*) AS BIGINT) FROM embeddings WHERE vec_id % 5 <> 4)
         AS corpus_n
FROM embeddings WHERE vec_id IN (1, 2, 3) ORDER BY vec_id
"""


def q_mv_rewrite_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-9 (verdict item 6): MV auto-rewrite THROUGH a catalog view.
    # A user rollup whose FROM is a view (aliased projection + filter
    # over the MV's base relation) expands through the view definition
    # before relation normalization and answers from the
    # rollup-cardinality MV (plan-pinned: MV scanned, fact table
    # absent). A view the grammar cannot expand (a rollup body) FALLS
    # BACK to the base table (negative plan-pin) — fail-closed, never
    # a wrong answer. Values hash-checked against DuckDB computing
    # from the base table.
    import tempfile

    from dbt_maxcompute_spark.catalog import EngineCatalog
    from dbt_maxcompute_spark.materializations.materialized_view import (
        create_materialized_view,
    )

    cat = EngineCatalog(spark, tempfile.mkdtemp(prefix="mvv9_wh_"))
    cat.create_table("orders", load_table(spark, sf_dir, "orders"))
    create_materialized_view(
        cat,
        "mv_status",
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                  CAST(sum(CAST(o_totalprice AS decimal(28,6))) AS double) AS total
           FROM orders WHERE o_custkey > 0
           GROUP BY o_orderstatus, o_orderpriority""",
    )
    cat.create_view(
        "ord_v",
        "SELECT o_orderstatus AS status, o_orderpriority, o_totalprice "
        "FROM orders WHERE o_custkey > 0",
    )

    def plan_of(df: DataFrame) -> str:
        return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    served = cat.sql(
        """SELECT status, count(*) AS n,
                  CAST(sum(CAST(o_totalprice AS decimal(28,6))) AS double) AS total
           FROM ord_v GROUP BY status"""
    )
    p1 = plan_of(served)
    used_mv = ("mv_status" in p1) and ("default/orders" not in p1)

    cat.create_view(
        "ord_rollup",
        "SELECT o_orderstatus, count(*) AS cnt FROM orders GROUP BY o_orderstatus",
    )
    p2 = plan_of(
        cat.sql(
            "SELECT o_orderstatus, sum(cnt) AS s FROM ord_rollup "
            "GROUP BY o_orderstatus"
        )
    )
    rollup_view_fell_back = ("mv_status" not in p2) and ("default/orders" in p2)

    return (
        served.withColumn("used_mv", F.lit(bool(used_mv)))
        .withColumn("rollup_view_fell_back", F.lit(bool(rollup_view_fell_back)))
        .orderBy("status")
    )


ORACLE_MV_REWRITE_VIEW = """
SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total,
       TRUE AS used_mv, TRUE AS rollup_view_fell_back
FROM orders WHERE o_custkey > 0
GROUP BY o_orderstatus ORDER BY status
"""


def q_text_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-9 pipeline operator: C4/RefinedWeb-style LINE-level
    # boilerplate removal — a trimmed line occurring in >= min_docs
    # DISTINCT documents (headers, footers, nav chrome) drops from
    # every document; survivors reassemble in original order. The
    # fixture builds multi-line docs deterministically (per-source
    # header + body + global footer), so sources with >= 3 docs lose
    # their header, rarer sources keep theirs, the footer always
    # drops, and repeated bodies get caught by the same threshold —
    # the oracle replays the identical algorithm in SQL.
    from dbt_maxcompute_spark.operators.textanalysis import (
        remove_boilerplate_lines,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    multi = docs.withColumn("body", F.col("text")).withColumn(
        "text",
        F.concat_ws(
            "\n",
            F.concat(F.lit("header for "), F.col("source")),
            F.col("text"),
            F.lit("global footer"),
        ),
    )
    cleaned = remove_boilerplate_lines(multi, "doc_id", "text", min_docs=3)
    return (
        cleaned.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("chars"),
            F.sum(
                F.when(F.col("text") == F.col("body"), 1).otherwise(0)
            ).cast("bigint").alias("n_body_exact"),
            F.sum("n_removed_lines").cast("bigint").alias("removed"),
        )
        .orderBy("lang")
    )


ORACLE_TEXT_BOILERPLATE_REMOVAL = """
WITH src AS (
  SELECT doc_id, lang, text AS body,
         'header for ' || source || chr(10) || text || chr(10) ||
         'global footer' AS t
  FROM documents
),
lines AS (
  SELECT doc_id,
         unnest(string_split(t, chr(10))) AS line,
         unnest(range(1, len(string_split(t, chr(10))) + 1)) AS pos
  FROM src
),
freq AS (
  SELECT trim(line) AS k FROM lines WHERE length(trim(line)) > 0
  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3
),
kept AS (
  SELECT l.doc_id, l.line, l.pos FROM lines l
  WHERE trim(l.line) NOT IN (SELECT k FROM freq)
),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS cleaned,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT s.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(COALESCE(r.cleaned, ''))) AS BIGINT) AS chars,
       CAST(sum(CASE WHEN COALESCE(r.cleaned, '') = s.body THEN 1 ELSE 0 END)
            AS BIGINT) AS n_body_exact,
       CAST(sum(len(string_split(s.t, chr(10))) - COALESCE(r.n_kept, 0))
            AS BIGINT) AS removed
FROM src s LEFT JOIN rebuilt r USING (doc_id)
GROUP BY s.lang ORDER BY s.lang
"""


def q_text_boilerplate_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-9 pipeline operator, continuous-ingest shape: documents
    # arrive in three batches (doc_id % 3); a PERSISTENT line-frequency
    # store (transaction-log table, keyed DV upserts) accumulates
    # cumulative distinct-doc counts, and each batch cleans against
    # the counts as of its own arrival — boilerplate that only becomes
    # frequent in a later batch starts dropping from that batch on,
    # with history never reprocessed. The oracle replays the cumulative
    # thresholds per batch horizon in SQL.
    import tempfile

    from dbt_maxcompute_spark.operators.textanalysis import (
        clean_boilerplate_incremental,
    )
    from dbt_maxcompute_spark.txnlog import TxnTable

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    multi = docs.withColumn(
        "text",
        F.concat_ws(
            "\n",
            F.concat(F.lit("header for "), F.col("source")),
            F.col("text"),
            F.lit("global footer"),
        ),
    )
    store = TxnTable(spark, tempfile.mkdtemp(prefix="boiler_inc_") + "/freq")
    rows = []
    for k in range(3):
        bk = multi.filter(F.col("doc_id") % 3 == k)
        out = clean_boilerplate_incremental(
            spark, store, bk, "doc_id", "text", min_docs=3
        )
        agg = out.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("chars"),
            F.sum("n_removed_lines").cast("bigint").alias("removed"),
        ).collect()[0]
        rows.append((k, agg["n_docs"], agg["chars"], agg["removed"]))
    return local_frame(
        spark, rows, "batch_id int, n_docs bigint, chars bigint, removed bigint"
    ).orderBy("batch_id")


ORACLE_TEXT_BOILERPLATE_INCREMENTAL = """
WITH src AS (
  SELECT doc_id, CAST(doc_id % 3 AS INT) AS b,
         'header for ' || source || chr(10) || text || chr(10) ||
         'global footer' AS t
  FROM documents
),
lines AS (
  SELECT doc_id, b,
         unnest(string_split(t, chr(10))) AS line,
         unnest(range(1, len(string_split(t, chr(10))) + 1)) AS pos
  FROM src
),
freq AS (
  SELECT trim(l.line) AS k_line, h.k AS k, count(DISTINCT l.doc_id) AS c
  FROM lines l, (SELECT unnest(range(0, 3)) AS k) h
  WHERE l.b <= h.k AND length(trim(l.line)) > 0
  GROUP BY 1, 2
),
kept AS (
  SELECT l.doc_id, l.b, l.line, l.pos
  FROM lines l
  WHERE NOT EXISTS (
    SELECT 1 FROM freq f
    WHERE f.k = l.b AND f.k_line = trim(l.line) AND f.c >= 3
  )
),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS cleaned,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT s.b AS batch_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(COALESCE(r.cleaned, ''))) AS BIGINT) AS chars,
       CAST(sum(len(string_split(s.t, chr(10))) - COALESCE(r.n_kept, 0))
            AS BIGINT) AS removed
FROM src s LEFT JOIN rebuilt r USING (doc_id)
GROUP BY s.b ORDER BY batch_id
"""


QUERIES = {
    "model_hooks_script": q_model_hooks_script,
    "ann_ivf_rebalance": q_ann_ivf_rebalance,
    "mv_rewrite_view": q_mv_rewrite_view,
    "text_boilerplate_removal": q_text_boilerplate_removal,
    "text_boilerplate_incremental": q_text_boilerplate_incremental,
}

ORACLES = {
    "model_hooks_script": ORACLE_MODEL_HOOKS_SCRIPT,
    "ann_ivf_rebalance": ORACLE_ANN_IVF_REBALANCE,
    "mv_rewrite_view": ORACLE_MV_REWRITE_VIEW,
    "text_boilerplate_removal": ORACLE_TEXT_BOILERPLATE_REMOVAL,
    "text_boilerplate_incremental": ORACLE_TEXT_BOILERPLATE_INCREMENTAL,
}
