"""Second extras suite (round 2, post-window): domain quota capping,
corpus Zipf profile, document length histogram, next-event training
examples. All oracle-paired; the driver's 50-entry window is already
full of this round's previously-unchecked queries, so the first two
here ride the remaining slots and the rest rotate in next round.
pytest + driver_sim enforce every oracle regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators import relevance, sampling, training
from dbt_maxcompute_spark.operators import textanalysis as ta
from dbt_maxcompute_spark.sources.registry import load_table
from dbt_maxcompute_spark.suite.relational import _dsum
from dbt_maxcompute_spark.localframe import local_frame

_BUCKET_WAREHOUSES: dict[str, str] = {}


def _bucket_warehouse(sf_dir: str) -> str:
    """One temp warehouse per (process, sf_dir) — repeated invocations
    overwrite the same bucketed tables instead of leaking a copy per
    call, and the session-catalog registrations stay bound to one
    LOCATION."""
    if sf_dir not in _BUCKET_WAREHOUSES:
        import tempfile

        _BUCKET_WAREHOUSES[sf_dir] = tempfile.mkdtemp(prefix="bkt_wh_")
    return _BUCKET_WAREHOUSES[sf_dir]


def q_sample_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cap every source domain at 120 docs (deterministic md5-ranked
    # keep set), then report per-source kept/dropped counts — the audit
    # row a curation run logs per domain. Single scan: the audit ranks
    # and aggregates in one pass (quota_cap itself produces the rows).
    docs = load_table(spark, sf_dir, "documents")
    return sampling.quota_cap_audit(docs, ["source"], "doc_id", cap=120).orderBy(
        "source"
    )


ORACLE_DOMAIN_QUOTA = """
WITH kept AS (
  SELECT source FROM documents
  QUALIFY row_number() OVER (PARTITION BY source
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 120
), k AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_kept FROM kept GROUP BY source
), a AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_total FROM documents GROUP BY source
)
SELECT a.source, a.n_total, k.n_kept, a.n_total - k.n_kept AS n_dropped
FROM a JOIN k USING (source) ORDER BY source
"""


def q_corpus_zipf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relevance.corpus_term_profile(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", k=20
    )


ORACLE_ZIPF = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents
), counts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY term
), total AS (
  SELECT sum(n) AS total_tokens FROM counts
)
SELECT CAST(row_number() OVER (ORDER BY n DESC, term) AS INTEGER) AS rank,
       term, n,
       round(sum(n) OVER (ORDER BY n DESC, term
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / CAST(total_tokens AS DOUBLE), 6) AS cum_share
FROM counts CROSS JOIN total
ORDER BY rank LIMIT 20
"""


def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Token-count histogram in width-8 buckets: corpus shape at a
    # glance (truncation risk, short-doc mass). Single map-side-
    # combinable agg over one pruned scan — no window, no second pass.
    docs = load_table(spark, sf_dir, "documents")
    n_tok = ta.token_count(F.col("text")).cast("long")
    bucket = (F.floor(n_tok / 8) * 8).cast("long")
    return (
        docs.select(bucket.alias("bucket_start"), n_tok.alias("__n"))
        .groupBy("bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("total_tokens"),
            F.min("__n").alias("min_tokens"),
            F.max("__n").alias("max_tokens"),
        )
        .orderBy("bucket_start")
    )


ORACLE_LENGTH_HIST = """
WITH n AS (
  SELECT CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tok
  FROM documents
)
SELECT (n_tok // 8) * 8 AS bucket_start,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       min(n_tok) AS min_tokens,
       max(n_tok) AS max_tokens
FROM n GROUP BY bucket_start ORDER BY bucket_start
"""


def q_train_next_event_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (context, label) pairs for next-event prediction: 2 preceding
    # event types -> current type, per user timeline.
    ev = load_table(spark, sf_dir, "events")
    # context stays an array in the operator; JSON at the output
    # boundary (the driver's hasher cannot hash list cells).
    return training.next_event_examples(
        ev, "user_id", "ts", "event_type", "event_id", context=2
    ).withColumn("context", F.to_json("context"))


ORACLE_NEXT_EVENT = """
SELECT event_id, user_id, CAST(to_json(context) AS VARCHAR) AS context, label FROM (
  SELECT event_id, user_id,
         list(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS context,
         event_type AS label,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type IS NOT NULL
) WHERE rn > 2
"""


def q_curation_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The audit row every corpus-curation run logs: how many documents
    # survive each successive quality gate (length -> composite quality
    # -> repetition). ONE scan, conditional aggregation — no per-stage
    # pass, no shuffle beyond the single-row agg. Gates compare on
    # round(...,6) values whose formulas the oracle mirrors exactly
    # (quality_score summation order is pinned; dup ratio divides exact
    # integer-valued doubles), so the float thresholds are engine-safe.
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    toks = ta.tokens(t)
    n_tok = F.size(toks)
    quality = F.round(ta.quality_score(t), 6)
    dup_ratio = F.round(F.lit(1.0) - F.size(F.array_distinct(toks)) / n_tok, 6)
    staged = docs.select(
        (n_tok >= 30).alias("p_len"),
        quality.alias("q"),
        dup_ratio.alias("d"),
    ).select(
        "p_len",
        (F.col("p_len") & (F.col("q") >= 0.60)).alias("p_qual"),
        (F.col("p_len") & (F.col("q") >= 0.60) & (F.col("d") <= 0.55)).alias("p_rep"),
    )
    return staged.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("p_len"), 1)).alias("n_pass_length"),
        F.count(F.when(F.col("p_qual"), 1)).alias("n_pass_quality"),
        F.count(F.when(F.col("p_rep"), 1)).alias("n_pass_repetition"),
    ).select(
        "n_total",
        "n_pass_length",
        "n_pass_quality",
        "n_pass_repetition",
        F.round(F.col("n_pass_repetition") / F.col("n_total"), 6).alias("kept_share"),
    )


_SW_ALL = sorted({w for ws in ta.STOPWORDS.values() for w in ws})
_SW_SQL = "[" + ", ".join(f"'{w}'" for w in _SW_ALL) + "]"

ORACLE_FUNNEL2 = f"""
WITH t AS (
  SELECT text, string_split_regex(lower(trim(text)), '\\s+') AS toks,
         CAST(length(text) AS DOUBLE) AS n_chars
  FROM documents
), m AS (
  SELECT len(toks) AS n_tokens,
         CASE WHEN n_chars = 0 THEN 0.0
              ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / n_chars
         END AS alpha_ratio,
         CASE WHEN n_chars = 0 THEN 0.0
              ELSE length(regexp_replace(text, '[^.,;:!?]', '', 'g')) / n_chars
         END AS punct_ratio,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, x -> list_contains({_SW_SQL}, x)))
                        AS DOUBLE) / len(toks)
         END AS sw_ratio,
         round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS dup_ratio
  FROM t
), g AS (
  SELECT n_tokens >= 30 AS p_len,
         round(0.35 * alpha_ratio
               + 0.25 * least(sw_ratio * 4.0, 1.0)
               + 0.25 * (1.0 - least(punct_ratio * 5.0, 1.0))
               + 0.15 * least(n_tokens / 100.0, 1.0), 6) AS q,
         dup_ratio AS d
  FROM m
)
SELECT CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(CASE WHEN p_len THEN 1 END) AS BIGINT) AS n_pass_length,
       CAST(count(CASE WHEN p_len AND q >= 0.60 THEN 1 END) AS BIGINT) AS n_pass_quality,
       CAST(count(CASE WHEN p_len AND q >= 0.60 AND d <= 0.55 THEN 1 END) AS BIGINT)
            AS n_pass_repetition,
       round(count(CASE WHEN p_len AND q >= 0.60 AND d <= 0.55 THEN 1 END)
             / CAST(count(*) AS DOUBLE), 6) AS kept_share
FROM g
"""


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # JSONL is the interchange format training pipelines actually
    # exchange; the query proves the full sink->source cycle: write the
    # documents table as newline-delimited JSON (many-file, splittable),
    # read it back with an EXPLICIT schema (no inference scan), and
    # aggregate. The oracle computes the same aggregate from the parquet
    # table, so any fidelity loss in the round trip (escaping, unicode,
    # null handling, numeric widths) breaks the hash.
    import os

    from dbt_maxcompute_spark.sources import jsonl

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars"
    )
    out = os.path.join(_bucket_warehouse(sf_dir), "docs_jsonl")
    jsonl.write_jsonl(docs, out)
    back = jsonl.read_jsonl(
        spark, out, "doc_id bigint, lang string, text string, n_chars bigint"
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.length("text")).alias("sum_text_len"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("lang")
    )


ORACLE_JSONL_ROUNDTRIP = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
       min(doc_id) AS min_id,
       max(doc_id) AS max_id
FROM documents GROUP BY lang ORDER BY lang
"""


def q_webdataset_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Multimodal corpora ship as WebDataset tar shards. The query packs
    # the documents table into shard-NNNNN.tar files (executors write
    # shards directly — no driver funnel), reads them back through the
    # binaryFile source + Arrow tar walk, joins members to the source
    # table, and asserts byte-exact fidelity: n_exact counts members
    # whose payload equals utf8(text). Shard assignment is
    # content-stable xxhash, timestamps pinned, keys sorted — same
    # corpus, same shard bytes.
    import os

    from dbt_maxcompute_spark.operators import webdataset

    docs = load_table(spark, sf_dir, "documents")
    out = os.path.join(_bucket_warehouse(sf_dir), "wds")
    webdataset.write_webdataset(docs, out, "doc_id", {"txt": "text"}, num_shards=8)
    members = webdataset.read_webdataset(spark, out)
    joined = members.join(
        docs.select(F.col("doc_id").cast("string").alias("key"), "text"), "key"
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_members"),
        F.countDistinct("key").alias("n_keys"),
        F.sum("byte_len").alias("total_bytes"),
        F.sum(
            (F.col("payload") == F.encode(F.col("text"), "UTF-8")).cast("long")
        ).alias("n_exact"),
    )


ORACLE_WEBDATASET = """
SELECT CAST(count(*) AS BIGINT) AS n_members,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_keys,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(count(*) AS BIGINT) AS n_exact
FROM documents WHERE text IS NOT NULL
"""


def q_txn_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Transaction-log table (SURVEY §4.3 stretch, Delta-paper design in
    # txnlog.py): three commits — create a third of orders, append
    # another third, copy-on-write delete the finished ones — then read
    # ALL THREE versions back via snapshot resolution and aggregate
    # each. The oracle recomputes every version's expected state from
    # the orders table, so log replay, atomic commit contents, and
    # delete semantics are all value-hash-checked.
    import os
    import shutil

    from dbt_maxcompute_spark.txnlog import TxnTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(_bucket_warehouse(sf_dir), "txn_orders")
    shutil.rmtree(path, ignore_errors=True)
    t = TxnTable(spark, path)
    t.create(orders.filter(F.col("o_orderkey") % 3 == 0))
    t.append(orders.filter(F.col("o_orderkey") % 3 == 1))
    t.delete_where("o_orderstatus = 'F'")
    versions = [
        t.read(v)
        .agg(
            F.lit(v).cast("long").alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
            _dsum(F.col("o_totalprice")).alias("total_price"),
        )
        for v in (0, 1, 2)
    ]
    out = versions[0]
    for v in versions[1:]:
        out = out.unionByName(v)
    return out.select("version", "n_rows", "total_price").orderBy("version")


ORACLE_TXN = """
SELECT CAST(0 AS BIGINT) AS version, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
FROM orders WHERE o_orderkey % 3 = 0
UNION ALL
SELECT 1, CAST(count(*) AS BIGINT),
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
FROM orders WHERE o_orderkey % 3 <= 1
UNION ALL
SELECT 2, CAST(count(*) AS BIGINT),
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
FROM orders WHERE o_orderkey % 3 <= 1 AND o_orderstatus <> 'F'
ORDER BY version
"""


def q_txn_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Data skipping over the transaction log (Delta-paper: per-file
    # min/max stats recorded at write, files pruned by predicate before
    # Spark sees them). Four disjoint key-range commits; a top-quartile
    # predicate must scan exactly ONE file — n_files/n_scanned/pruned
    # are log-derived observables the oracle pins, and the filtered
    # aggregate is value-hash-checked against plain SQL.
    import os
    import shutil

    from dbt_maxcompute_spark.txnlog import TxnTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    m = orders.agg(F.max("o_orderkey")).collect()[0][0]  # metadata-sized
    b1, b2, b3 = m // 4, m // 2, (3 * m) // 4
    path = os.path.join(_bucket_warehouse(sf_dir), "txn_skip_orders")
    shutil.rmtree(path, ignore_errors=True)
    t = TxnTable(spark, path)
    k = F.col("o_orderkey")
    t.create(orders.filter(k <= b1).coalesce(1))
    t.append(orders.filter((k > b1) & (k <= b2)).coalesce(1))
    t.append(orders.filter((k > b2) & (k <= b3)).coalesce(1))
    t.append(orders.filter(k > b3).coalesce(1))

    where = [("o_orderkey", ">", b3)]
    n_files = len(t.snapshot().files)
    n_scanned = len(t.files_scanned(where))
    return (
        t.read(where=where)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .select(
            F.lit(n_files).cast("long").alias("n_files"),
            F.lit(n_scanned).cast("long").alias("n_scanned"),
            F.lit(n_scanned < n_files).alias("pruned"),
            "n_rows",
            "total_price",
        )
    )


ORACLE_TXN_SKIP = """
WITH m AS (SELECT max(o_orderkey) AS mk FROM orders)
SELECT CAST(4 AS BIGINT) AS n_files,
       CAST(1 AS BIGINT) AS n_scanned,
       TRUE AS pruned,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
FROM orders, m
WHERE o_orderkey > (3 * mk) // 4
"""


def q_catalog_ddl_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SURVEY §2.7's DDL surface, driven end-to-end through the driver
    # gate: create schema/table/view, add + drop columns, string-family
    # widening, comments, clone, rename, truncate — then emit the
    # catalog's own description of the final state (info-schema row +
    # ordered column signature per relation). The oracle is the literal
    # expected outcome, so any DDL step silently misbehaving (lost
    # comment, column order drift, widening applied wrong, clone/rename
    # leaking state) breaks the hash. Fresh warehouse per call.
    import tempfile

    from dbt_maxcompute_spark.catalog import EngineCatalog

    cat = EngineCatalog(spark, tempfile.mkdtemp(prefix="ddl_audit_wh_"))
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cat.create_schema("core")
    cat.create_table("core.r1", region, comment="regions")
    cat.add_remove_columns("core.r1", add={"note": "varchar(8)"})
    cat.alter_column_type("core.r1", "note", "string")  # widening ok
    cat.set_comment("core.r1", "regions v2")
    cat.set_column_comment("core.r1", "r_name", "region name")
    cat.create_view("core.v1", "SELECT 1 AS one")
    cat.clone("core.r1", "core.r2")
    cat.add_remove_columns("core.r2", remove=["note"])
    cat.rename("core.r2", "core.r3")
    cat.truncate("core.r3")  # schema survives, rows go
    sig = {
        full: ",".join(f"{c}:{t}" for c, t in cat.columns(full))
        for full in ("core.r1", "core.r3")
    }
    info = cat.info_schema().filter(F.col("table_schema") == "core")
    sig_df = local_frame(
        spark,
        [("r1", sig["core.r1"]), ("r3", sig["core.r3"]), ("v1", None)],
        "table_name string, cols_sig string",
    )
    return (
        info.join(sig_df, "table_name")
        .select(
            "table_schema", "table_name", "table_type", "comment",
            "n_columns", "cols_sig",
        )
        .orderBy("table_name")
    )


ORACLE_DDL_AUDIT = """
SELECT * FROM (VALUES
  ('core', 'r1', 'table', 'regions v2', 3,
   'r_regionkey:int,r_name:string,note:string'),
  ('core', 'r3', 'table', 'regions v2', 2,
   'r_regionkey:int,r_name:string'),
  ('core', 'v1', 'view', NULL, 1, NULL)
) AS t(table_schema, table_name, table_type, comment, n_columns, cols_sig)
ORDER BY table_name
"""


def q_raw_script_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SURVEY §2.1's raw multi-statement passthrough, driver-checked:
    # SET preamble (scoped conf application), a temp-view DDL
    # statement, and a final SELECT — with a query comment injected
    # into every statement (the reference's query-comment contract).
    # The returned frame must match the oracle computed straight from
    # the orders table, proving the statement splitter, preamble
    # scoping, and comment injection are all value-neutral.
    from dbt_maxcompute_spark.materializations.raw import run_raw

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_raw")
    script = """
    SET spark.sql.shuffle.partitions=16;
    CREATE OR REPLACE TEMP VIEW big_orders AS
      SELECT o_orderkey, o_totalprice FROM orders_raw
      WHERE o_totalprice > 100000;
    SELECT CAST(count(*) AS BIGINT) AS n_big,
           CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
    FROM big_orders
    """
    df, _hints, errors = run_raw(
        spark, script, query_comment={"app": "spark-graft", "suite": "extras2"}
    )
    if errors or df is None:
        raise RuntimeError(f"raw script failed: {errors}")
    return df


ORACLE_RAW_SCRIPT = """
SELECT CAST(count(*) AS BIGINT) AS n_big,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
FROM orders WHERE o_totalprice > 100000
"""


def q_ops_contract_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Freshness and EXPLAIN-validation are wall-clock / plan-text by
    # nature, so the driver-checkable surface is their CONTRACT as
    # booleans the oracle predicts: a just-written table reports a
    # small non-negative age, a view (no data files) reports infinite
    # age, valid SQL validates via analysis-only EXPLAIN, and invalid
    # SQL raises instead of executing.
    import tempfile

    from dbt_maxcompute_spark.catalog import EngineCatalog

    cat = EngineCatalog(spark, tempfile.mkdtemp(prefix="ops_probe_wh_"))
    cat.create_table("f1", load_table(spark, sf_dir, "region"))
    age = cat.freshness("f1")
    cat.create_view("v1", "SELECT 1 AS one")
    vage = cat.freshness("v1")
    plan = cat.validate_sql("SELECT count(*) AS n FROM range(10)")
    try:
        cat.validate_sql("SELECT definitely_not_a_column FROM range(3)")
        invalid_raises = False
    except Exception:
        invalid_raises = True
    return local_frame(
        spark,
        [
            (
                bool(0.0 <= age < 3600.0),
                bool(vage == float("inf")),
                bool("Aggregate" in plan),
                invalid_raises,
            )
        ],
        "fresh_after_write boolean, view_age_infinite boolean, "
        "explain_validates boolean, invalid_sql_raises boolean",
    )


ORACLE_OPS_PROBE = """
SELECT TRUE AS fresh_after_write, TRUE AS view_age_infinite,
       TRUE AS explain_validates, TRUE AS invalid_sql_raises
"""


def q_ops_compact_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The two standing-maintenance ops (SURVEY §2.2/§2.7) as an
    # oracle-predicted ledger: small-file COMPACTION must collapse a
    # fragmented table (create + 3 appends ⇒ ≥4 files) to exactly one
    # right-sized file with rows and a value checksum intact, and the
    # lifecycle SWEEPER (reference LIFECYCLE N option) must — under an
    # injected clock — drop exactly the expired table and keep the
    # fresh one. Every fact rides as a column the DuckDB oracle
    # predicts from the nation table.
    import tempfile

    from dbt_maxcompute_spark.catalog import EngineCatalog
    from dbt_maxcompute_spark.plans import dml

    cat = EngineCatalog(spark, tempfile.mkdtemp(prefix="compact_probe_wh_"))
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("t", nation)
    for _ in range(3):
        dml.append(cat, "t", nation)
    stats = cat.compact("t", target_file_bytes=1 << 30)
    n_rows = cat.read("t").count()
    key_sum = cat.read("t").agg(
        F.sum("n_nationkey").cast("bigint").alias("s")
    ).collect()[0]["s"]

    cat.create_table("ttl_short", nation.limit(1), lifecycle=1)
    cat.create_table("ttl_long", nation.limit(1), lifecycle=30)
    created = cat.meta("ttl_short").created_at
    dropped = cat.sweep_lifecycle(now=created + 2 * 86400)
    return local_frame(
        spark,
        [
            (
                bool(stats["files_before"] >= 4),
                int(stats["files_after"]),
                int(n_rows),
                int(key_sum),
                bool(dropped == ["default.ttl_short"]),
                bool(cat.exists("ttl_long") and not cat.exists("ttl_short")),
            )
        ],
        "fragmented_before boolean, files_after int, n_rows bigint, "
        "key_sum bigint, swept_exactly_expired boolean, ttl_respected boolean",
    )


ORACLE_COMPACT_PROBE = """
SELECT TRUE AS fragmented_before,
       CAST(1 AS INTEGER) AS files_after,
       CAST(4 * count(*) AS BIGINT) AS n_rows,
       CAST(4 * sum(n_nationkey) AS BIGINT) AS key_sum,
       TRUE AS swept_exactly_expired,
       TRUE AS ttl_respected
FROM nation
"""


def q_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # REAL bucketed tables: orders and customer co-bucketed on the
    # customer key, so the equi-join plans with zero exchanges on the
    # fact sides — the storage layout is the shuffle, paid once at
    # write time (the plan pin asserts no Exchange feeds the join).
    # The post-join rollup to mktsegment is the only (5-row) shuffle.
    # The warehouse dir is cached per sf_dir: bench/driver invoke this
    # repeatedly and a fresh mkdtemp per call both leaks a full copy of
    # the bucketed tables and rebinds the session-global registrations.
    from dbt_maxcompute_spark.catalog import EngineCatalog

    cat = EngineCatalog(spark, _bucket_warehouse(sf_dir))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    cat.create_bucketed_table(
        "orders_b", orders, bucket_by=["o_custkey"], bucket_num=8,
        sort_by=["o_custkey"], mode="overwrite",
    )
    cat.create_bucketed_table(
        "customer_b", cust, bucket_by=["c_custkey"], bucket_num=8,
        sort_by=["c_custkey"], mode="overwrite",
    )
    ob, cb = cat.read_bucketed("orders_b"), cat.read_bucketed("customer_b")
    j = ob.join(cb, ob["o_custkey"] == cb["c_custkey"])
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_BUCKETED_JOIN = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Importance sampling by quality: each doc kept with probability =
    # its composite quality score, decided by a deterministic md5
    # uniform — the quality-weighted mixing step of corpus curation,
    # RNG-free and engine-reproducible. Single scan, no shuffle.
    docs = load_table(spark, sf_dir, "documents")
    q = F.round(ta.quality_score(F.col("text")), 6)
    return sampling.weighted_sample(docs, "doc_id", q).select(
        "doc_id", "lang", "source", "n_chars"
    )


_ORACLE_QUALITY_EXPR = f"""round(0.35 * (CASE WHEN length(text) = 0 THEN 0.0
               ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                    / CAST(length(text) AS DOUBLE) END)
       + 0.25 * least((CASE WHEN len(string_split_regex(lower(trim(text)), '\\s+')) = 0 THEN 0.0
               ELSE CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                              x -> list_contains({_SW_SQL}, x))) AS DOUBLE)
                    / len(string_split_regex(lower(trim(text)), '\\s+')) END) * 4.0, 1.0)
       + 0.25 * (1.0 - least((CASE WHEN length(text) = 0 THEN 0.0
               ELSE length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                    / CAST(length(text) AS DOUBLE) END) * 5.0, 1.0))
       + 0.15 * least(len(string_split_regex(lower(trim(text)), '\\s+')) / 100.0, 1.0), 6)"""

ORACLE_QUALITY_WEIGHTED = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
      / CAST(16777216 AS DOUBLE)
      < least(greatest({_ORACLE_QUALITY_EXPR}, 0.0), 1.0)
"""


def q_dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # New crawl batch (every 10th doc) vs the corpus store (the rest):
    # drop batch docs whose exact text hash OR token-bag fingerprint
    # already exists in the store — cross-batch dedup keyed on digests,
    # the op a growing corpus runs per ingest.
    docs = load_table(spark, sf_dir, "documents")
    store = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    from dbt_maxcompute_spark.operators import dedup

    return (
        dedup.dedup_against_store(batch, store, "text")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


ORACLE_INCR_DEDUP = """
WITH fp AS (
  SELECT doc_id, md5(text) AS h,
         md5(array_to_string(
               list_sort(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))),
               ' ')) AS f
  FROM documents
), store AS (
  SELECT h, f FROM fp WHERE doc_id % 10 != 0
), batch AS (
  SELECT doc_id, h, f FROM fp WHERE doc_id % 10 = 0
)
SELECT d.doc_id, d.lang, d.source
FROM batch b JOIN documents d USING (doc_id)
WHERE b.h NOT IN (SELECT h FROM store)
  AND b.f NOT IN (SELECT f FROM store)
ORDER BY d.doc_id
"""


def q_txn_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # OPTIMIZE ... ZORDER: cluster a transaction table on the
    # interleaved Z-curve of (x, y) and show data skipping prunes files
    # for a predicate on EITHER dimension — lexicographic range
    # clustering can only ever prune the leading column. The pruned_*
    # booleans are log-derived observables the oracle pins TRUE, and
    # the filtered aggregate is value-hash-checked against plain SQL
    # (skipping must stay an optimization, never a filter).
    import os
    import shutil

    from dbt_maxcompute_spark.txnlog import TxnTable

    grid = load_table(spark, sf_dir, "orders").select(
        F.expr("o_orderkey % 16").alias("x"),
        F.expr("(o_orderkey div 16) % 16").alias("y"),
        "o_totalprice",
    )
    path = os.path.join(_bucket_warehouse(sf_dir), "txn_zorder_orders")
    shutil.rmtree(path, ignore_errors=True)
    t = TxnTable(spark, path)
    t.create(grid.repartition(8))  # appended layout: every file spans both ranges
    t.optimize(cluster_by=["x", "y"], zorder=True, target_files=16, zorder_bits=4)

    n_files = len(t.snapshot().files)
    sx = len(t.files_scanned([("x", "=", 7)]))
    sy = len(t.files_scanned([("y", "=", 3)]))
    return (
        t.read(where=[("y", "=", 3)])
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .select(
            F.lit(sx < n_files).alias("pruned_x"),
            F.lit(sy < n_files).alias("pruned_y"),
            "n_rows",
            "total_price",
        )
    )


ORACLE_TXN_ZORDER = """
WITH g AS (
  SELECT o_orderkey % 16 AS x, (o_orderkey // 16) % 16 AS y, o_totalprice
  FROM orders
)
SELECT TRUE AS pruned_x, TRUE AS pruned_y,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
FROM g WHERE y = 3
"""


def q_txn_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Row-level DELETE via deletion vectors: the commit writes a
    # (file, pos) vector, NO data file is rewritten — files_unchanged /
    # n_add / n_remove are log-derived observables the oracle pins, the
    # post-delete aggregate is value-hash-checked against plain SQL,
    # and time travel to the pre-delete version still counts every row.
    import os
    import shutil

    from dbt_maxcompute_spark.txnlog import TxnTable

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    path = os.path.join(_bucket_warehouse(sf_dir), "txn_dv_orders")
    shutil.rmtree(path, ignore_errors=True)
    t = TxnTable(spark, path)
    t.create(orders.repartition(4))
    files_before = sorted(t.snapshot().files)
    v = t.delete_where_dv("o_totalprice > 300000")
    files_unchanged = sorted(t.snapshot().files) == files_before
    last = t.history()[-1]
    pre_delete_rows = t.read(version=v - 1).count()
    return (
        t.read()
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .select(
            F.lit(files_unchanged).alias("files_unchanged"),
            F.lit(last["n_add"]).cast("long").alias("n_add"),
            F.lit(last["n_remove"]).cast("long").alias("n_remove"),
            F.lit(pre_delete_rows).cast("long").alias("pre_delete_rows"),
            "n_rows",
            "total_price",
        )
    )


ORACLE_TXN_DV = """
SELECT TRUE AS files_unchanged,
       CAST(0 AS BIGINT) AS n_add,
       CAST(0 AS BIGINT) AS n_remove,
       (SELECT count(*) FROM orders) AS pre_delete_rows,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
FROM orders WHERE NOT coalesce(o_totalprice > 300000, FALSE)
"""


def q_txn_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Schema evolution through the log: a later append commits a WIDER
    # schema (added column); the committed schema governs reads, so
    # files written before the column backfill NULL — and time travel
    # to the pre-evolution version still serves the ORIGINAL schema.
    # The oracle predicts the blended aggregate (old rows NULL, new
    # rows valued) and both schema observables.
    import os
    import shutil

    from dbt_maxcompute_spark.txnlog import TxnTable

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    old = orders.filter(F.col("o_orderkey") % 2 == 0)
    new = orders.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "priority_score", (F.col("o_orderkey") % 7).cast("long")
    )
    path = os.path.join(_bucket_warehouse(sf_dir), "txn_schema_evo")
    shutil.rmtree(path, ignore_errors=True)
    t = TxnTable(spark, path)
    v0 = t.create(old)
    t.append(new)

    cur_cols = t.read().columns
    old_cols = t.read(version=v0).columns
    return (
        t.read()
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("priority_score").alias("n_scored"),
            F.sum("priority_score").alias("score_sum"),
        )
        .select(
            F.lit("priority_score" in cur_cols).alias("evolved"),
            F.lit("priority_score" not in old_cols).alias("time_travel_pre_schema"),
            "n_rows",
            "n_scored",
            "score_sum",
        )
    )


ORACLE_TXN_SCHEMA_EVO = """
SELECT TRUE AS evolved,
       TRUE AS time_travel_pre_schema,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS BIGINT) AS n_scored,
       CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN o_orderkey % 7 END) AS BIGINT)
         AS score_sum
FROM orders
"""


def q_skew_salted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit skew mitigation, end to end: lineitem joins a 3-row flag
    # dim through a SALTED join (the join key becomes (flag, salt), so
    # a hot flag spans 16 tasks instead of one), then aggregates by the
    # 3-value flag through a SALTED two-phase aggregation (partials per
    # (flag, salt), re-associated per flag — the merge shuffle is
    # |keys|*salt tiny rows, and no single reducer owns a flag's whole
    # data). Both transforms are exact, so the oracle is the plain
    # join + group-by with no salt anywhere in it.
    from dbt_maxcompute_spark.operators import skew

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(28,4)")
        .alias("rev"),
    )
    dim = local_frame(
        spark,
        [("A", "accepted"), ("N", "none"), ("R", "returned")],
        "l_returnflag string, flag_label string",
    )
    joined = skew.salted_join(li, dim, "l_returnflag", salt=16, salt_on="l_orderkey")
    out = skew.salted_aggregate(
        joined,
        ["l_returnflag", "flag_label"],
        [
            ("rev", "sum", "__rev"),
            ("rev", "count", "n_items"),
            ("rev", "min", "__min_rev"),
            ("rev", "max", "__max_rev"),
        ],
        salt=32,
        salt_on="l_orderkey",
    )
    return out.select(
        "l_returnflag",
        "flag_label",
        F.col("__rev").cast("double").alias("revenue"),
        "n_items",
        F.col("__min_rev").cast("double").alias("min_rev"),
        F.col("__max_rev").cast("double").alias("max_rev"),
    ).orderBy("l_returnflag")


ORACLE_SKEW_SALTED = """
WITH dim(l_returnflag, flag_label) AS (
  VALUES ('A', 'accepted'), ('N', 'none'), ('R', 'returned')
), li AS (
  SELECT l_returnflag,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)) AS rev
  FROM lineitem
)
SELECT li.l_returnflag, d.flag_label,
       CAST(sum(rev) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(min(rev) AS DOUBLE) AS min_rev,
       CAST(max(rev) AS DOUBLE) AS max_rev
FROM li JOIN dim d USING (l_returnflag)
GROUP BY 1, 2 ORDER BY 1
"""


def q_txn_dv_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # delete+insert expressed as deletion-vector + append in ONE
    # commit: every pre-existing data file survives (files_kept), the
    # commit removes nothing (n_remove = 0), and the visible state is
    # exactly "target rows whose key isn't in the source, plus the
    # source" — the SQL the oracle runs. Updated keys take the source
    # row; brand-new keys append; untouched rows never move on disk.
    import os
    import shutil

    from dbt_maxcompute_spark.txnlog import TxnTable

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    mk = orders.agg(F.max("o_orderkey")).collect()[0][0]  # metadata-sized
    path = os.path.join(_bucket_warehouse(sf_dir), "txn_dv_upsert")
    shutil.rmtree(path, ignore_errors=True)
    t = TxnTable(spark, path)
    t.create(orders.repartition(4))
    files_before = set(t.snapshot().files)

    updated = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", (F.col("o_totalprice") + 1000).alias("o_totalprice")
    )
    fresh = spark.range(1, 51).select(
        (F.lit(mk) + F.col("id")).alias("o_orderkey"),
        (F.col("id") * 10.0).alias("o_totalprice"),
    )
    t.delete_insert_dv(updated.unionByName(fresh), ["o_orderkey"])

    files_kept = files_before <= set(t.snapshot().files)
    last = t.history()[-1]
    return (
        t.read()
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .select(
            F.lit(files_kept).alias("files_kept"),
            F.lit(last["n_remove"]).cast("long").alias("n_remove"),
            "n_rows",
            "total_price",
        )
    )


ORACLE_TXN_DV_UPSERT = """
WITH t AS (
  SELECT o_orderkey, o_totalprice FROM orders
), mk AS (
  SELECT max(o_orderkey) AS m FROM orders
), src AS (
  SELECT o_orderkey, o_totalprice + 1000 AS o_totalprice
  FROM t WHERE o_orderkey % 100 = 0
  UNION ALL
  SELECT m + i, CAST(i * 10.0 AS DOUBLE) FROM mk, range(1, 51) r(i)
), merged AS (
  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
  UNION ALL
  SELECT * FROM src
)
SELECT TRUE AS files_kept,
       CAST(0 AS BIGINT) AS n_remove,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
FROM merged
"""


def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Runtime bloom filtering, made explicit: lineitem rows are
    # prefiltered by a bloom bitmap built from the high-value orders'
    # keys BEFORE the join, so at scale the probe shuffle moves ~6% of
    # the fact table instead of all of it. The bitmap is m/64 longs —
    # bounded by m, independent of build cardinality — and the
    # membership test is k pure-Catalyst bit probes inside the scan
    # stage. Exactness is structural: blooms have no false negatives,
    # and the real join drops any false positives, so the oracle is the
    # plain join with no bloom anywhere in it.
    from dbt_maxcompute_spark.operators import bloomjoin

    li = load_table(spark, sf_dir, "lineitem")
    hot = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 470000)
        .select("o_orderkey", "o_orderdate")
    )
    pre = bloomjoin.bloom_prefilter(li, hot, "l_orderkey", "o_orderkey", m_bits=1 << 20)
    joined = pre.join(F.broadcast(hot), pre["l_orderkey"] == hot["o_orderkey"])
    return (
        joined.groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        )
        .orderBy("order_month")
    )


ORACLE_BLOOM_JOIN = """
SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS order_month,
       count(*) AS n_items,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4)))
            AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 470000
GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "sample_domain_quota": q_sample_domain_quota,
    "corpus_zipf_profile": q_corpus_zipf_profile,
    "doc_length_histogram": q_doc_length_histogram,
    "train_next_event_examples": q_train_next_event_examples,
    "curation_filter_funnel": q_curation_filter_funnel,
    "bucketed_colocated_join": q_bucketed_colocated_join,
    "sample_quality_weighted": q_sample_quality_weighted,
    "dedup_incremental_batch": q_dedup_incremental_batch,
    "jsonl_roundtrip": q_jsonl_roundtrip,
    "webdataset_roundtrip": q_webdataset_roundtrip,
    "txn_time_travel": q_txn_time_travel,
    "catalog_ddl_audit": q_catalog_ddl_audit,
    "raw_script_passthrough": q_raw_script_passthrough,
    "ops_contract_probe": q_ops_contract_probe,
    "ops_compact_probe": q_ops_compact_probe,
    "txn_file_skipping": q_txn_file_skipping,
    "bloom_prefilter_join": q_bloom_prefilter_join,
    "txn_zorder_skipping": q_txn_zorder_skipping,
    "txn_deletion_vectors": q_txn_deletion_vectors,
    "txn_dv_upsert": q_txn_dv_upsert,
    "skew_salted_rollup": q_skew_salted_rollup,
    "txn_schema_evolution": q_txn_schema_evolution,
}

ORACLES: dict[str, str] = {
    "sample_domain_quota": ORACLE_DOMAIN_QUOTA,
    "corpus_zipf_profile": ORACLE_ZIPF,
    "doc_length_histogram": ORACLE_LENGTH_HIST,
    "train_next_event_examples": ORACLE_NEXT_EVENT,
    "curation_filter_funnel": ORACLE_FUNNEL2,
    "bucketed_colocated_join": ORACLE_BUCKETED_JOIN,
    "sample_quality_weighted": ORACLE_QUALITY_WEIGHTED,
    "dedup_incremental_batch": ORACLE_INCR_DEDUP,
    "jsonl_roundtrip": ORACLE_JSONL_ROUNDTRIP,
    "webdataset_roundtrip": ORACLE_WEBDATASET,
    "txn_time_travel": ORACLE_TXN,
    "catalog_ddl_audit": ORACLE_DDL_AUDIT,
    "raw_script_passthrough": ORACLE_RAW_SCRIPT,
    "ops_contract_probe": ORACLE_OPS_PROBE,
    "ops_compact_probe": ORACLE_COMPACT_PROBE,
    "txn_file_skipping": ORACLE_TXN_SKIP,
    "bloom_prefilter_join": ORACLE_BLOOM_JOIN,
    "txn_zorder_skipping": ORACLE_TXN_ZORDER,
    "txn_deletion_vectors": ORACLE_TXN_DV,
    "txn_dv_upsert": ORACLE_TXN_DV_UPSERT,
    "skew_salted_rollup": ORACLE_SKEW_SALTED,
    "txn_schema_evolution": ORACLE_TXN_SCHEMA_EVO,
}
