"""Round-11 suite: byte-aware OPTIMIZE bin-packing (Delta's actual
packing unit, round-10 verdict "What's wrong" #3), unit-test
WITH-prologue robustness (models opening with comments / RECURSIVE,
round-10 advisory sweep item), and the fastText-style linear quality
classifier (broadcast weight-table scoring, the learned counterpart
of the heuristic quality_score).

Oracle conventions as elsewhere: exact sums through DECIMAL(28,6)
cast to DOUBLE at the edge, counts as BIGINT, explicit ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_maxcompute_spark.sources.registry import load_table


def q_txn_optimize_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-11 (round-10 verdict item 4): OPTIMIZE with
    # ``target_bytes`` routes candidacy on ON-DISK BYTES. The fixture
    # is the skewed-row-width case row counts get wrong: a wide-row
    # file (few documents, KB-scale texts) next to byte-tiny appends
    # (many short rows). Byte-based candidacy keeps the byte-huge
    # file byte-identical (name/size/mtime — metadata checks, no data
    # reads) even though it is row-SMALL, and packs only the tiny
    # files; content is oracle-checked against the union.
    import os
    import tempfile

    from dbt_maxcompute_spark.txnlog import TxnTable

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    t = TxnTable(spark, tempfile.mkdtemp(prefix="optbytes_") + "/t")
    # wide-row file: 3/4 of the documents with their full text —
    # structurally byte-huge vs the truncated appends at ANY fixture SF
    # (round-11 advisory: the old 1/4 slice left too little headroom at
    # small SFs, risking k >= len(candidates) and a silent no-op)
    t.create(docs.filter(F.col("doc_id") % 4 != 1).coalesce(1))
    # byte-tiny appends: the %4==1 slice with the text TRUNCATED to one
    # char — many rows, almost no bytes, split into 5 files
    # persisted once so the five append commits don't re-scan the
    # documents table five times (fixture setup, not the byte-candidacy
    # under test)
    seed = (
        docs.filter(F.col("doc_id") % 4 == 1)
        .withColumn("text", F.substring("text", 1, 1))
        .persist()
    )
    for b in range(5):
        t.append(seed.filter(F.col("doc_id") % 5 == b).coalesce(1))
    seed.unpersist()
    snap0 = t.snapshot()
    wide = max(snap0.files, key=lambda f: snap0.stats[f]["sizeBytes"])
    meta0 = (
        os.path.getsize(os.path.join(t.path, wide)),
        os.path.getmtime(os.path.join(t.path, wide)),
    )
    # Derive the smallest target that (a) admits every tiny file as a
    # candidate and (b) guarantees k = ceil(cand_bytes/target) <
    # len(tiny), so the pack provably shrinks the file count; then
    # ASSERT it stays below the wide file so the wide file provably
    # stays out. A fixture scale that broke the invariant now fails
    # loudly here instead of silently flipping the oracle booleans.
    tiny = [f for f in snap0.files if f != wide]
    tiny_sizes = [snap0.stats[f]["sizeBytes"] for f in tiny]
    target = max(max(tiny_sizes) + 1, -(-sum(tiny_sizes) // (len(tiny) - 1)))
    wide_bytes = snap0.stats[wide]["sizeBytes"]
    if target > wide_bytes:
        raise AssertionError(
            f"optimize_bytes fixture invariant broke: derived target "
            f"{target} exceeds wide file {wide_bytes} bytes"
        )
    v = t.optimize(target_bytes=target)

    after = t.snapshot()
    wide_untouched = (
        wide in after.files
        and after.stats.get(wide) == snap0.stats.get(wide)
        and (
            os.path.getsize(os.path.join(t.path, wide)),
            os.path.getmtime(os.path.join(t.path, wide)),
        )
        == meta0
    )
    tiny_packed = len(after.files) < len(snap0.files)
    single_commit = v == snap0.version + 1

    return (
        t.read()
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("text").cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_len"),
        )
        .withColumn("wide_file_untouched", F.lit(bool(wide_untouched)))
        .withColumn("tiny_files_packed", F.lit(bool(tiny_packed)))
        .withColumn("single_commit", F.lit(bool(single_commit)))
        .orderBy("lang")
    )


ORACLE_TXN_OPTIMIZE_BYTES = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(length(text) AS DECIMAL(28,6))) AS DOUBLE) AS sum_len,
       TRUE AS wide_file_untouched,
       TRUE AS tiny_files_packed,
       TRUE AS single_commit
FROM (
  SELECT lang, text FROM documents WHERE doc_id % 4 <> 1
  UNION ALL
  SELECT lang, substring(text, 1, 1) AS text FROM documents
  WHERE doc_id % 4 = 1
)
GROUP BY lang
ORDER BY lang
"""


def q_model_unit_test_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-11 advisory fix: the unit-test fixture prologue must splice
    # past a model's leading comments (a `--` header before its own
    # WITH previously produced invalid SQL) and keep RECURSIVE
    # immediately after WITH. Both shapes run against fixtures that
    # shadow a real catalog table, and the row returns a real aggregate
    # over orders alongside the pass/fail invariants.
    import tempfile

    from dbt_maxcompute_spark.catalog import EngineCatalog
    from dbt_maxcompute_spark.runner import run_unit_test

    cat = EngineCatalog(spark, tempfile.mkdtemp(prefix="utcte_wh_"))
    # persisted: the slice feeds the decoy table write AND the returned
    # aggregate — one orders scan instead of two (guide §5.1); tiny
    # (orders/23) and scoped to this invocation.
    src = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 23 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .persist()
    )
    # decoy catalog table: the fixture must shadow it
    cat.create_table(
        "uord", src.withColumn("o_totalprice", F.lit(0.0))
    )

    commented = (
        "-- per-status totals\n"
        "/* header block */\n"
        "WITH t AS (SELECT o_orderstatus, o_totalprice FROM uord)\n"
        "SELECT o_orderstatus AS status, count(*) AS n,\n"
        "       sum(o_totalprice) AS total\n"
        "FROM t GROUP BY o_orderstatus"
    )
    fixture = [
        {"o_orderkey": 1, "o_orderstatus": "F", "o_totalprice": 10.0},
        {"o_orderkey": 2, "o_orderstatus": "F", "o_totalprice": 5.0},
        {"o_orderkey": 3, "o_orderstatus": "O", "o_totalprice": 2.5},
    ]
    ok_comment = run_unit_test(
        cat,
        "ut_commented",
        commented,
        given={"uord": fixture},
        expect=[
            {"status": "F", "n": 2, "total": 15.0},
            {"status": "O", "n": 1, "total": 2.5},
        ],
    )

    # The fixture reference lives in the ANCHOR's scalar subquery and the
    # bound rides the recursion as a column: Spark's UnionLoop re-plans and
    # re-executes a scalar subquery in the loop CONDITION on every
    # iteration (measured ~0.9 s/iteration vs a literal bound's ~85 ms —
    # guide §5.1 evaluate-invariants-once), while an anchor subquery runs
    # exactly once. Same rows (n=1..3), same n_rows=3, and the fixture
    # still must shadow the decoy INSIDE the recursive CTE for the test
    # to pass.
    recursive = (
        "-- row-per-unit expansion\n"
        "WITH RECURSIVE seq AS ("
        "  SELECT 1 AS n, (SELECT count(*) FROM uord) AS k"
        "  UNION ALL SELECT n + 1, k FROM seq"
        "  WHERE n < k"
        ") SELECT count(*) AS n_rows FROM seq"
    )
    ok_recursive = run_unit_test(
        cat,
        "ut_recursive",
        recursive,
        given={"uord": fixture},
        expect=[{"n_rows": 3}],
    )

    return (
        src.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("total"),
        )
        .withColumn(
            "comment_merge_ok", F.lit(ok_comment["status"] == "pass")
        )
        .withColumn(
            "recursive_merge_ok", F.lit(ok_recursive["status"] == "pass")
        )
        .orderBy("o_orderstatus")
    )


ORACLE_MODEL_UNIT_TEST_CTE = """
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total,
       TRUE AS comment_merge_ok, TRUE AS recursive_merge_ok
FROM orders WHERE o_orderkey % 23 = 0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# Dyadic-rational weights (multiples of 1/8): every token contribution
# and every partial sum is exactly representable in binary doubles, so
# the fold is ORDER-EXACT — Spark's left-to-right aggregate and
# DuckDB's unordered SUM produce bit-identical logits, and the oracle
# can hash them. The vocabulary shape mirrors a real quality filter:
# common-word mass up, spam markers down.
_CLF_WEIGHTS = {
    "the": 0.5, "and": 0.5, "of": 0.375, "to": 0.25, "a": 0.25,
    "in": 0.25, "is": 0.25, "that": 0.375, "it": 0.25, "for": 0.25,
    "le": 0.375, "la": 0.375, "el": 0.375, "der": 0.375, "die": 0.375,
    "und": 0.375, "que": 0.375, "de": 0.25, "un": 0.25, "und.": 0.125,
    "click": -1.5, "free": -1.25, "buy": -2.0, "www": -1.75,
    "http": -2.0, "subscribe": -1.5, "winner": -1.75, "$$$": -2.0,
}
_CLF_BIAS = -0.03125


def q_text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-11 extension: fastText-style LINEAR quality classifier
    # (Joulin et al. 2016) — the learned counterpart of the heuristic
    # quality_score, and the shape production quality/toxicity filters
    # ship as. The weight table (the model) rides as ONE broadcast map
    # column, never a create_map plan literal (production vocabs run
    # 1e5-1e6 entries — the same literal-vs-broadcast cliff as the IVF
    # centroid matrices); scoring is one Catalyst fold per row. The
    # oracle re-derives the logit with an unnest + weights-VALUES join;
    # dyadic weights make both engines' sums exact (see _CLF_WEIGHTS).
    from dbt_maxcompute_spark.operators import textanalysis as ta

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 0
    )
    scored = ta.classifier_score(docs, "text", _CLF_WEIGHTS, bias=_CLF_BIAS)
    return scored.select(
        "doc_id",
        "lang",
        ta.token_count(F.col("text")).alias("n_tokens"),
        F.round("clf_logit", 6).alias("clf_logit"),
        (F.col("clf_logit") > 0).alias("kept"),
    ).orderBy("doc_id")


ORACLE_TEXT_QUALITY_CLASSIFIER = """
WITH w(t, wt) AS (VALUES
  ('the', 0.5), ('and', 0.5), ('of', 0.375), ('to', 0.25), ('a', 0.25),
  ('in', 0.25), ('is', 0.25), ('that', 0.375), ('it', 0.25), ('for', 0.25),
  ('le', 0.375), ('la', 0.375), ('el', 0.375), ('der', 0.375), ('die', 0.375),
  ('und', 0.375), ('que', 0.375), ('de', 0.25), ('un', 0.25), ('und.', 0.125),
  ('click', -1.5), ('free', -1.25), ('buy', -2.0), ('www', -1.75),
  ('http', -2.0), ('subscribe', -1.5), ('winner', -1.75), ('$$$', -2.0)
),
tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
  FROM documents WHERE doc_id % 3 = 0
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         COALESCE(SUM(wt), 0.0) AS hits
  FROM tok LEFT JOIN w USING (t)
  GROUP BY doc_id
)
SELECT d.doc_id, d.lang, a.n_tokens,
       ROUND(-0.03125 + a.hits / a.n_tokens, 6) AS clf_logit,
       (-0.03125 + a.hits / a.n_tokens) > 0 AS kept
FROM documents d JOIN agg a USING (doc_id)
WHERE d.doc_id % 3 = 0
ORDER BY d.doc_id
"""


QUERIES = {
    "txn_optimize_bytes": q_txn_optimize_bytes,
    "model_unit_test_cte": q_model_unit_test_cte,
    "text_quality_classifier": q_text_quality_classifier,
}

ORACLES = {
    "txn_optimize_bytes": ORACLE_TXN_OPTIMIZE_BYTES,
    "model_unit_test_cte": ORACLE_MODEL_UNIT_TEST_CTE,
    "text_quality_classifier": ORACLE_TEXT_QUALITY_CLASSIFIER,
}
