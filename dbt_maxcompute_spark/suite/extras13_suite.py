"""Round-13 suite: the production-vocab classifier measurement row
(round-12 verdict item 4 — the GetMapValue linear-scan cliff was found
by an ad-hoc 200k-entry measurement; this row pins the sharded-probe
path into the driver + bench so it cannot regress), and incremental
DSIR profile maintenance from a transaction-table change feed
(round-12 verdict item 8).

Oracle conventions as elsewhere: exact sums through DECIMAL(28,6) or
dyadic rationals, counts as BIGINT, explicit ORDER BY.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_maxcompute_spark.sources.registry import load_table

_CLF100K_BIAS = -0.03125
_CLF100K_VOCAB = 100_000


def _md5_weight(token: str) -> float:
    """Deterministic dyadic weight in {-8..8}/8 from md5 — computable
    identically in DuckDB (``('0x' || substr(md5(t),1,4))::INTEGER``),
    so the oracle re-derives every hit without enumerating the table."""
    return ((int(hashlib.md5(token.encode()).hexdigest()[:4], 16) % 17) - 8) / 8.0


def q_classifier_vocab_100k(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-13 (round-12 verdict item 4): score the documents table
    # against a PRODUCTION-SIZED vocabulary — 100k entries, the scale
    # where Catalyst's GetMapValue linear scan could not finish 5k docs
    # in 6 minutes. Round 12 fixed that with crc32-sharded sub-maps;
    # the r13 optimization round went further: above 512 entries
    # classifier_score routes to the vectorized Arrow scorer
    # (textanalysis._bow_mean_scorer — measured 10.4 s -> 0.6 s at
    # sf0.1, bit-identical logits). The table is the corpus vocabulary
    # (md5-derived dyadic weights) padded to 100k with keys containing
    # a space (unreachable by any whitespace token), so every probe
    # pays the full big-table cost while the oracle replays each hit
    # arithmetically. The row's own booleans pin that the table really
    # was >= 100k entries and the big-table routing threshold engaged
    # (`sharded`, kept under its original name for hash stability) — a
    # regression to the interpreted flat map would blow up this row's
    # bench time.
    from dbt_maxcompute_spark.operators import textanalysis as ta

    docs = load_table(spark, sf_dir, "documents")
    real = [
        r["t"]
        for r in docs.select(
            F.explode(ta.tokens(F.col("text"))).alias("t")
        )
        .distinct()
        .collect()
    ]
    vocab = {t: _md5_weight(t) for t in real}
    for i in range(max(0, _CLF100K_VOCAB - len(vocab))):
        vocab[f"pad {i}"] = _md5_weight(f"pad {i}")

    scored = ta.classifier_score(docs, "text", vocab, bias=_CLF100K_BIAS)
    return scored.select(
        "doc_id",
        "lang",
        ta.token_count(F.col("text")).alias("n_tokens"),
        F.round("clf_logit", 6).alias("clf_logit"),
        (F.col("clf_logit") > 0).alias("kept"),
        F.lit(len(vocab) >= _CLF100K_VOCAB).alias("vocab_100k"),
        F.lit(ta._shard_count(len(vocab)) > 1).alias("sharded"),
    ).orderBy("doc_id")


# hits = md5-derived dyadic weight of EVERY token (the table contains
# the whole corpus vocabulary by construction; the padding keys embed a
# space so no whitespace token can reach them). Dyadic eighths make the
# sum order-exact across engines; division + round(6) mirror the Spark
# side exactly.
ORACLE_CLASSIFIER_VOCAB_100K = """
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
  FROM documents
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         SUM(((CAST(('0x' || substr(md5(t), 1, 4)) AS INTEGER) % 17) - 8) / 8.0)
           AS hits
  FROM tok
  GROUP BY doc_id
)
SELECT d.doc_id, d.lang, a.n_tokens,
       ROUND(-0.03125 + a.hits / a.n_tokens, 6) AS clf_logit,
       (-0.03125 + a.hits / a.n_tokens) > 0 AS kept,
       TRUE AS vocab_100k,
       TRUE AS sharded
FROM documents d JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


_DSIR13_BUCKETS = 256


def q_dsir_incremental_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-13 (round-12 verdict item 8): DSIR's source profile
    # maintained INCREMENTALLY from a mutating transaction-table
    # corpus's change feed — batch 0 bootstraps (the feed from an
    # empty table is the snapshot itself, all inserts), batch 1
    # appends new docs (append fast path: feed reads ONLY the added
    # files), batch 2 row-level-deletes via a deletion vector (DV
    # reconstruction path) which must SUBTRACT counts. The final
    # incremental profile is compared bucket-for-bucket against a full
    # fit_profile recompute of the final corpus (`incr_matches_full`),
    # and the oracle independently replays the final-corpus bucket
    # counts arithmetically (md5-prefix bucketing, uni+bi grams).
    import tempfile

    from dbt_maxcompute_spark.operators import dsir
    from dbt_maxcompute_spark.txnlog import TxnTable

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="dsir_inc_")
    corpus = TxnTable(spark, root + "/corpus")
    store = TxnTable(spark, root + "/profile")

    v0 = corpus.create(docs.filter(F.col("doc_id") % 3 == 0))
    boot = corpus.read(version=v0).withColumn(
        "_change_type", F.lit("insert")
    )
    dsir.update_profile_incremental(
        store, boot, "text", _DSIR13_BUCKETS, batch_id=v0
    )

    v1 = corpus.append(docs.filter(F.col("doc_id") % 3 == 1))
    dsir.update_profile_incremental(
        store, corpus.change_feed(v0, v1), "text", _DSIR13_BUCKETS, batch_id=v1
    )

    v2 = corpus.delete_where_dv("doc_id % 5 = 0")
    dsir.update_profile_incremental(
        store, corpus.change_feed(v1, v2), "text", _DSIR13_BUCKETS, batch_id=v2
    )
    # replaying the last sync must be a no-op (exactly-once ledger)
    dsir.update_profile_incremental(
        store, corpus.change_feed(v1, v2), "text", _DSIR13_BUCKETS, batch_id=v2
    )

    incr = dsir.read_profile(store)
    full = dsir.fit_profile(corpus.read(), "text", _DSIR13_BUCKETS)
    n_diff = (
        incr.join(full.withColumnRenamed("cnt", "full_cnt"), "bucket", "full_outer")
        .filter(
            F.coalesce(F.col("cnt"), F.lit(-1))
            != F.coalesce(F.col("full_cnt"), F.lit(-2))
        )
        .count()
    )
    return (
        incr.withColumn("incr_matches_full", F.lit(n_diff == 0))
        .orderBy("bucket")
    )


ORACLE_DSIR_INCREMENTAL_PROFILE = f"""
WITH base AS (
  SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
  FROM documents
  WHERE doc_id % 3 IN (0, 1) AND doc_id % 5 <> 0
),
uni AS (
  SELECT unnest(arr) AS f FROM base
),
pos AS (
  SELECT arr, unnest(range(1, len(arr))) AS i
  FROM base WHERE len(arr) >= 2
),
bi AS (
  SELECT arr[i] || ' ' || arr[i + 1] AS f FROM pos
),
feat AS (
  SELECT CAST(CAST(('0x' || substring(md5(f), 1, 8)) AS UBIGINT)
              % {_DSIR13_BUCKETS} AS BIGINT) AS bucket
  FROM (SELECT f FROM uni UNION ALL SELECT f FROM bi)
)
SELECT bucket, CAST(count(*) AS BIGINT) AS cnt, TRUE AS incr_matches_full
FROM feat
GROUP BY bucket
ORDER BY bucket
"""


QUERIES = {
    "classifier_vocab_100k": q_classifier_vocab_100k,
    "dsir_incremental_profile": q_dsir_incremental_profile,
}

ORACLES = {
    "classifier_vocab_100k": ORACLE_CLASSIFIER_VOCAB_100K,
    "dsir_incremental_profile": ORACLE_DSIR_INCREMENTAL_PROFILE,
}
