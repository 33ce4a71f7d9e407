"""Round-12 suite: KenLM-style n-gram LM perplexity filtering (the
CCNet / Gopher / RefinedWeb quality gate, round-11 verdict item 4)
and chunk-level exact substring dedup (Lee et al. 2022, verdict
item 5).

Oracle conventions as elsewhere: dyadic log-probs so both engines'
sums are bit-exact, counts as BIGINT, explicit ORDER BY, transcendental
columns (perplexity) excluded from the compared output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_maxcompute_spark.sources.registry import load_table

# The n-gram table the LM row scores with: dyadic log-probs (multiples
# of 1/8) over the fixture corpus vocabulary, unigrams + bigrams, so
# the stupid-backoff chain exercises every level (bigram hit, backoff
# to unigram hit, backoff to OOV) on real rows.
_LM_TABLE: dict[str, float] = {
    # unigrams
    "the": -1.0, "a": -1.25, "data": -1.5, "table": -1.5, "row": -1.75,
    "join": -1.5, "scan": -1.75, "merge": -1.75, "filter": -2.0,
    "group": -2.0, "order": -1.75, "query": -2.0, "spark": -2.25,
    "window": -2.25, "stream": -2.5, "batch": -2.0, "hash": -2.5,
    "key": -2.25, "line": -2.5, "value": -2.5,
    # bigrams
    "the table": -0.5, "the data": -0.625, "a row": -0.75,
    "join order": -0.875, "table scan": -0.5, "hash join": -0.625,
    "order by": -0.375, "group by": -0.375, "merge join": -0.75,
    "data line": -1.0, "batch batch": -0.25, "scan merge": -0.875,
}
_LM_BACKOFF = -0.5
_LM_OOV = -8.0
_LM_KEEP_ABOVE = -5.0


def q_lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-12 extension (round-11 verdict item 4): KenLM-style n-gram
    # LM scoring with stupid backoff (Brants et al. 2007) — the
    # perplexity filter CCNet (Wenzek et al. 2019) and Gopher gate web
    # text on. The n-gram table is the model (real tables run 1e6-1e8
    # entries) so it rides as ONE broadcast single-row map column,
    # never a create_map plan literal; scoring is one Catalyst
    # transform+aggregate fold per row — no shuffle, no Python. The
    # oracle replays the backoff chain per token via an unnest-zip +
    # table-VALUES join; dyadic log-probs make both engines' sums
    # bit-exact, so the compare rides the mean log-prob (perplexity =
    # exp(-mean) is transcendental and stays out of the row).
    from dbt_maxcompute_spark.operators import textanalysis as ta

    from dbt_maxcompute_spark.operators.dedup import spread

    docs = spread(
        load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 3 == 1
        )
    )
    scored = ta.lm_perplexity(
        docs,
        "text",
        _LM_TABLE,
        order=2,
        backoff_logprob=_LM_BACKOFF,
        oov_logprob=_LM_OOV,
    )
    return scored.select(
        "doc_id",
        "lang",
        ta.token_count(F.col("text")).alias("n_tokens"),
        F.round("lm_mean_logprob", 6).alias("lm_mean_logprob"),
        (F.col("lm_mean_logprob") > _LM_KEEP_ABOVE).alias("kept"),
    ).orderBy("doc_id")


def _lm_values_sql() -> str:
    rows = ", ".join(
        f"('{k}', {v!r})" for k, v in sorted(_LM_TABLE.items())
    )
    return f"w(k, lp) AS (VALUES {rows})"


ORACLE_LM_PERPLEXITY_FILTER = f"""
WITH {_lm_values_sql()},
base AS (
  SELECT doc_id, lang,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
  FROM documents WHERE doc_id % 3 = 1
),
tok AS (
  SELECT doc_id, arr,
         unnest(arr) AS u,
         unnest(range(1, len(arr) + 1)) AS i
  FROM base
),
tok2 AS (
  SELECT doc_id, i, u,
         CASE WHEN i > 1 THEN arr[i - 1] || ' ' || u END AS b
  FROM tok
),
lp AS (
  SELECT t.doc_id,
         CASE WHEN t.i = 1 THEN COALESCE(uw.lp, {_LM_OOV})
              ELSE COALESCE(bw.lp,
                            COALESCE(uw.lp, {_LM_OOV}) + {_LM_BACKOFF})
         END AS x
  FROM tok2 t
  LEFT JOIN w uw ON uw.k = t.u
  LEFT JOIN w bw ON bw.k = t.b
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n, SUM(x) AS s
  FROM lp GROUP BY doc_id
)
SELECT b.doc_id, b.lang, a.n AS n_tokens,
       ROUND(a.s / a.n, 6) AS lm_mean_logprob,
       (a.s / a.n) > {_LM_KEEP_ABOVE} AS kept
FROM base b JOIN agg a USING (doc_id)
ORDER BY b.doc_id
"""


def q_dedup_substring_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-12 extension (round-11 verdict item 5): chunk-level exact
    # substring dedup — the distributable approximation of Lee et al.
    # 2022's suffix-array span dedup. Non-overlapping 4-token chunks
    # (4, not the production 50, so the fixture corpus actually HAS
    # cross-doc repeats — ~10% of chunks at every SF); any chunk text
    # recurring in >=2 distinct docs is dropped from all of them, and
    # survivors reassemble in order. The reassembled text is pinned by
    # md5 + length (strict full-content check without hauling the
    # strings through the compare); chunk spans shuffle as md5 digests,
    # never 50-token strings.
    from dbt_maxcompute_spark.operators.dedup import (
        dedup_substring_chunks,
        spread,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    out = dedup_substring_chunks(
        docs, "doc_id", "text", chunk_tokens=4, min_docs=2
    )
    return out.select(
        "doc_id",
        "n_chunks",
        "n_dup_chunks",
        F.md5("clean_text").alias("clean_md5"),
        F.length("clean_text").cast("long").alias("clean_len"),
    ).orderBy("doc_id")


ORACLE_DEDUP_SUBSTRING_CHUNKS = """
WITH base AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
  FROM documents
),
idx AS (
  SELECT doc_id, arr,
         unnest(range(1, CAST(ceil(len(arr) / 4.0) AS BIGINT) + 1)) AS c
  FROM base
),
ch AS (
  SELECT doc_id, c,
         array_to_string(arr[(c - 1) * 4 + 1 : least(c * 4, len(arr))],
                         ' ') AS chunk
  FROM idx
),
rep AS (
  SELECT chunk FROM ch GROUP BY chunk
  HAVING count(DISTINCT doc_id) >= 2
),
perdoc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(SUM(CASE WHEN r.chunk IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_dup_chunks,
         COALESCE(string_agg(CASE WHEN r.chunk IS NULL THEN ch.chunk END,
                             ' ' ORDER BY ch.c), '') AS clean_text
  FROM ch LEFT JOIN rep r USING (chunk)
  GROUP BY doc_id
)
SELECT doc_id, n_chunks, n_dup_chunks,
       md5(clean_text) AS clean_md5,
       CAST(length(clean_text) AS BIGINT) AS clean_len
FROM perdoc
ORDER BY doc_id
"""


def q_lm_train_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-12 extension: the TRAINING half of the LM pipeline —
    # count-based MLE bigram table over the corpus (the relative
    # frequencies KenLM starts from), the table lm_perplexity then
    # scores with. prob = cnt/ctx_cnt is one IEEE division of two
    # exact integers, so the oracle compare needs no rounding. Counts
    # shuffle as aggregated (context, word) pairs; ctx_cnt is a window
    # sum over the aggregated counts (partition width = the context's
    # continuation vocab, bounded by |vocab|, never corpus size).
    from dbt_maxcompute_spark.operators import textanalysis as ta

    from dbt_maxcompute_spark.operators.dedup import spread

    # spread(): the fixture arrives as one file split and would pin
    # the explode+count on one core; no-op at scale
    docs = spread(load_table(spark, sf_dir, "documents"))
    out = ta.ngram_counts(docs, "text", order=2, min_count=5)
    return out.select(
        "context", "word", "cnt", "ctx_cnt", "prob"
    ).orderBy("context", "word")


ORACLE_LM_TRAIN_NGRAM_COUNTS = """
WITH base AS (
  SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
  FROM documents
),
pos AS (
  SELECT arr, unnest(range(1, len(arr))) AS i
  FROM base WHERE len(arr) >= 2
),
ng AS (
  SELECT arr[i] AS context, arr[i + 1] AS word FROM pos
),
cnt AS (
  SELECT context, word, CAST(count(*) AS BIGINT) AS cnt
  FROM ng GROUP BY context, word
),
ctx AS (
  SELECT context, word, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY context) AS BIGINT) AS ctx_cnt
  FROM cnt
)
SELECT context, word, cnt, ctx_cnt,
       CAST(cnt AS DOUBLE) / CAST(ctx_cnt AS DOUBLE) AS prob
FROM ctx
WHERE cnt >= 5
ORDER BY context, word
"""


# --- DSIR (Xie et al. 2023) -------------------------------------------------

_DSIR_BUCKETS = 512


def _dsir_bucket(f: str) -> int:
    import hashlib

    return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % _DSIR_BUCKETS


# Dyadic per-bucket log-ratio table for the selection row, derived at
# import from token-level weights (bucket collisions resolved
# deterministically: later sorted token wins — the ORACLE is generated
# from the final bucket->weight dict, so both engines see one table).
_DSIR_TOKEN_WEIGHTS = {
    "spark": 0.5, "query": 0.5, "join": 0.375, "scan": 0.375,
    "table": 0.25, "data": 0.25, "hash": 0.375, "merge": 0.25,
    "window": 0.375, "stream": 0.25, "batch": 0.25, "filter": 0.375,
    "customer": -0.5, "line": -0.375, "value": -0.25, "slow": -0.5,
    "small": -0.25, "big": -0.25, "the": -0.125, "a": -0.125,
}
_DSIR_TABLE = {
    _dsir_bucket(t): w for t, w in sorted(_DSIR_TOKEN_WEIGHTS.items())
}
_DSIR_K = 25


def q_dsir_profile_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-12 extension: the FIT half of DSIR (Xie et al. 2023,
    # "Data Selection for Language Models via Importance Resampling")
    # — hashed-n-gram (unigram+bigram) bucket counts for a TARGET
    # slice (lang='en' docs) and the full SOURCE corpus, the two
    # multinomials the importance weights derive from. The md5-prefix
    # bucket device is SQL-reproducible, so the oracle replays the
    # exact featurization; counts are exact integers. Shuffle is
    # bounded at `buckets` partial counts per task.
    from dbt_maxcompute_spark.operators import dsir

    from dbt_maxcompute_spark.operators.dedup import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    tgt = dsir.fit_profile(
        docs.filter(F.col("lang") == "en"), "text", _DSIR_BUCKETS
    )
    src = dsir.fit_profile(docs, "text", _DSIR_BUCKETS)
    return (
        src.withColumnRenamed("cnt", "source_cnt")
        .join(tgt.withColumnRenamed("cnt", "target_cnt"), "bucket", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.coalesce("target_cnt", F.lit(0)).cast("long").alias("target_cnt"),
            F.col("source_cnt").cast("long").alias("source_cnt"),
        )
        .orderBy("bucket")
    )


ORACLE_DSIR_PROFILE_COUNTS = f"""
WITH base AS (
  SELECT lang,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
  FROM documents
),
uni AS (
  SELECT lang, unnest(arr) AS f FROM base
),
pos AS (
  SELECT lang, arr, unnest(range(1, len(arr))) AS i
  FROM base WHERE len(arr) >= 2
),
bi AS (
  SELECT lang, arr[i] || ' ' || arr[i + 1] AS f FROM pos
),
feat AS (
  SELECT lang,
         CAST(CAST(('0x' || substring(md5(f), 1, 8)) AS UBIGINT)
              % {_DSIR_BUCKETS} AS BIGINT) AS bucket
  FROM (SELECT lang, f FROM uni UNION ALL SELECT lang, f FROM bi)
)
SELECT bucket,
       CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS target_cnt,
       CAST(count(*) AS BIGINT) AS source_cnt
FROM feat
GROUP BY bucket
ORDER BY bucket
"""


def q_dsir_topk_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-12 extension: the SELECT half of DSIR — score every source
    # doc as the sum of per-bucket dyadic log-ratios (the table rides
    # as ONE broadcast map column, one Catalyst fold per row, no
    # shuffle) and keep the deterministic top-k (ties on doc_id; the
    # Gumbel-seeded variant is pytest-pinned, the driver row stays
    # noise-free so the oracle is exact). Scores are dyadic sums —
    # bit-exact cross-engine, no rounding. Top-k compiles to
    # TakeOrderedAndProject, never a global window.
    from dbt_maxcompute_spark.operators import dsir

    from dbt_maxcompute_spark.operators.dedup import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    scored = dsir.importance_score(
        docs, "text", _DSIR_TABLE, _DSIR_BUCKETS, orders=(1, 2)
    )
    top = dsir.select_top_k(scored, "doc_id", _DSIR_K)
    return top.select("doc_id", "lang", "dsir_logw").orderBy(
        F.desc("dsir_logw"), "doc_id"
    )


def _dsir_values_sql() -> str:
    rows = ", ".join(
        f"({b}, {w!r})" for b, w in sorted(_DSIR_TABLE.items())
    )
    return f"w(bucket, wt) AS (VALUES {rows})"


ORACLE_DSIR_TOPK_SELECTION = f"""
WITH {_dsir_values_sql()},
base AS (
  SELECT doc_id, lang,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
  FROM documents
),
uni AS (
  SELECT doc_id, unnest(arr) AS f FROM base
),
pos AS (
  SELECT doc_id, arr, unnest(range(1, len(arr))) AS i
  FROM base WHERE len(arr) >= 2
),
bi AS (
  SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS f FROM pos
),
feat AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substring(md5(f), 1, 8)) AS UBIGINT)
              % {_DSIR_BUCKETS} AS BIGINT) AS bucket
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
),
score AS (
  SELECT f.doc_id,
         CAST(COALESCE(SUM(w.wt), 0.0) AS DOUBLE) AS dsir_logw
  FROM feat f LEFT JOIN w USING (bucket)
  GROUP BY f.doc_id
)
SELECT b.doc_id, b.lang, s.dsir_logw
FROM base b JOIN score s USING (doc_id)
ORDER BY s.dsir_logw DESC, b.doc_id
LIMIT {_DSIR_K}
"""


QUERIES = {
    "lm_perplexity_filter": q_lm_perplexity_filter,
    "dedup_substring_chunks": q_dedup_substring_chunks,
    "lm_train_ngram_counts": q_lm_train_ngram_counts,
    "dsir_profile_counts": q_dsir_profile_counts,
    "dsir_topk_selection": q_dsir_topk_selection,
}

ORACLES = {
    "lm_perplexity_filter": ORACLE_LM_PERPLEXITY_FILTER,
    "dedup_substring_chunks": ORACLE_DEDUP_SUBSTRING_CHUNKS,
    "lm_train_ngram_counts": ORACLE_LM_TRAIN_NGRAM_COUNTS,
    "dsir_profile_counts": ORACLE_DSIR_PROFILE_COUNTS,
    "dsir_topk_selection": ORACLE_DSIR_TOPK_SELECTION,
}
