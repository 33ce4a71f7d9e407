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

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 1
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
    from dbt_maxcompute_spark.operators.dedup import dedup_substring_chunks

    docs = load_table(spark, sf_dir, "documents")
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

    docs = load_table(spark, sf_dir, "documents")
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


QUERIES = {
    "lm_perplexity_filter": q_lm_perplexity_filter,
    "dedup_substring_chunks": q_dedup_substring_chunks,
    "lm_train_ngram_counts": q_lm_train_ngram_counts,
}

ORACLES = {
    "lm_perplexity_filter": ORACLE_LM_PERPLEXITY_FILTER,
    "dedup_substring_chunks": ORACLE_DEDUP_SUBSTRING_CHUNKS,
    "lm_train_ngram_counts": ORACLE_LM_TRAIN_NGRAM_COUNTS,
}
