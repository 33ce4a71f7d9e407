"""TF-IDF term relevance over a document corpus.

No counterpart in the reference (extension per BASELINE.json). Corpus
curation uses TF-IDF for keyword extraction, near-topic filtering, and
quality heuristics; the operator shape (term stats via two
map-side-combinable aggregations + a broadcast of the term table's
small summary, then a per-doc top-k window) is the standard
at-scale formulation:

- tokenize + explode once; both the per-doc term frequencies and the
  document frequencies aggregate from that single pass (Spark reuses
  the exchange where possible, and both aggs are partial/map-side);
- N (corpus size) joins in as a broadcast 1-row frame — no driver
  round-trip, the plan stays lazy;
- idf uses the LOG-FREE inverse-frequency ratio (N+1)/(df+1): within
  a fixed corpus log() is a monotone transform, so per-doc term
  RANKINGS are identical, and products/quotients of integer-valued
  doubles are correctly-rounded IEEE — bit-identical across engines,
  which log() (libm-dependent) is not. Swap in log1p for
  cross-corpus-comparable magnitudes;
- top-k per doc = row_number window partitioned by doc — one shuffle
  on doc_id, bounded output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators.textanalysis import tokens


def term_frequencies(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) — one row per distinct term per doc."""
    return (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def corpus_term_profile(
    docs: DataFrame, id_col: str, text_col: str, k: int = 20
) -> DataFrame:
    """Corpus-level Zipf profile: the top-k terms by total occurrence
    count, with rank and cumulative share of ALL token occurrences.

    Shape at 100 TB: explode + groupBy(term) is map-side combinable
    (the shuffle carries one row per distinct term per map task, not
    one per token); the global total aggregates from the term counts
    (never re-scans the corpus) and broadcasts as a 1-row frame; top-k
    is TakeOrderedAndProject (bounded, no full sort); the running-sum
    window then runs on k rows — a single partition by construction,
    and deliberately so (k is tiny).

    Determinism: count ties rank by term string; cumulative share
    divides exact BIGINT sums, rounded to 6 places.
    """
    tf = term_frequencies(docs, id_col, text_col)
    counts = tf.groupBy("term").agg(F.sum("tf").alias("n"))
    total = counts.agg(F.sum("n").alias("total_tokens"))
    top = counts.orderBy(F.desc("n"), F.asc("term")).limit(k)
    w = Window.orderBy(F.desc("n"), F.asc("term")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        top.join(F.broadcast(total))
        .withColumn("rank", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("term"))))
        .withColumn(
            "cum_share",
            F.round(F.sum("n").over(w) / F.col("total_tokens"), 6),
        )
        .select("rank", "term", "n", "cum_share")
    )


def tf_idf_top_terms(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k most TF-IDF-relevant terms per document. Deterministic:
    score is rounded to 6 places BEFORE ranking and ties break on the
    term string, so any engine computing the same formula ranks
    identically."""
    tf = term_frequencies(docs, id_col, text_col)
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_counts, "term")
        .join(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )
