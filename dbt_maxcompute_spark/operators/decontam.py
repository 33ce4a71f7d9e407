"""Benchmark decontamination: flag training documents sharing word
n-grams with an evaluation set.

No counterpart in the reference (extension per BASELINE.json). Before
training, corpora are scrubbed of documents that textually overlap the
evaluation benchmarks (the GPT-3 / PaLM "13-gram overlap" recipe):
any training doc sharing at least one word n-gram with any eval doc is
flagged (or dropped).

Scale shape:

- n-grams are generated per row with pure Catalyst lambdas (transform
  over a sequence of start offsets + slice/array_join) — no explode
  until after hashing, no Python;
- each gram is reduced to a 64-bit xxhash64 BEFORE the join, so the
  shuffle carries (doc_id, gram_hash) longs — never the gram strings.
  A hash collision can only over-flag (false positive) at ~2^-64 per
  pair, the right trade for a contamination filter;
- the eval side is the small side by construction (benchmarks are MBs,
  corpora are TBs): distinct eval-gram hashes broadcast into the
  probe, so the corpus scan never shuffles at all. If the eval side
  ever outgrows broadcast, the same plan degrades gracefully to a
  shuffled semi-join on the hash;
- the probe is a semi-join + count per doc — map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators.textanalysis import tokens, with_tokens


def _starts(toks: Column, n: int) -> Column:
    return F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))


def word_ngrams(text: Column, n: int) -> Column:
    """array<string> of space-joined word n-grams of lowercased,
    whitespace-tokenized text; docs shorter than n tokens yield an
    empty array. Tokenization is lambda-bound (with_tokens) so it runs
    once per row, not once per gram position — the re-split variant is
    7x slower at sf0.1."""
    return with_tokens(
        text,
        lambda t: F.transform(
            _starts(t, n), lambda i: F.array_join(F.slice(t, i, n), " ")
        ),
    )


def word_ngram_hashes(text: Column, n: int) -> Column:
    """array<bigint> of xxhash64'd n-grams — the join-side form."""
    return with_tokens(
        text,
        lambda t: F.transform(
            _starts(t, n), lambda i: F.xxhash64(F.array_join(F.slice(t, i, n), " "))
        ),
    )


def _gram_hashes(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(word_ngram_hashes(F.col(text_col), n))
        ).alias("gram_hash"),
    )


def contamination_counts(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per training doc: how many of its distinct n-grams appear
    anywhere in the eval set (0 = clean). Keeps every training doc
    (explode_outer + left join), so the output is a full audit table."""
    train_grams = _gram_hashes(train, id_col, text_col, n)
    eval_grams = (
        _gram_hashes(eval_df, id_col, text_col, n)
        .select("gram_hash")
        .filter(F.col("gram_hash").isNotNull())
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    return (
        train_grams.join(eval_grams, "gram_hash", "left")
        .groupBy(id_col)
        .agg(F.sum(F.coalesce("__hit", F.lit(0))).cast("bigint").alias("n_shared_ngrams"))
        .withColumn("contaminated", F.col("n_shared_ngrams") > 0)
    )
