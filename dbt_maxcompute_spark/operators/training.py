"""Training-set preparation operators: sequence packing, intra-document
repetition profiling, deterministic global shuffle order.

No counterpart in the reference (extension per BASELINE.json) — these
are the ops a large-scale LLM pretraining pipeline runs between raw
text and the tokenizer:

- ``pack_sequences``: concat-and-chop accounting — where each document
  lands when the corpus is concatenated in id order and split into
  fixed-capacity context windows (start offset, window id, whether the
  doc straddles a window boundary).
- ``repetition_profile``: Gopher-style intra-doc repetition signals
  (duplicate-token ratio, top-bigram fraction) used as quality filters.
- ``training_order``: reproducible pseudo-random global order via
  md5(id, seed) — shard + in-shard rank; any engine reproduces it
  (md5 is engine-neutral where xxhash64 is Spark-only).

Scale design — the packing prefix-sum is the interesting one: a naive
``sum() OVER (ORDER BY id)`` is a SINGLE-PARTITION window (Spark moves
the whole table to one task — the classic global-window trap). Instead:

1. bucket ids into K contiguous ranges (pure expression, no shuffle);
2. per-bucket token totals — K rows, a metadata-sized aggregate;
3. exclusive bucket offsets on the driver (K numbers);
4. in-bucket cumulative sums via a window PARTITIONED by bucket —
   K-way parallel — plus the broadcast bucket offset.

Total cost: one map-side-combinable agg + one partitioned window; no
stage touches more than 1/K of the data in one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# whitespace tokenization, mirrored 1:1 by the DuckDB oracles
# (string_split_regex(lower(trim(text)), '\s+'))
def _ws_tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    capacity: int = 512,
    num_buckets: int = 32,
) -> DataFrame:
    """Concat-in-id-order-and-chop packing accounting.

    Returns one row per document: ``n_tokens``, ``start_token`` (its
    offset in the concatenated token stream), ``seq_id``
    (start_token // capacity — the training window its first token
    lands in) and ``spans_boundary`` (true when the document crosses a
    window boundary and will be split).
    """
    n_tok = F.size(_ws_tokens(F.col(text_col))).cast("long")
    # persist the (id, n_tokens) projection (16 B/row): three consumers
    # below (id-range probe, bucket sums, final window) would otherwise
    # each re-scan and re-tokenize the text column
    base = df.select(F.col(id_col).alias("__id"), n_tok.alias("n_tokens")).persist()

    # contiguous id buckets from the observed id range: pure per-row
    # expression once lo/hi are driver literals (metadata-sized probe)
    lo, hi = base.agg(F.min("__id"), F.max("__id")).first()
    if lo is None:  # empty input: empty output with the full schema
        return base.select(
            F.col("__id").alias(id_col),
            "n_tokens",
            F.lit(0).cast("long").alias("start_token"),
            F.lit(0).cast("long").alias("seq_id"),
            F.lit(False).alias("spans_boundary"),
        )
    span = max(int(hi) - int(lo) + 1, 1)
    k = min(num_buckets, span)
    bucket = ((F.col("__id") - F.lit(int(lo))) * k / span).cast("long")
    base = base.withColumn("__b", bucket)

    # per-bucket totals -> exclusive offsets (K rows on the driver)
    sums = {
        int(r["__b"]): int(r["s"])
        for r in base.groupBy("__b").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets, running = {}, 0
    for b in range(k):
        offsets[b] = running
        running += sums.get(b, 0)
    offset_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("__b"),
    )

    # in-bucket exclusive cumsum: window partitioned by bucket = K-way
    # parallel, never a single-partition global sort
    w = (
        Window.partitionBy("__b")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + offset_expr).alias(
        "start_token"
    )
    out = base.select(F.col("__id").alias(id_col), "n_tokens", start)
    seq = (F.col("start_token") / capacity).cast("long")
    last_seq = ((F.col("start_token") + F.col("n_tokens") - 1) / capacity).cast("long")
    return out.select(
        id_col,
        "n_tokens",
        "start_token",
        seq.alias("seq_id"),
        (seq != last_seq).alias("spans_boundary"),
    )


def repetition_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style intra-document repetition signals: duplicate-token
    ratio and the fraction of all bigrams taken by the most frequent
    bigram.

    SHUFFLE-FREE: the top-bigram count is the longest equal run in the
    per-row SORTED bigram array (an `aggregate` higher-order fold), so
    the whole profile is one narrow projection over one scan — an
    explode + groupBy formulation would shuffle every bigram in the
    corpus (token-count-sized exchange at 100 TB) for a per-document
    statistic that never needed to leave its row."""
    toks = _ws_tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("__id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        toks.alias("__toks"),
    )
    # guard size<2: sequence(0, -1) descends instead of being empty
    bigrams_sorted = F.expr(
        "CASE WHEN size(__toks) < 2 THEN array() ELSE "
        "array_sort(transform(sequence(0, size(__toks) - 2), "
        "i -> concat(__toks[i], ' ', __toks[i+1]))) END"
    )
    max_run = F.expr(
        "aggregate(__bg, "
        "struct(cast(null as string) as prev, cast(0 as bigint) as run, "
        "       cast(0 as bigint) as best), "
        "(a, x) -> struct(x as prev, "
        "  if(a.prev is not null and x = a.prev, a.run + 1, cast(1 as bigint)) as run, "
        "  greatest(a.best, if(a.prev is not null and x = a.prev, a.run + 1, "
        "           cast(1 as bigint))) as best), "
        "a -> a.best)"
    )
    return base.withColumn("__bg", bigrams_sorted).select(
        F.col("__id").alias(id_col),
        "n_tokens",
        "n_unique_tokens",
        F.round(
            F.lit(1) - F.col("n_unique_tokens") / F.col("n_tokens"), 6
        ).alias("dup_token_ratio"),
        F.when(
            F.col("n_tokens") > 1,
            F.round(max_run / (F.col("n_tokens") - 1), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


def next_event_examples(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    context: int = 2,
) -> DataFrame:
    """Sliding-window next-event-prediction examples from an event log:
    for every event with >= ``context`` predecessors in its user's
    timeline, emit the ordered context event types and the event's own
    type as the label — the (context, label) pairs a behavioral
    sequence model trains on.

    One shuffle on the user key; both windows (the ROWS-frame
    collect_list and the row_number completeness filter) share the
    same partitioning + ordering, so Catalyst plans a single exchange
    and a single sort. Order inside the context array follows the
    window order (ts, then id as tiebreak) — deterministic on any
    engine with ordered window list aggregation.
    """
    if context < 1:
        raise ValueError(f"context must be >= 1, got {context}")
    # NULL-typed rows are excluded from the timeline up front:
    # collect_list silently drops NULL elements from contexts while
    # row_number would still count the row, desynchronizing context
    # length from the completeness filter.
    df = df.filter(F.col(type_col).isNotNull())
    order = [F.col(ts_col), F.col(id_col)]
    wctx = (
        Window.partitionBy(user_col).orderBy(*order).rowsBetween(-context, -1)
    )
    wrn = Window.partitionBy(user_col).orderBy(*order)
    return (
        df.select(
            F.col(id_col),
            F.col(user_col),
            F.collect_list(type_col).over(wctx).alias("context"),
            F.col(type_col).alias("label"),
            F.row_number().over(wrn).alias("__rn"),
        )
        .filter(F.col("__rn") > context)
        .drop("__rn")
    )


def training_order(
    df: DataFrame, id_col: str, seed: int = 42, shard_chars: int = 2
) -> DataFrame:
    """Deterministic pseudo-random training order: md5(id, seed) gives
    a uniform key; the first hex chars are the output shard and the
    rank is computed WITHIN each shard (256-way parallel window — a
    global rank would be a single-partition sort). Readers stream
    shards in order, rows in rank order: reproducible on any engine."""
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"-{seed}")))
    base = df.select(F.col(id_col).alias("__id"), key.alias("__k"))
    shard = F.substring("__k", 1, shard_chars)
    w = Window.partitionBy("shard").orderBy("__k", "__id")
    return (
        base.withColumn("shard", shard)
        .withColumn("shuffle_rank", F.row_number().over(w).cast("long"))
        .select(F.col("__id").alias(id_col), "shard", "shuffle_rank")
    )
