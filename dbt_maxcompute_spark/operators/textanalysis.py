"""Text-analysis operators for training-data pipelines.

No counterpart in the reference (extension per BASELINE.json):
language-ID (stopword heuristic), quality scoring, token counting
(whitespace + BPE-ish regex estimate), document fingerprinting.

Everything here is pure Catalyst expressions (split / regexp /
filter / aggregate lambdas) — whole-stage codegen, no Python UDFs, so
a 100 TB documents scan stays one pass with column pruning (only
`text` + id columns read). Each function is also expressible in ANSI
SQL, so every suite query pairs with a DuckDB oracle.
"""

from __future__ import annotations

from typing import Iterator  # noqa: UP035 — pyspark resolves pandas_udf hints from module globals

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from dbt_maxcompute_spark.localframe import local_frame

# Small fixed stopword sets per language — the heuristic's lexicon.
# Deliberately tiny: lang-ID here demonstrates the operator shape
# (argmax over per-language token-hit counts); swap in real lexicons
# for production.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "es", "por"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "que", "dans"),
}

# BPE-ish word-piece pattern: letter runs, single digits, single
# punctuation marks — a cheap proxy for subword token counts.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens of lowercased text."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def tokens_estimate(text: Column) -> Column:
    """BPE-ish token-count estimate: count TOKEN_REGEX matches."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0)))


def stopword_hits(toks: Column, lang: str) -> Column:
    words = list(STOPWORDS[lang])
    return F.size(F.filter(toks, lambda t: t.isin(words)))


def with_tokens(text: Column, fn) -> Column:
    """Bind the token array ONCE per row as a lambda variable and
    evaluate fn over it. Higher-order functions are interpreted
    (CodegenFallback), so codegen subexpression elimination never
    dedupes a `tokens(text)` referenced by several HOF calls — each
    reference re-splits the text. Routing the metrics through one
    transform-over-singleton-array makes the tokenization cost O(1)
    per row regardless of how many token-level metrics consume it
    (measured 7x on the 3-gram hasher at sf0.1)."""
    return F.get(F.transform(F.array(tokens(text)), fn), 0)


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword hits; ties break lexicographically
    by language code; zero hits everywhere -> 'und'."""

    def best_lang(toks: Column) -> Column:
        best = None
        for code in sorted(STOPWORDS):
            cand = F.struct(
                stopword_hits(toks, code).alias("hits"), F.lit(code).alias("code")
            )
            if best is None:
                best = cand
            else:
                # strictly-greater keeps the earlier (lexicographically
                # smaller) code on ties
                best = F.when(cand["hits"] > best["hits"], cand).otherwise(best)
        return F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))

    return with_tokens(text, best_lang)


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters."""
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(alpha.cast("double") / n.cast("double"))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n.cast("double"))


def _stopword_ratio_t(toks: Column) -> Column:
    all_words = sorted({w for ws in STOPWORDS.values() for w in ws})
    hits = F.size(F.filter(toks, lambda t: t.isin(all_words)))
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n.cast("double"))


def stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are (any-language) stopwords."""
    return with_tokens(text, _stopword_ratio_t)


# Catalyst's GetMapValue is a LINEAR scan over the map's keys, so a
# probe against a broadcast map column costs O(|table|) — fine at the
# hundreds-of-entries scale, catastrophic at a production 2e5-entry
# vocab (measured round 12: a 200k-entry map could not finish scoring
# 5k docs in 6 minutes; 5.4e10 string compares). Above this cutoff the
# table ships SHARDED: an array of B sub-maps bucketed by
# crc32(key) % B (crc32 because python's zlib.crc32 and Spark's
# F.crc32 agree, so both sides place/probe identically), probed as
# element_at(shards[bucket], key) — O(|table|/B) per probe, still ONE
# broadcast single-row frame, zero shuffle, bit-identical results.
_MAP_SHARD_TARGET = 64  # ~entries per shard after bucketing
_MAP_SHARD_MIN_ENTRIES = 512  # below this a flat map scan is cheaper


def _shard_count(n_entries: int) -> int:
    if n_entries <= _MAP_SHARD_MIN_ENTRIES:
        return 1
    b = 1
    while n_entries / b > _MAP_SHARD_TARGET:
        b *= 2
    return b


def _py_tokens(s: str | None) -> list[str]:
    """EXACT Python replica of :func:`tokens` —
    ``split(lower(trim(text)), '\\s+')`` under Spark semantics — for
    the vectorized big-table scorer path. Must stay bit-compatible
    (each point verified empirically against Spark 4.1 and pinned by
    tests/test_classifier.py path-equivalence cases):
    - Spark ``trim`` strips ONLY the space char U+0020 from both ends
      (tabs/newlines/control chars survive);
    - Java ``\\s`` is ASCII-only ``[ \\t\\n\\x0B\\f\\r]``;
    - split keeps LEADING and TRAILING empty strings (limit -1), so
      ``'\\ta b\\r'`` tokenizes as ``['', 'a', 'b', '']``;
    - an empty string yields ``['']``;
    - NULL text maps to [] (both engines then score 0.0 — the fold's
      ``when(n > 0, ...)`` fallback)."""
    if s is None:
        return []
    s = s.strip(" ").lower()
    return _ASCII_WS.split(s) if s else [""]


import re as _re

_ASCII_WS = _re.compile(r"[ \t\n\x0b\f\r]+")


def _bow_mean_scorer(spark, weights: dict[str, float]):
    """Vectorized (Arrow) mean-pooled bag-of-words scorer — the
    big-table path of :func:`classifier_score` (optimization guide
    §4.2/§4.5: batch the boundary, init the model once per task).

    Catalyst's interpreted HOF fold costs ~10 us per token-probe no
    matter how the map is sharded; a Python dict probe costs ~50 ns.
    Measured at sf0.1 with the 100k-entry production vocab: 10.4 s
    (crc32-sharded fold) -> 0.6 s (this path), bit-identical logits.
    The table ships ONCE per executor as a Spark broadcast (unpickled
    once per worker process, cached across tasks); only the text
    column crosses the Arrow boundary; summation is left-to-right in
    token order, so even NON-dyadic weights reproduce the fold's exact
    IEEE addition sequence. Returns mean(weight) with the fold's
    n==0 -> 0.0 fallback (bias is added Catalyst-side by the caller).
    """
    bc = spark.sparkContext.broadcast(dict(weights))

    @F.pandas_udf("double")
    def _mean_w(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        get = bc.value.get  # once per task; broadcast caches per worker
        for texts in batches:
            out = []
            for t in texts:
                toks = _py_tokens(t)
                n = len(toks)
                if n == 0:
                    out.append(0.0)
                    continue
                s = 0.0
                for tk in toks:
                    v = get(tk)
                    if v is not None:
                        s += v
                out.append(s / n)
            yield pd.Series(out, dtype="float64")

    return _mean_w


def _sharded_str_map(spark, table: dict[str, float], col: str):
    """Single-row broadcast frame `col array<map<string,double>>` with
    crc32-bucketed shards, plus a `lookup(key_col)` probe builder.
    B=1 keeps the flat-map probe (no crc32 in the hot loop)."""
    import zlib

    b = _shard_count(len(table))
    shards: list[dict[str, float]] = [{} for _ in range(b)]
    for k, v in table.items():
        kk = str(k)
        shards[zlib.crc32(kk.encode()) % b][kk] = float(v)
    wdf = local_frame(spark, [(shards,)], f"{col} array<map<string,double>>")

    def lookup(key: Column) -> Column:
        if b == 1:
            return F.element_at(F.element_at(F.col(col), 1), key)
        idx = F.pmod(F.crc32(F.encode(key, "UTF-8")), F.lit(b)).cast("int")
        return F.element_at(F.element_at(F.col(col), idx + 1), key)

    return wdf, lookup


def classifier_score(
    df,
    text_col: str,
    weights: dict[str, float],
    bias: float = 0.0,
    logit_col: str = "clf_logit",
    score_col: str = "clf_score",
):
    """fastText-style LINEAR text classifier (Joulin et al. 2016,
    "Bag of Tricks for Efficient Text Classification") — the learned
    counterpart of :func:`quality_score`'s hand-set heuristic, and the
    shape production quality/toxicity/language filters actually ship
    as: logit = bias + mean over tokens of weight[token] (mean-pooled
    bag of words; out-of-vocabulary tokens contribute 0), score =
    sigmoid(logit).

    Scale shape: the weight table is the model — production vocabs run
    1e5-1e6 entries. Tables up to `_MAP_SHARD_MIN_ENTRIES` score as one
    Catalyst fold per row over a broadcast single-row map frame (never
    a `create_map` plan literal — the literal-vs-broadcast cliff of
    round-11): no shuffle, no Python, chains straight into a
    partitioned filter/write. Bigger tables route to the vectorized
    Arrow scorer (:func:`_bow_mean_scorer`, round-13): Catalyst's
    interpreted HOF fold costs ~10 us/token-probe regardless of map
    sharding, while a dict probe behind an Arrow batch costs ~50 ns —
    measured 10.4 s -> 0.6 s on the 100k-vocab row at sf0.1,
    bit-identical logits (left-to-right summation preserved). Still a
    single scan with no exchange: only the text column crosses the
    boundary and the table ships once per executor as a Spark
    broadcast. Adds ``logit_col``
    (pure-arithmetic — with dyadic-rational weights the fold is
    order-exact and oracle-checkable) and ``score_col`` (sigmoid;
    transcendental, so cross-engine comparison belongs on the logit).
    """
    spark = df.sparkSession
    if len(weights) > _MAP_SHARD_MIN_ENTRIES:
        # big-table path: vectorized Arrow scorer (see _bow_mean_scorer;
        # bit-identical to the fold, ~20x faster at production vocab
        # sizes). The fold below stays for small tables, where it chains
        # into scans with zero Python and no boundary cost.
        mean_w = _bow_mean_scorer(spark, weights)
        return (
            df.withColumn(
                logit_col, F.lit(float(bias)) + mean_w(F.col(text_col))
            )
            .withColumn(
                score_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(logit_col)))
            )
        )
    wdf, lookup = _sharded_str_map(spark, weights, "__clf_m")
    out = df.crossJoin(F.broadcast(wdf))

    def logit(toks: Column) -> Column:
        hits = F.aggregate(
            toks,
            F.lit(0.0),
            lambda acc, t: acc + F.coalesce(lookup(t), F.lit(0.0)),
        )
        n = F.size(toks)
        return F.lit(float(bias)) + F.when(
            n > 0, hits / n.cast("double")
        ).otherwise(F.lit(0.0))

    z = with_tokens(F.col(text_col), logit)
    return (
        out.withColumn(logit_col, z)
        .withColumn(
            score_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(logit_col)))
        )
        .drop("__clf_m")
    )


def lm_perplexity(
    df,
    text_col: str,
    logprobs: dict[str, float],
    order: int = 2,
    backoff_logprob: float = -0.5,
    oov_logprob: float = -8.0,
    lp_col: str = "lm_mean_logprob",
    ppl_col: str = "lm_perplexity",
):
    """KenLM-style n-gram language-model scorer with STUPID BACKOFF
    (Brants et al. 2007, "Large Language Models in Machine
    Translation") — the perplexity filter CCNet (Wenzek et al. 2019)
    and the Gopher/RefinedWeb quality pipelines gate web text on.

    ``logprobs`` maps space-joined n-grams of ANY length 1..order to
    log-probabilities. Token i scores on the LONGEST n-gram ending at
    i that is (a) in the table and (b) fits the available left
    context; each level backed off adds ``backoff_logprob`` (log of
    the stupid-backoff alpha); a token missing even as a unigram
    contributes ``oov_logprob`` after the same backoff chain. Adds
    ``lp_col`` = mean token log-prob (pure dyadic arithmetic when the
    table is — order-exact, oracle-checkable) and ``ppl_col`` =
    exp(-mean) (transcendental; cross-engine comparison belongs on
    the mean).

    Scale shape (same device as :func:`classifier_score`): the n-gram
    table IS the model — real KenLM tables run 1e6-1e8 entries — so
    it rides as ONE broadcast single-row frame, never a `create_map`
    plan literal, crc32-sharded above `_MAP_SHARD_MIN_ENTRIES` so each
    probe scans O(|table|/B) keys, not Catalyst's O(|table|)
    GetMapValue linear scan (round-12). Scoring is one Catalyst
    transform+aggregate fold per row over the :func:`with_tokens`
    binding: no shuffle, no Python, chains straight into a
    partitioned filter/write.
    """
    spark = df.sparkSession
    wdf, lookup = _sharded_str_map(spark, logprobs, "__lm_m")
    out = df.crossJoin(F.broadcast(wdf))
    bk = float(backoff_logprob)
    oov = float(oov_logprob)

    def mean_lp(toks: Column) -> Column:
        def lp_at(w: Column, i: Column) -> Column:
            # i is 0-based; the current token sits at 1-based i+1
            attempts = F.least(i, F.lit(order - 1)).cast("double")
            res = None
            for d in range(order - 1, 0, -1):
                # d context tokens: 1-based positions (i+1-d)..i
                # start clamped to 1: when i < d the guard below makes
                # this branch dead, but the slice must still be LEGAL —
                # relying on And short-circuit to skip an out-of-range
                # start would break if Catalyst ever reordered or
                # hoisted the subexpression (round-12 advisory)
                key = F.concat_ws(
                    " ",
                    F.slice(toks, F.greatest(i - F.lit(d) + 1, F.lit(1)), d),
                    w,
                )
                hit = lookup(key)
                cand = hit + (attempts - float(d)) * bk
                guard = (i >= d) & hit.isNotNull()
                res = (
                    F.when(guard, cand)
                    if res is None
                    else res.when(guard, cand)
                )
            uni = (
                F.coalesce(lookup(w), F.lit(oov))
                + attempts * bk
            )
            return uni if res is None else res.otherwise(uni)

        total = F.aggregate(
            F.transform(toks, lp_at), F.lit(0.0), lambda acc, x: acc + x
        )
        return total / F.size(toks).cast("double")

    z = with_tokens(F.col(text_col), mean_lp)
    return (
        out.withColumn(lp_col, z)
        .withColumn(ppl_col, F.exp(-F.col(lp_col)))
        .drop("__lm_m")
    )


def ngram_counts(
    df,
    text_col: str,
    order: int = 2,
    min_count: int = 1,
):
    """Count-based n-gram LM TRAINING (the MLE table
    :func:`lm_perplexity` scores with): one row per (context, word)
    n-gram with its corpus count, the context's continuation count,
    and the MLE probability ``prob = cnt / ctx_cnt`` — exactly the
    relative frequencies KenLM's pipeline starts from (Heafield 2011)
    before smoothing.

    ``context`` is the space-joined first ``order-1`` tokens (empty
    string for unigrams, whose ``ctx_cnt`` is then the total token
    count). Docs shorter than ``order`` tokens contribute nothing.
    ``min_count`` prunes the OUTPUT only — probabilities are true MLE
    over the unpruned counts.

    Scale shape: one explode + groupBy(context, word) with map-side
    partial aggregation (the shuffle carries (ngram, partial-count),
    never positions), then ``ctx_cnt`` via a window sum partitioned by
    context over the ALREADY-AGGREGATED counts — partition width is
    the context's continuation vocabulary, bounded by |vocab|, not by
    corpus size. Two shuffles total for a 100 TB corpus; no Python.
    """
    toks = tokens(F.col(text_col))
    n = int(order)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.struct(
                F.concat_ws(" ", F.slice(toks, i, n - 1)).alias("context"),
                F.element_at(toks, (i + n - 1).cast("int")).alias("word"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<context:string,word:string>>"))
    ex = df.select(F.explode(grams).alias("__g")).select(
        F.col("__g.context").alias("context"),
        F.col("__g.word").alias("word"),
    )
    cnt = ex.groupBy("context", "word").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    if n == 1:
        # order=1: every row shares context = '' — a window partitioned
        # by context would funnel the ENTIRE vocabulary through one
        # task (round-12 verdict). The empty context's ctx_cnt is just
        # the global token count: a scalar aggregate broadcast back
        # over the counts, no window, no single-partition funnel.
        tot = cnt.agg(F.sum("cnt").cast("long").alias("ctx_cnt"))
        ctx = cnt.crossJoin(F.broadcast(tot))
    else:
        from pyspark.sql import Window

        w = Window.partitionBy("context")
        ctx = cnt.withColumn("ctx_cnt", F.sum("cnt").over(w).cast("long"))
    return ctx.withColumn(
        "prob", F.col("cnt").cast("double") / F.col("ctx_cnt").cast("double")
    ).filter(F.col("cnt") >= int(min_count))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic:
      0.35*alpha_ratio + 0.25*min(stopword_ratio*4, 1)
      + 0.25*(1 - min(punct_ratio*5, 1)) + 0.15*min(token_count/100, 1)
    Weights/caps are the operator's parameters, mirrored exactly in the
    oracle SQL. The whole formula evaluates inside ONE with_tokens
    binding (token terms see the bound array; char terms reference the
    outer text column) so tokenization runs once per row, and the
    SUMMATION ORDER matches the oracle exactly — float addition is not
    associative, so regrouping the weighted terms would flip
    round(...,6) hashes."""

    def score(toks: Column) -> Column:
        length_score = F.least(F.size(toks).cast("double") / 100.0, F.lit(1.0))
        sw = F.least(_stopword_ratio_t(toks) * 4.0, F.lit(1.0))
        pu = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
        return 0.35 * alpha_ratio(text) + 0.25 * sw + 0.25 * pu + 0.15 * length_score

    return with_tokens(text, score)


def chunk_starts(toks: Column, chunk_size: int, overlap: int) -> Column:
    """1-based start offsets of token windows: stride = size - overlap,
    last window may be short; every doc yields >= 1 chunk."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    return F.sequence(
        F.lit(1), F.greatest(F.size(toks) - overlap, F.lit(1)), F.lit(stride)
    )


def chunk_tokens(toks: Column, start: Column, chunk_size: int) -> Column:
    return F.slice(toks, start, chunk_size)


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token bag. Identical token multisets-modulo-order collide by design
    (bag fingerprinting); pair with exact dedup for strict identity."""
    toks = F.array_sort(F.array_distinct(tokens(text)))
    return F.md5(F.concat_ws(" ", toks))


# PII patterns — deliberately RE2-compatible (no backrefs/lookaround)
# so the same pattern string runs in Spark (Java regex), DuckDB (RE2),
# and any other engine auditing the corpus. Swap in fuller lexicons
# (intl phone formats, IBANs, ...) for production; the operator shape
# (ordered global regexp_replace chain + per-kind match counts) is the
# point.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3,4}-\d{4}\b",
}


def pii_count(text: Column, kind: str) -> Column:
    """How many matches of one PII kind appear in the text."""
    return F.size(F.regexp_extract_all(text, F.lit(PII_PATTERNS[kind]), F.lit(0)))


def redact_pii(text: Column) -> Column:
    """Replace every PII match with a typed placeholder. Order matters
    and is fixed (email -> ipv4 -> phone): emails are redacted before
    the ipv4 pass so a digit-heavy mail domain can't be half-eaten, and
    phone runs last. Pure Catalyst (regexp_replace is global in Spark),
    single pass per pattern — a 100 TB scrub stays codegen'd."""
    out = text
    for kind in ("email", "ipv4", "phone"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def remove_boilerplate_lines(
    docs,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    sep: str = "\n",
):
    """C4/RefinedWeb-style LINE-level boilerplate removal: a line
    (trimmed) that occurs in ``min_docs`` or more DISTINCT documents is
    boilerplate (headers, footers, nav chrome, cookie banners) and is
    dropped from EVERY document; surviving lines reassemble in their
    original order. No counterpart in the reference (training-data
    extension per BASELINE.json) — this is the step between raw scrape
    and dedup in every large text pipeline.

    Scale shape (pure Catalyst, no Python):
    - one ``posexplode`` pass over the corpus (line, position);
    - line frequency is ONE hash-agg on the trimmed line text with an
      exact ``count(DISTINCT id)`` (two-stage partial agg under AQE) —
      the shuffle carries distinct (line, id) pairs, not documents;
    - removal is a join against the (usually tiny) boilerplate line
      set — left as a plain join for AQE to broadcast when it fits;
    - reassembly is one groupBy(id) with ``array_sort`` over collected
      (pos, line) structs — order restored without a window sort.

    Returns the input frame with ``text_col`` replaced by the cleaned
    text (documents whose every line was boilerplate keep an empty
    string) and an added ``n_removed_lines`` column.
    """
    import re as _re

    from pyspark.sql import DataFrame  # noqa: F401

    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(sep), -1)
        ).alias("__pos", "__line"),
    )
    key = F.trim(F.col("__line"))
    boiler = (
        lines.where(F.length(key) > 0)
        .groupBy(key.alias("__k"))
        .agg(F.count_distinct(F.col(id_col)).alias("__d"))
        .where(F.col("__d") >= min_docs)
        .select("__k")
    )
    kept = lines.join(
        boiler, on=F.trim(lines["__line"]) == boiler["__k"], how="left_anti"
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("__line")))
                ),
                lambda s: s["__line"],
            ),
            sep,
        ).alias("__cleaned"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    # size() of a NULL array is -1: a NULL document has zero lines
    n_lines = F.when(
        F.col(text_col).isNull(), F.lit(0)
    ).otherwise(F.size(F.split(F.col(text_col), _re.escape(sep), -1)))
    return (
        docs.join(rebuilt, on=id_col, how="left")
        .withColumn(
            "n_removed_lines",
            (n_lines - F.coalesce(F.col("__n_kept"), F.lit(0))).cast("bigint"),
        )
        .withColumn(text_col, F.coalesce(F.col("__cleaned"), F.lit("")))
        .drop("__cleaned", "__n_kept")
    )


def clean_boilerplate_incremental(
    spark,
    store,
    batch,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    sep: str = "\n",
    batch_id: int | None = None,
    app_id: str = "boilerplate",
):
    """INCREMENTAL line-level boilerplate removal — the continuous-
    ingest shape of :func:`remove_boilerplate_lines`: a persistent
    line-frequency STORE (a transaction-log table of
    ``(line, n_docs)``) accumulates how many distinct documents each
    trimmed line has appeared in ACROSS ALL BATCHES SO FAR, and each
    arriving batch is cleaned against the cumulative counts (its own
    contribution included). A nav header that only becomes frequent in
    batch 7 starts dropping from batch 7 on — history is never
    re-scanned, exactly like the repo's incremental dedup stores.

    Scale shape:
    - the batch pays one posexplode + one (line, id)-distinct hash-agg
      (batch-sized);
    - the store update is ONE keyed DV upsert (``delete_insert_dv``):
      matched lines bump their count via a join against the store's
      CURRENT values, new lines insert — cost is O(|batch lines| +
      matched rows), never O(|store|);
    - the boilerplate set is read back filtered (``n_docs >=
      min_docs``) — answer-sized, AQE broadcasts the removal join when
      it fits;
    - reassembly is the same array_sort groupBy as the batch operator.

    ``store`` is a :class:`~dbt_maxcompute_spark.txnlog.TxnTable`
    handle; an empty/uninitialized table is created on first use.
    Returns the cleaned batch frame (same contract as
    :func:`remove_boilerplate_lines`).

    ``batch_id`` (round-10 advisory fix) makes REPLAYS idempotent: the
    store upsert commits with the txn ledger marker
    ``(app_id, batch_id)`` — the same exactly-once device as the
    engine's streaming ``foreachBatch`` sinks — so a batch re-run after
    a downstream failure sees its own id already recorded and SKIPS the
    count update (no double-counted documents, no premature
    boilerplate classification) while still returning the cleaned
    frame. Callers that never replay may omit it (the pre-fix
    behavior); a document SPLIT ACROSS batches still counts once per
    batch — the contract is distinct documents per batch, monotonic
    batch ids per app_id.
    """
    import re as _re

    lines = batch.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(sep), -1)
        ).alias("__pos", "__line"),
    )
    key = F.trim(F.col("__line"))
    batch_counts = (
        lines.where(F.length(key) > 0)
        .groupBy(key.alias("line"))
        .agg(F.count_distinct(F.col(id_col)).alias("n_new"))
    )
    txn = (
        {"app_id": str(app_id), "batch_id": int(batch_id)}
        if batch_id is not None
        else None
    )
    if store.exists():
        last = store.last_batch(str(app_id)) if batch_id is not None else None
        if last is not None and int(batch_id) <= last:
            pass  # replayed batch: counts already applied exactly once
        else:
            current = store.read().select("line", "n_docs")
            merged = (
                batch_counts.join(current, on="line", how="left")
                .select(
                    "line",
                    (
                        F.coalesce(F.col("n_docs"), F.lit(0)) + F.col("n_new")
                    ).cast("bigint").alias("n_docs"),
                )
            )
            store.delete_insert_dv(merged, ["line"], txn=txn)
    else:
        store.create(
            batch_counts.select(
                "line", F.col("n_new").cast("bigint").alias("n_docs")
            ),
            txn=txn,
        )
    boiler = store.read().where(F.col("n_docs") >= min_docs).select(
        F.col("line").alias("__k")
    )
    kept = lines.join(
        boiler, on=F.trim(lines["__line"]) == boiler["__k"], how="left_anti"
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("__line")))
                ),
                lambda s: s["__line"],
            ),
            sep,
        ).alias("__cleaned"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    n_lines = F.when(
        F.col(text_col).isNull(), F.lit(0)
    ).otherwise(F.size(F.split(F.col(text_col), _re.escape(sep), -1)))
    return (
        batch.join(rebuilt, on=id_col, how="left")
        .withColumn(
            "n_removed_lines",
            (n_lines - F.coalesce(F.col("__n_kept"), F.lit(0))).cast("bigint"),
        )
        .withColumn(text_col, F.coalesce(F.col("__cleaned"), F.lit("")))
        .drop("__cleaned", "__n_kept")
    )
