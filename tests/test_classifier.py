"""Linear text classifier (fastText-style bag-of-words scorer)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators import textanalysis as ta


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_classifier_known_scores(spark):
    df = _docs(
        spark,
        [
            (1, "the cat and the dog"),  # hits: 0.5+0.5+0.5 = 1.5, n=5
            (2, "buy now click here"),  # hits: -2.0 + -1.5 = -3.5, n=4
            (3, "zzz qqq"),  # all OOV -> 0, n=2
            (4, ""),  # empty text: split('') = [''] -> n=1, hits 0
        ],
    )
    w = {"the": 0.5, "and": 0.5, "buy": -2.0, "click": -1.5}
    out = {
        r["doc_id"]: (r["clf_logit"], r["clf_score"])
        for r in ta.classifier_score(df, "text", w, bias=0.25).collect()
    }
    assert out[1][0] == 0.25 + 1.5 / 5
    assert out[2][0] == 0.25 + (-3.5) / 4
    assert out[3][0] == 0.25
    assert out[4][0] == 0.25
    for logit, score in out.values():
        assert math.isclose(score, 1 / (1 + math.exp(-logit)), rel_tol=1e-12)


def test_classifier_weight_table_is_broadcast_not_literal(spark):
    # the weight table is the MODEL — production vocabs run 1e5-1e6
    # entries, so it must never appear as create_map plan literals.
    # Above the routing threshold it ships as a Spark broadcast behind
    # the Arrow scorer (round-13); the plan stays single-scan with no
    # exchange and no vocab literals.
    df = _docs(spark, [(i, f"tok{i} the") for i in range(50)])
    big_vocab = {f"tok{i}": (i % 7 - 3) / 8.0 for i in range(5000)}
    out = ta.classifier_score(df, "text", big_vocab)

    old = spark.conf.get("spark.sql.debug.maxToStringFields", "25")
    spark.conf.set("spark.sql.debug.maxToStringFields", "1000000")
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.debug.maxToStringFields", old)
    assert len(plan) < 50_000, "vocab leaked into the plan as literals"
    assert "Exchange" not in plan.replace("BroadcastExchange", "")

    # and the scores still come out right through the broadcast path
    r = {x["doc_id"]: x["clf_logit"] for x in out.collect()}
    assert r[0] == (big_vocab["tok0"] + 0.0) / 2  # 'the' is OOV here


def test_classifier_filter_chains_without_shuffle(spark, sf_dir):
    # classify -> filter is the production shape (score the corpus,
    # keep the good docs): one scan, no shuffle beyond the broadcast
    from dbt_maxcompute_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = ta.classifier_score(docs, "text", {"the": 0.5, "buy": -2.0}).filter(
        F.col("clf_logit") > 0
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("documents.parquet") == 1
    assert "Exchange" not in plan.replace("BroadcastExchange", "")


def test_classifier_empty_weights_degrades_to_bias(spark):
    # round-11 advisory sweep: an EMPTY weight dict must not break the
    # crossJoin with the broadcast map — every token is OOV, the fold
    # degrades to the bias, and the sigmoid follows it
    df = _docs(spark, [(1, "any text at all"), (2, "")])
    out = {
        r["doc_id"]: (r["clf_logit"], r["clf_score"])
        for r in ta.classifier_score(df, "text", {}, bias=0.75).collect()
    }
    assert out[1][0] == 0.75 and out[2][0] == 0.75
    for logit, score in out.values():
        assert math.isclose(score, 1 / (1 + math.exp(-logit)), rel_tol=1e-12)


def test_arrow_and_flat_map_paths_agree(spark, monkeypatch):
    # the Arrow scorer (vocab > _MAP_SHARD_MIN_ENTRIES, round-13) must
    # be bit-identical to the Catalyst flat-map fold — same lookups,
    # same left-to-right IEEE addition order (weights here are NOT all
    # dyadic, so this pins the summation order too)
    df = _docs(spark, [(i, f"tok{i % 700} the tok{(i * 7) % 700}") for i in range(60)])
    vocab = {f"tok{i}": (i % 13 - 6) / 8.0 for i in range(700)}  # > 512 -> arrow
    vocab["tok3"] = 0.1  # non-dyadic: order-sensitive in IEEE754
    vocab["the"] = 0.25
    arrow = {
        r["doc_id"]: r["clf_logit"]
        for r in ta.classifier_score(df, "text", vocab).collect()
    }
    monkeypatch.setattr(ta, "_MAP_SHARD_MIN_ENTRIES", 1 << 30)
    flat = {
        r["doc_id"]: r["clf_logit"]
        for r in ta.classifier_score(df, "text", vocab).collect()
    }
    assert arrow == flat


def test_arrow_scorer_tokenizer_parity(spark, monkeypatch):
    # _py_tokens must replicate tokens() = split(lower(trim), '\s+')
    # under Java semantics on the edge cases: empty text, whitespace-
    # only text, tabs/newlines, control chars at the ends, unicode
    # NBSP (NOT ascii \s), uppercase, NULL
    rows = [
        (1, ""),
        (2, "   "),
        (3, "\tA B  c\nd\r"),
        (4, "\x01 edge\x02"),
        (5, None),
        (6, "ONE two\fTHREE"),
    ]
    df = _docs(spark, rows)
    vocab = {f"w{i}": 0.0625 for i in range(600)}  # force arrow path
    vocab.update({"": 0.5, "a b": 0.25, "edge\x02": 0.125, "one": -0.25})
    arrow = {
        r["doc_id"]: r["clf_logit"]
        for r in ta.classifier_score(df, "text", vocab).collect()
    }
    monkeypatch.setattr(ta, "_MAP_SHARD_MIN_ENTRIES", 1 << 30)
    flat = {
        r["doc_id"]: r["clf_logit"]
        for r in ta.classifier_score(df, "text", vocab).collect()
    }
    assert arrow == flat


def test_shard_count_policy():
    assert ta._shard_count(10) == 1
    assert ta._shard_count(512) == 1
    assert ta._shard_count(513) == 16
    assert ta._shard_count(200_000) == 4096


def test_classifier_100k_vocab_plan_is_vectorized_and_bounded(spark):
    # round-13 (verdict item 4, re-pinned after the optimization round
    # routed big tables to the Arrow scorer): at 1e5 entries the
    # vectorized path MUST engage — the table must not leak into the
    # plan as literals, scoring stays single-scan/no-exchange, and the
    # Python evaluation is the ARROW batch node, never row-pickling
    # BatchEvalPython. A regression to the interpreted fold would show
    # up here (no ArrowEvalPython) and as a bench-row blowup on
    # classifier_vocab_100k.
    assert ta._shard_count(100_000) > 1  # threshold fn still routes big tables

    df = _docs(spark, [(i, f"tok{i % 50} filler words") for i in range(40)])
    vocab = {f"w{i} pad": -0.125 for i in range(100_000)}
    vocab.update({f"tok{i}": 0.25 for i in range(50)})
    out = ta.classifier_score(df, "text", vocab, bias=0.0)

    old = spark.conf.get("spark.sql.debug.maxToStringFields", "25")
    spark.conf.set("spark.sql.debug.maxToStringFields", "1000000")
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.debug.maxToStringFields", old)
    assert len(plan) < 80_000, "100k vocab leaked into the plan as literals"
    assert "ArrowEvalPython" in plan, "big-vocab scorer must be the Arrow path"
    assert "BatchEvalPython" not in plan, "row-pickling UDF path is forbidden"
    assert "Exchange" not in plan.replace("BroadcastExchange", "")

    r = {x["doc_id"]: x["clf_logit"] for x in out.collect()}
    # every doc: one vocab token (0.25) + two OOV -> 0.25/3
    assert r[7] == 0.25 / 3
