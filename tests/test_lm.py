"""KenLM-style n-gram LM perplexity scorer (stupid backoff)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators import textanalysis as ta


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lm_bigram_known_scores(spark):
    df = _docs(
        spark,
        [
            (1, "the cat sat"),  # -1.0 (uni), -0.5 (bi), -0.25 (bi)
            (2, "zz qq"),  # oov -8.0; bi+uni miss -> -8.0 + 1*-0.5
            (3, ""),  # split('') = [''] -> one OOV token
        ],
    )
    lp = {"the": -1.0, "cat": -2.0, "sat": -3.0, "the cat": -0.5, "cat sat": -0.25}
    out = {
        r["doc_id"]: (r["lm_mean_logprob"], r["lm_perplexity"])
        for r in ta.lm_perplexity(df, "text", lp, order=2).collect()
    }
    assert out[1][0] == (-1.0 - 0.5 - 0.25) / 3
    assert out[2][0] == (-8.0 + (-8.0 - 0.5)) / 2
    assert out[3][0] == -8.0
    for mean_lp, ppl in out.values():
        assert math.isclose(ppl, math.exp(-mean_lp), rel_tol=1e-12)


def test_lm_trigram_backoff_chain(spark):
    # order=3: the 3rd token prefers the trigram, then bigram with one
    # backoff step, then unigram with two, then OOV with two
    lp = {
        "a b c": -0.125,  # trigram hit
        "b d": -0.25,  # bigram hit (one backoff)
        "e": -1.0,  # unigram hit (two backoffs)
    }
    df = _docs(
        spark,
        [(1, "a b c"), (2, "a b d"), (3, "a b e"), (4, "a b f")],
    )
    out = {
        r["doc_id"]: r["lm_mean_logprob"]
        for r in ta.lm_perplexity(
            df, "text", lp, order=3, backoff_logprob=-0.5, oov_logprob=-8.0
        ).collect()
    }
    # first two tokens are identical across docs:
    #   'a' i=0: uni miss -> -8.0
    #   'b' i=1: bigram 'a b' miss, uni miss -> -8.0 - 0.5
    head = -8.0 + (-8.0 - 0.5)
    assert out[1] == (head + (-0.125 + 0 * -0.5)) / 3
    assert out[2] == (head + (-0.25 + 1 * -0.5)) / 3
    assert out[3] == (head + (-1.0 + 2 * -0.5)) / 3
    assert out[4] == (head + (-8.0 + 2 * -0.5)) / 3


def test_lm_table_is_broadcast_not_literal(spark):
    # the n-gram table is the MODEL — real KenLM tables run 1e6-1e8
    # entries — so it must ride as a broadcast map column, never a
    # create_map plan literal (same cliff as classifier_score / IVF)
    df = _docs(spark, [(i, f"tok{i} the end") for i in range(50)])
    big = {f"tok{i} the": -float((i % 15) + 1) / 8.0 for i in range(5000)}
    big.update({f"tok{i}": -1.0 for i in range(1000)})
    out = ta.lm_perplexity(df, "text", big, order=2)

    old = spark.conf.get("spark.sql.debug.maxToStringFields", "25")
    spark.conf.set("spark.sql.debug.maxToStringFields", "1000000")
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.debug.maxToStringFields", old)
    assert len(plan) < 50_000, "n-gram table leaked into the plan as literals"
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Exchange" not in plan.replace("BroadcastExchange", "")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    # and scores come out right through the broadcast path:
    # tok i: uni hit -1.0 (i<1000) / oov; 'the': bigram hit; 'end': oov+bk
    r = {x["doc_id"]: x["lm_mean_logprob"] for x in out.collect()}
    assert r[3] == (-1.0 + big["tok3 the"] + (-8.0 - 0.5)) / 3


def test_lm_filter_chains_without_shuffle(spark, sf_dir):
    # score -> filter is the production shape (CCNet: keep docs whose
    # perplexity is under a threshold): one scan, no shuffle
    from dbt_maxcompute_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = ta.lm_perplexity(
        docs, "text", {"the": -1.0, "the cat": -0.5}
    ).filter(F.col("lm_mean_logprob") > -6.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("documents.parquet") == 1
    assert "Exchange" not in plan.replace("BroadcastExchange", "")


def test_lm_empty_table_degrades_to_oov(spark):
    df = _docs(spark, [(1, "a b c d")])
    out = ta.lm_perplexity(df, "text", {}, order=2).collect()[0]
    # token 0: oov; tokens 1-3: oov after one failed backoff
    assert out["lm_mean_logprob"] == (-8.0 + 3 * (-8.0 - 0.5)) / 4


def test_ngram_counts_known_values(spark):
    df = _docs(spark, [(1, "a b a b c"), (2, "a b"), (3, "x")])
    out = {
        (r["context"], r["word"]): (r["cnt"], r["ctx_cnt"], r["prob"])
        for r in ta.ngram_counts(df, "text", order=2).collect()
    }
    assert out[("a", "b")] == (3, 3, 1.0)
    assert out[("b", "a")] == (1, 2, 0.5)
    assert out[("b", "c")] == (1, 2, 0.5)
    assert len(out) == 3  # doc 3 is shorter than the order
    # unigrams: context '', ctx_cnt = total tokens
    uni = {
        r["word"]: (r["context"], r["cnt"], r["ctx_cnt"])
        for r in ta.ngram_counts(df, "text", order=1).collect()
    }
    assert uni["a"] == ("", 3, 8) and uni["x"] == ("", 1, 8)


def test_ngram_counts_min_count_prunes_output_not_probs(spark):
    df = _docs(spark, [(1, "a b a b a c")])
    out = {
        (r["context"], r["word"]): r["prob"]
        for r in ta.ngram_counts(df, "text", order=2, min_count=2).collect()
    }
    # 'a c' (cnt=1) pruned, but 'a b' prob stays 2/3 (true MLE over
    # the unpruned context count), not 2/2
    assert out == {("a", "b"): 2 / 3, ("b", "a"): 1.0}


def test_train_then_score_roundtrip(spark):
    # the full CCNet-style pipeline: train the table on a corpus,
    # score held-out docs with lm_perplexity using MLE log-probs
    import math

    corpus = _docs(
        spark, [(i, "the cat sat on the mat") for i in range(5)]
    )
    table_rows = ta.ngram_counts(corpus, "text", order=2).collect()
    table = {
        f"{r['context']} {r['word']}": math.log(r["prob"])
        for r in table_rows
    }
    # in-domain bigrams score their MLE log-probs ('the' continues to
    # cat/mat -> ln(0.5); 'cat sat' is deterministic -> ln(1)=0);
    # out-of-domain text sinks to OOV
    held = _docs(spark, [(1, "the cat sat"), (2, "purple monkey dishwasher")])
    out = {
        r["doc_id"]: r["lm_mean_logprob"]
        for r in ta.lm_perplexity(held, "text", table, order=2).collect()
    }
    assert out[1] == (-8.0 + math.log(0.5) + 0.0) / 3  # first token uni-OOV
    assert out[2] == (-8.0 + 2 * -8.5) / 3
    assert out[1] > out[2]


def test_ngram_counts_plan_two_shuffles(spark, sf_dir):
    import re

    from dbt_maxcompute_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = ta.ngram_counts(docs, "text", order=2, min_count=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "CartesianProduct" not in plan
    # groupBy(context, word) + window partitionBy(context): exactly
    # two hash exchanges; partial aggregation before the first
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    assert plan.count("documents.parquet") == 1


def test_lm_sharded_and_flat_paths_agree(spark, monkeypatch):
    # the crc32-sharded probe must be bit-identical through the FULL
    # backoff chain (bigram hit / backoff / OOV) to the flat map
    df = _docs(
        spark,
        [(i, f"tok{i % 400} tok{(i + 1) % 400} zz") for i in range(40)],
    )
    tbl = {f"tok{i}": -((i % 11) + 1) / 8.0 for i in range(400)}
    tbl.update({f"tok{i} tok{i + 1}": -0.25 for i in range(0, 400, 3)})
    sharded = {
        r["doc_id"]: r["lm_mean_logprob"]
        for r in ta.lm_perplexity(df, "text", tbl, order=2).collect()
    }
    monkeypatch.setattr(ta, "_shard_count", lambda n: 1)
    flat = {
        r["doc_id"]: r["lm_mean_logprob"]
        for r in ta.lm_perplexity(df, "text", tbl, order=2).collect()
    }
    assert sharded == flat


def test_lm_order_exceeds_doc_length(spark):
    # docs SHORTER than the model order: every token's context window
    # is clamped (i < d for the high orders), so scoring must fall
    # through the backoff chain without ever slicing at a non-positive
    # start (round-12 advisory: the clamp is structural, not an
    # evaluation-order accident)
    lp = {"a": -1.0, "a b": -0.5, "a b c": -0.25}
    df = _docs(spark, [(1, "a"), (2, "a b"), (3, "a b c")])
    out = {
        r["doc_id"]: r["lm_mean_logprob"]
        for r in ta.lm_perplexity(df, "text", lp, order=4).collect()
    }
    assert out[1] == -1.0  # i=0: no context possible, unigram hit
    # 'b' at i=1: attempts=min(1, 3)=1; bigram 'a b' hit, 0 backoffs
    assert out[2] == (-1.0 + -0.5) / 2
    # 'c' at i=2: attempts=2; trigram 'a b c' hit at d=2 -> 0 backoffs
    assert out[3] == (-1.0 + -0.5 + -0.25) / 3


def test_ngram_counts_order1_no_window_funnel(spark, sf_dir):
    # order=1 puts EVERY row in context '' — a window partitioned by
    # context would funnel the whole vocabulary through one task at
    # corpus scale (round-12 verdict). Pin the special case: scalar
    # aggregate + broadcast join, no Window operator in the plan.
    from dbt_maxcompute_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = ta.ngram_counts(docs, "text", order=1, min_count=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "EvalPython" not in plan
    # order>=2 keeps the per-context window (bounded partitions)
    plan2 = ta.ngram_counts(docs, "text", order=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" in plan2
