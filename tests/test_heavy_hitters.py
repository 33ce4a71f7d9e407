"""Unit pins for the two-pass exact heavy hitters
(operators/sketches.heavy_hitters): result == plain groupBy/HAVING,
the pigeonhole no-false-negative guarantee under adversarial
partitioning, and edge cases."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators import sketches


def _exact(df, col, min_support):
    n = df.count()
    thr = max(1, math.ceil(min_support * n))
    return {
        (r[col], r["cnt"])
        for r in df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= thr)
        .collect()
    }


def test_matches_exact_on_events(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        (r["user_id"], r["cnt"])
        for r in sketches.heavy_hitters(ev, "user_id", min_support=0.002).collect()
    }
    assert got == _exact(ev, "user_id", 0.002)
    assert got  # non-trivial at sf0.001


def test_borderline_value_survives_scatter(spark):
    """A value exactly AT the global threshold, scattered uniformly so
    no partition sees it concentrated: the pigeonhole argument says at
    least one partition must still find it locally frequent — no false
    negatives, ever."""
    n, copies = 10_000, 100  # support 1% == min_support exactly
    df = (
        spark.range(n)
        .select(
            F.when(F.col("id") % (n // copies) == 0, F.lit(7))
            .otherwise(F.col("id") + 1000)  # all other values unique
            .alias("v")
        )
        .repartition(32)  # scatter: ~3 copies per partition
    )
    got = {r["v"]: r["cnt"] for r in sketches.heavy_hitters(df, "v", 0.01).collect()}
    assert got == {7: copies}


def test_empty_input(spark):
    df = spark.createDataFrame([], "v bigint")
    out = sketches.heavy_hitters(df, "v", 0.01)
    assert out.columns == ["v", "cnt", "support"]
    assert out.count() == 0


def test_nulls_are_not_hitters(spark):
    df = spark.createDataFrame([(None,)] * 50 + [(1,)] * 50, "v int")
    got = {r["v"] for r in sketches.heavy_hitters(df, "v", 0.2).collect()}
    assert got == {1}  # NULL never reported (value_counts dropna)
