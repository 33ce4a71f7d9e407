"""Salted join/aggregate: exactness vs the unsalted plan, and the plan
property the salt exists for — the shuffle key includes the salt."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators import skew
from tests.test_plan_quality import plan_of


def test_salted_aggregate_matches_plain(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") * 2).alias("v")
    )
    got = {
        r.k: (r.s, r.n, r.mn, r.mx)
        for r in skew.salted_aggregate(
            df, ["k"],
            [("v", "sum", "s"), ("v", "count", "n"), ("v", "min", "mn"), ("v", "max", "mx")],
            salt=8, salt_on="v",
        ).collect()
    }
    want = {
        r.k: (r.s, r.n, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == want


def test_salted_join_matches_plain(spark):
    left = spark.range(5_000).select((F.col("id") % 4).alias("k"), F.col("id").alias("v"))
    right = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k long, lbl string")
    got = sorted(
        (r.k, r.v, r.lbl)
        for r in skew.salted_join(left, right, "k", salt=8, salt_on="v").collect()
    )
    want = sorted((r.k, r.v, r.lbl) for r in left.join(right, "k").collect())
    assert got == want


def test_salted_join_shuffle_key_includes_salt(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = spark.range(1000).select((F.col("id") % 2).alias("k"), F.col("id").alias("v"))
        right = spark.createDataFrame([(0, "a"), (1, "b")], "k long, lbl string")
        plan = plan_of(spark, skew.salted_join(left, right, "k", salt=8, salt_on="v"))
        # every exchange that partitions on the join key also carries
        # the salt: no single reducer owns a hot key
        parts = [ln for ln in plan.splitlines() if "hashpartitioning" in ln and "k#" in ln]
        assert parts, "expected hash exchanges on the join key"
        assert all("__salt" in ln for ln in parts), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_aggregate_count_skips_nulls_like_sql(spark):
    """COUNT(col) excludes nulls; COUNT(*) keeps them — both must match
    the unsalted plan exactly (advisor round-4 finding)."""
    df = spark.createDataFrame(
        [(0, 1), (0, None), (0, 3), (1, None), (1, None)], "k long, v long"
    )
    got = {
        r.k: (r.n_v, r.n_star)
        for r in skew.salted_aggregate(
            df, ["k"],
            [("v", "count", "n_v"), ("*", "count", "n_star")],
            salt=4, salt_on="k",
        ).collect()
    }
    assert got == {0: (2, 3), 1: (0, 2)}
