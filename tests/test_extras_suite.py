"""Extras suite vs DuckDB oracles at sf0.001 (as-of + range joins),
plus temporal-operator unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators import temporal
from dbt_maxcompute_spark.suite import extras_suite
from tests.oracle import compare_to_oracle


@pytest.mark.parametrize("name", sorted(extras_suite.ORACLES))
def test_extras_query_matches_oracle(spark, sf_dir, name):
    df = extras_suite.QUERIES[name](spark, sf_dir)
    compare_to_oracle(df, extras_suite.ORACLES[name], sf_dir)


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_asof_join_crafted(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:10:00")), (2, 10, _ts("2024-01-01 00:00:30")),
         (3, 20, _ts("2024-01-01 00:05:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts("2024-01-01 00:01:00"), 5.0),
         (101, 10, _ts("2024-01-01 00:09:00"), 7.0),
         (102, 30, _ts("2024-01-01 00:00:00"), 9.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r
        for r in temporal.asof_join(
            left, right, "user_id", "ts", "ts", ["value"], "event_id"
        ).collect()
    }
    assert out[1]["asof_event_id"] == 101 and out[1]["asof_value"] == 7.0
    assert out[2]["asof_event_id"] is None  # no purchase before 00:00:30
    assert out[3]["asof_event_id"] is None  # user 20 has no right rows


def test_asof_join_inclusive_and_tiebreak(spark):
    t = _ts("2024-01-01 00:05:00")
    left = spark.createDataFrame([(1, 10, t)], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(100, 10, t, 1.0), (101, 10, t, 2.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    row = temporal.asof_join(left, right, "user_id", "ts", "ts", ["value"], "event_id").collect()[0]
    # inclusive <=, equal-ts ties resolve to the greatest tiebreak id
    assert row["asof_event_id"] == 101 and row["asof_value"] == 2.0


def test_range_join_binned_matches_naive(spark, sf_dir):
    from dbt_maxcompute_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    binned = temporal.range_join_binned(
        errors, clicks, "user_id", "ts", "click_ts", -300.0, 0.0
    )
    naive = errors.alias("e").join(
        clicks.alias("c"),
        (F.col("e.user_id") == F.col("c.user_id"))
        & (F.col("c.click_ts") >= F.col("e.ts") - F.expr("INTERVAL 300 SECOND"))
        & (F.col("c.click_ts") < F.col("e.ts")),
    )
    got = sorted((r["event_id"], r["click_ts"]) for r in binned.collect())
    want = sorted((r["event_id"], r["click_ts"]) for r in naive.collect())
    assert got == want


def test_range_join_no_cartesian_no_range_condition(spark, sf_dir):
    # the binned formulation must plan a plain hash equi-join: no
    # BroadcastNestedLoop, no CartesianProduct
    from dbt_maxcompute_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    df = temporal.range_join_binned(errors, clicks, "user_id", "ts", "click_ts", -300.0, 0.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_mergeable_sketches_union_equals_direct_estimate(spark):
    # unioning per-segment sketches must estimate the same cardinality
    # class as sketching the whole set directly — and exactly-known
    # small sets are estimated exactly by DataSketches HLL
    from pyspark.sql import functions as F

    from dbt_maxcompute_spark.operators import sketches

    df = spark.range(3000).selectExpr(
        "'g' AS g", "id % 3 AS seg", "id % 500 AS v"
    )
    stored = sketches.mergeable_distinct_sketches(df, ["g"], "seg", "v")
    assert stored.count() == 3  # one sketch per segment
    merged = sketches.merge_distinct_sketches(stored, ["g"]).collect()[0]
    assert merged["n_segments"] == 3 and merged["n_rows"] == 3000
    # 500 distinct values: HLL at default lgk is exact in sparse mode
    assert abs(merged["approx_distinct"] - 500) <= 15
