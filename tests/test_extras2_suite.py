"""Extras2 suite vs DuckDB oracles at sf0.001, plus unit tests for the
quota-cap and next-event-examples operators on crafted frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators import sampling, training
from dbt_maxcompute_spark.suite import extras2_suite
from tests.oracle import compare_to_oracle


@pytest.mark.parametrize("name", sorted(extras2_suite.ORACLES))
def test_extras2_query_matches_oracle(spark, sf_dir, name):
    df = extras2_suite.QUERIES[name](spark, sf_dir)
    compare_to_oracle(df, extras2_suite.ORACLES[name], sf_dir)


def test_quota_cap_keeps_cap_rows_per_group(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 8 else "b") for i in range(10)], "id long, grp string"
    )
    out = sampling.quota_cap(df, ["grp"], "id", cap=3)
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"a": 3, "b": 2}  # b has only 2 rows, under the cap
    # deterministic: same keep set on re-run
    again = sampling.quota_cap(df, ["grp"], "id", cap=3)
    assert sorted(r["id"] for r in out.collect()) == sorted(r["id"] for r in again.collect())


def test_quota_cap_rejects_bad_cap(spark):
    df = spark.createDataFrame([(1, "a")], "id long, grp string")
    with pytest.raises(ValueError):
        sampling.quota_cap(df, ["grp"], "id", cap=0)


def test_next_event_examples_crafted(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    df = spark.createDataFrame(
        [
            (1, 10, ts(0), "view"),
            (2, 10, ts(1), "click"),
            (3, 10, ts(2), "purchase"),
            (4, 10, ts(3), "view"),
            (5, 20, ts(0), "view"),  # only 1 event: no complete context
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    out = {
        r["event_id"]: r
        for r in training.next_event_examples(
            df, "user_id", "ts", "event_type", "event_id", context=2
        ).collect()
    }
    assert set(out) == {3, 4}
    assert out[3]["context"] == ["view", "click"] and out[3]["label"] == "purchase"
    assert out[4]["context"] == ["click", "purchase"] and out[4]["label"] == "view"


def test_next_event_examples_rejects_bad_context(spark):
    df = spark.createDataFrame([(1, 1, None, "x")], "event_id long, user_id long, ts timestamp, event_type string")
    with pytest.raises(ValueError):
        training.next_event_examples(df, "user_id", "ts", "event_type", "event_id", context=0)
