"""Events suite vs DuckDB oracle + Structured Streaming equivalence."""

from __future__ import annotations

import pytest

from dbt_maxcompute_spark.sources.registry import table_path
from dbt_maxcompute_spark.streaming import windows as sw
from dbt_maxcompute_spark.suite import events_suite
from tests.oracle import compare_to_oracle


@pytest.mark.parametrize("name", sorted(events_suite.ORACLES))
def test_events_query_matches_oracle(spark, sf_dir, name):
    df = events_suite.QUERIES[name](spark, sf_dir)
    compare_to_oracle(df, events_suite.ORACLES[name], sf_dir)


def test_streaming_tumbling_matches_batch(spark, sf_dir, tmp_path):
    """The streaming plan over AvailableNow must equal the batch plan —
    one definition, two execution modes."""
    batch = {
        (r.hour_start, r.event_type): (r.n_events, r.total_value)
        for r in events_suite.q_events_tumbling_hourly(spark, sf_dir).collect()
    }
    # the file stream source wants a directory; link the fixture in
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    (stream_dir / "events.parquet").symlink_to(table_path(sf_dir, "events"))
    stream = sw.read_events_stream(spark, str(stream_dir))
    sw.run_available_now(sw.tumbling_hourly(stream), "t_tumbling")
    got = {
        (r.hour_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("t_tumbling").collect()
    }
    assert got == batch
