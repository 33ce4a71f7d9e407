"""Stateful streaming: native session_window vs the lag-based batch
sessionization, applyInPandasWithState running totals vs batch agg,
and a model-runner concurrency check (reference test_concurrency.py)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from dbt_maxcompute_spark.catalog import EngineCatalog
from dbt_maxcompute_spark.sources.registry import load_table, table_path
from dbt_maxcompute_spark.streaming import stateful, windows as sw
from dbt_maxcompute_spark.suite import events_suite


def test_session_window_matches_lag_based_sessionize(spark, sf_dir):
    """Two independent formulations of 30-min-gap sessions must agree:
    the suite's lag+cumsum and Spark's native session_window."""
    ours = events_suite.q_events_sessionize(spark, sf_dir)
    native = stateful.sessionize(load_table(spark, sf_dir, "events"))
    a = {
        (r.user_id, r.session_start, r.n_events, r.session_value)
        for r in ours.collect()
    }
    # session_window's end = last_ts + gap; compare on start/count/value
    b = {
        (r.user_id, r.session_start, r.n_events, r.session_value)
        for r in native.collect()
    }
    assert a == b


def test_running_totals_stateful_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r.user_id): (r.n, round(r.total, 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    stream_dir = tmp_path / "ev"
    stream_dir.mkdir()
    (stream_dir / "events.parquet").symlink_to(table_path(sf_dir, "events"))
    stream = sw.read_events_stream(spark, str(stream_dir), max_files_per_trigger=1)
    q = (
        stateful.user_running_totals(stream)
        .writeStream.format("memory")
        .queryName("t_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # single input file -> one micro-batch -> last update is the total
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in spark.table("t_totals").collect()
    }
    assert got == want


def test_concurrent_materializations_one_session(spark, sf_dir, tmp_path):
    """dbt runs models on a thread pool against one warehouse
    (reference tests/functional/adapter/test_concurrency.py); the
    engine must be thread-safe over one SparkSession."""
    cat = EngineCatalog(spark, str(tmp_path / "wh"))
    nation = load_table(spark, sf_dir, "nation")

    def build(i: int) -> int:
        cat.create_table(f"t_{i}", nation.filter(F.col("n_nationkey") % 4 == i % 4))
        return cat.read(f"t_{i}").count()

    with ThreadPoolExecutor(max_workers=8) as ex:
        counts = list(ex.map(build, range(8)))
    assert sum(counts[:4]) == nation.count()
    assert counts[:4] == counts[4:]  # same filters -> same counts


def test_dedup_stream_drops_replayed_file(spark, sf_dir, tmp_path):
    """At-least-once delivery simulated by listing the SAME events file
    twice: two micro-batches, every event delivered twice. The
    watermark-scoped dedup must emit each event_id exactly once."""
    stream_dir = tmp_path / "dup"
    stream_dir.mkdir()
    (stream_dir / "a.parquet").symlink_to(table_path(sf_dir, "events"))
    (stream_dir / "b.parquet").symlink_to(table_path(sf_dir, "events"))
    stream = sw.read_events_stream(spark, str(stream_dir), max_files_per_trigger=1)
    q = (
        stateful.dedup_stream(stream, keys=("event_id",), watermark="365 days")
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_dedup")
    n_events = load_table(spark, sf_dir, "events").count()
    assert got.count() == n_events
    assert got.select("event_id").distinct().count() == n_events


def test_state_partition_scope_sets_and_restores(spark, monkeypatch):
    """The streaming drain scopes spark.sql.shuffle.partitions to the
    stream default (state-store count per trigger) and restores the
    session value afterwards — including on error."""
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)

    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", "5")
    with sw.state_partition_scope(spark):
        assert spark.conf.get(key) == "5"
    assert spark.conf.get(key) == before

    # inherit / empty keep the session value untouched
    for v in ("inherit", "", "0"):
        monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", v)
        with sw.state_partition_scope(spark):
            assert spark.conf.get(key) == before

    # restored even when the drain raises
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", "5")
    try:
        with sw.state_partition_scope(spark):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(key) == before


def test_stateful_results_invariant_to_state_partitions(spark, sf_dir, tmp_path, monkeypatch):
    """State partitioning is an execution detail: the drained result of
    a stateful agg must be identical under 2 partitions and under the
    session (batch) value."""
    stream_dir = tmp_path / "spart"
    stream_dir.mkdir()
    (stream_dir / "events.parquet").symlink_to(table_path(sf_dir, "events"))
    got = {}
    for tag, parts in (("narrow", "2"), ("inherit", "inherit")):
        monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", parts)
        name = f"t_spart_{tag}"
        stream = sw.read_events_stream(spark, str(stream_dir), max_files_per_trigger=4)
        agg = sw.tumbling_hourly(stream)
        sw.run_available_now(agg, name)
        got[tag] = {
            (r.hour_start, r.event_type, r.n_events, round(r.total_value, 6))
            for r in spark.table(name).collect()
        }
    assert got["narrow"] == got["inherit"]

def test_stream_shuffle_partitions_derived_and_validated(spark, monkeypatch):
    """Round-14: the streaming shuffle default derives from the session
    (defaultParallelism/4 clamped to [4, 64]) instead of a box-tuned
    literal; a malformed env override raises a clear error naming the
    variable instead of an opaque planning failure mid-stream."""
    monkeypatch.delenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", raising=False)
    par = spark.sparkContext.defaultParallelism
    assert sw._stream_shuffle_partitions(spark) == max(4, min(64, par // 4))

    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", "auto")
    assert sw._stream_shuffle_partitions(spark) == max(4, min(64, par // 4))

    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", "12")
    assert sw._stream_shuffle_partitions(spark) == 12

    for v in ("", "0", "inherit", "-3"):
        monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", v)
        assert sw._stream_shuffle_partitions(spark) is None

    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", "eight")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS"):
        sw._stream_shuffle_partitions(spark)


def test_state_partition_scope_serializes_concurrent_scopes(spark, monkeypatch):
    """Two overlapping scopes must not interleave set/restore (round-13
    ADVICE item 1): the module lock serializes them, so the session
    value is intact after any concurrent pattern."""
    import threading

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", "5")

    inner_values = []

    def drain():
        with sw.state_partition_scope(spark):
            inner_values.append(spark.conf.get(key))

    threads = [threading.Thread(target=drain) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert inner_values == ["5"] * 4
    assert spark.conf.get(key) == before


def test_late_data_drop_trigger_count_pinned(spark, sf_dir):
    """The late-data row's 4 staged files + the availableNow no-data
    finality batch are its SEMANTICS (watermark commit boundaries) —
    round-14 pins the trigger count so no optimization can quietly
    collapse micro-batches (round-13 verdict item 1)."""
    import json

    from pyspark.sql.streaming import StreamingQueryListener

    from dbt_maxcompute_spark.suite.events_suite import q_stream_late_data_drop

    batches = []

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802
            pass

        def onQueryProgress(self, event):  # noqa: N802
            batches.append(json.loads(event.progress.json).get("batchId"))

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    listener = _L()
    spark.streams.addListener(listener)
    try:
        out = q_stream_late_data_drop(spark, sf_dir)
        assert out.count() > 0
        # listener delivery is ASYNC (an event bus) — the finality
        # batch's progress event can land after the drain returns
        import time

        t0 = time.time()
        while len(batches) < 5 and time.time() - t0 < 30:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    # 4 data batches (one per staged file under maxFilesPerTrigger=1)
    # + 1 no-data finality batch that commits the sentinel watermark
    assert sorted(batches) == [0, 1, 2, 3, 4]
