"""Streaming foreachBatch -> DML planner integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_maxcompute_spark.catalog import EngineCatalog
from dbt_maxcompute_spark.sources.registry import load_table, table_path
from dbt_maxcompute_spark.streaming import windows as sw
from dbt_maxcompute_spark.streaming.foreach_batch import stream_into_table


@pytest.fixture()
def cat(spark, tmp_path):
    return EngineCatalog(spark, str(tmp_path / "wh"))


def _events_stream(spark, sf_dir, tmp_path):
    d = tmp_path / "ev_src"
    d.mkdir()
    (d / "events.parquet").symlink_to(table_path(sf_dir, "events"))
    return sw.read_events_stream(spark, str(d))


def test_stream_merge_into_table(spark, sf_dir, tmp_path, cat):
    ev = load_table(spark, sf_dir, "events")
    # pre-seed with stale rows for half the ids: the stream must upsert
    stale = ev.filter(F.col("event_id") % 2 == 0).withColumn("value", F.lit(-1.0))
    cat.create_table("ev_tgt", stale)
    q = stream_into_table(
        _events_stream(spark, sf_dir, tmp_path),
        cat,
        "ev_tgt",
        strategy="merge",
        unique_key="event_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got = cat.read("ev_tgt")
    assert got.count() == ev.count()
    assert got.filter(F.col("value") == -1.0).count() == 0  # all refreshed


def test_stream_append_into_table(spark, sf_dir, tmp_path, cat):
    ev = load_table(spark, sf_dir, "events")
    cat.create_table("ev_app", ev.limit(0))
    q = stream_into_table(
        _events_stream(spark, sf_dir, tmp_path),
        cat,
        "ev_app",
        strategy="append",
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q.awaitTermination()
    assert cat.read("ev_app").count() == ev.count()


def test_stream_merge_requires_key(spark, sf_dir, tmp_path, cat):
    with pytest.raises(ValueError, match="unique_key"):
        stream_into_table(
            _events_stream(spark, sf_dir, tmp_path), cat, "x", strategy="merge"
        )


def test_stream_upsert_txn_exactly_once(spark, sf_dir, tmp_path):
    """Streaming DV upsert with replay protection: run the same
    bounded stream TWICE with the checkpoint deleted in between (the
    worst-case at-least-once replay). The second run's batches find
    their ids in the ledger and commit NOTHING — version history and
    data both replay-clean."""
    import shutil

    from dbt_maxcompute_spark.streaming.foreach_batch import stream_upsert_txn_table
    from dbt_maxcompute_spark.txnlog import TxnTable

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    t = TxnTable(spark, str(tmp_path / "txn_upsert"))
    # pre-seed with stale values for half the ids
    t.create(
        ev.filter(F.col("event_id") % 2 == 0).withColumn("value", F.lit(-1.0))
    )

    def run_once(tag):
        d = tmp_path / f"src_{tag}"
        d.mkdir()
        (d / "events.parquet").symlink_to(table_path(sf_dir, "events"))
        stream = sw.read_events_stream(spark, str(d)).select(
            "event_id", "event_type", "value"
        )
        q = stream_upsert_txn_table(
            stream, t, ["event_id"], app_id="upsert_stream",
            checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
        )
        q.awaitTermination()

    run_once("a")
    v_after_first = t.latest_version()
    got = t.read()
    assert got.count() == ev.count()
    assert got.filter(F.col("value") == -1.0).count() == 0  # all refreshed

    # full replay: fresh checkpoint, same app id, same batch ids
    run_once("b")
    assert t.latest_version() == v_after_first  # ZERO new commits
    assert t.read().count() == ev.count()


def test_stream_upsert_seq_col_orders_by_event_not_layout(spark, tmp_path):
    """Round-5 advisor finding: within-batch 'last wins' must follow an
    EXPLICIT sequence column, not physical row position. The batch file
    is written so the physically-last row carries a STALE seq — id
    order and event order disagree."""
    from dbt_maxcompute_spark.streaming.foreach_batch import stream_upsert_txn_table
    from dbt_maxcompute_spark.txnlog import TxnTable

    src = spark.createDataFrame(
        [(1, 3, "newest"), (2, 1, "only"), (1, 1, "oldest"), (1, 2, "mid")],
        "id long, seq long, payload string",
    ).coalesce(1)
    d = tmp_path / "seq_src"
    d.mkdir()
    src.write.parquet(str(d / "b0.parquet"))
    t = TxnTable(spark, str(tmp_path / "t_seq"))
    t.create(
        spark.createDataFrame([(1, 0, "seed"), (9, 0, "seed")], src.schema)
    )
    stream = spark.readStream.schema(src.schema).parquet(str(d) + "/*")
    q = stream_upsert_txn_table(
        stream, t, ["id"], app_id="seq_app", seq_col="seq",
        checkpoint_dir=str(tmp_path / "ck_seq"),
    )
    q.awaitTermination()
    rows = {r.id: (r.seq, r.payload) for r in t.read().collect()}
    assert rows[1] == (3, "newest")     # highest seq wins, not last row
    assert rows[2] == (1, "only")
    assert rows[9] == (0, "seed")


def test_stream_upsert_duplicate_keys_without_seq_col_raises(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from dbt_maxcompute_spark.streaming.foreach_batch import stream_upsert_txn_table
    from dbt_maxcompute_spark.txnlog import TxnTable

    src = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b")], "id long, seq long, payload string"
    ).coalesce(1)
    d = tmp_path / "dup_src"
    d.mkdir()
    src.write.parquet(str(d / "b0.parquet"))
    t = TxnTable(spark, str(tmp_path / "t_dup"))
    t.create(src.limit(0))
    stream = spark.readStream.schema(src.schema).parquet(str(d) + "/*")
    q = stream_upsert_txn_table(
        stream, t, ["id"], app_id="dup_app",
        checkpoint_dir=str(tmp_path / "ck_dup"),
    )
    with pytest.raises(StreamingQueryException, match="seq_col"):
        q.awaitTermination()
