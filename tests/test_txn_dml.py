"""transactional=true behind the ONE catalog/DML interface: creates,
merges, appends, truncate, compact route through the transaction log
(SURVEY §4.3 "both paths behind one interface"; reference
create.sql:2-4,44-49 — transactional + primary key ⇒ ACID upsert)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_maxcompute_spark.catalog import EngineCatalog
from dbt_maxcompute_spark.materializations.incremental import run_incremental
from dbt_maxcompute_spark.plans import dml
from dbt_maxcompute_spark.txnlog import TxnTable


@pytest.fixture()
def cat(spark, tmp_path):
    return EngineCatalog(spark, str(tmp_path / "wh"))


def _r(spark, lo, hi, mult=2):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * mult).alias("v")
    )


def test_create_transactional_routes_through_log(spark, cat):
    cat.create_table("t", _r(spark, 0, 50), transactional=True, primary_keys=["id"])
    assert cat.meta("t").transactional
    t = cat.txn("t")
    assert t.latest_version() == 0
    assert cat.read("t").count() == 50


def test_transactional_requires_pk_and_rejects_partitions(spark, cat):
    # transactional WITHOUT primary_keys is legal (reference create.sql
    # emits transactional=true alone for non-delta ACID tables); only
    # the partition_by combination is rejected
    meta = cat.create_table("t0", _r(spark, 0, 5), transactional=True)
    assert meta.transactional and meta.primary_keys == []
    assert cat.read("t0").count() == 5
    with pytest.raises(ValueError, match="partition_by"):
        cat.create_table(
            "t", _r(spark, 0, 5), transactional=True,
            primary_keys=["id"], partition_by=["v"],
        )


def test_merge_commits_one_version_and_time_travels(spark, cat):
    run_incremental(
        cat, "t", _r(spark, 0, 100), strategy="merge", unique_key="id",
        transactional=True, primary_keys=["id"],
    )
    run_incremental(
        cat, "t", _r(spark, 50, 150, mult=3), strategy="merge", unique_key="id"
    )
    hist = cat.txn("t").history()
    assert [h["version"] for h in hist] == [0, 1]  # one commit per merge
    assert cat.read("t").count() == 150
    # matched rows updated, unmatched kept
    got = {r.id: r.v for r in cat.read("t").collect()}
    assert got[10] == 20 and got[60] == 180 and got[149] == 447
    # pre-merge state readable via the same interface
    assert cat.read("t", version=0).count() == 100
    assert {r.v for r in cat.read("t", version=0).filter("id = 60").collect()} == {120}


def test_append_strategy_commits(spark, cat):
    run_incremental(
        cat, "t", _r(spark, 0, 10), strategy="append",
        transactional=True, primary_keys=["id"],
    )
    run_incremental(cat, "t", _r(spark, 10, 30), strategy="append")
    assert [h["version"] for h in cat.txn("t").history()] == [0, 1]
    assert cat.read("t").count() == 30


def test_delete_insert_commits_one_version(spark, cat):
    run_incremental(
        cat, "t", _r(spark, 0, 40), strategy="delete+insert", unique_key="id",
        transactional=True, primary_keys=["id"],
    )
    run_incremental(
        cat, "t", _r(spark, 20, 60, mult=5), strategy="delete+insert", unique_key="id"
    )
    assert [h["version"] for h in cat.txn("t").history()] == [0, 1]
    got = {r.id: r.v for r in cat.read("t").collect()}
    assert len(got) == 60 and got[5] == 10 and got[25] == 125


def test_merge_retry_recomputes_after_conflict(spark, cat, monkeypatch):
    """The optimistic-concurrency loop: a commit that interleaves
    between the merge's snapshot read and its commit forces a
    CommitConflict; the retry must RECOMPUTE from the new snapshot so
    the interleaved rows survive (lost-update prevention), and the race
    costs exactly one extra version."""
    cat.create_table(
        "t", _r(spark, 0, 50), transactional=True, primary_keys=["id"]
    )
    competitor = _r(spark, 1000, 1010)

    orig = TxnTable.overwrite_from
    fired = {"n": 0}

    def racy(self, base_version, df):
        if fired["n"] == 0:
            fired["n"] += 1
            # another writer lands a commit first
            TxnTable(spark, self.path).append(competitor)
        return orig(self, base_version, df)

    monkeypatch.setattr(TxnTable, "overwrite_from", racy)
    dml.merge(cat, "t", _r(spark, 25, 75, mult=7), unique_key="id")

    hist = [h["version"] for h in cat.txn("t").history()]
    assert hist == [0, 1, 2]  # create, competitor append, merged commit
    got = {r.id: r.v for r in cat.read("t").collect()}
    # competitor's rows survived the merge that raced them
    assert all(got[i] == 2 * i for i in range(1000, 1010))
    # merge applied on top: matched updated, source-only inserted
    assert got[30] == 210 and got[74] == 518 and got[5] == 10
    assert len(got) == 85


def test_merge_conflict_exhaustion_raises(spark, cat, monkeypatch):
    from dbt_maxcompute_spark.txnlog import CommitConflict

    cat.create_table(
        "t", _r(spark, 0, 10), transactional=True, primary_keys=["id"]
    )

    def always_conflict(self, base_version, df):
        raise CommitConflict("forced")

    monkeypatch.setattr(TxnTable, "overwrite_from", always_conflict)
    with pytest.raises(CommitConflict):
        dml.merge(cat, "t", _r(spark, 0, 5), unique_key="id")


def test_truncate_is_a_commit_history_survives(spark, cat):
    cat.create_table("t", _r(spark, 0, 30), transactional=True, primary_keys=["id"])
    cat.truncate("t")
    assert cat.read("t").count() == 0
    assert cat.read("t", version=0).count() == 30
    assert [h["version"] for h in cat.txn("t").history()] == [0, 1]


def test_compact_transactional_commits_not_rewrites(spark, cat):
    cat.create_table("t", _r(spark, 0, 20), transactional=True, primary_keys=["id"])
    for i in range(1, 4):
        dml.append(cat, "t", _r(spark, 20 * i, 20 * i + 20))
    stats = cat.compact("t", target_file_bytes=1 << 30)
    assert stats["files_after"] == 1
    assert stats["files_before"] > 1
    assert cat.read("t").count() == 80
    # compaction is itself a versioned commit — history intact
    assert cat.read("t", version=0).count() == 20


def test_catalog_sql_sees_snapshot_not_dead_files(spark, cat):
    cat.create_table("t", _r(spark, 0, 40), transactional=True, primary_keys=["id"])
    dml.merge(cat, "t", _r(spark, 0, 40, mult=9), unique_key="id")
    # the overwrite left v0's files on disk (pre-vacuum); SQL over the
    # catalog must read the SNAPSHOT, not the directory
    n = cat.sql("SELECT count(*) AS n FROM t").collect()[0]["n"]
    assert n == 40
    v = cat.sql("SELECT v FROM t WHERE id = 3").collect()[0]["v"]
    assert v == 27


def test_non_transactional_read_rejects_version(spark, cat):
    cat.create_table("p", _r(spark, 0, 5))
    with pytest.raises(ValueError, match="transactional"):
        cat.read("p", version=0)


def test_delete_insert_routes_through_deletion_vectors(spark, cat):
    # no incremental_predicates -> the row-level DV fast path: the
    # upsert commit rewrites ZERO data files (set_dv + adds only) and
    # duplicate source keys are inserted verbatim (delete+insert
    # semantics, unlike merge)
    run_incremental(
        cat, "t", _r(spark, 0, 40), strategy="delete+insert", unique_key="id",
        transactional=True, primary_keys=["id"],
    )
    t = cat.txn("t")
    files_before = set(t.snapshot().files)
    dup_src = spark.createDataFrame(
        [(10, 111), (10, 222), (50, 500)], "id bigint, v bigint"
    )
    dml.delete_insert(cat, "t", dup_src, unique_key="id")
    # every pre-existing file survived; the delete landed as a vector
    assert files_before <= set(t.snapshot().files)
    assert t.history()[-1]["n_remove"] == 0
    assert t.snapshot().dv_file is not None
    rows = sorted((r.id, r.v) for r in cat.read("t").collect())
    assert (10, 111) in rows and (10, 222) in rows and (50, 500) in rows
    assert sum(1 for r in rows if r[0] == 10) == 2  # both duplicates inserted
    assert len(rows) == 42  # 40 original - 1 deleted (id=10) + 3 source rows
