"""SCD2 snapshot tests — timestamp + check strategies,
invalidate_hard_deletes, column expansion (reference snapshot.sql,
test_basic.py:73-88, test_simple_snapshot.py)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from dbt_maxcompute_spark.catalog import EngineCatalog
from dbt_maxcompute_spark.materializations.snapshot import run_snapshot

T0 = datetime.datetime(2025, 1, 1, 0, 0, 0)
T1 = datetime.datetime(2025, 1, 2, 0, 0, 0)
T2 = datetime.datetime(2025, 1, 3, 0, 0, 0)


@pytest.fixture()
def catalog(spark, tmp_path):
    return EngineCatalog(spark, str(tmp_path / "wh"))


def df_of(spark, rows):
    return spark.createDataFrame(rows, "id bigint, status string, updated_at timestamp")


def test_timestamp_strategy_versions(spark, catalog):
    src1 = df_of(spark, [(1, "new", T0), (2, "new", T0)])
    assert run_snapshot(catalog, "snap", src1, "id", "timestamp", "updated_at") == "create"

    # id=1 changes at T1; id=2 unchanged
    src2 = df_of(spark, [(1, "paid", T1), (2, "new", T0)])
    run_snapshot(catalog, "snap", src2, "id", "timestamp", "updated_at")

    snap = catalog.read("snap")
    assert snap.count() == 3
    v1 = snap.filter((F.col("id") == 1) & F.col("dbt_valid_to").isNotNull()).first()
    assert v1["status"] == "new" and v1["dbt_valid_to"] == T1
    open1 = snap.filter((F.col("id") == 1) & F.col("dbt_valid_to").isNull()).first()
    assert open1["status"] == "paid" and open1["dbt_valid_from"] == T1
    # unchanged row: still exactly one open version
    assert snap.filter(F.col("id") == 2).count() == 1


def test_timestamp_strategy_idempotent(spark, catalog):
    src = df_of(spark, [(1, "new", T0)])
    run_snapshot(catalog, "snap2", src, "id", "timestamp", "updated_at")
    run_snapshot(catalog, "snap2", src, "id", "timestamp", "updated_at")
    assert catalog.read("snap2").count() == 1


def test_check_strategy(spark, catalog):
    src1 = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, val string")
    run_snapshot(catalog, "snapc", src1, "id", "check", check_cols=["val"], snapshot_ts=T0)
    src2 = spark.createDataFrame([(1, "CHANGED"), (2, "b")], "id bigint, val string")
    run_snapshot(catalog, "snapc", src2, "id", "check", check_cols=["val"], snapshot_ts=T1)
    snap = catalog.read("snapc")
    assert snap.count() == 3
    closed = snap.filter(F.col("dbt_valid_to").isNotNull()).first()
    assert closed["id"] == 1 and closed["val"] == "a" and closed["dbt_valid_to"] == T1


def test_invalidate_hard_deletes(spark, catalog):
    src1 = df_of(spark, [(1, "new", T0), (2, "new", T0)])
    run_snapshot(catalog, "snapd", src1, "id", "timestamp", "updated_at",
                 invalidate_hard_deletes=True, snapshot_ts=T1)
    src2 = df_of(spark, [(1, "new", T0)])  # id=2 hard-deleted
    run_snapshot(catalog, "snapd", src2, "id", "timestamp", "updated_at",
                 invalidate_hard_deletes=True, snapshot_ts=T2)
    snap = catalog.read("snapd")
    gone = snap.filter(F.col("id") == 2).first()
    assert gone["dbt_valid_to"] == T2
    assert snap.filter(F.col("id") == 1).first()["dbt_valid_to"] is None


def test_column_expansion(spark, catalog):
    src1 = df_of(spark, [(1, "new", T0)])
    run_snapshot(catalog, "snape", src1, "id", "timestamp", "updated_at")
    src2 = spark.createDataFrame(
        [(1, "paid", T1, "web")], "id bigint, status string, updated_at timestamp, channel string"
    )
    run_snapshot(catalog, "snape", src2, "id", "timestamp", "updated_at")
    snap = catalog.read("snape")
    assert "channel" in snap.columns
    old = snap.filter(F.col("dbt_valid_to").isNotNull()).first()
    assert old["channel"] is None
    new = snap.filter(F.col("dbt_valid_to").isNull()).first()
    assert new["channel"] == "web"


def test_snapshot_target_is_transactional(spark, catalog):
    run_snapshot(catalog, "snapt", df_of(spark, [(1, "x", T0)]), "id", "timestamp", "updated_at")
    meta = catalog.meta("snapt")
    assert meta.transactional and meta.primary_keys == ["dbt_scd_id"]


def test_unknown_strategy(spark, catalog):
    with pytest.raises(ValueError, match="strategy"):
        run_snapshot(catalog, "x", df_of(spark, [(1, "x", T0)]), "id", "bogus")
