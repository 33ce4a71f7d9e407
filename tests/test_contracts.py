"""Model-contract regressions — the reference's
tests/functional/adapter/test_constraints.py shapes: columns-equivalent
compile check, not_null ENFORCED with rollback, NOT_SUPPORTED constraint
types downgraded to warnings (impl.py:69-75 CONSTRAINT_SUPPORT)."""

from __future__ import annotations

import pytest

from dbt_maxcompute_spark import contracts
from dbt_maxcompute_spark.catalog import EngineCatalog
from dbt_maxcompute_spark.materializations.incremental import run_incremental
from dbt_maxcompute_spark.runner import run_model


@pytest.fixture()
def catalog(spark, tmp_path):
    return EngineCatalog(spark, str(tmp_path / "wh"))


def _df(spark, rows=((1, "a"), (2, "b"))):
    return spark.createDataFrame(list(rows), "id bigint, name string")


CONTRACT = {
    "enforced": True,
    "columns": [
        {"name": "id", "data_type": "bigint", "constraints": ["not_null"]},
        {"name": "name", "data_type": "string"},
    ],
}


class TestColumnsEquivalent:
    def test_matching_contract_passes(self, spark, catalog):
        meta = catalog.create_table("t", _df(spark), contract=CONTRACT)
        assert meta.contract["columns"][0]["constraints"] == ["not_null"]
        assert sorted(r["id"] for r in catalog.read("t").collect()) == [1, 2]

    def test_type_alias_normalization(self, spark, catalog):
        # 'text' and 'datetime' are alias-normalized (reference column.py:16-22)
        df = spark.createDataFrame([(1, "a")], "id bigint, name string")
        c = {"enforced": True, "columns": [
            {"name": "id", "data_type": "BIGINT"},
            {"name": "name", "data_type": "text"},
        ]}
        catalog.create_table("t", df, contract=c)

    def test_wrong_type_raises(self, spark, catalog):
        c = {"enforced": True, "columns": [
            {"name": "id", "data_type": "string"},
            {"name": "name", "data_type": "string"},
        ]}
        with pytest.raises(contracts.ContractError, match="declared 'string' != inferred 'bigint'"):
            catalog.create_table("t", _df(spark), contract=c)
        assert not catalog.exists("t")

    def test_missing_and_extra_columns_raise(self, spark, catalog):
        c = {"enforced": True, "columns": [
            {"name": "id", "data_type": "bigint"},
            {"name": "ghost", "data_type": "string"},
        ]}
        with pytest.raises(contracts.ContractError) as e:
            catalog.create_table("t", _df(spark), contract=c)
        assert "ghost" in str(e.value) and "name" in str(e.value)

    def test_unenforced_contract_skips_check(self, spark, catalog):
        c = {"enforced": False, "columns": [{"name": "wrong", "data_type": "int"}]}
        catalog.create_table("t", _df(spark), contract=c)  # no error


class TestNotNullEnforcement:
    def test_null_rejected(self, spark, catalog):
        df = spark.createDataFrame([(1, "a"), (None, "b")], "id bigint, name string")
        with pytest.raises(contracts.ConstraintViolation, match="not_null"):
            catalog.create_table("t", df, contract=CONTRACT)
        assert not catalog.exists("t")

    def test_rollback_preserves_existing(self, spark, catalog):
        """Reference TestTableConstraintsRollback: a failed rebuild must
        leave the previous relation readable."""
        catalog.create_table("t", _df(spark), contract=CONTRACT)
        bad = spark.createDataFrame([(None, "x")], "id bigint, name string")
        with pytest.raises(contracts.ConstraintViolation):
            catalog.create_table("t", bad, contract=CONTRACT, mode="overwrite")
        assert sorted(r["id"] for r in catalog.read("t").collect()) == [1, 2]

    def test_partitioned_target(self, spark, catalog):
        df = spark.createDataFrame(
            [(1, "a", "p1"), (None, "b", "p2")], "id bigint, name string, pt string"
        )
        c = {"enforced": True, "columns": [
            {"name": "id", "data_type": "bigint", "constraints": ["not_null"]},
            {"name": "name", "data_type": "string"},
            {"name": "pt", "data_type": "string"},
        ]}
        with pytest.raises(contracts.ConstraintViolation):
            catalog.create_table("t", df, partition_by=["pt"], contract=c)
        assert not catalog.exists("t")


class TestUnsupportedConstraints:
    def test_warn_and_ignore(self, spark, catalog):
        c = {"enforced": True, "columns": [
            {"name": "id", "data_type": "bigint",
             "constraints": ["primary_key", "unique", {"type": "check"}]},
            {"name": "name", "data_type": "string"},
        ]}
        with pytest.warns(UserWarning, match="not supported"):
            catalog.create_table("t", _df(spark), contract=c)
        assert catalog.exists("t")

    def test_unknown_constraint_raises(self, spark, catalog):
        c = {"enforced": True, "columns": [
            {"name": "id", "data_type": "bigint", "constraints": ["exotic"]},
            {"name": "name", "data_type": "string"},
        ]}
        with pytest.raises(contracts.ContractError, match="unknown constraint"):
            catalog.create_table("t", _df(spark), contract=c)


class TestIncrementalEnforcement:
    def test_batch_null_rejected_target_untouched(self, spark, catalog):
        run_incremental(
            catalog, "t", _df(spark), strategy="merge", unique_key="id",
            contract=CONTRACT,
        )
        bad = spark.createDataFrame([(None, "z")], "id bigint, name string")
        with pytest.raises(contracts.ConstraintViolation):
            run_incremental(catalog, "t", bad, strategy="merge", unique_key="id")
        assert sorted(r["id"] for r in catalog.read("t").collect()) == [1, 2]

    def test_clean_batch_merges(self, spark, catalog):
        run_incremental(
            catalog, "t", _df(spark), strategy="merge", unique_key="id",
            contract=CONTRACT,
        )
        good = spark.createDataFrame([(3, "c")], "id bigint, name string")
        run_incremental(catalog, "t", good, strategy="merge", unique_key="id")
        assert sorted(r["id"] for r in catalog.read("t").collect()) == [1, 2, 3]


def test_contract_via_run_model(spark, catalog):
    meta = run_model(
        catalog,
        {"name": "t", "materialized": "table", "contract": CONTRACT},
        _df(spark),
    )
    assert meta.contract["enforced"] is True
