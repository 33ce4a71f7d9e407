"""Relational suite vs DuckDB oracle at sf0.001 (driver runs sf0.01)."""

from __future__ import annotations

import pytest

from dbt_maxcompute_spark.suite import relational
from tests.oracle import compare_to_oracle


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_query_matches_oracle(spark, sf_dir, name):
    df = relational.QUERIES[name](spark, sf_dir)
    compare_to_oracle(df, relational.ORACLES[name], sf_dir)
