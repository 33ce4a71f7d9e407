"""Relational suite part 2 vs DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from dbt_maxcompute_spark.suite import relational2
from tests.oracle import compare_to_oracle


@pytest.mark.parametrize("name", sorted(relational2.QUERIES))
def test_relational2_query_matches_oracle(spark, sf_dir, name):
    df = relational2.QUERIES[name](spark, sf_dir)
    compare_to_oracle(df, relational2.ORACLES[name], sf_dir)
