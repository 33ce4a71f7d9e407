"""Relational suite part 3 vs DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from dbt_maxcompute_spark.suite import relational3
from tests.oracle import compare_to_oracle


@pytest.mark.parametrize("name", sorted(relational3.QUERIES))
def test_relational3_query_matches_oracle(spark, sf_dir, name):
    df = relational3.QUERIES[name](spark, sf_dir)
    compare_to_oracle(df, relational3.ORACLES[name], sf_dir)
