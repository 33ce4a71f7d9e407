"""TPC-H-shaped deep-plan suite vs DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from dbt_maxcompute_spark.suite import tpch
from tests.oracle import compare_to_oracle


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_query_matches_oracle(spark, sf_dir, name):
    df = tpch.QUERIES[name](spark, sf_dir)
    compare_to_oracle(df, tpch.ORACLES[name], sf_dir)
