"""TPC-H deep-plan suite part 2 (Q2/Q5/Q6/Q11/Q12/Q16/Q21) vs DuckDB oracle."""

from __future__ import annotations

import pytest

from dbt_maxcompute_spark.suite import tpch2
from tests.oracle import compare_to_oracle


@pytest.mark.parametrize("name", sorted(tpch2.QUERIES))
def test_tpch2_query_matches_oracle(spark, sf_dir, name):
    df = tpch2.QUERIES[name](spark, sf_dir)
    compare_to_oracle(df, tpch2.ORACLES[name], sf_dir)
