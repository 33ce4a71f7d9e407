"""DML suite vs DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from dbt_maxcompute_spark.suite import dml_suite
from tests.oracle import compare_to_oracle


@pytest.mark.parametrize("name", sorted(dml_suite.QUERIES))
def test_dml_query_matches_oracle(spark, sf_dir, name):
    df = dml_suite.QUERIES[name](spark, sf_dir)
    compare_to_oracle(df, dml_suite.ORACLES[name], sf_dir)
