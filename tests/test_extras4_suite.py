"""Round-6 suite vs DuckDB oracles at sf0.001 (SQL INSERT PARTITION /
explicit-column CREATE / grants / txn lifecycle / MV avg+having /
seq_col streaming upsert)."""

from __future__ import annotations

import pytest

from dbt_maxcompute_spark.suite import extras4_suite
from tests.oracle import compare_to_oracle


@pytest.mark.parametrize("name", sorted(extras4_suite.ORACLES))
def test_extras4_query_matches_oracle(spark, sf_dir, name):
    df = extras4_suite.QUERIES[name](spark, sf_dir)
    compare_to_oracle(df, extras4_suite.ORACLES[name], sf_dir)
