"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_maxcompute_spark.session import apply_session_defaults
from dbt_maxcompute_spark.suite import (
    dml_suite,
    events_suite,
    extras2_suite,
    extras_suite,
    functions_suite,
    pipeline_suite,
    relational,
    relational2,
    relational3,
    tpch,
    tpch2,
)

_SUITES = [
    dml_suite,
    pipeline_suite,
    events_suite,
    extras_suite,
    extras2_suite,
    functions_suite,
    relational2,
    tpch2,
    relational3,
    relational,
    tpch,
]

# Query order is driver-visible: the driver's CORRECTNESS gate checks the
# FIRST 50 ``queries()`` entries only. Round 1 proved the relational /
# TPC-H / core-functions queries green, so they rotate behind everything
# that still needs a driver row: the DML / pipeline / events / extras
# suites (never driver-checked) plus the two queries whose output types
# were realigned after round 1 (decimal_fidelity, tpch_q12) and the one
# functions query that fell just past round 1's window (fn_array_ops).
# That's 48; the first two extras2_suite queries ride the last 2 slots
# (the remainder after the priority pop keeps _SUITES order).
_PRIORITY = [
    *dml_suite.QUERIES,
    *pipeline_suite.QUERIES,
    *events_suite.QUERIES,
    *extras_suite.QUERIES,
    "fn_array_ops",
    "decimal_fidelity",
    "tpch_q12_lateness_priority",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_session_defaults(spark)
    return relational.q_flagship_customers(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for suite in _SUITES:
        overlap = out.keys() & suite.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names across suites: {overlap}")
        out.update(suite.QUERIES)
    ordered = {name: out.pop(name) for name in _PRIORITY}
    ordered.update(out)
    out = ordered

    def _wrap(fn):
        def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_session_defaults(spark)
            return fn(spark, sf_dir)

        return inner

    return {name: _wrap(fn) for name, fn in out.items()}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for suite in _SUITES:
        out.update(getattr(suite, "ORACLES", {}))
    return out
