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
    extras3_suite,
    extras4_suite,
    extras5_suite,
    extras6_suite,
    extras7_suite,
    extras8_suite,
    extras9_suite,
    extras10_suite,
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
    extras3_suite,
    extras4_suite,
    extras5_suite,
    extras6_suite,
    extras7_suite,
    extras8_suite,
    extras9_suite,
    extras10_suite,
    functions_suite,
    relational2,
    tpch2,
    relational3,
    relational,
    tpch,
]

# Query order is driver-visible: the driver's CORRECTNESS gate checks the
# FIRST 50 ``queries()`` entries only. Round 10 rotation: the NEW round-10
# queries and the rows whose BEHAVIOR changed this round (incremental
# OPTIMIZE inside sql_maintenance_script; CDF integer start bound in
# sql_cdf_tvf) lead, then the 22 r6-stale rows the round-9 verdict queued
# (freshness floor r6 -> r7) — computed from the union of
# CORRECTNESS_r01..r09 greens.
_PRIORITY = [
    # new in round 10 — must be driver-checked
    "txn_optimize_incremental",
    "ann_ivfpq_indexed_topk",
    "model_empty_build",
    "sql_type_literals",
    "model_unit_test",
    "ann_ivfpq_residual_topk",
    # behavior changed in round 10
    "sql_maintenance_script",
    "sql_cdf_tvf",
    "txn_deletion_vectors",
    # the 22 r6-stale rows (round-9 verdict item 1)
    "mv_cdf_maintenance",
    "stream_seq_upsert",
    "stream_exactly_once_dedup",
    "sql_txn_lifecycle_script",
    "sql_mixed_partition_insert",
    "mv_rewrite_avg_having",
    "scd2_snapshot_orders",
    "sql_insert_partition_script",
    "mv_returnflag_rollup",
    "incr_insert_overwrite_events",
    "stream_tumbling_hourly",
    "incr_microbatch_events",
    "mv_incremental_refresh",
    "sketch_distinct_users",
    "seed_roundtrip",
    "sketch_value_quantiles",
    "ops_contract_probe",
    "train_next_event_examples",
    "jsonl_roundtrip",
    "pack_sequences",
    "raw_script_passthrough",
    "train_shuffle_order",
    # next-stalest hard-green rows (last checked r7), name order
    "agg_daily_orders",
    "ann_ivfpq_topk",
    "ann_pq_topk",
    "anti_join_customers_without_orders",
    "bloom_prefilter_join",
    "cube_orders",
    "date_spine",
    "dedup_incremental_lsh",
    "dedup_shared_chunks",
    "distinct_counts",
    "exists_suppliers",
    "explode_order_lines",
    "flagship_customers",
    "fn_any_value",
    "fn_datetime_ops",
    "fn_listagg_lineitems",
    "fn_string_ops",
    "mixture_sample_langs",
    "mv_join_cdf_maintenance",
    "mv_minmax_maintenance",
    "ops_compact_probe",
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
