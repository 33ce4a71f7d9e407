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
# FIRST 50 ``queries()`` entries only. After round 3 every query had a
# green driver row at least once (r3 re-proved 50 incl. all former
# failures); round 4 rotates FRESHNESS into the window: the twenty-two new
# round-4 queries (log-committed transactional merge, MV auto-rewrite,
# compaction+lifecycle probe, txn data skipping, exact heavy hitters,
# mixture sampling, streaming late-data drop, stream-stream interval
# join, bloom-prefilter join, Z-order skipping, PQ ANN, exactly-once
# txn streaming sink, incremental LSH dedup, deletion vectors,
# mergeable HLL sketches, DV upsert, salted skew rollup, txn schema
# evolution, shared-chunk dedup, streaming session windows,
# custom-state totals, IVF-PQ ANN) lead, followed by 28 of the 48
# queries whose only
# hard driver row is from round 1 — the relational / TPC-H / functions
# families, least-changed code but the stalest signal. cartesian_regions
# and tpch_q3/q4/q5/q6/q7/q8/q9/q10/q11/q13/q14/q15/q16/q17/q18/q19/q20/q21/q22 (also r1-only) don't fit
# the 50-slot window; they head round 5's rotation together with the
# seventeen r2-last queries.
_PRIORITY = [
    # new in round 4 — never driver-checked
    "stream_interval_join",
    "bloom_prefilter_join",
    "txn_zorder_skipping",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "stream_txn_exactly_once",
    "dedup_incremental_lsh",
    "txn_deletion_vectors",
    "sketch_mergeable_distinct",
    "txn_dv_upsert",
    "skew_salted_rollup",
    "txn_schema_evolution",
    "dedup_shared_chunks",
    "stream_session_windows",
    "stream_custom_state_totals",
    "txn_incremental_merge",
    "mv_auto_rewrite",
    "ops_compact_probe",
    "txn_file_skipping",
    "sketch_heavy_hitters",
    "mixture_sample_langs",
    "stream_late_data_drop",
    # r1-only greens: functions family
    "fn_string_ops",
    "fn_datetime_ops",
    "fn_listagg_lineitems",
    "fn_any_value",
    # r1-only greens: relational2 (grouping sets / pivot / lateral)
    "rollup_revenue",
    "cube_orders",
    "pivot_status_priority",
    "exists_suppliers",
    "explode_order_lines",
    # r1-only greens: relational3 (stats / ranking / regex)
    "stats_moments",
    "percentiles_exact",
    "ranking_family",
    "regexp_ops",
    # r1-only greens: core relational
    "flagship_customers",
    "agg_daily_orders",
    "pricing_summary",
    "revenue_by_nation",
    "anti_join_customers_without_orders",
    "semi_join_parts_with_lineitems",
    "window_top_orders_per_segment",
    "window_running_revenue",
    "setops_nationkeys",
    "top10_expensive_orders",
    "distinct_counts",
    "scalar_subquery_recent_orders",
    "tuple_in_subquery",
    "date_spine",
    # r1-only greens: the TPC-H shapes
    "tpch_q2_min_cost_supplier",
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
