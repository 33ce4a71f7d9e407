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
    extras11_suite,
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
    extras11_suite,
    functions_suite,
    relational2,
    tpch2,
    relational3,
    relational,
    tpch,
]

# Query order is driver-visible: the driver's CORRECTNESS gate checks the
# FIRST 50 ``queries()`` entries only. Round 11 rotation: the NEW round-11
# queries lead, then every row whose CODE PATH changed this round (the
# broadcast-frame centroid/codebook device touches all IVF/PQ rows; the
# sizeBytes stat and the unit-test prologue merge touch the optimize and
# unit-test rows), then the 28 r7-stale rows the round-10 verdict queued
# (freshness floor r7 -> r8), then the next-stalest r8 rows — staleness
# computed from the union of CORRECTNESS_r01..r10 greens.
_PRIORITY = [
    # new in round 11 — must be driver-checked
    "txn_optimize_bytes",
    "model_unit_test_cte",
    "text_quality_classifier",
    # code paths changed in round 11 (broadcast-frame quantizer matrices,
    # cached bench index, sizeBytes stat, unit-test prologue merge)
    "ann_ivfpq_indexed_topk",
    "ann_ivfpq_residual_topk",
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_ivf_indexed_topk",
    "ann_ivf_index_maintenance",
    "ann_ivf_cdf_sync",
    "ann_ivf_rebalance",
    "txn_optimize_incremental",
    "model_unit_test",
    "sql_maintenance_script",
    # the 28 r7-stale rows (round-10 verdict item 2)
    "mv_minmax_maintenance",
    "ops_compact_probe",
    "percentiles_exact",
    "pivot_status_priority",
    "pricing_summary",
    "ranking_family",
    "regexp_ops",
    "revenue_by_nation",
    "rollup_revenue",
    "scalar_subquery_recent_orders",
    "semi_join_parts_with_lineitems",
    "setops_nationkeys",
    "sketch_heavy_hitters",
    "sketch_mergeable_distinct",
    "skew_salted_rollup",
    "stats_moments",
    "stream_cdf_pipeline",
    "stream_custom_state_totals",
    "stream_interval_join",
    "stream_late_data_drop",
    "stream_session_windows",
    "stream_txn_exactly_once",
    "top10_expensive_orders",
    "tpch_q2_min_cost_supplier",
    "txn_bloom_skipping",
    "txn_change_feed_keyed",
    "txn_time_travel",
    "webdataset_roundtrip",
    # next-stalest hard-green rows (last checked r8), name order
    "cartesian_regions",
    "corpus_zipf_profile",
    "decontam_ngram_overlap",
    "events_funnel",
    "events_json_props",
    "exact_distinct_users",
    "hash_split_counts",
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
