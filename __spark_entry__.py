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
    extras12_suite,
    extras13_suite,
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
    extras12_suite,
    extras13_suite,
    functions_suite,
    relational2,
    tpch2,
    relational3,
    relational,
    tpch,
]

# Query order is driver-visible: the driver's CORRECTNESS gate checks the
# FIRST 50 ``queries()`` entries only. Round 14 rotation (round-13
# verdict item 9): 4 rows whose code paths changed MOST this round
# (Arrow PQ LUT/ADC kernels, IVF build persist + reused-search
# checkpoint, one-partition local fixture frames in the stream
# staging), then ALL 46 now-stalest rows (last driver-checked r10 —
# the cohort the r13 window rotated out) — 4 + 46 = exactly the
# 50-row window. Freshness floor moves r10 -> r11.
_PRIORITY = [
    # code paths changed most in round 14
    "ann_ivfpq_topk",
    "ann_pq_topk",
    "ann_ivf_rebalance",
    "stream_late_data_drop",
    # the 46 r10-stale rows (round-13 verdict item 9)
    "ann_brute_force_cosine",
    "ann_ivfpq_indexed_topk",
    "ann_ivfpq_residual_topk",
    "bucketed_colocated_join",
    "catalog_ddl_audit",
    "dsir_profile_counts",
    "dsir_topk_selection",
    "incr_append_partitioned",
    "incr_delete_insert_lineitem",
    "incr_merge_orders",
    "model_unit_test",
    "model_unit_test_cte",
    "multimodal_features",
    "multimodal_metadata",
    "mv_auto_rewrite",
    "mv_rewrite_containment",
    "mv_rewrite_join_alias",
    "sample_domain_quota",
    "sample_quality_weighted",
    "sample_stratified_lang",
    "sql_copy_into",
    "sql_ddl_statement_script",
    "sql_dml_script",
    "sql_merge_dv_script",
    "stream_txn_upsert",
    "text_chunking",
    "text_fingerprint",
    "text_langid",
    "text_pii_redaction",
    "text_repetition",
    "text_stats",
    "text_tfidf_top_terms",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_lateness_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tuple_in_subquery",
    "txn_dv_upsert",
    "txn_file_skipping",
    "txn_optimize_bytes",
    "txn_schema_evolution",
    "txn_zorder_skipping",
    "window_running_revenue",
    "window_top_orders_per_segment",
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
