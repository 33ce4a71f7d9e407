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
# FIRST 50 ``queries()`` entries only. Round 9 rotation: the NEW round-9
# queries and the rows whose SEMANTICS changed this round (CDF timestamp
# start bound) lead, then the 16 r5-stale rows the round-8 verdict queued
# (freshness floor r5 -> r6), then the stalest r6 block in name order —
# computed from the union of CORRECTNESS_r01..r08 greens.
_PRIORITY = [
    # new or behavior-changed in round 9 — must be driver-checked
    "model_hooks_script",
    "ann_ivf_rebalance",
    "mv_rewrite_view",
    "text_boilerplate_removal",
    "text_boilerplate_incremental",
    "sql_cdf_tvf",
    # the 16 r5-stale rows (round-8 verdict item 2)
    "tpch_q3_shipping_priority",
    "tpch_q4_late_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_profit_by_nation",
    "tpch_q16_supplier_count",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive_filter",
    "tpch_q20_small_part_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_idle_customers",
    "txn_change_feed",
    "txn_incremental_merge",
    # stalest hard-green rows (last checked r6), name order
    "ann_brute_force_cosine",
    "ann_ivf_topk",
    "bucketed_colocated_join",
    "catalog_ddl_audit",
    "contracts_not_null",
    "curation_filter_funnel",
    "decimal_fidelity",
    "dedup_cluster_components",
    "dedup_exact_documents",
    "dedup_incremental_batch",
    "dedup_keep_canonical",
    "dedup_lsh_recall_pinned",
    "dedup_minhash_lsh",
    "dedup_semantic_clusters",
    "dedup_simhash_pairs",
    "dedup_token_jaccard_pairs",
    "doc_length_histogram",
    "emb_cosine_dup_pairs",
    "emb_cosine_exact_pairs",
    "emb_kmeans_profile",
    "emb_quantize_int8",
    "events_asof_last_purchase",
    "events_range_click_error",
    "events_sessionize",
    "events_sliding_windows",
    "events_tumbling_hourly",
    "fn_array_ops",
    "group_split_leakage_safe",
    "incr_insert_overwrite_events",
    "incr_microbatch_events",
    "jsonl_roundtrip",
    "mv_cdf_maintenance",
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
