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
# FIRST 50 ``queries()`` entries only. Round 13 rotation: the 2 NEW
# round-13 queries lead, then the 4 rows whose CODE PATH changed this
# round (LM slice clamp + order-1 special case, substring-dedup
# explode_outer policy, commit-timestamp quantization), then ALL 44
# r9-stale rows the round-12 verdict queued (freshness floor r9 -> r10)
# — 2 + 4 + 44 = exactly the 50-row window.
_PRIORITY = [
    # new in round 13 — must be driver-checked
    "classifier_vocab_100k",
    "dsir_incremental_profile",
    # code paths changed in round 13
    "lm_perplexity_filter",
    "lm_train_ngram_counts",
    "dedup_substring_chunks",
    "txn_restore",
    # the 44 r9-stale rows (round-12 verdict item 1)
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
    "model_hooks_script",
    "mv_rewrite_view",
    "text_boilerplate_incremental",
    "text_boilerplate_removal",
    "tpch_q16_supplier_count",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive_filter",
    "tpch_q20_small_part_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_idle_customers",
    "tpch_q3_shipping_priority",
    "tpch_q4_late_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_profit_by_nation",
    "txn_change_feed",
    "txn_incremental_merge",
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
