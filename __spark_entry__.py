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
    functions_suite,
    relational2,
    tpch2,
    relational3,
    relational,
    tpch,
]

# Query order is driver-visible: the driver's CORRECTNESS gate checks the
# FIRST 50 ``queries()`` entries only. After round 4 every query has had
# a hard driver-green row at least once; round 5 completes the freshness
# rotation the round-4 verdict prescribed: the new round-5 queries
# (SQL-surface DML + time travel, and the other round-5 additions) lead,
# followed by ALL remaining queries whose last hard driver row is r1
# (cartesian_regions, tpch_q3–q22) or r2 (text_*, multimodal_*,
# sample_*, events_funnel/json_props, exact_distinct_users,
# hash_split_counts, corpus_zipf_profile, decontam_ngram_overlap).
# After this round no query's last driver row is older than r3.
_PRIORITY = [
    # new in round 5 — never driver-checked
    "sql_dml_script",
    "ann_ivf_indexed_topk",
    "mv_rewrite_containment",
    "sql_maintenance_script",
    "stream_txn_upsert",
    "txn_change_feed",
    # r2-last: text analysis / multimodal / sampling / events families
    "text_repetition",
    "text_stats",
    "text_langid",
    "text_fingerprint",
    "text_chunking",
    "text_pii_redaction",
    "text_tfidf_top_terms",
    "multimodal_metadata",
    "multimodal_features",
    "hash_split_counts",
    "events_json_props",
    "events_funnel",
    "decontam_ngram_overlap",
    "exact_distinct_users",
    "corpus_zipf_profile",
    "sample_stratified_lang",
    "sample_domain_quota",
    "sample_quality_weighted",
    # r1-only: the deliberate cartesian + the TPC-H long tail
    "cartesian_regions",
    "tpch_q3_shipping_priority",
    "tpch_q4_late_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_profit_by_nation",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_lateness_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_count",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive_filter",
    "tpch_q20_small_part_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_idle_customers",
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
