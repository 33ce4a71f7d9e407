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
    functions_suite,
    relational2,
    tpch2,
    relational3,
    relational,
    tpch,
]

# Query order is driver-visible: the driver's CORRECTNESS gate checks the
# FIRST 50 ``queries()`` entries only. Round 8 continues the freshness
# rotation: the 2 NEW round-8 queries and the 3 round-7 rows whose
# behavior/output changed this round lead, then the 8 r4-stale rows the
# round-7 verdict queued, then the stalest hard-green block (all r5) in
# name order — computed from the union of CORRECTNESS_r01..r07 greens.
_PRIORITY = [
    # new or output-changed in round 8 — must be driver-checked
    "ann_ivf_index_maintenance",
    "ann_ivf_cdf_sync",
    "txn_restore",
    "sql_copy_into",
    "mv_rewrite_join_alias",
    "sql_cdf_tvf",
    "sql_ddl_statement_script",
    "sql_merge_dv_script",
    # the 8 r4-stale rows (round-7 verdict item 1)
    "tuple_in_subquery",
    "txn_deletion_vectors",
    "txn_dv_upsert",
    "txn_file_skipping",
    "txn_schema_evolution",
    "txn_zorder_skipping",
    "window_running_revenue",
    "window_top_orders_per_segment",
    # stalest hard-green rows (all last checked r5), name order
    "ann_ivf_indexed_topk",
    "cartesian_regions",
    "corpus_zipf_profile",
    "decontam_ngram_overlap",
    "events_funnel",
    "events_json_props",
    "exact_distinct_users",
    "hash_split_counts",
    "incr_append_partitioned",
    "incr_delete_insert_lineitem",
    "incr_merge_orders",
    "multimodal_features",
    "multimodal_metadata",
    "mv_auto_rewrite",
    "mv_rewrite_containment",
    "sample_domain_quota",
    "sample_quality_weighted",
    "sample_stratified_lang",
    "sql_dml_script",
    "sql_maintenance_script",
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
