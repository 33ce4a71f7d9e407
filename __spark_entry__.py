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
    functions_suite,
    relational2,
    tpch2,
    relational3,
    relational,
    tpch,
]

# Query order is driver-visible: the driver's CORRECTNESS gate checks the
# FIRST 50 ``queries()`` entries only. Round 6 continues the freshness
# rotation the round-5 verdict prescribed: the 7 NEW round-6 queries
# (never driver-checked) lead, followed by the queries whose last hard
# driver-green row is r3. Two of those (txn_time_travel,
# webdataset_roundtrip — both also exercised by r4/r5-green rows
# sql_dml_script and the r5 webdataset row per VERDICT §2.1) sit at
# positions 51-52 and rotate in next round.
_PRIORITY = [
    # new in round 6 — never driver-checked
    "dedup_semantic_clusters",
    "mv_cdf_maintenance",
    "sql_insert_partition_script",
    "sql_txn_lifecycle_script",
    "sql_mixed_partition_insert",
    "mv_rewrite_avg_having",
    "stream_seq_upsert",
    # r3-last (45 queries, stalest first-class rows)
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
    "mv_incremental_refresh",
    "mv_returnflag_rollup",
    "ops_contract_probe",
    "pack_sequences",
    "raw_script_passthrough",
    "scd2_snapshot_orders",
    "seed_roundtrip",
    "sketch_distinct_users",
    "sketch_value_quantiles",
    "stream_exactly_once_dedup",
    "stream_tumbling_hourly",
    "train_next_event_examples",
    "train_shuffle_order",
    "txn_time_travel",
    "webdataset_roundtrip",
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
