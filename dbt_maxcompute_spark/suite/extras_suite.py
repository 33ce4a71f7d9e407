"""Extras suite: operators whose driver check is rows-only by nature
(iterative algorithms with no reasonable SQL oracle). Deliberately
LAST in the suite order — the driver's correctness window is already
packed with oracle-checked queries; these still run in the bench and
are validated in pytest against NumPy reference implementations
(tests/test_clustering.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbt_maxcompute_spark.operators import clustering
from dbt_maxcompute_spark.sources.registry import load_table


def q_emb_kmeans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Lloyd k-means over the embeddings fixture: per-cluster sizes +
    # mean within-cluster squared distance. Deterministic (id-order
    # init, decimal-accumulated updates) but 5 iterations of argmin are
    # not SQL-expressible — pytest pins it against a NumPy reference.
    emb = load_table(spark, sf_dir, "embeddings")
    return clustering.kmeans_cluster_profile(
        emb, "vec_id", "embedding", k=8, max_iter=5
    )


QUERIES = {
    "emb_kmeans_profile": q_emb_kmeans_profile,
}

ORACLES: dict[str, str] = {}
