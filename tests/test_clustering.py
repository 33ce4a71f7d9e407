"""k-means (Lloyd) vs a NumPy reference implementation, plus plan and
determinism properties."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators import clustering
from dbt_maxcompute_spark.sources.registry import load_table


def _numpy_lloyd(X, k, max_iter):
    """Reference fit mirroring the operator's rules: first-k init in id
    order, argmin ties to the lower index, empty clusters keep their
    centroid."""
    C = X[:k].astype(np.float64).copy()
    for _ in range(max_iter):
        d2 = ((X[:, None, :].astype(np.float64) - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin takes the first (lowest) index on ties
        newC = C.copy()
        for j in range(k):
            members = X[assign == j]
            if len(members):
                newC[j] = members.astype(np.float64).mean(axis=0)
        if ((newC - C) ** 2).sum(axis=1).max() <= 1e-6:
            C = newC
            break
        C = newC
    return C, assign


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    return rows


def test_kmeans_matches_numpy_reference(spark, sf_dir, emb):
    X = np.array([list(r["embedding"]) for r in emb], dtype=np.float32)
    want_C, want_assign = _numpy_lloyd(X, k=4, max_iter=3)

    df = load_table(spark, sf_dir, "embeddings")
    got_C, _ = clustering.kmeans_fit(df, "vec_id", "embedding", k=4, max_iter=3)
    assert np.allclose(np.array(got_C), want_C, atol=1e-6)

    # assignment property: the chosen cluster is distance-optimal under
    # the reference distances (index equality is too strict — random
    # high-dim embeddings concentrate distances, so 1e-6 centroid drift
    # legitimately flips near-tie argmins)
    assigned = clustering.assign_clusters(df, "embedding", got_C)
    got_assign = {
        r["vec_id"]: r["cluster"] for r in assigned.select("vec_id", "cluster").collect()
    }
    d2 = ((X[:, None, :].astype(np.float64) - np.array(got_C)[None, :, :]) ** 2).sum(axis=2)
    ids = [r["vec_id"] for r in emb]
    for pos, i in enumerate(ids):
        chosen = got_assign[i]
        assert d2[pos, chosen] <= d2[pos].min() + 1e-9, f"vec {i} not distance-optimal"


def test_kmeans_deterministic_under_repartition(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings")
    c1, i1 = clustering.kmeans_fit(df, "vec_id", "embedding", k=4, max_iter=3)
    c2, i2 = clustering.kmeans_fit(df.repartition(13), "vec_id", "embedding", k=4, max_iter=3)
    assert i1 == i2 and c1 == c2  # decimal-accumulated sums: exact match


def test_assign_clusters_is_narrow(spark, sf_dir):
    # assignment must not shuffle the corpus: one scan, and the only
    # exchange is the broadcast of the (metadata-sized) centroid matrix
    df = load_table(spark, sf_dir, "embeddings")
    centroids, _ = clustering.kmeans_fit(df, "vec_id", "embedding", k=3, max_iter=1)
    out = clustering.assign_clusters(df, "embedding", centroids)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan
    assert plan.count("embeddings.parquet") == 1


def test_kmeans_profile_shape(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings")
    prof = clustering.kmeans_cluster_profile(df, "vec_id", "embedding", k=5, max_iter=2)
    rows = prof.collect()
    total = sum(r["n_members"] for r in rows)
    assert total == df.count()
    assert all(r["mean_sq_dist"] >= 0 for r in rows)
    assert len(rows) <= 5


def test_kmeans_k_exceeds_corpus_raises(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="exceeds corpus"):
        clustering.kmeans_fit(df, "vec_id", "embedding", k=5)
