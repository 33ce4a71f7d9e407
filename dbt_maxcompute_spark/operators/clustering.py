"""Distributed k-means (Lloyd's algorithm) over embedding columns.

No counterpart in the reference (extension per BASELINE.json) — the
iterative-algorithm pattern a training pipeline needs for corpus
clustering (topic balancing, dedup-by-cluster, IVF coarse quantizers).

Spark-first iteration shape — each Lloyd step is:

1. centroids live on the DRIVER as plain lists (K x dim doubles —
   metadata-sized; 1024 x 768 floats is ~3 MB);
2. assignment is a pure-Catalyst expression: the centroid array is a
   broadcast literal, the argmin over K squared distances runs inside
   whole-stage codegen (zip_with/aggregate folds — no Python, no UDF,
   no shuffle);
3. the update is ONE map-side-combinable aggregate: groupBy(cluster)
   over per-dimension sums + counts — a K-row result collected to the
   driver.

Total per iteration: one corpus scan, one K-row shuffle. Nothing
materializes on the driver except the K x dim centroid matrix itself.
Deterministic throughout: init picks the first K vectors in id order,
ties in argmin break toward the lower cluster index, and the update
sums accumulate in decimal(28,12) so the fit is identical under any
partition layout (double sums are addition-order dependent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist_to_literal(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a driver-side centroid as a codegen'd
    fold: sum((v_j - c_j)^2) with the centroid inlined as literals."""
    arr = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(vec, arr, lambda v, c: (v.cast("double") - c) * (v.cast("double") - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """Attach `cluster` = argmin_k ||vec - centroid_k||^2 (ties to the
    lower index). Pure projection — no shuffle, safe to chain into a
    partitioned-by-cluster write at scale."""
    dists = [_sq_dist_to_literal(F.col(vec_col), c) for c in centroids]
    best_d, best_k = dists[0], F.lit(0)
    for k, d in enumerate(dists[1:], start=1):
        is_better = d < best_d
        best_k = F.when(is_better, F.lit(k)).otherwise(best_k)
        best_d = F.when(is_better, d).otherwise(best_d)
    return df.withColumn("cluster", best_k.cast("long"))


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-6,
) -> tuple[list[list[float]], int]:
    """Lloyd iterations; returns (centroids, iterations_run). Converges
    when no centroid moves more than sqrt(tol) in L2."""
    init_rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(init_rows)}")
    centroids = [[float(x) for x in r[vec_col]] for r in init_rows]
    dim = len(centroids[0])

    for it in range(1, max_iter + 1):
        assigned = assign_clusters(df.select(F.col(vec_col).alias("__v")), "__v", centroids)
        # per-dimension sums via ONE aggregate: sum of vectors is a
        # zip_with fold accumulated per cluster (map-side combinable)
        sums = (
            assigned.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                # decimal detour: double sums are partition-order
                # dependent; decimal(28,12) accumulation keeps the fit
                # deterministic under any layout (same trick as the
                # suite's _dsum)
                *[
                    F.sum(
                        F.element_at(F.col("__v"), j + 1).cast("decimal(28,12)")
                    )
                    .cast("double")
                    .alias(f"s{j}")
                    for j in range(dim)
                ],
            )
            .collect()
        )
        new_centroids = [list(c) for c in centroids]  # empty clusters keep position
        for r in sums:
            kidx = int(r["cluster"])
            new_centroids[kidx] = [r[f"s{j}"] / r["n"] for j in range(dim)]
        shift = max(
            sum((a - b) ** 2 for a, b in zip(old, new))
            for old, new in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if shift <= tol:
            return centroids, it
    return centroids, max_iter


def kmeans_cluster_profile(
    df: DataFrame, id_col: str, vec_col: str, k: int = 8, max_iter: int = 10
) -> DataFrame:
    """Fit + assign + per-cluster profile (size, mean within-cluster
    squared distance). The driver-visible shape of the operator."""
    centroids, _ = kmeans_fit(df, id_col, vec_col, k=k, max_iter=max_iter)
    assigned = assign_clusters(df, vec_col, centroids)
    dists = [_sq_dist_to_literal(F.col(vec_col), c) for c in centroids]
    expr = dists[-1]
    for kidx in range(len(centroids) - 2, -1, -1):
        expr = F.when(F.col("cluster") == kidx, dists[kidx]).otherwise(expr)
    return (
        assigned.withColumn("__d2", expr)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg("__d2"), 6).alias("mean_sq_dist"),
        )
        .orderBy("cluster")
    )
