"""Round-6 suite, part 2: SemDeDup-style semantic dedup over the
embeddings table (cluster-bucketed cosine near-dup, never all-pairs)
and change-feed-driven incremental rollup maintenance (the IVM
extension of additive MV refresh to UPDATE/DELETE history).

Oracle conventions as elsewhere: exact sums through DECIMAL(28,6) cast
to DOUBLE at the edge, counts as BIGINT, explicit ORDER BY, and the
same argmin/tiebreak mirroring the kmeans oracle proved out
(extras_suite.ORACLE_KMEANS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_maxcompute_spark.sources.registry import load_table


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SemDeDup (arXiv:2303.09540): nearest-centroid cells bound the
    # pair space; within a cell, a row is a semantic duplicate iff a
    # smaller-id neighbour has cosine >= 0.45 (threshold sits in a
    # measured >1e-3 gap of the sf0.01 pair distribution — no
    # float-boundary flake against the oracle). Deterministic init:
    # first k vectors in id order, same as the kmeans driver row.
    from dbt_maxcompute_spark.operators import dedup

    emb = load_table(spark, sf_dir, "embeddings")
    k = 8
    init_rows = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(k).collect()
    )
    centroids = [[float(x) for x in r["embedding"]] for r in init_rows]
    # max_cell=1000 bounds per-cell pair volume to n_cell*max_cell
    # (linear in corpus size): never engages at the oracle-checked
    # sf0.01 (~60/cell) or the benched sf0.1 (~600/cell), but caps
    # the sf1 rehearsal's replicated-embedding hot cells, which
    # otherwise grow the self-join quadratically (measured e=+1.41
    # uncapped -> see SCALE.md round-7 notes)
    out = dedup.semantic_dedup(
        emb, "vec_id", "embedding", centroids, threshold=0.45, max_cell=1000
    )
    return out.select("vec_id", "cluster", "is_semdup").orderBy("vec_id")


ORACLE_DEDUP_SEMANTIC = """
WITH c AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, embedding AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
), d AS (
  SELECT e.vec_id, e.embedding, c.cluster,
         list_sum(list_transform(list_zip(e.embedding, c.cvec),
             p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS d2
  FROM embeddings e CROSS JOIN c
), a AS (
  SELECT vec_id, embedding, cluster FROM d
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
)
SELECT x.vec_id, x.cluster,
       EXISTS (
         SELECT 1 FROM a y
         WHERE y.cluster = x.cluster AND y.vec_id < x.vec_id
           AND list_sum(list_transform(list_zip(y.embedding, x.embedding),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / ( sqrt(list_sum(list_transform(y.embedding,
                     v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
               * sqrt(list_sum(list_transform(x.embedding,
                     v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) ) >= 0.45
       ) AS is_semdup
FROM a x ORDER BY x.vec_id
"""


def q_mv_cdf_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exactly-once CDF -> rollup pipeline: bootstrap sync (full
    # aggregate + cursor marker in ONE commit), then DELETE +
    # key-upsert UPDATE + append against the source, then an
    # incremental sync that merges ONLY the signed feed deltas (cost ~
    # |rollup| + |changes|, never the fact table), then a replayed
    # sync that must commit NOTHING (the Delta txn marker is the
    # cursor). The oracle recomputes the rollup from the simulated
    # FINAL state — equality is the IVM invariant, and replay_noop is
    # the exactly-once invariant.
    import tempfile

    from dbt_maxcompute_spark.materializations.materialized_view import (
        sync_rollup_exactly_once,
    )
    from dbt_maxcompute_spark.txnlog import TxnTable

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 == 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    tmp = tempfile.mkdtemp(prefix="ivm_")
    t = TxnTable(spark, tmp + "/src")
    t.create(base)
    tgt = TxnTable(spark, tmp + "/rollup")

    def sync():
        return sync_rollup_exactly_once(
            t, tgt, ["o_orderstatus"], {"sum_total": "o_totalprice"}, "n"
        )

    sync()  # bootstrap: full aggregate, cursor = v0
    # row-level DELETE (deletion vectors, no rewrite)
    t.delete_where_dv("o_custkey % 5 = 0")
    # key-upsert UPDATE: double the open-order prices among survivors
    upd = (
        base.filter(F.col("o_custkey") % 5 != 0)
        .filter(F.col("o_orderstatus") == "O")
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    t.delete_insert_dv(upd, ["o_orderkey"])
    # append a disjoint slice
    t.append(
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 == 3)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    applied = sync()      # incremental: signed feed deltas only
    replayed = sync()     # exactly-once: nothing to apply
    return tgt.read().select(
        "o_orderstatus",
        F.col("n").alias("n_orders"),
        F.col("sum_total").cast("double").alias("total_price"),
        F.lit(applied == 3 and replayed == 0).alias("replay_noop"),
    ).orderBy("o_orderstatus")


ORACLE_MV_CDF_MAINTENANCE = """
WITH a AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 7 = 0
),
survivors AS (SELECT * FROM a WHERE o_custkey % 5 <> 0),
updated AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 2
              ELSE o_totalprice END AS o_totalprice
  FROM survivors
),
final AS (
  SELECT * FROM updated
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 7 = 3
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price,
       TRUE AS replay_noop
FROM final GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


QUERIES = {
    "dedup_semantic_clusters": q_dedup_semantic,
    "mv_cdf_maintenance": q_mv_cdf_maintenance,
}

ORACLES = {
    "dedup_semantic_clusters": ORACLE_DEDUP_SEMANTIC,
    "mv_cdf_maintenance": ORACLE_MV_CDF_MAINTENANCE,
}
