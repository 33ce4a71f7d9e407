"""Connected components over an edge list — distributed min-label
propagation.

No counterpart in the reference (extension per BASELINE.json). Every
near-dup detector in this repo (MinHash-LSH, SimHash, embedding-cosine)
emits PAIRS; a dedup pipeline must collapse pairs into CLUSTERS —
transitively-connected groups with one representative each — which is
exactly connected components. At 100 TB the pair list itself can be
billions of rows, so the algorithm must be join-based, not driver-side.

Spark-first iteration shape (min-label propagation):

1. symmetrize the edge list once (union with swapped endpoints);
2. every node starts labeled with itself (`comp = node`);
3. each round, every node adopts the minimum label over its closed
   neighborhood: one shuffle join of edges against labels on the
   neighbor id, then a map-side-combinable min-agg on node. The
   shuffle payload is two longs per row — never document text or
   embeddings;
4. stop when a round changes no label (the convergence probe collects
   a single count — metadata-sized).

Rounds needed = graph diameter. Dedup graphs are near-cliques (every
member of a duplicate cluster pairs with most others), so 2-3 rounds
converge in practice; `max_iter` bounds pathological chains. For
adversarial long-path graphs the classic fix is large-star/small-star
contraction (Kiveris et al., "Connected Components in MapReduce and
Beyond") — same join primitives, O(log^2 n) rounds; plain propagation
is the right default for dedup workloads and stays one join per round.

Each round re-plans from a `localCheckpoint` of the previous labels so
the lineage (and codegen size) stays constant across iterations
instead of growing by one join per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, comp) for every node appearing in `edges`; comp is the
    minimum node id reachable from the node. Deterministic for any
    partition layout (min is order-independent)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("comp", F.col("node"))
    ).localCheckpoint(eager=False)

    for _ in range(max_iter):
        nbr = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), "comp")
        )
        new = (
            nbr.union(labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new.join(labels.withColumnRenamed("comp", "prev"), "node")
            .filter(F.col("comp") != F.col("prev"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def dedup_clusters(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Cluster profile for dedup: one row per component with its
    representative (minimum id), member count, and member list (sorted;
    fine at dedup-cluster cardinality — drop the list column for
    pathological mega-components)."""
    labels = connected_components(edges, src, dst, max_iter)
    return (
        labels.groupBy("comp")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.array_sort(F.collect_list("node")).alias("members"),
        )
        .select(
            F.col("comp").alias("representative"),
            "n_members",
            "members",
        )
    )
