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
converge in practice and plain propagation (one join per round) is the
right default. For adversarial long-diameter graphs (paths, lattices —
diameter rounds would be the job), the loop SWITCHES after an
iteration budget to large-star/small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", 2014): the same
join+min-agg primitives, but each round rewires edges toward local
minima so components collapse in O(log^2 n) rounds regardless of
diameter.

Each round re-plans from a `localCheckpoint` of the previous state so
the lineage (and codegen size) stays constant across iterations
instead of growing by one join per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct undirected edges oriented hi→lo, self-loops dropped."""
    e = edges.select(F.col(src).alias("x"), F.col(dst).alias("y")).filter(
        F.col("x") != F.col("y")
    )
    return e.select(
        F.greatest("x", "y").alias("hi"), F.least("x", "y").alias("lo")
    ).distinct()


def _large_star(canon: DataFrame) -> DataFrame:
    """One large-star round: every node u connects its LARGER neighbors
    to min(closed neighborhood of u). Output is naturally hi→lo
    oriented (v > u >= m)."""
    sym = canon.union(
        canon.select(F.col("lo").alias("hi"), F.col("hi").alias("lo"))
    ).select(F.col("hi").alias("a"), F.col("lo").alias("b"))
    m = sym.groupBy("a").agg(F.min("b").alias("mn")).select(
        "a", F.least("mn", F.col("a")).alias("m")
    )
    return (
        sym.join(m, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("hi"), F.col("m").alias("lo"))
        .distinct()
    )


def _small_star(canon: DataFrame) -> DataFrame:
    """One small-star round: every node u rewires its SMALLER neighbors
    (and itself) to the minimum of them. Input/output hi→lo."""
    mn = canon.groupBy("hi").agg(F.min("lo").alias("m"))
    rewired = (
        canon.join(mn, "hi")
        .filter(F.col("lo") != F.col("m"))
        .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
    )
    direct = mn.select("hi", F.col("m").alias("lo"))
    return rewired.union(direct).distinct()


def _star_contraction(
    canon: DataFrame, nodes: DataFrame, max_rounds: int, stats: dict | None
) -> DataFrame:
    """Alternate large/small-star until the edge set is a fixed point:
    then every non-root node carries exactly one edge to its component
    minimum. O(log^2 n) rounds (Kiveris et al. Thm 2) — the adversarial
    -diameter path. The change probe is one anti-join limit-1 count
    (edge-set growth is impossible: both stars only move endpoints to
    smaller labels, so new==old set-wise iff nothing moved)."""
    cur = canon.localCheckpoint(eager=False)
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        new = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        moved = (
            new.exceptAll(cur).limit(1).count() + cur.exceptAll(new).limit(1).count()
        )
        cur = new
        if moved == 0:
            break
    if stats is not None:
        stats["star_rounds"] = rounds
    star = cur.select(F.col("hi").alias("node"), F.col("lo").alias("comp"))
    return nodes.join(star, "node", "left").select(
        "node", F.coalesce("comp", "node").alias("comp")
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    star_after: int = 4,
    stats: dict | None = None,
) -> DataFrame:
    """(node, comp) for every node appearing in `edges`; comp is the
    minimum node id reachable from the node. Deterministic for any
    partition layout (min is order-independent).

    Min-label propagation for up to ``star_after`` rounds (optimal for
    the near-clique graphs dedup emits: converges in 2-3); if still
    unconverged — diameter larger than the budget — the remaining
    budget runs large-star/small-star contraction on the ORIGINAL
    edges, whose round count is O(log^2 n) in component size, not
    O(diameter). ``stats`` (optional dict) reports ``algorithm``,
    ``label_rounds`` and ``star_rounds`` for observability/tests."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("comp", F.col("node"))
    ).localCheckpoint(eager=False)

    label_rounds = 0
    converged = False
    comp_type = dict(labels.dtypes)["comp"]
    for _ in range(min(max_iter, star_after)):
        label_rounds += 1
        # The closed-neighborhood union already carries each node's
        # PREVIOUS label on the `labels` branch (one row per node), so
        # threading it through the aggregate as max(__prev) — nulls on
        # the neighbor branch are ignored — recovers prev on the SAME
        # shuffle. The convergence probe then reads comp != __prev off
        # the checkpointed result directly instead of paying a separate
        # labels-sized join back against the previous round every
        # iteration (guide §2.2: shuffle fewer bytes / fewer passes).
        nbr = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .select(
                F.col("a").alias("node"),
                "comp",
                F.lit(None).cast(comp_type).alias("__prev"),
            )
        )
        own = labels.select("node", "comp", F.col("comp").alias("__prev"))
        new = (
            nbr.union(own)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"), F.max("__prev").alias("__prev"))
            .localCheckpoint(eager=False)
        )
        # Path-halving shortcut (pointer jumping): follow each node's
        # label to that label's OWN label — comp values are node ids,
        # so one extra labels-sized self-join contracts chains
        # exponentially (round k reaches distance ~2^k instead of k).
        # Same fixed point (min reachable id): labels only ever
        # decrease toward it, and least() keeps monotonicity. The lazy
        # localCheckpoint above makes the self-join read ONE
        # materialization, not two plan copies. Near-clique graphs
        # (the dedup common case) converge in the same 2-3 rounds;
        # chain-shaped dup graphs stop exhausting the label budget and
        # spilling into the star-contraction restart.
        hop = new.select(F.col("node").alias("__hp"), F.col("comp").alias("__hc"))
        new = (
            new.join(hop, new["comp"] == hop["__hp"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("__hc"), F.col("comp"))
                ).alias("comp"),
                "__prev",
            )
            .localCheckpoint(eager=False)
        )
        changed = new.filter(F.col("comp") != F.col("__prev")).limit(1).count()
        labels = new.select("node", "comp")
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats["label_rounds"] = label_rounds
        stats["algorithm"] = "min_label"
    if converged or max_iter <= star_after:
        return labels
    # unconverged within the budget: the graph has real diameter —
    # contract stars instead of walking it
    if stats is not None:
        stats["algorithm"] = "star"
    nodes = labels.select("node")
    return _star_contraction(
        _canonical(edges, src, dst), nodes, max_iter, stats
    )


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
