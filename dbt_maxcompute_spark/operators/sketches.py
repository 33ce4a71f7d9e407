"""Approximate sketch aggregates: HLL distinct counts and quantile
sketches.

No counterpart in the reference (extension per BASELINE.json). At
100 TB, exact COUNT(DISTINCT) and exact percentiles are shuffle-heavy
(exact distinct shuffles every distinct value; exact percentile sorts)
— sketches are the standard substitute: fixed-size mergeable state,
map-side partials, one small shuffle.

Spark-first: both sketches are built-in Catalyst aggregates —
`approx_count_distinct` is HyperLogLog++ (dense/sparse, rsd-tunable),
`percentile_approx` is an eager KLL-style quantile summary with an
accuracy knob. No UDAF needed.

These are approximate by construction, so no DuckDB oracle can
reproduce them bit-for-bit (driver records rows-only); tests pin each
sketch against its exact companion within the published error bound
(rsd for HLL, 1/accuracy rank error for the quantile sketch), and the
suite pairs each sketch query with an exact oracle-checked companion
on the same grouping so the driver still hash-checks the shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, group_cols: Sequence[str], value_col: str, rsd: float = 0.02
) -> DataFrame:
    """Per-group HLL++ distinct estimate alongside the group row count.
    rsd = target relative standard deviation (default 2%)."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct"),
    )


def approx_distinct_with_exact(
    df: DataFrame, group_cols: Sequence[str], value_col: str, rsd: float = 0.02
) -> DataFrame:
    """Sketch + exact distinct in ONE aggregate pass (Catalyst expands
    the distinct alongside the HLL partials). The suite uses this to
    emit the sketch's error bound as a driver-checkable boolean; at
    100 TB you would drop the exact column and keep only the sketch —
    the exact distinct is the shuffle the sketch exists to avoid."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(value_col).alias("n_users"),
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct"),
    )


def approx_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probs: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantile-sketch estimates at the given probabilities;
    rank error <= 1/accuracy. One map-side-combinable aggregate."""
    cols = [
        F.percentile_approx(value_col, p, accuracy).alias(f"p{int(p * 100):02d}")
        for p in probs
    ]
    return df.groupBy(*group_cols).agg(*cols)


def heavy_hitters(
    df: DataFrame, value_col: str, min_support: float = 0.001
) -> DataFrame:
    """EXACT heavy hitters — every value with frequency >=
    ceil(min_support * N) — in two bounded-shuffle passes (the
    canonical 100 TB top-k pattern; no reference counterpart,
    extension like the other sketches).

    Why not one groupBy: over a high-cardinality column (user ids) the
    exact groupBy shuffles ~every distinct value; over 100 TB that IS
    the job.  Heavy hitters admit a two-pass scheme whose shuffle is
    bounded by the answer size, not the cardinality:

      pass 1 (candidates) — per-partition exact value counts via
        Arrow-batched ``mapInPandas``; a partition emits only values
        that are locally frequent (local_count >= min_support *
        local_rows).  Pigeonhole: a globally frequent value must be
        locally frequent in at least one partition, so the candidate
        set has NO false negatives (deterministic — stronger than
        sample-based candidate generation).  Candidates per partition
        <= 1/min_support: metadata-sized.
      pass 2 (verify) — exact count of the candidate values only,
        via broadcast semi-join + one tiny groupBy; false positives
        from pass 1 die here.  Output is EXACT, so a plain SQL
        HAVING-count oracle checks it.

    Per-partition state is the partition's distinct-value counts; with
    the default 128 MB maxPartitionBytes that is bounded by partition
    rows.  (A fixed-size Misra-Gries summary is the drop-in upgrade if
    per-partition cardinality ever outgrows memory; the two-pass
    structure and its guarantee are unchanged.)
    """
    import math

    import pandas as pd

    n_total = df.count()
    if n_total == 0:
        return (
            df.select(value_col)
            .withColumn("cnt", F.lit(0).cast("bigint"))
            .withColumn("support", F.lit(0.0))
            .limit(0)
        )
    threshold = max(1, math.ceil(min_support * n_total))

    schema = df.select(value_col).schema

    def _local_frequent(batches):
        counts: dict = {}
        local_n = 0
        for pdf in batches:
            local_n += len(pdf)
            vc = pdf.iloc[:, 0].value_counts(dropna=True)
            for v, c in vc.items():
                counts[v] = counts.get(v, 0) + int(c)
        cut = min_support * local_n
        keep = [v for v, c in counts.items() if c >= cut]
        yield pd.DataFrame({schema[0].name: keep})

    candidates = (
        df.select(value_col).mapInPandas(_local_frequent, schema).distinct()
    )
    return (
        df.join(F.broadcast(candidates), on=value_col, how="left_semi")
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(threshold))
        .withColumn("support", F.col("cnt") / F.lit(float(n_total)))
    )


def mergeable_distinct_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    segment_col: str,
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-(group, segment) DataSketches HLL sketches — the STORABLE
    form (a binary column). The 100 TB rollup pattern: sketch each
    partition/day once at ingest, persist the sketches, and answer any
    later cross-segment distinct question by UNIONING sketches instead
    of rescanning raw data — the re-aggregation an incremental MV needs
    for COUNT(DISTINCT), which plain additive rollups cannot express."""
    return df.groupBy(*group_cols, segment_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_distinct_sketches(
    sketches: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Union stored per-segment sketches to per-group distinct
    estimates. Fixed-size mergeable state: the shuffle carries one
    fixed-register sketch per (group, segment), never the values; the
    union adopts the stored sketches' lgConfigK."""
    return sketches.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )
