"""Deterministic hash-based sampling and dataset splits.

Training pipelines need samples and train/valid/test splits that are
(a) reproducible across runs and engines, (b) stable under
repartitioning, and (c) cheap at 100 TB. Random sampling
(``df.sample``) is none of these — its output depends on partition
layout. Hash-bucket assignment is all three: bucket =
first-6-hex-digits of md5(id) mod 10_000, a pure per-row expression
(no shuffle, no state, same answer in any engine with md5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(id_col: Column) -> Column:
    """Stable bucket in [0, 10000) from the row id — md5-based so any
    engine reproduces it (xxhash64 would be Spark-only)."""
    hex6 = F.substring(F.md5(id_col.cast("string")), 1, 6)
    return (F.conv(hex6, 16, 10).cast("bigint") % BUCKETS).cast("int")


def hash_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Keep ~fraction of rows, deterministically by id."""
    return df.filter(hash_bucket(F.col(id_col)) < int(round(fraction * BUCKETS)))


def hash_split(df: DataFrame, id_col: str, weights: dict[str, float]) -> DataFrame:
    """Assign each row a split label by cumulative weight thresholds
    over the hash bucket. Weights must sum to 1 (±1e-9)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(F.col(id_col))
    expr = None
    acc = 0.0
    for name, w in weights.items():
        acc += w
        cond = bucket < int(round(acc * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # float rounding could leave the last bucket unlabeled; close it
    last = list(weights)[-1]
    return df.withColumn("split", expr.otherwise(F.lit(last)))


def quota_cap(
    df: DataFrame, group_cols: list[str], id_col: str, cap: int
) -> DataFrame:
    """Cap each group at ``cap`` rows — the domain-quota op corpus
    curation runs so one mega-domain can't dominate the training mix.
    Keeps the ``cap`` rows ranking first by md5(id) (deterministic,
    engine-neutral; any engine keeps the identical rows).

    Cost: one shuffle on the group key; the per-group sort is the
    window's. A domain with billions of docs makes that sort the
    bottleneck — there, pre-filter with ``hash_sample`` at a fraction
    that overshoots the cap (e.g. 3x cap / est_count) first, so the
    exact window only ranks a few-times-cap candidate set per group.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def quota_cap_audit(
    df: DataFrame, group_cols: list[str], id_col: str, cap: int
) -> DataFrame:
    """Per-group audit of what ``quota_cap`` would keep/drop — in ONE
    pass: rank inside the same window quota_cap uses, then aggregate
    kept/total counts on the group key. The groupBy reuses the
    window's hash partitioning, so the plan is one scan + one
    exchange; materializing the kept set and re-scanning for totals
    would read the corpus twice."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.select(*group_cols, F.row_number().over(w).alias("__rn"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("__rn") <= cap, 1)).alias("n_kept"),
        )
        .withColumn("n_dropped", F.col("n_total") - F.col("n_kept"))
    )


def weighted_sample(df: DataFrame, id_col: str, weight: Column) -> DataFrame:
    """Deterministic importance sampling: keep each row with
    probability = clamp(weight, 0, 1), decided by comparing a uniform
    md5-derived u(id) in [0,1) against the row's weight — the
    quality-weighted mixing step of corpus curation (upsample good
    documents, downsample junk) without RNG state.

    Pure per-row expression: no shuffle, no state, reproducible on any
    engine with md5 (u = first 6 md5 hex digits / 16^6, ~24 bits of
    resolution). E[kept] = sum(weights) exactly.
    """
    u = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10).cast(
        "double"
    ) / float(16**6)
    w = F.least(F.greatest(weight.cast("double"), F.lit(0.0)), F.lit(1.0))
    return df.filter(u < w)


def stratified_sample(
    df: DataFrame, strata_cols: list[str], id_col: str, num: int, denom: int
) -> DataFrame:
    """Exact per-stratum sample: the ceil(n * num/denom) rows of each
    stratum that rank first by md5(id). The fraction is a RATIONAL
    (num/denom) and the keep rule is pure integer arithmetic
    (rn * denom <= n * num + (denom-1) -- i.e. rn <= ceil(n*num/denom))
    so every engine selects the identical rows: no float fraction, no
    engine-specific ceil-of-double edge cases.

    Cost: one shuffle on the strata key; the per-stratum sort is the
    rank's window sort. For mega-strata where even that sort hurts,
    `hash_sample` (threshold on the hash, no sort) gives the same
    determinism with only approximate per-stratum counts.
    """
    if not 0 < num <= denom:
        raise ValueError(f"need 0 < num <= denom, got {num}/{denom}")
    from pyspark.sql import Window

    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    w = Window.partitionBy(*strata_cols).orderBy(*order)
    wn = Window.partitionBy(*strata_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .filter((F.col("__rn") - 1) * denom < F.col("__n") * num)
        .drop("__rn", "__n")
    )
