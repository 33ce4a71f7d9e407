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
