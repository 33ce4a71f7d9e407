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
