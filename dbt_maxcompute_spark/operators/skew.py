"""Explicit skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting handles many cases at runtime, but two
shapes still need explicit salting at 100 TB:

* aggregation over a LOW-CARDINALITY group key (3 return flags over
  6 B rows → 3 reduce tasks own the whole table);
* a shuffle join where one key's rows exceed what one task can hold
  and the build side cannot broadcast.

Both transforms are exact — they re-associate decomposable aggregates
or replicate the small side across salts — so plain SQL oracles check
them outright.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregate spec ops supported by salted_aggregate (decomposable:
#: partial per (key, salt) then re-associated per key)
_PARTIAL = {
    "sum": F.sum,
    "count": None,  # special-cased (count -> sum of partial counts)
    "min": F.min,
    "max": F.max,
}
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    salt: int = 32,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed/low-cardinality group keys:
    ``aggs`` is (column, op, alias) with op in sum/count/min/max.
    ``("x", "count", a)`` is SQL COUNT(x) — nulls excluded; use
    ``("*", "count", a)`` (or column None) for COUNT(*).

    Phase 1 groups by (key, salt) — the shuffle spreads every hot key
    over ``salt`` reducers; phase 2 merges the ``salt`` partials per
    key — a shuffle of |keys|*salt tiny rows.  Exactness comes from
    decomposability: sum of sums, sum of counts, min of mins, max of
    maxes.  ``salt_on`` picks the column whose hash spreads rows
    (default: a per-partition row index via ``monotonically_increasing_id``,
    which never changes results — only placement).

    Spark's own partial aggregation already does map-side combine; the
    explicit salt matters when the MERGE side is the bottleneck:
    3 distinct keys mean 3 final reducers no matter how many partials
    fed them, and per-reducer state (e.g. exact distinct downstream)
    blows up. This is the documented escape hatch.
    """
    for _, op, _ in aggs:
        if op not in _MERGE:
            raise ValueError(f"unsupported op {op!r} (need sum/count/min/max)")
    src = F.col(salt_on) if salt_on else F.monotonically_increasing_id()
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(src), F.lit(salt)))
    # SQL COUNT semantics: count(col) skips nulls; pass "*" (or None)
    # for count(*). Partials merge by sum either way.
    partial = salted.groupBy(*group_cols, "__salt").agg(
        *[
            (
                (F.count(F.lit(1)) if c in (None, "*") else F.count(F.col(c)))
                if op == "count"
                else _PARTIAL[op](c)
            ).alias(f"__p_{a}")
            for c, op, a in aggs
        ]
    )
    return partial.groupBy(*group_cols).agg(
        *[_MERGE[op](f"__p_{a}").alias(a) for _, op, a in aggs]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Inner equi-join where ``skewed``'s hot keys overflow single
    reduce tasks and ``small`` cannot broadcast: the skewed side gets a
    deterministic salt, the small side is replicated across all
    ``salt`` values (one explode of a ``sequence`` literal — |small| x
    salt rows, the explicit price of spreading the hot key), and the
    join key becomes (key, salt) so every hot key spans ``salt`` tasks.

    Result is EXACTLY the plain inner join: every skewed row meets
    every matching small row exactly once (at its own salt).
    """
    src = F.col(salt_on) if salt_on else F.monotonically_increasing_id()
    left = skewed.withColumn("__salt", F.pmod(F.xxhash64(src), F.lit(salt)))
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(salt - 1).cast("long")))
    )
    return left.join(right, [key, "__salt"]).drop("__salt")
