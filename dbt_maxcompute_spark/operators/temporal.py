"""Temporal joins Spark lacks as primitives: as-of join and range join.

No counterpart in the reference (extension per BASELINE.json); both are
staples of event-stream feature engineering (latest-state-at-time
lookups, windowed correlation counts).

Scale design — the two classic blowups and their avoidance:

- **as-of join**: the naive formulation (join on key + ts inequality,
  then keep the max right ts per left row) explodes to |L| x |R| per
  key before pruning. Instead: UNION the two tagged inputs, ONE window
  per key ordered by (ts, side, id), and carry the right payload
  forward with last(ignorenulls) — every left row reads the most
  recent right row at or before its timestamp. One shuffle on the key,
  zero row amplification, any key cardinality.
- **range join**: Spark plans key-equi + ts-range as a join with a
  range condition — fine per key until a hot key makes it quadratic.
  Binning makes it an EQUI-join: right rows land in floor(ts/w) bins,
  left rows enumerate the few bins covering [ts+lo, ts+hi], the exact
  predicate filters after the hash join. Row amplification is
  ceil((hi-lo)/w)+1 per left row — chosen, bounded, and independent of
  key skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: str,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    (right_ts, tiebreak) such that right_ts <= left_ts, per key
    (backward as-of, inclusive — DuckDB `ASOF JOIN ... ON l.ts >= r.ts`
    semantics with a deterministic tiebreak). Left rows with no prior
    right row keep NULL payloads (left join)."""
    lcols = left.columns
    out_payload = [f"{prefix}{c}" for c in [right_ts, tiebreak, *right_payload]]

    l_side = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_l"),
        F.lit(None).cast("long").alias("__tb"),
        F.struct(*lcols).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in [right_ts, tiebreak, *right_payload]],
    )
    r_side = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_l"),
        F.col(tiebreak).cast("long").alias("__tb"),
        F.lit(None).cast(l_side.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in [right_ts, tiebreak, *right_payload]],
    )
    # right rows sort before left at equal ts (inclusive <=); among
    # right rows at the same ts the greatest tiebreak wins
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts"), F.col("__is_l"), F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(out)
        for c, out in zip([right_ts, tiebreak, *right_payload], out_payload)
    ]
    return (
        l_side.unionByName(r_side)
        .select("__is_l", "__l", *carried)
        .filter(F.col("__is_l") == 1)
        .select(*[F.col(f"__l.{c}").alias(c) for c in lcols], *out_payload)
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    bin_seconds: float = 300.0,
) -> DataFrame:
    """All (left, right) pairs with same key and
    right_ts in [left_ts + lower_s, left_ts + upper_s). Equi-join on
    (key, time bin) with bounded left-side bin enumeration, exact
    filter after."""
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    clash = (set(left.columns) & set(right.columns)) - {key}
    if clash:
        raise ValueError(f"rename right columns colliding with left: {sorted(clash)}")
    r_bin = F.floor(F.unix_micros(F.col(right_ts)) / F.lit(int(bin_seconds * 1e6)))
    r = right.withColumnRenamed(key, "__k").withColumn("__bin", r_bin)
    l_us = F.unix_micros(F.col(left_ts))
    lo_bin = F.floor((l_us + F.lit(int(lower_s * 1e6))) / F.lit(int(bin_seconds * 1e6)))
    hi_bin = F.floor((l_us + F.lit(int(upper_s * 1e6))) / F.lit(int(bin_seconds * 1e6)))
    l = left.withColumn("__bin", F.explode(F.sequence(lo_bin, hi_bin))).withColumnRenamed(
        key, "__k"
    )
    exact = (F.unix_micros(F.col(right_ts)) >= l_us + F.lit(int(lower_s * 1e6))) & (
        F.unix_micros(F.col(right_ts)) < l_us + F.lit(int(upper_s * 1e6))
    )
    return (
        l.join(r, ["__k", "__bin"])
        .filter(exact)
        .withColumnRenamed("__k", key)
        .drop("__bin")
    )
