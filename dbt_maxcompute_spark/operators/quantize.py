"""Int8 embedding quantization (symmetric, per-vector scale).

No counterpart in the reference (extension per BASELINE.json). A
100 TB embedding store in float32 is 4x the bytes of int8; symmetric
per-vector quantization (scale = max|x| / 127, q = round(x / scale))
is the standard storage/ANN-recall trade. Pure Catalyst: one
array_max fold for the scale + one transform for the codes — no
Python, no shuffle, safe to chain straight into a partitioned write.

Determinism note: every arithmetic step (cast, abs, max, divide,
round) is correctly-rounded IEEE double math, and round() on DOUBLE is
half-away-from-zero in both Spark and DuckDB — so the codes are
bit-identical across engines and the suite query oracle-checks them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def vector_scale(vec: Column) -> Column:
    """Per-vector symmetric scale: max|x| / 127 (double). Zero vectors
    get scale 0 and quantize to all-zero codes."""
    return (
        F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double")))) / F.lit(127.0)
    )


def quantize_codes(vec: Column, scale: Column) -> Column:
    """array<tinyint> codes; round(x/scale), 0 when scale is 0."""
    return F.transform(
        vec,
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(F.round(x.cast("double") / scale, 0))
        .cast("tinyint"),
    )


def dequantize(codes: Column, scale: Column) -> Column:
    """array<double> reconstruction: code * scale."""
    return F.transform(codes, lambda q: q.cast("double") * scale)


def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, scale, codes) — the stored form. Reconstruction error is
    bounded by scale/2 per component; `max_abs_err` reports the
    realized bound for auditability."""
    scale = vector_scale(F.col(vec_col))
    out = df.select(
        F.col(id_col),
        scale.alias("scale"),
        quantize_codes(F.col(vec_col), scale).alias("codes"),
        F.col(vec_col).alias("__v"),
    )
    err = F.array_max(
        F.zip_with(
            dequantize(F.col("codes"), F.col("scale")),
            F.col("__v"),
            lambda d, x: F.abs(d - x.cast("double")),
        )
    )
    return out.select(id_col, "scale", "codes", err.alias("max_abs_err"))
