"""Skew-robust LSH: the bucket-cap quarantine under boilerplate-heavy
input (round-3 verdict stretch item 8).

The 100 TB claim's nastiest input is a corpus where a boilerplate
document repeats thousands of times: every copy lands in the SAME
(band, bh) bucket in every band, and an uncapped bucket self-join goes
quadratic — C(n,2) candidate pairs from one bucket.  The
``max_bucket`` quarantine (operators/dedup.py: hash-agg + broadcast
anti-join) drops those buckets before the self-join, so boilerplate
contributes ZERO candidate pairs and wall-time stays flat.

Three pins:
  * result-level: a corpus with a 10%+ boilerplate block produces the
    same near-dup pairs as the clean corpus (the quarantined block adds
    none) — sharp, deterministic;
  * wall-time: the boilerplate run stays within a small factor of the
    clean run (quadratic blowup would be orders of magnitude);
  * the cap is load-bearing: with the cap lifted at tiny scale, the
    identical block DOES produce its C(n,2) pairs.

Default scale sf0.01 (~5k docs + 1.2k boilerplate); set
SPARK_GRAFT_SKEW_SF=/root/testdata/sf0.1 to reproduce the measured
sf0.1 numbers recorded in SCALE.md.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators.dedup import minhash_lsh_pairs

SKEW_SF = os.environ.get("SPARK_GRAFT_SKEW_SF", "/root/testdata/sf0.01")
CAP = 200
BOILER_COPIES = 1200  # > CAP: every band-bucket of the block overflows

_BOILER = (
    "subscribe to our newsletter terms of service privacy policy all "
    "rights reserved contact us about careers press sitemap help center "
    "cookie settings do not sell my personal information"
)


def _docs(spark):
    return (
        spark.read.parquet(os.path.join(SKEW_SF, "documents.parquet"))
        .select("doc_id", "text")
    )


def _with_boilerplate(spark, docs):
    boiler = spark.range(BOILER_COPIES).select(
        (F.lit(10_000_000) + F.col("id")).alias("doc_id"),
        F.lit(_BOILER).alias("text"),
    )
    return docs.unionByName(boiler)


def _pairs(df, max_bucket=CAP):
    return minhash_lsh_pairs(
        df, "doc_id", "text", num_hashes=32, bands=8, jaccard_threshold=0.5,
        max_bucket=max_bucket,
    )


def test_boilerplate_block_is_quarantined_not_joined(spark):
    docs = _docs(spark)

    t0 = time.perf_counter()
    clean = {(r["id_a"], r["id_b"]) for r in _pairs(docs).collect()}
    t_clean = time.perf_counter() - t0

    t0 = time.perf_counter()
    skewed = {
        (r["id_a"], r["id_b"])
        for r in _pairs(_with_boilerplate(spark, docs)).collect()
    }
    t_skew = time.perf_counter() - t0

    # the quarantined block contributes no pairs; the organic pairs are
    # unchanged (their buckets stay under the cap)
    boiler_pairs = {p for p in skewed if p[0] >= 10_000_000 or p[1] >= 10_000_000}
    assert boiler_pairs == set()
    assert skewed == clean

    # wall-time flat: C(1200,2) ≈ 719k quarantined candidates would
    # dominate the ~seconds clean run if they were joined + verified;
    # generous 5x bound (JVM noise) still catches any quadratic path
    assert t_skew < max(5 * t_clean, t_clean + 10.0), (
        f"skewed run {t_skew:.1f}s vs clean {t_clean:.1f}s — quarantine broken?"
    )


def test_cap_is_load_bearing_at_tiny_scale(spark):
    """Lift the cap on a small identical block: the block's C(n,2)
    pairs DO appear — proving the quarantine (not luck) is what keeps
    the skewed run flat above."""
    n = 60
    block = spark.range(n).select(
        (F.lit(20_000_000) + F.col("id")).alias("doc_id"),
        F.lit(_BOILER).alias("text"),
    )
    pairs = _pairs(block, max_bucket=10**9).collect()
    assert len(pairs) == n * (n - 1) // 2
    assert all(abs(r["jaccard"] - 1.0) < 1e-9 for r in pairs)

    # and with the cap on, the same block yields nothing
    assert _pairs(block, max_bucket=50).count() == 0
