"""Arrow vecmath kernels (round-13) must be BIT-IDENTICAL to the
Catalyst fold forms they replace — the driver re-hashes every query
against the DuckDB oracle, so these are equality pins, not closeness
checks. Each test runs the same operator with USE_ARROW on and off
(monkeypatched) over fixture data PLUS edge rows (zero vector, NULL
vector, tie-prone duplicates) and compares collected results exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators import (
    clustering,
    quantize,
    similarity,
    vecmath,
)
from dbt_maxcompute_spark.sources.registry import load_table


@pytest.fixture()
def emb_with_edges(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    edge = spark.createDataFrame(
        [
            (90001, [0.0] * dim, 0),  # zero vector: cosine denom == 0
            (90002, None, 0),  # NULL vector
            (90003, [1.0] + [0.0] * (dim - 1), 0),  # tie-prone dup
            (90004, [1.0] + [0.0] * (dim - 1), 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    return emb.unionByName(edge)


def _both(fn):
    """(arrow_result, fold_result) of the same callable."""
    orig = vecmath.USE_ARROW
    try:
        vecmath.USE_ARROW = True
        a = fn()
        vecmath.USE_ARROW = False
        b = fn()
    finally:
        vecmath.USE_ARROW = orig
    return a, b


def test_assign_cells_bit_identical(spark, sf_dir, emb_with_edges):
    emb = load_table(spark, sf_dir, "embeddings")
    centroids, _ = similarity.ivf_assign(emb, "vec_id", "embedding", 16, 42)
    cent = sorted(centroids.collect(), key=lambda r: r["centroid_id"])
    ids = [r["centroid_id"] for r in cent]
    umat = [
        similarity._unit([float(x) for x in r["centroid_vec"]]) for r in cent
    ]
    a, b = _both(
        lambda: sorted(
            (r["vec_id"], r["centroid_id"])
            for r in similarity._assign_cells(
                emb_with_edges, "embedding", ids, umat
            ).collect()
        )
    )
    assert a == b


def test_pq_codes_bit_identical(spark, sf_dir, emb_with_edges):
    emb = load_table(spark, sf_dir, "embeddings")
    cb = quantize.pq_codebook(emb, "vec_id", "embedding", m=8, ks=32, seed=42)
    a, b = _both(
        lambda: sorted(
            (
                r["vec_id"],
                tuple(r["__codes"]) if r["__codes"] is not None else None,
            )
            for r in quantize.pq_encode(
                emb_with_edges.select(
                    "vec_id", F.col("embedding").alias("__cv")
                ),
                "__cv",
                cb,
            ).collect()
        )
    )
    assert a == b


def test_cosine_pairs_bit_identical(spark, emb_with_edges):
    # cross of 60 x 20 rows including the zero/NULL/dup edges; exact
    # float equality (NaN/NULL positions must match too)
    pairs = (
        emb_with_edges.limit(60)
        .select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
        .crossJoin(
            emb_with_edges.limit(20).select(
                F.col("vec_id").alias("ib"), F.col("embedding").alias("vb")
            )
        )
    )
    a, b = _both(
        lambda: sorted(
            (r["ia"], r["ib"], r["c"])
            for r in pairs.withColumn(
                "c", similarity.cosine_expr(F.col("va"), F.col("vb"))
            ).collect()
        )
    )
    assert a == b


def test_cosine_mismatched_lengths_match_fold(spark):
    # zip_with null-padding semantics: dot is NULL when lengths differ,
    # so result is NULL unless the norm product is 0 (then 0.0)
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0], [1.0, 2.0, 3.0]),
            (2, [0.0, 0.0], [0.0, 0.0, 0.0]),
            (3, [1.0], [1.0]),
        ],
        "i long, a array<double>, b array<double>",
    )
    a, b = _both(
        lambda: [
            (r["i"], r["c"])
            for r in df.withColumn(
                "c", similarity.cosine_expr(F.col("a"), F.col("b"))
            )
            .orderBy("i")
            .collect()
        ]
    )
    assert a == b


def test_kmeans_assign_and_profile_bit_identical(spark, sf_dir, emb_with_edges):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(8).collect()
    ]
    a, b = _both(
        lambda: sorted(
            (r["vec_id"], r["cluster"])
            for r in clustering.assign_clusters(
                emb_with_edges, "embedding", cents
            ).collect()
        )
    )
    assert a == b
    a, b = _both(
        lambda: [
            tuple(r)
            for r in clustering.kmeans_cluster_profile(
                emb, "vec_id", "embedding", k=8, max_iter=4
            ).collect()
        ]
    )
    assert a == b


def test_pq_lut_bit_identical(spark, sf_dir, emb_with_edges):
    emb = load_table(spark, sf_dir, "embeddings")
    cb = quantize.pq_codebook(emb, "vec_id", "embedding", m=8, ks=16, seed=42)

    def lut_rows():
        return (
            quantize.pq_lut(
                emb_with_edges.select("vec_id", "embedding"), "embedding", cb
            )
            .orderBy("vec_id")
            .collect()
        )

    a, b = _both(lut_rows)
    assert repr(a) == repr(b)


def test_adc_score_bit_identical(spark, sf_dir, emb_with_edges):
    emb = load_table(spark, sf_dir, "embeddings")
    cb = quantize.pq_codebook(emb, "vec_id", "embedding", m=8, ks=16, seed=42)

    def scored_rows():
        coded = quantize.pq_encode(
            emb_with_edges.select("vec_id", "embedding"), "embedding", cb
        )
        lut = quantize.pq_lut(
            emb.filter(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("qid"), "embedding"
            ),
            "embedding",
            cb,
        ).select("qid", "__lut")
        return (
            coded.crossJoin(F.broadcast(lut))
            .select(
                "vec_id",
                "qid",
                quantize.pq_adc_score(F.col("__lut"), F.col("__codes")).alias("s"),
            )
            .orderBy("vec_id", "qid")
            .collect()
        )

    a, b = _both(scored_rows)
    assert repr(a) == repr(b)


def test_ivfpq_topk_arrow_and_fold_agree(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)

    def run():
        return (
            similarity.ivfpq_topk(
                emb, queries, "vec_id", "embedding",
                k=5, num_centroids=8, nprobe=4, m=8, ks=16, cand_mult=8,
            )
            .orderBy("query_id", "rank")
            .collect()
        )

    a, b = _both(run)
    assert repr(a) == repr(b)


def test_lit_matrix_bit_identical_to_elementwise(spark):
    """_lit_matrix builds the C x dim literal matrix with ONE SQL parse
    (round-14 driver-time fix: the F.array(F.lit...) form costs C*dim+C
    py4j round trips, ~1 s per 16x64 probe). The repr->CAST('..' AS
    DOUBLE) round trip must reproduce the exact binary64 of every
    element, including negative zero, denormals, and max-magnitude
    doubles — compare raw bit patterns, not ==."""
    import struct

    vals = [
        -0.0, 0.0, 5e-324, 1.7976931348623157e308, 0.1, 1 / 3,
        -2.2250738585072014e-308, 123456789.123456789, -1e-15,
        0.30000000000000004, 2.0 ** -1074 * 3, 9007199254740993.0,
        -1.0, 2.5, 1e16 + 2, 7.2,
    ]
    mat = [vals[i : i + 4] for i in range(0, len(vals), 4)]
    elementwise = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in mat]
    )
    parsed = similarity._lit_matrix(mat)
    row = spark.range(1).select(
        elementwise.alias("a"), parsed.alias("b")
    ).first()

    def bits(m):
        return [[struct.pack("<d", x) for x in r] for r in m]

    assert bits(row["a"]) == bits(row["b"])


def test_lit_ids_and_neg_idx_match_elementwise(spark):
    """_lit_ids/_neg_idx_arr (one SQL parse per array) must reproduce
    the element-wise F.lit forms exactly — values AND column types,
    since element_at's result type feeds the declared schemas."""
    cases = [
        [1, 2, 3],                                   # int
        [2**40, -5, 0],                              # long
        ["7", "c-1", "a b"],                         # safe strings
    ]
    for ids in cases:
        a, b = (
            spark.range(1)
            .select(
                F.array(*[F.lit(i) for i in ids]).alias("a"),
                similarity._lit_ids(ids).alias("b"),
            )
            .first()
        )
        assert a == b
        df = spark.range(1).select(
            F.array(*[F.lit(i) for i in ids]).alias("a"),
            similarity._lit_ids(ids).alias("b"),
        )
        assert df.schema["a"].dataType == df.schema["b"].dataType
    # string rendering of native ids (the _residual_expr site)
    sa, sb = (
        spark.range(1)
        .select(
            F.array(*[F.lit(str(i)) for i in [10, 11]]).alias("a"),
            similarity._lit_ids([10, 11], as_string=True).alias("b"),
        )
        .first()
    )
    assert sa == sb
    # unsafe strings take the fallback path, still exact
    odd = ["it's", 'a"b']
    oa, ob = (
        spark.range(1)
        .select(
            F.array(*[F.lit(s) for s in odd]).alias("a"),
            similarity._lit_ids(odd).alias("b"),
        )
        .first()
    )
    assert oa == ob
    # negated index sequence: values and long type
    df = spark.range(1).select(
        F.array(*[F.lit(-i).cast("long") for i in range(5)]).alias("a"),
        similarity._neg_idx_arr(5).alias("b"),
    )
    r = df.first()
    assert r["a"] == r["b"]
    assert df.schema["a"].dataType == df.schema["b"].dataType
