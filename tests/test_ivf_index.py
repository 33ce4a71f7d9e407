"""Persisted IVF index: identical results to the inline path, and the
partition-pruning contract — probes prune the file listing, the scan
never touches unprobed cells (SCALE.md's promised artifact form)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators import similarity
from tests.test_plan_quality import plan_of


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_indexed_matches_inline(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3)
    idx_path = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, "vec_id", "embedding", idx_path, num_centroids=8)
    got = sorted(
        (r.query_id, r.neighbor_id, r.rank, r.cosine)
        for r in similarity.ivf_indexed_topk(
            spark, idx_path, queries, k=5, nprobe=3
        ).collect()
    )
    want = sorted(
        (r.query_id, r.neighbor_id, r.rank, r.cosine)
        for r in similarity.ivf_topk(
            emb, queries, "vec_id", "embedding", k=5, num_centroids=8, nprobe=3
        ).collect()
    )
    assert got == want and len(got) == 3 * 5


def test_indexed_scan_prunes_partitions(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 2)
    idx_path = str(tmp_path / "ivf")
    meta = similarity.build_ivf_index(
        emb, "vec_id", "embedding", idx_path, num_centroids=8
    )
    out = similarity.ivf_indexed_topk(spark, idx_path, queries, k=5, nprobe=2)
    # the scan must carry a LITERAL partition IN-filter over at most
    # |queries| x nprobe cells — pruning in the file listing, before a
    # byte of data is read (inputFiles() reports pre-pruning files, so
    # the plan is the thing to pin)
    import re

    plan = plan_of(spark, out)
    pf_line = plan.split("PartitionFilters:", 1)[1].splitlines()[0]
    m = re.search(r"centroid_id[^ ]* as bigint\) IN \(([^)]*)\)|centroid_id#\d+ IN \(([^)]*)\)", pf_line)
    assert m, pf_line
    in_list = (m.group(1) or m.group(2)).split(",")
    assert 0 < len(in_list) <= 2 * 2 < meta["num_centroids"]
