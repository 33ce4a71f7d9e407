"""WebDataset tar shards: roundtrip fidelity, byte-reproducible
shards, multi-extension samples, collate regrouping."""

from __future__ import annotations

import hashlib
import os
import tarfile

from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators import webdataset


def _df(spark, n=50):
    return spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("text for doc "), F.col("id").cast("string")).alias("txt"),
        F.encode(F.concat(F.lit("meta"), F.col("id").cast("string")), "UTF-8").alias(
            "meta"
        ),
    )


def test_roundtrip_members(spark, tmp_path):
    path = str(tmp_path / "wds")
    webdataset.write_webdataset(
        _df(spark), path, "id", {"txt": "txt", "json": "meta"}, num_shards=4
    )
    shards = sorted(f for f in os.listdir(path) if f.endswith(".tar"))
    assert len(shards) == 4
    members = webdataset.read_webdataset(spark, path)
    assert members.count() == 100  # 50 samples x 2 members
    got = {
        (r.key, r.ext): bytes(r.payload)
        for r in members.collect()
    }
    assert got[("7", "txt")] == b"text for doc 7"
    assert got[("7", "json")] == b"meta7"


def test_shards_are_byte_reproducible(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    # different input partitioning, same corpus
    webdataset.write_webdataset(_df(spark), p1, "id", {"txt": "txt"}, num_shards=3)
    webdataset.write_webdataset(
        _df(spark).repartition(13), p2, "id", {"txt": "txt"}, num_shards=3
    )
    for f in sorted(os.listdir(p1)):
        h1 = hashlib.md5(open(os.path.join(p1, f), "rb").read()).hexdigest()
        h2 = hashlib.md5(open(os.path.join(p2, f), "rb").read()).hexdigest()
        assert h1 == h2, f


def test_sample_members_adjacent_in_shard(spark, tmp_path):
    # the WebDataset contract: a sample's members are stored adjacently
    path = str(tmp_path / "adj")
    webdataset.write_webdataset(
        _df(spark, 20), path, "id", {"txt": "txt", "json": "meta"}, num_shards=2
    )
    for f in os.listdir(path):
        with tarfile.open(os.path.join(path, f)) as tf:
            names = [m.name for m in tf]
        keys = [n.rpartition(".")[0] for n in names]
        # each key appears in one contiguous run
        seen = set()
        prev = None
        for k in keys:
            if k != prev:
                assert k not in seen, f"members of {k} not adjacent: {names}"
                seen.add(k)
            prev = k


def test_samples_from_members(spark, tmp_path):
    path = str(tmp_path / "col")
    webdataset.write_webdataset(
        _df(spark, 10), path, "id", {"txt": "txt", "json": "meta"}, num_shards=2
    )
    members = webdataset.read_webdataset(spark, path)
    samples = webdataset.samples_from_members(members, ["txt", "json"])
    assert samples.count() == 10
    r = samples.where("key = '3'").collect()[0]
    assert bytes(r.txt) == b"text for doc 3" and bytes(r.json) == b"meta3"


def test_roundtrip_adversarial_payloads(spark, tmp_path):
    # binary payloads that break naive container handling: empty,
    # null bytes, tar-block-sized (512) and off-by-one payloads,
    # 1 MiB blob
    rows = [
        ("a", b""),
        ("b", b"\x00" * 512),
        ("c", b"\xff" * 511),
        ("d", b"\x01\x02" * 256 + b"\x03"),  # 513 bytes
        ("e", bytes(range(256)) * 4096),  # 1 MiB
    ]
    df = spark.createDataFrame(rows, "k string, payload binary")
    path = str(tmp_path / "nasty")
    webdataset.write_webdataset(df, path, "k", {"bin": "payload"}, num_shards=2)
    members = webdataset.read_webdataset(spark, path)
    got = {r.key: bytes(r.payload) for r in members.collect()}
    assert got == dict(rows)
