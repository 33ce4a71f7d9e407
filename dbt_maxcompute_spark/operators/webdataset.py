"""WebDataset-style tar shards: the container format multimodal
training corpora actually ship in (one sample = adjacently-stored tar
members ``<key>.<ext>``; a corpus = many ``shard-NNNNN.tar`` files).

No counterpart in the reference (extension per BASELINE.json).
Stdlib ``tarfile`` only — no external deps.

Scale design:
- The WRITER assigns every sample a deterministic shard id
  (``xxhash64(key) % num_shards`` — content-stable, so re-runs place
  samples identically), repartitions so each shard is exactly one
  task, and each task streams its samples into ``shard-NNNNN.tar``
  via ``foreachPartition``. Executors write directly to the shared
  filesystem (POSIX dir here; an object-store mount on a cluster) —
  no driver funnel, no full-corpus collect.
- The READER is ``spark.read.format("binaryFile")`` over the shard
  files (one task per shard, Spark's standard whole-file source) and
  an Arrow-batched ``mapInPandas`` that walks each tar stream into
  member rows. Tar parsing is sequential per shard by design — that
  is the format's contract (sequential I/O, no per-member seeks) and
  why training loaders stream it.
- Shard size is the parallelism knob: ``num_shards`` should be >= the
  cluster's task slots and sized so one shard's bytes stream through
  one task's memory (the reader never materializes more than a batch
  of members at once beyond the tar blob itself).
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEMBER_SCHEMA = StructType(
    [
        StructField("shard", StringType()),
        StructField("key", StringType()),
        StructField("ext", StringType()),
        StructField("payload", BinaryType()),
        StructField("byte_len", LongType()),
    ]
)

# tar timestamps are pinned for byte-reproducible shards (same corpus
# -> same bytes -> content-addressable caching works downstream)
_EPOCH = 0


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    payload_cols: dict[str, str],
    num_shards: int = 16,
) -> None:
    """Pack ``df`` into ``path/shard-NNNNN.tar``.

    ``payload_cols`` maps extension -> binary/string column; each row
    becomes one sample whose members are ``<key>.<ext>`` stored
    adjacently (the WebDataset contract). Shard assignment is
    ``xxhash64(key) % num_shards`` — deterministic and content-stable.
    Keys sort within a shard so shard bytes are reproducible.
    """
    os.makedirs(path, exist_ok=True)
    # overwrite semantics, like every other sink: a re-run with fewer
    # shards or different data must not leave stale tars that the reader
    # would ingest as phantom members (ADVICE r3)
    for f in os.listdir(path):
        if f.startswith("shard-") and f.endswith(".tar"):
            os.unlink(os.path.join(path, f))
    exts = sorted(payload_cols)
    cols = [F.col(key_col).cast("string").alias("__key")] + [
        F.col(payload_cols[e]).cast("binary").alias(f"__p_{e}") for e in exts
    ]
    shard = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(num_shards))
    src = df.select(shard.alias("__shard"), *cols).repartition(
        num_shards, F.col("__shard")
    )

    def write_partition(rows) -> None:
        buf: dict[int, list] = {}
        for r in rows:
            buf.setdefault(int(r["__shard"]), []).append(r)
        for sid, rs in buf.items():
            fname = os.path.join(path, f"shard-{sid:05d}.tar")
            with tarfile.open(fname, "w") as tf:
                for r in sorted(rs, key=lambda x: x["__key"]):
                    for e in exts:
                        data = r[f"__p_{e}"]
                        if data is None:
                            continue
                        data = bytes(data)
                        info = tarfile.TarInfo(name=f"{r['__key']}.{e}")
                        info.size = len(data)
                        info.mtime = _EPOCH
                        tf.addfile(info, io.BytesIO(data))

    src.foreachPartition(write_partition)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Member rows from every ``*.tar`` under ``path``.

    One binaryFile task per shard; the tar walk happens inside an
    Arrow-batched ``mapInPandas`` so member payloads move in Arrow
    buffers, never row-at-a-time through pickle."""
    blobs = spark.read.format("binaryFile").load(os.path.join(path, "*.tar"))

    def unpack(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(p)
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        data = tf.extractfile(m).read()
                        key, _, ext = m.name.rpartition(".")
                        out.append(
                            {
                                "shard": shard,
                                "key": key,
                                "ext": ext,
                                "payload": data,
                                "byte_len": len(data),
                            }
                        )
            yield pd.DataFrame(
                out, columns=["shard", "key", "ext", "payload", "byte_len"]
            )

    return blobs.select("path", "content").mapInPandas(unpack, MEMBER_SCHEMA)


def samples_from_members(members: DataFrame, exts: list[str]) -> DataFrame:
    """Re-group member rows into one row per sample key with a column
    per extension — the shape a training collate step consumes. One
    hash agg on key (members of a sample are adjacent in a shard, so
    the shuffle is shard-local in practice)."""
    agg = [
        F.max(F.when(F.col("ext") == e, F.col("payload"))).alias(e) for e in exts
    ]
    return members.groupBy("key").agg(*agg)
