"""Multimodal (image/audio/video) column plumbing.

No counterpart in the reference (extension per BASELINE.json). Media
payloads are opaque ``binary`` columns plus a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The actual codec step is STUBBED (no
image/audio libs in this container): ``decode_media`` raises
NotImplementedError unless ``fake=True``, in which case it produces
deterministic pseudo-features derived from the bytes — the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested.

Scale design:
- Binary payloads never pass through Python row-at-a-time: Arrow
  batches only (`mapInPandas`), with `maxRecordsPerBatch` sized so a
  batch of payloads fits executor memory (set
  spark.sql.execution.arrow.maxRecordsPerBatch accordingly).
- Metadata-only operations (byte length, content hash, format sniff)
  are pure Catalyst — no Python at all.
- At 100 TB, repartition by a size-balanced key before the decode
  stage so one executor doesn't get all the 4K videos
  (`repartition_by_size`).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Literal

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_KINDS = ("image", "audio", "video")

# Canonical media schema: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def binary_metadata(payload: Column) -> list[Column]:
    """Pure-Catalyst metadata over a binary column — no decode needed."""
    return [
        F.length(payload).cast("long").alias("byte_len"),
        F.md5(payload).alias("content_md5"),
    ]


def attach_fake_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Test-fixture helper: synthesize a binary payload from a text
    column (UTF-8 encode) so the media pipeline can run on the
    `documents` fixture. Real pipelines read payloads from object
    storage or parquet binary columns."""
    payload = F.encode(F.col(text_col), "UTF-8")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.col(id_col) % len(MEDIA_KINDS) + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        *binary_metadata(payload),
    )


def repartition_by_size(df: DataFrame, num_partitions: int, byte_len_col: str = "byte_len") -> DataFrame:
    """Spread large payloads: salt by byte-length bucket so each output
    partition holds a mix of sizes (avoids one straggler partition of
    all-huge videos at scale)."""
    salt = F.xxhash64(F.col(byte_len_col), F.monotonically_increasing_id())
    return df.repartition(num_partitions, salt)


def decode_media(
    df: DataFrame,
    fake: bool = False,
    kind_filter: Literal["image", "audio", "video"] | None = None,
) -> DataFrame:
    """Decode payloads → feature rows via Arrow-batched mapInPandas.

    STUB: real decode needs PIL/ffmpeg (absent here). ``fake=True``
    derives deterministic pseudo-features from the payload bytes so the
    distributed plumbing (schema, batching, partition behavior) is
    fully exercised; ``fake=False`` raises NotImplementedError inside
    the task, exactly where the codec call would go.
    """
    src = df if kind_filter is None else df.filter(F.col("kind") == kind_filter)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio codecs not present in "
                    "this environment; run with fake=True for the "
                    "deterministic stub"
                )
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                h = hashlib.md5(bytes(payload)).digest()
                rows.append(
                    {
                        "media_id": int(media_id),
                        "kind": kind,
                        "width": 16 + h[0] % 240,
                        "height": 16 + h[1] % 240,
                        "n_frames": 1 if kind != "video" else 1 + h[2] % 64,
                        "mean_intensity": round(h[3] / 255.0, 6),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return src.select("media_id", "kind", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample(features: DataFrame, every_n: int = 8) -> DataFrame:
    """Sample frame indices 0, every_n, 2*every_n, ... per video row —
    pure Catalyst explode, no Python. Non-video rows pass through with
    frame_idx 0."""
    idxs = F.when(
        F.col("kind") == "video",
        F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)),
    ).otherwise(F.array(F.lit(0)))
    return features.withColumn("frame_idx", F.explode(idxs))
