"""JSONL (newline-delimited JSON) source + sink.

Reference parity: the adapter ingests flat files only through seeds
(CSV, seeds.py); JSONL is the interchange format large-scale training
pipelines actually exchange (one document per line, schema-on-read),
so the engine treats it as a first-class source.

Scale posture:
- Reads take an EXPLICIT schema. ``spark.read.json`` without one runs
  a full inference pass over the data — at 100 TB that is a second
  scan of the corpus before the first real job. ``schema="infer"``
  opts in explicitly and supports ``samplingRatio`` so the inference
  pass reads a fraction of the files.
- Lines are splittable only when uncompressed or in a splittable
  codec; a single .gz file serializes the whole read onto one task.
  The writer therefore defaults to uncompressed many-file output
  (parallelism = upstream partitions) and refuses single-file shapes
  the reader cannot parallelize.
- Values keep their JSON types; timestamps are parsed with an explicit
  format, never inferred per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    timestamp_format: str = "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]",
    sampling_ratio: float = 1.0,
    permissive: bool = True,
) -> DataFrame:
    """Read newline-delimited JSON with a declared schema.

    ``schema`` is a DDL string or StructType; pass the literal string
    ``"infer"`` to opt in to schema inference (with ``sampling_ratio``
    bounding the inference scan). PERMISSIVE mode (default) keeps
    corrupt lines as NULL rows in a ``_corrupt_record`` column when the
    schema declares one; FAILFAST surfaces them immediately.
    """
    reader = (
        spark.read.option("mode", "PERMISSIVE" if permissive else "FAILFAST")
        .option("timestampFormat", timestamp_format)
    )
    if isinstance(schema, str) and schema == "infer":
        reader = reader.option("samplingRatio", sampling_ratio)
    else:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """Write newline-delimited JSON, one file per task partition.

    ``compression`` accepts splittable-friendly codecs (None, "bzip2")
    or per-file codecs ("gzip", "zstd") — per-file codecs are fine
    because output stays many-file; what the reader cannot parallelize
    is a single concatenated compressed file, which this sink never
    produces.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
