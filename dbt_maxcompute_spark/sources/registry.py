"""Fixture-table registry: parquet scans for the driver testdata.

Reference parity: the adapter's table scan is a catalog lookup +
``select ... from project.schema.table`` (Tutorial.md:17-50); here a
scan is ``spark.read.parquet`` — columnar, with predicate pushdown and
column pruning handled by Catalyst (check ``PushedFilters`` /
``ReadSchema`` in ``df.explain("formatted")``).

At 100 TB each table is a directory of many files (or a catalog
table); this module only centralizes naming so every operator reads
through one door.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always be broadcast in joins at any SF:
# region/nation are fixed-size (5/25 rows at every TPC-H scale factor);
# supplier scales but stays tiny relative to fact tables here.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table: {name!r} (have {TABLES})")
    df = spark.read.parquet(table_path(sf_dir, name))
    # The fixture's timestamp physical types have varied across driver
    # generations: TIMESTAMP(NANOS) (read as long via
    # spark.sql.legacy.parquet.nanosAsLong), tz-adjusted µs, and
    # tz-naive µs (read as TIMESTAMP_NTZ in Spark 4). Normalize every
    # variant to plain TIMESTAMP: the session tz is pinned UTC, so the
    # NTZ→TIMESTAMP cast preserves wall-clock values and keeps epoch
    # arithmetic (cast to long / unix_micros) legal downstream.
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # integer division: ns values exceed 2^53, float division
        # would round the microseconds
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)
    ]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each fixture table as a temp view for spark.sql use."""
    for name in names:
        if os.path.exists(table_path(sf_dir, name)):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
