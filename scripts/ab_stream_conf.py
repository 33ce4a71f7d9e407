#!/usr/bin/env python
"""Interleaved same-JVM A/B of streaming configs on the stream_* rows:
state-store shuffle partition counts x state store provider. Each config
runs `reps` times, variants interleaved (A B C A B C ...) so a host noise
phase taxes every variant equally. Reports per-config min/median wall.

Usage: python scripts/ab_stream_conf.py <query> [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

CONFIGS = [
    ("p8_hdfs", "8", HDFS),
    ("p4_hdfs", "4", HDFS),
    ("p2_hdfs", "2", HDFS),
    ("p1_hdfs", "1", HDFS),
    ("p8_rocks", "8", ROCKSDB),
    ("p2_rocks", "2", ROCKSDB),
]


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import __spark_entry__ as entrymod
    from dbt_maxcompute_spark.session import get_spark

    spark = get_spark(app_name=f"ab_stream_{name}")
    fn = entrymod.queries()[name]

    # warm: one run with defaults (stages fixtures, forks workers)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    results: dict[str, list[float]] = {c[0]: [] for c in CONFIGS}
    for rep in range(reps):
        for label, parts, provider in CONFIGS:
            os.environ["SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS"] = parts
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            results[label].append(time.perf_counter() - t0)
            spark.catalog.clearCache()

    print(f"query={name} sf={sf_dir} reps={reps}")
    for label, ts in results.items():
        print(
            f"  {label:10s} min={min(ts):.3f} med={statistics.median(ts):.3f} "
            f"all={[round(t, 2) for t in ts]}"
        )


if __name__ == "__main__":
    main()
