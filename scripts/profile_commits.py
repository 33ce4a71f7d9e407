#!/usr/bin/env python
"""Phase-profile the txn commit path for one or more declared queries.

Monkeypatch-timers around TxnTable._stage_files (split into the Spark
write vs footer/bloom stats), TxnTable._commit (JSON + checkpoint), and
DV parquet writes, then run the query with the bench's noop sink.
Prints per-phase totals and counts — where does a multi-commit row's
time actually go?

Usage: SPARK_GRAFT_SF_DIR=... python scripts/profile_commits.py <query> [...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]

    import __spark_entry__ as entrymod
    from dbt_maxcompute_spark import txnlog
    from dbt_maxcompute_spark.session import get_spark

    spark = get_spark(app_name="profile_commits")
    qs = entrymod.queries()

    acc: dict[str, list[float]] = {}

    def _wrap(obj, attr, phase):
        orig = getattr(obj, attr)

        def inner(*a, **k):
            t0 = time.perf_counter()
            try:
                return orig(*a, **k)
            finally:
                acc.setdefault(phase, []).append(time.perf_counter() - t0)

        setattr(obj, attr, inner)
        return orig

    # split _stage_files into the Spark write vs the stats/bloom tail:
    # time the whole call, and separately the df.write inside it by
    # wrapping DataFrameWriter.parquet (covers DV writes too).
    from pyspark.sql.readwriter import DataFrameWriter

    _wrap(txnlog.TxnTable, "_stage_files", "stage_files_total")
    _wrap(txnlog.TxnTable, "_commit", "commit_json")
    _wrap(txnlog, "_footer_stats", "footer_stats")
    _wrap(txnlog, "_bloom_write_sidecar", "bloom_sidecar")
    _wrap(DataFrameWriter, "parquet", "parquet_write_job")

    for name in names:
        fn = qs[name]
        acc.clear()
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        print(f"\n=== {name}: wall {wall:.3f}s ===")
        for phase in sorted(acc):
            v = acc[phase]
            print(
                f"  {phase:<20} n={len(v):<4} total={sum(v):7.3f}s "
                f"mean={sum(v)/len(v)*1000:7.1f}ms max={max(v)*1000:7.1f}ms"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
