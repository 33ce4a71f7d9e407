#!/usr/bin/env python
"""Time individual declared queries in isolation with the noop sink
(same methodology as bench.py, minus the full-suite warmups).

Usage: python scripts/time_one.py <query> [query ...] [--reps N]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 1
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])

    import __spark_entry__ as entrymod
    from dbt_maxcompute_spark.session import get_spark

    spark = get_spark(app_name="time_one")
    qs = entrymod.queries()

    # same fixture warmup as bench.py so first-touch I/O isn't billed
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        try:
            spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).write.format(
                "noop").mode("overwrite").save()
        except Exception:
            pass

    for name in args:
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.perf_counter()
            try:
                qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
                t = time.perf_counter() - t0
                print(f"{name} rep{r}: {t:.3f}s", flush=True)
            except Exception as exc:
                print(f"{name} rep{r}: FAILED {exc}", flush=True)
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
