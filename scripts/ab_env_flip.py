#!/usr/bin/env python
"""Interleaved A/B of declared queries under two values of one env var,
inside ONE Spark session (same JVM, alternating reps) — the only timing
shape that survives this host's bursty hypervisor steal.

Usage: python scripts/ab_env_flip.py VAR=a,b <query> [...] [--reps N]
Env: SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    spec = sys.argv[1]
    var, vals = spec.split("=", 1)
    vals = vals.split(",")
    reps = 3
    names = []
    skip = False
    for i, a in enumerate(sys.argv[2:], start=2):
        if skip:
            skip = False
            continue
        if a == "--reps":
            reps = int(sys.argv[i + 1])
            skip = True
        elif not a.startswith("--"):
            names.append(a)

    import __spark_entry__ as entrymod
    from dbt_maxcompute_spark.session import get_spark

    spark = get_spark(app_name="ab_env_flip")
    qs = entrymod.queries()

    for t in ("orders", "lineitem", "events", "documents", "embeddings"):
        try:
            spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).write.format(
                "noop").mode("overwrite").save()
        except Exception:
            pass

    acc: dict[tuple[str, str], list[float]] = {}
    for name in names:
        for r in range(reps):
            for v in vals:
                os.environ[var] = v
                spark.sparkContext.setJobDescription(f"{name} {var}={v} rep{r}")
                t0 = time.perf_counter()
                try:
                    qs[name](spark, SF_DIR).write.format("noop").mode(
                        "overwrite").save()
                    t = time.perf_counter() - t0
                    acc.setdefault((name, v), []).append(t)
                    print(f"{name} {var}={v} rep{r}: {t:.3f}s", flush=True)
                except Exception as exc:
                    print(f"{name} {var}={v} rep{r}: FAILED {exc}", flush=True)
                try:
                    spark.catalog.clearCache()
                except Exception:
                    pass
    os.environ.pop(var, None)
    print("\n== min per variant ==")
    for name in names:
        line = " ".join(
            f"{v}:{min(acc[(name, v)]):.3f}s" for v in vals if (name, v) in acc
        )
        print(f"{name}: {line}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
