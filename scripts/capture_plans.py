#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [suffix] [name ...]
  tag    — subdirectory under plans/ (e.g. r13)
  suffix — file suffix, default "before" -> plans/r13/<query>_before.txt
  name   — optional subset of query names (default: all)

Queries that materialize side state (DML scripts, txn tables, streams)
still only have their RETURNED DataFrame's plan captured; the capture
runs the query function exactly as the bench does, so plan files
reflect what the bench times.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    import __spark_entry__ as entrymod
    from dbt_maxcompute_spark.session import get_spark

    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    subset = set(sys.argv[3:])

    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark(app_name="capture_plans")
    qs = entrymod.queries()
    n_ok = n_fail = 0
    for name in sorted(qs):
        if subset and name not in subset:
            continue
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(plan)
            n_ok += 1
            print(f"  plan {name}")
        except Exception:
            n_fail += 1
            print(f"  FAIL {name}")
            traceback.print_exc(limit=3)
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
    print(f"{n_ok} plans captured, {n_fail} failed -> {outdir}/*_{suffix}.txt")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
