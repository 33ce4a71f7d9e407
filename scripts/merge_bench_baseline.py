#!/usr/bin/env python
"""Additively pin NEW queries into BENCH_BASELINE.json from >=2 bench runs.

Usage: python scripts/merge_bench_baseline.py /tmp/runA.json /tmp/runB.json

Existing medians/maxima are left untouched (they were pinned from more
runs under known-clean conditions); only queries absent from the
baseline are added, with median-across-runs and max-across-runs.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_diff import load_bench_line  # noqa: E402

BASELINE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "BENCH_BASELINE.json"
)


def main() -> int:
    runs = [load_bench_line(p) for p in sys.argv[1:]]
    if len(runs) < 2:
        raise SystemExit("need >= 2 bench run files")
    with open(BASELINE) as fh:
        base = json.load(fh)
    added = []
    names = set()
    for r in runs:
        names.update(r["queries"])
    for n in sorted(names):
        if n in base["medians"]:
            continue
        vals = [r["queries"][n] for r in runs if r["queries"].get(n, -1) >= 0]
        if not vals:
            raise SystemExit(f"new query {n} failed in every run")
        base["medians"][n] = round(statistics.median(vals), 3)
        base["maxima"][n] = round(max(vals), 3)
        added.append(n)
    if not added:
        print("no new queries to pin")
        return 0
    with open(BASELINE, "w") as fh:
        json.dump(base, fh, indent=1, sort_keys=True)
    print(f"pinned {len(added)} new queries: {', '.join(added)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
