#!/usr/bin/env python
"""Build BENCH_BASELINE.json from N bench.py output files.

Usage: python scripts/make_bench_baseline.py /tmp/bench_run1.json /tmp/bench_run2.json ...

Per-query MEDIAN across the runs.  Streaming queries get a recorded
``floor`` — the data-independent micro-batch/trigger/checkpoint cost —
so bench_diff.py compares the data-dependent part (a 2x drift on a
96%-floor query is noise; a 2x drift above the floor is real).
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_diff import load_bench_line  # noqa: E402  (same directory)

# data-independent streaming floors (measured: the sf0.001 run of the
# same queries lands within ~10% of these — the cost is triggers +
# state store + checkpoint commits, not rows)
FLOORS = {
    # ~90% of the minimum observed sf0.001 run of each query: at that
    # scale the wall time is triggers + state store + checkpoint
    # commits, not rows
    "stream_exactly_once_dedup": 4.5,
    "stream_tumbling_hourly": 1.3,
    "stream_interval_join": 10.0,
    "stream_late_data_drop": 13.5,
    "stream_txn_exactly_once": 2.7,
    "stream_session_windows": 10.4,
    "stream_custom_state_totals": 2.9,
}


def main() -> int:
    runs = [load_bench_line(p) for p in sys.argv[1:]]
    if len(runs) < 2:
        raise SystemExit("need >= 2 bench run files")
    names = set()
    for r in runs:
        names.update(r["queries"])
    medians = {}
    maxima = {}
    for n in sorted(names):
        vals = [r["queries"][n] for r in runs if r["queries"].get(n, -1) >= 0]
        if not vals:
            raise SystemExit(f"query {n} failed in every run")
        medians[n] = round(statistics.median(vals), 3)
        maxima[n] = round(max(vals), 3)
    out = {
        "sf": runs[0].get("sf"),
        "runs": len(runs),
        "medians": medians,
        # observed per-query max across the baseline runs: the noise
        # envelope (file-churning queries are bimodal under disk/GC
        # pressure); a drift flag must clear this too
        "maxima": maxima,
        "floors": {k: v for k, v in FLOORS.items() if k in medians},
        "note": (
            "per-query median wall seconds from bench.py at sf0.1 on "
            "local[32]; floors = data-independent streaming trigger/"
            "checkpoint cost, see bench_diff.py"
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "BENCH_BASELINE.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {os.path.normpath(path)}: {len(medians)} queries, "
          f"suite median total {round(sum(medians.values()), 1)}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
