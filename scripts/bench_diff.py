#!/usr/bin/env python
"""Per-query bench drift detector (round-3 verdict item 2).

Usage:
    python bench.py > /tmp/bench_now.json
    python scripts/bench_diff.py /tmp/bench_now.json [--threshold 1.5]

Compares a fresh ``bench.py`` output line against the committed
``BENCH_BASELINE.json`` (per-query medians of N runs at sf0.1) and
flags queries whose wall time drifted above ``threshold`` x the
baseline median.  Exit 1 if any query drifts, so a round's bench run
is mechanically attributable: either the flagged queries' code
changed, or the environment did — never "maybe it's noise".

Guards against false positives on tiny queries:
  * absolute slack — a query must also be >0.25 s over baseline;
  * fixed floors — streaming queries carry a data-independent
    micro-batch/checkpoint floor recorded in the baseline's
    ``floors`` map; the ratio is computed on the above-floor part.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE = os.path.join(HERE, "..", "BENCH_BASELINE.json")
ABS_SLACK_S = 0.25


def load_bench_line(path: str) -> dict:
    """bench.py prints warnings + ONE JSON line; take the last line
    that parses as a dict with a 'queries' key."""
    out = None
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(obj, dict) and "queries" in obj:
                out = obj
    if out is None:
        raise SystemExit(f"no bench JSON line found in {path}")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json", help="file containing bench.py output")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--baseline", default=BASELINE)
    args = ap.parse_args()

    with open(args.baseline) as fh:
        base = json.load(fh)
    medians: dict[str, float] = base["medians"]
    maxima: dict[str, float] = base.get("maxima", {})
    floors: dict[str, float] = base.get("floors", {})

    cand = load_bench_line(args.bench_json)["queries"]

    flagged, missing, new = [], [], []
    for name, sec in sorted(cand.items()):
        if sec < 0:
            flagged.append((name, sec, medians.get(name, float("nan")), "FAILED"))
            continue
        if name not in medians:
            new.append(name)
            continue
        med = medians[name]
        floor = floors.get(name, 0.0)
        # compare the data-dependent part; a pure-floor query (med==floor)
        # compares absolute
        eff_c, eff_m = max(sec - floor, 1e-3), max(med - floor, 1e-3)
        ratio = eff_c / eff_m
        # a real drift clears the ratio bar, the absolute slack, AND
        # the noise envelope observed across the baseline's own runs
        envelope = 1.15 * maxima.get(name, med)
        if ratio > args.threshold and (sec - med) > ABS_SLACK_S and sec > envelope:
            flagged.append((name, sec, med, f"{ratio:.2f}x"))
    for name in medians:
        if name not in cand:
            missing.append(name)

    for name, sec, med, why in flagged:
        print(f"DRIFT {name}: {sec:.3f}s vs baseline {med:.3f}s ({why})")
    if new:
        print(f"# {len(new)} new queries (no baseline): {', '.join(new)}")
    if missing:
        print(f"# {len(missing)} baseline queries absent from run: {', '.join(missing)}")

    total_c = sum(s for s in cand.values() if s >= 0)
    total_m = sum(medians.values())
    print(
        f"# suite: {total_c:.1f}s vs baseline {total_m:.1f}s "
        f"({total_c / total_m:.2f}x) over {len(cand)} queries"
    )
    if flagged:
        print(f"{len(flagged)} queries drifted beyond {args.threshold}x")
        return 1
    print("bench within baseline envelope")
    return 0


if __name__ == "__main__":
    sys.exit(main())
