#!/usr/bin/env python
"""sf0.1 -> sf1 growth-exponent report (round-4 verdict item 3).

Usage: python scripts/scale_growth.py /tmp/bench_sf1.json [--flag 1.15]

For each query, the measured growth exponent over the 10x scale-up is

    e = log10(t_sf1 / t_sf0.1)

(e = 1 → perfectly linear in data size; e = 0 → size-independent;
e > 1 → super-linear, the thing that kills a 100 TB run). t_sf0.1 is
the committed BENCH_BASELINE.json median; streaming queries compare on
the above-floor part (their wall time is trigger/checkpoint cost, not
rows). Queries faster than 0.5 s at sf0.1 are reported but not flagged
(constant overheads dominate; an exponent over noise is meaningless).

Exit 1 if any flaggable query exceeds the threshold exponent.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from bench_diff import load_bench_line  # noqa: E402

BASELINE = os.path.join(HERE, "..", "BENCH_BASELINE.json")
MIN_BASE_S = 0.5


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf1_json")
    ap.add_argument("--flag", type=float, default=1.15)
    ap.add_argument("--baseline", default=BASELINE)
    args = ap.parse_args()

    base = json.load(open(args.baseline))
    medians, floors = base["medians"], base.get("floors", {})
    sf1 = load_bench_line(args.sf1_json)["queries"]

    rows = []
    for name, t1 in sorted(sf1.items()):
        if t1 < 0:
            rows.append((name, None, None, "FAILED@sf1"))
            continue
        t0 = medians.get(name)
        if t0 is None:
            rows.append((name, None, None, "no-baseline"))
            continue
        fl = floors.get(name, 0.0)
        a0, a1 = max(t0 - fl, 1e-3), max(t1 - fl, 1e-3)
        e = math.log10(a1 / a0)
        tag = ""
        if fl:
            tag = "floor-adj"
            # a run AT or UNDER its floor has no measurable
            # data-dependent part — the exponent is pure noise
            # amplification (e.g. 3.7s vs a 4.5s floor → a1/1e-3)
            if t0 < fl * 1.1 or t1 < fl * 1.1:
                tag = "floor-dominated"
        if t0 < MIN_BASE_S:
            tag = (tag + " tiny").strip()
        rows.append((name, (t0, t1), e, tag))

    flagged = []
    for name, ts, e, tag in rows:
        if ts is None:
            print(f"{name:42s}  {tag}")
            continue
        mark = ""
        if e > args.flag and "tiny" not in tag and "dominated" not in tag:
            mark = " <-- SUPER-LINEAR"
            flagged.append(name)
        print(f"{name:42s} {ts[0]:8.2f}s -> {ts[1]:8.2f}s  e={e:+.2f} {tag}{mark}")

    es = [e for _, ts, e, tag in rows if ts and "tiny" not in tag and "dominated" not in tag]
    if es:
        es.sort()
        print(
            f"\n{len(es)} measurable queries: median e={es[len(es)//2]:+.2f}, "
            f"p90 e={es[int(len(es)*0.9)]:+.2f}, max e={es[-1]:+.2f}"
        )
    if flagged:
        print(f"\nSUPER-LINEAR ({len(flagged)}): {', '.join(flagged)}")
        return 1
    print("\nno super-linear growth detected")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
