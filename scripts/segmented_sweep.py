#!/usr/bin/env python
"""Segmented full-suite sweep: run every declared query once at a given
SF in CHUNKS of fresh processes, with a load-average gate between
chunks — the round-13 verdict's protocol for the sf1 rehearsal (two
prior attempts were trashed by multi-hour host-noise phases; small
chunks localize damage and the gate keeps chunks off the noisy spans).

Usage: python scripts/segmented_sweep.py <sf_dir> <out_json> [chunk=20]

Each chunk is one `scripts/time_one.py` subprocess (bench-identical
noop-sink methodology, single pass — min-of-N would hide the very
drift a scaling sweep measures). Results merge into <out_json> after
every chunk, so a killed sweep resumes by rerunning: completed names
are skipped.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATE_LOAD = float(os.environ.get("SPARK_GRAFT_SWEEP_GATE", "3.0"))
GATE_WAIT_MAX = 600  # seconds to wait for quiet before proceeding anyway


def wait_quiet() -> None:
    t0 = time.time()
    while time.time() - t0 < GATE_WAIT_MAX:
        load1 = os.getloadavg()[0]
        if load1 < GATE_LOAD:
            return
        time.sleep(15)
    print(f"# gate timeout (load {os.getloadavg()[0]:.2f}); proceeding", flush=True)


def main() -> int:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    import __spark_entry__ as entrymod

    names = sorted(entrymod.queries())
    done: dict[str, float] = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            done = json.load(fh).get("queries", {})

    todo = [n for n in names if n not in done]
    print(f"{len(todo)} to run of {len(names)} ({len(done)} already done)", flush=True)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    rx = re.compile(r"^(\S+) rep0: ([0-9.]+)s")
    rx_fail = re.compile(r"^(\S+) rep0: FAILED")
    t_start = time.time()
    for i in range(0, len(todo), chunk):
        batch = todo[i : i + chunk]
        wait_quiet()
        load_before = os.getloadavg()[0]
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "scripts/time_one.py", *batch, "--reps=1"],
            env=env,
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for line in proc.stdout.splitlines():
            m = rx.match(line)
            if m:
                done[m.group(1)] = float(m.group(2))
            elif rx_fail.match(line):
                done[rx_fail.match(line).group(1)] = -1.0
        with open(out_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "chunk": chunk,
                    "gate_load": GATE_LOAD,
                    "queries": done,
                    "n_done": len(done),
                    "n_failed": sum(1 for v in done.values() if v < 0),
                },
                fh,
                indent=1,
                sort_keys=True,
            )
        print(
            f"chunk {i // chunk + 1}: {len(batch)} rows in {time.time() - t0:.0f}s "
            f"(load_before {load_before:.2f}; total done {len(done)})",
            flush=True,
        )
    print(f"sweep complete in {time.time() - t_start:.0f}s -> {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
