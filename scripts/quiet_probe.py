#!/usr/bin/env python
"""Parallel host-noise probe: the single-threaded busy loop in bench.py
stays quiet during this host's documented noisy phases (the signature
is high loadavg + stalled multi-core Spark stages), so a QUIET check
needs aggregate parallel throughput. Runs N worker processes of the
same busy loop; prints wall seconds and per-worker max. Quiet host:
wall ~= single-threaded time (~0.7 s). Noisy phase: wall inflates.

Exit 0 when wall < threshold (default 1.4 s), else 1.
Usage: python scripts/quiet_probe.py [n_workers] [threshold_s]
"""

from __future__ import annotations

import os
import sys
import time
from multiprocessing import Pool


def _busy(_: int) -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(5_000_000):
        acc += i & 1023
    assert acc
    return time.perf_counter() - t0


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (os.cpu_count() or 8)
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 1.4
    t0 = time.perf_counter()
    with Pool(n) as p:
        per = p.map(_busy, range(n))
    wall = time.perf_counter() - t0
    la = os.getloadavg()
    print(
        f"wall={wall:.3f}s workers={n} worker_max={max(per):.3f}s "
        f"loadavg={la[0]:.2f},{la[1]:.2f},{la[2]:.2f} "
        f"{'QUIET' if wall < thresh else 'NOISY'}"
    )
    return 0 if wall < thresh else 1


if __name__ == "__main__":
    raise SystemExit(main())
