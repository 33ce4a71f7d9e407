#!/usr/bin/env python
"""Quiet-host A/B: `_assign_cells` broadcast-frame vs the old literal
form at the bench's C=16 (round-11 verdict "What's wrong" #1 — the
r11 broadcast-frame change added a fixed BroadcastExchange per
assignment job where literals were free; attribute the observed
ann-row drift to that cost or to host noise).

Usage: python scripts/ab_assign_cells.py [reps] [sf_dir]

Prints one JSON line: per-form per-rep seconds + medians + the busy
-loop host-noise sentinel, so the decision (add a size cutoff à la
bloomjoin.LITERAL_MAX_BITS, or record noise) is mechanical.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _noise() -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(5_000_000):
        acc += i & 1023
    assert acc
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from dbt_maxcompute_spark.operators import similarity as sim
    from dbt_maxcompute_spark.session import get_spark

    spark = get_spark(app_name="ab_assign_cells")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb.write.format("noop").mode("overwrite").save()  # warm page cache

    ranked = emb.withColumn("__r", F.xxhash64(F.col("vec_id"), F.lit(42)))
    cent = sorted(
        ranked.orderBy("__r").limit(16).collect(), key=lambda r: r["vec_id"]
    )
    ids = [r["vec_id"] for r in cent]
    unit_mat = [
        sim._unit([float(x) for x in r["embedding"]]) for r in cent
    ]

    def run_broadcast():
        sim._assign_cells(emb, "embedding", ids, unit_mat).write.format(
            "noop"
        ).mode("overwrite").save()

    def run_literal():
        # the pre-r11 form: C x dim literal matrix + literal id array
        sims = sim._unit_sims_expr(F.col("embedding"), unit_mat)
        idx = F.array_position(sims, F.array_max(sims))
        id_arr = F.array(*[F.lit(i) for i in ids])
        emb.withColumn(
            "centroid_id", F.element_at(id_arr, idx.cast("int"))
        ).write.format("noop").mode("overwrite").save()

    # equal warmup for both forms (first-touch codegen)
    run_broadcast()
    run_literal()

    out: dict = {"sf_dir": sf_dir, "reps": reps, "noise_before": _noise()}
    times: dict[str, list[float]] = {"broadcast": [], "literal": []}
    for _ in range(reps):
        # interleave so a noise phase hits both forms equally
        for name, fn in (("broadcast", run_broadcast), ("literal", run_literal)):
            t0 = time.perf_counter()
            fn()
            times[name].append(round(time.perf_counter() - t0, 3))
    out["noise_after"] = _noise()
    out["times"] = times
    out["median"] = {
        k: round(statistics.median(v), 3) for k, v in times.items()
    }
    out["min"] = {k: round(min(v), 3) for k, v in times.items()}
    out["broadcast_over_literal_median"] = round(
        out["median"]["broadcast"] / out["median"]["literal"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
