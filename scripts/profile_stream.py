#!/usr/bin/env python
"""Per-trigger profile of a streaming declared query: attach a
StreamingQueryListener, run the query once, and print each micro-batch's
durationMs breakdown (addBatch / getBatch / latestOffset / queryPlanning /
triggerExecution / walCommit / commitOffsets) plus state-store metrics —
the §1 "measure first" tool for the stream_* rows, where the cost lives
in per-trigger overhead rather than in any batch plan.

Usage: python scripts/profile_stream.py <query_name> [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402


class _Capture(StreamingQueryListener):
    def __init__(self) -> None:
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        self.progress.append(json.loads(event.progress.json))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    import __spark_entry__ as entrymod
    from dbt_maxcompute_spark.session import get_spark

    spark = get_spark(app_name=f"profile_stream_{name}")
    qs = entrymod.queries()
    fn = qs[name]

    cap = _Capture()
    spark.streams.addListener(cap)

    for rep in range(reps):
        cap.progress.clear()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()

        print(f"=== rep {rep}: wall {wall:.3f}s, {len(cap.progress)} progress events ===")
        tot: dict[str, float] = {}
        for i, p in enumerate(cap.progress):
            dur = p.get("durationMs", {})
            for k, v in dur.items():
                tot[k] = tot.get(k, 0.0) + v
            states = [
                {
                    "rows": so.get("numRowsTotal"),
                    "upd": so.get("numRowsUpdated"),
                    "dropped": so.get("numRowsDroppedByWatermark"),
                    "commitMs": so.get("allUpdatesTimeMs"),
                    "removeMs": so.get("allRemovalsTimeMs"),
                    "commitTimeMs": so.get("commitTimeMs"),
                    "mem": so.get("memoryUsedBytes"),
                }
                for so in p.get("stateOperators", [])
            ]
            print(
                f"  batch {p.get('batchId')}: rows_in={p.get('numInputRows')} "
                f"dur={json.dumps(dur)} states={json.dumps(states)}"
            )
        print(f"  totals: {json.dumps(tot)}")
        tot_trigger = tot.get("triggerExecution", 0.0) / 1000.0
        print(
            f"  triggerExecution total {tot_trigger:.3f}s of wall {wall:.3f}s "
            f"(outside-trigger {wall - tot_trigger:.3f}s)"
        )


if __name__ == "__main__":
    main()
