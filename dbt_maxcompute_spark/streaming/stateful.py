"""Stateful event-stream operators: gap-based session windows (native)
and a custom applyInPandasWithState aggregator.

The reference has no streaming (SURVEY.md §2.9); these are the
Spark-native extensions a 100 TB event pipeline needs:

- ``sessionize`` uses Spark's built-in ``session_window`` (gap-based,
  merge-on-overlap) — works identically over a batch DataFrame and a
  watermarked stream; state is per (user, open-window) and bounded by
  the watermark.
- ``user_running_totals`` shows the custom-stateful escape hatch:
  ``applyInPandasWithState`` with an explicit state schema, for
  semantics session_window can't express (e.g. lifetime per-user
  counters across all time). State lives in the state store,
  partitioned by the grouping key — the shuffle is the groupBy; scale
  by key cardinality, not event volume.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SESSION_GAP = "30 minutes"


def sessionize(events: DataFrame, gap: str = SESSION_GAP, watermark: str | None = None) -> DataFrame:
    """Per-user gap-based sessions via the native session_window.
    Batch: pass watermark=None. Streaming: pass a watermark duration so
    open-session state is evicted once the watermark passes."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)
_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
    )


def user_running_totals(stream: DataFrame) -> DataFrame:
    """Lifetime per-user event counts/sums across micro-batches — a
    custom stateful operator (state schema: n, total). Emits the
    current running total for every user seen in the batch."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    events: DataFrame, keys: tuple[str, ...] = ("event_id",), watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exactly-once dedup for at-least-once sources (replayed
    files, retried producers): drop rows whose key was already seen
    within the watermark horizon. State holds one entry per key and is
    evicted once the event-time watermark passes it — the knob that
    keeps a 100 TB/day ingest's dedup state bounded (watermark = the
    max redelivery lag you promise to absorb, NOT the stream length).

    Same semantics as batch `dropDuplicates(keys)` whenever duplicates
    arrive within the horizon; the test pins that equivalence."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
