"""Stream-stream interval (time-bounded) joins.

The reference has no streaming (SURVEY.md §2.9); this extends the
engine's Structured-Streaming surface with the canonical attribution
shape: match a right-stream row to a left-stream row with the same key
when the right timestamp falls inside ``[left_ts, left_ts + lag]``.

Semantics (and why the result is deterministic):

* INNER stream-stream joins emit a pair exactly once, as soon as both
  sides of the match have arrived — regardless of which micro-batch
  delivered which side.  Spark buffers unmatched rows in the join
  state store until the watermark plus the time-range condition proves
  no future match is possible, then evicts.
* The time-range condition is what makes state BOUNDED at scale: the
  engine derives "left rows older than (right watermark - lag) can
  never match again" and drops them.  Without the range condition the
  join state grows without bound.
* With ``Trigger.AvailableNow`` over a bounded backlog and a watermark
  horizon wider than the data's time span, nothing is evicted early,
  so the drained result equals the batch join — which is exactly what
  the driver oracle checks.

Scale notes (100 TB): the join shuffles both streams once on the key;
state per key is (rows within the lag horizon), so the knobs are the
watermark delay and the lag width, not the corpus size.  Skewed keys
(one user with millions of views) inflate a single state partition —
the mitigation is the same salting used for batch skew, applied to the
key before the join and re-aggregated after.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lag: str,
    watermark: str,
    extra: Column | None = None,
) -> DataFrame:
    """Inner stream-stream join: rows pair when keys match and
    ``right_ts`` is in ``[left_ts, left_ts + lag]``.

    ``left`` / ``right`` must use disjoint column names apart from
    ``key`` (alias before calling).  ``lag`` is an SQL interval body,
    e.g. ``"30 minutes"``; ``watermark`` bounds state retention on both
    sides.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {lag}"))
    )
    if extra is not None:
        cond = cond & extra
    return lw.join(rw, cond, "inner").drop(rw[key])
