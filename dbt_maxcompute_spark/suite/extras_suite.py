"""Extras suite: operators added after the driver's 50-query
correctness window filled. Deliberately LAST in the suite order — the
window is packed with this round's previously-unchecked queries; these
still run in the bench, their oracles are enforced by pytest and
driver_sim, and they can rotate into the window next round.

- k-means profile: rows-only by nature (iterative, no SQL oracle) —
  pinned against a NumPy reference in tests/test_clustering.py.
- as-of join / range join: oracle-paired (DuckDB native ASOF JOIN and
  an inequality join respectively)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators import clustering, temporal
from dbt_maxcompute_spark.sources.registry import load_table


def q_emb_kmeans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Lloyd k-means over the embeddings fixture: per-cluster sizes +
    # mean within-cluster squared distance. Deterministic (id-order
    # init, decimal-accumulated updates) but 5 iterations of argmin are
    # not SQL-expressible — pytest pins it against a NumPy reference.
    emb = load_table(spark, sf_dir, "embeddings")
    return clustering.kmeans_cluster_profile(
        emb, "vec_id", "embedding", k=8, max_iter=5
    )


def q_events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    # latest purchase state at click time, per user: union + one window
    # per key carrying the purchase payload forward — never the naive
    # |L|x|R|-per-key inequality join. Tiebreak at equal ts = max
    # event_id, mirrored by the oracle's QUALIFY dedupe.
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return temporal.asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        right_payload=["value"], tiebreak="event_id",
    )


ORACLE_ASOF = """
WITH c AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
), p AS (
  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
)
SELECT c.event_id, c.user_id, c.ts, c.value,
       p.ts AS asof_ts, p.event_id AS asof_event_id, p.value AS asof_value
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def q_events_range_click_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    # clicks within the 5 minutes before each error, per user — binned
    # equi-join (bounded fan-out) instead of a skew-prone range join
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("click_ts")
    )
    pairs = temporal.range_join_binned(
        errors, clicks, key="user_id", left_ts="ts", right_ts="click_ts",
        lower_s=-300.0, upper_s=0.0,
    )
    counts = pairs.groupBy("event_id").agg(F.count(F.lit(1)).alias("n_prior_clicks"))
    return (
        errors.join(counts, "event_id", "left")
        .select(
            "event_id", "user_id", "ts",
            F.coalesce("n_prior_clicks", F.lit(0)).alias("n_prior_clicks"),
        )
    )


ORACLE_RANGE = """
WITH e AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
), c AS (
  SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'
)
SELECT e.event_id, e.user_id, e.ts,
       CAST(count(c.cts) AS BIGINT) AS n_prior_clicks
FROM e LEFT JOIN c
  ON e.user_id = c.user_id
 AND c.cts >= e.ts - INTERVAL 300 SECOND
 AND c.cts <  e.ts
GROUP BY e.event_id, e.user_id, e.ts
"""


QUERIES = {
    "emb_kmeans_profile": q_emb_kmeans_profile,
    "events_asof_last_purchase": q_events_asof_last_purchase,
    "events_range_click_error": q_events_range_click_error,
}

ORACLES: dict[str, str] = {
    "events_asof_last_purchase": ORACLE_ASOF,
    "events_range_click_error": ORACLE_RANGE,
}
