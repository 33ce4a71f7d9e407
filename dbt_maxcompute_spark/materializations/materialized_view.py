"""Materialized view: managed table + stored defining query.

Spark has no native MV; the reference's MV surface
(`/root/reference/dbt/adapters/maxcompute/relation_configs/
_materialized_view.py:15-128`, `impl.py:112-158`) maps to:

- CREATE: run the defining query, store it + the MV config
  (lifecycle, build_deferred, disable_rewrite, partitioning,
  tblproperties) in table metadata. `build_deferred=True` creates
  the metadata with an empty table (reference `_materialized_view.py:21`).
- REFRESH (`ALTER MATERIALIZED VIEW ... REBUILD`,
  macros/relations/materialized_view/refresh.sql:2): re-run the
  stored query, INSERT OVERWRITE the table.
- on config change: diff stored vs new config — changes to the
  defining query or partitioning require DROP+CREATE (replace);
  anything else is satisfiable by REBUILD/metadata update
  (reference impl.py:112-158 returns RelationConfigChangeAction).

`disable_rewrite` gates the automatic query rewrite implemented in
plans/mv_rewrite.py: catalog.sql() answers exact-text and
container-rollup matches from the MV unless the flag is set
(reference `_materialized_view.py:24,116-117`).
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame

from dbt_maxcompute_spark.catalog import EngineCatalog


def create_materialized_view(
    catalog: EngineCatalog,
    name: str,
    defining_sql: str,
    partition_by: list[str] | None = None,
    lifecycle: int | None = None,
    build_deferred: bool = False,
    disable_rewrite: bool = False,
    tblproperties: dict[str, str] | None = None,
    columns: dict[str, str] | None = None,
) -> None:
    df = catalog.sql(defining_sql, mv_rewrite=False)
    if build_deferred:
        df = df.limit(0)
    meta = catalog.create_table(
        name,
        df,
        partition_by=partition_by,
        lifecycle=lifecycle,
        tblproperties=tblproperties,
        mode="overwrite",
    )
    meta.table_type = "materialized_view"
    meta.view_sql = defining_sql
    meta.mv_config = {
        "partition_by": list(partition_by or []),
        "lifecycle": lifecycle,
        "build_deferred": build_deferred,
        "disable_rewrite": disable_rewrite,
        "tblproperties": dict(tblproperties or {}),
        "columns": dict(columns or {}),
        "built_at": time.time(),
    }
    catalog._write_meta(name, meta)  # noqa: SLF001


def refresh_materialized_view(catalog: EngineCatalog, name: str) -> None:
    """REBUILD: re-run the stored query, overwrite in place — the table
    identity (created_at) is preserved, mirroring the reference's
    creation_time-witnessed REBUILD (test_mv_configuration_changes.py)."""
    meta = catalog.meta(name)
    if meta.table_type != "materialized_view":
        raise ValueError(f"{name} is not a materialized view")
    df = catalog.sql(meta.view_sql, mv_rewrite=False)
    from dbt_maxcompute_spark.plans.dml import _stage_and_swap

    _stage_and_swap(catalog, name, meta, df, None)
    meta.mv_config["built_at"] = time.time()
    catalog._write_meta(name, meta)  # noqa: SLF001


def merge_additive_rollup(
    old: DataFrame, delta: DataFrame, keys: list[str]
) -> DataFrame:
    """Incremental (delta) maintenance for additive rollups: merge a
    delta-aggregate into the stored rollup instead of re-running the
    defining query over all history. At 100 TB this is the difference
    between a refresh that scans the new partition and one that scans
    the table — REBUILD (refresh_materialized_view) stays the fallback
    for non-additive definitions.

    Contract: ``old`` and ``delta`` share a schema of ``keys`` +
    additive measures — counts and DECIMAL sums. A rollup storing
    DOUBLE sums cannot be incrementally maintained (addition-order
    drift accumulates across refreshes); store decimal sums + counts
    and derive doubles/averages at read time. One shuffle, sized by
    |old| + |delta| — i.e. rollup-cardinality, not fact-table, rows."""
    measures = [c for c in old.columns if c not in keys]
    missing = [c for c in old.columns if c not in delta.columns]
    if missing:
        raise ValueError(f"delta rollup missing measure columns: {missing}")
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, FloatType

    for c in measures:
        if isinstance(old.schema[c].dataType, (DoubleType, FloatType)):
            raise ValueError(
                f"measure {c!r} is floating-point; additive maintenance "
                "requires exact (count/decimal) mergeable state"
            )
    merged = (
        old.unionByName(delta.select(old.columns))
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in measures])
    )
    # re-pin measure types: sum() widens decimal precision per merge,
    # which would drift the stored schema across refreshes
    return merged.select(
        *keys,
        *[F.col(c).cast(old.schema[c].dataType).alias(c) for c in measures],
    )


def rollup_delta_from_feed(
    feed: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    count_col: str = "n",
) -> DataFrame:
    """SIGNED delta-aggregate from a row-level change feed
    (``TxnTable.change_feed``): inserts contribute +value/+1, deletes
    -value/-1, so an update (its delete+insert pair) nets to the
    value difference. ``sums`` maps rollup measure name -> source
    column; sums accumulate as DECIMAL(28,6) (exact, mergeable — the
    same contract merge_additive_rollup enforces). One shuffle, sized
    by the CHANGES, never the base table."""
    from pyspark.sql import functions as F

    ins = F.col("_change_type") == "insert"
    return feed.groupBy(*keys).agg(
        *[
            F.sum(
                F.when(ins, F.col(src)).otherwise(-F.col(src)).cast("decimal(28,6)")
            )
            .cast("decimal(28,6)")
            .alias(name)
            for name, src in sums.items()
        ],
        F.sum(F.when(ins, F.lit(1)).otherwise(F.lit(-1))).cast("long").alias(count_col),
    )


def maintain_rollup_from_changes(
    old: DataFrame,
    feed: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    count_col: str = "n",
) -> DataFrame:
    """Incremental-view-maintenance step for a sum/count rollup from a
    change feed — the extension of merge_additive_rollup (append-only
    deltas) to UPDATE/DELETE history via TxnTable.change_feed.

    The maintained invariant: result == re-aggregating the source at
    the feed's end version, for count + decimal-sum measures (AVG
    derives at read time as sum/count — the same decomposition the MV
    rewriter uses). Groups whose row count reaches zero are REMOVED
    (a recompute would not emit them). Cost: |rollup| + |changes| —
    at 100 TB the rollup and the day's changes, never the fact table.
    """
    from pyspark.sql import functions as F

    delta = rollup_delta_from_feed(feed, keys, sums, count_col)
    return merge_additive_rollup(old, delta, keys).filter(F.col(count_col) > 0)


def sync_rollup_exactly_once(
    source,
    target,
    keys: list[str],
    sums: dict[str, str],
    count_col: str = "n",
    app_id: str = "cdf_rollup_sync",
) -> int:
    """One exactly-once step of a resumable CDF -> rollup pipeline
    between two :class:`~dbt_maxcompute_spark.txnlog.TxnTable`\\ s.

    The CURSOR (last applied source version) is the Delta ``txn``
    idempotence marker on the TARGET's own log — cursor advance and
    rollup replacement land in ONE commit, so a crash between steps,
    a replayed step, or a racing second syncer (CommitConflict on the
    pinned base) can never double-apply an interval. First call
    bootstraps with a full aggregate of the source snapshot; every
    later call applies only the change-feed interval
    ``(cursor, latest]`` at |rollup| + |changes| cost.

    Returns the number of source versions applied (0 = already caught
    up — including any replay of a committed step)."""
    from pyspark.sql import functions as F

    cur = source.latest_version()
    last = target.last_batch(app_id) if target.exists() else None
    if last is not None and cur <= last:
        return 0
    marker = {"app_id": app_id, "batch_id": cur}
    if last is None:
        full = source.read(cur).groupBy(*keys).agg(
            *[
                F.sum(F.col(src).cast("decimal(28,6)"))
                .cast("decimal(28,6)")
                .alias(name)
                for name, src in sums.items()
            ],
            F.count(F.lit(1)).alias(count_col),
        )
        if target.exists():
            target.overwrite_from(target.latest_version(), full, txn=marker)
        else:
            target.create(full, txn=marker)
        return cur + 1
    feed = source.change_feed(last, cur)
    base_v = target.latest_version()
    new = maintain_rollup_from_changes(
        target.read(base_v), feed, keys, sums, count_col
    )
    target.overwrite_from(base_v, new, txn=marker)
    return cur - last


def diff_config(old: dict[str, Any], new: dict[str, Any], old_sql: str, new_sql: str) -> str:
    """Returns 'rebuild' | 'replace' | 'noop' (reference impl.py:112-158)."""
    if old_sql.strip() != new_sql.strip():
        return "replace"
    if old.get("partition_by") != new.get("partition_by"):
        return "replace"
    for key in ("lifecycle", "disable_rewrite", "tblproperties", "columns"):
        if old.get(key) != new.get(key):
            return "rebuild"
    return "noop"


def apply_materialized_view(
    catalog: EngineCatalog,
    name: str,
    defining_sql: str,
    **config: Any,
) -> str:
    """Idempotent MV application: create if missing, otherwise diff the
    stored config and REBUILD / DROP+CREATE / no-op accordingly.
    Returns the action taken."""
    if not catalog.exists(name):
        create_materialized_view(catalog, name, defining_sql, **config)
        return "create"
    meta = catalog.meta(name)
    new_cfg = {
        "partition_by": list(config.get("partition_by") or []),
        "lifecycle": config.get("lifecycle"),
        "build_deferred": config.get("build_deferred", False),
        "disable_rewrite": config.get("disable_rewrite", False),
        "tblproperties": dict(config.get("tblproperties") or {}),
        "columns": dict(config.get("columns") or {}),
    }
    action = diff_config(meta.mv_config or {}, new_cfg, meta.view_sql or "", defining_sql)
    if action == "replace":
        catalog.drop(name)
        create_materialized_view(catalog, name, defining_sql, **config)
    elif action == "rebuild":
        meta.mv_config.update(new_cfg)
        meta.lifecycle = new_cfg["lifecycle"]
        meta.tblproperties = new_cfg["tblproperties"]
        catalog._write_meta(name, meta)  # noqa: SLF001
        refresh_materialized_view(catalog, name)
    return action
