"""Streaming ingestion into engine tables via foreachBatch.

Bridges Structured Streaming to the DML planner: each micro-batch
applies one incremental strategy (merge / append / insert_overwrite)
against a catalog table — the streaming counterpart of the reference's
microbatch materialization (its batch loop becomes Spark's trigger
loop; SURVEY.md §2.3/§2.9).

Exactly-once notes: the DML rewrites are idempotent per partition for
insert_overwrite (replayed batches rewrite the same partitions) and
key-idempotent for merge (replayed upserts converge); append is
at-least-once on replay — same contract dbt microbatch gives. State
lives in the checkpoint dir; at scale use one checkpoint per target
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from dbt_maxcompute_spark.catalog import EngineCatalog
from dbt_maxcompute_spark.plans import dml


def stream_into_table(
    stream: DataFrame,
    catalog: EngineCatalog,
    name: str,
    strategy: str = "merge",
    unique_key: list[str] | str | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Write a stream into catalog table `name` with a DML strategy per
    micro-batch. The target table must already exist (its schema and
    partition spec govern alignment)."""
    if strategy not in ("merge", "append", "insert_overwrite"):
        raise ValueError(f"unsupported streaming strategy {strategy!r}")
    if strategy == "merge" and not unique_key:
        raise ValueError("merge strategy requires unique_key")

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        if strategy == "merge":
            dml.merge(catalog, name, batch, unique_key)
        elif strategy == "append":
            dml.append(catalog, name, batch)
        else:
            dml.insert_overwrite(catalog, name, batch)

    writer = stream.writeStream.foreachBatch(apply_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_into_txn_table(
    stream: DataFrame,
    table,
    app_id: str,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """EXACTLY-ONCE streaming append into a transaction-log table.

    Each micro-batch commits through
    :meth:`TxnTable.idempotent_append` with a ``txn`` marker
    ``(app_id, batch_id)`` recorded in the log (the Delta-paper txn
    action).  Plain foreachBatch append is at-least-once: a batch can
    be re-delivered after a driver retry, a checkpoint replay, or a
    full re-run with a lost checkpoint.  Here the re-delivered batch
    finds its batch id already in the table's idempotence ledger and
    lands ZERO rows — duplicates are impossible as long as ``app_id``
    names the logical stream (Delta's contract: same app id + same
    batch id => same data).

    ``table`` must be an existing :class:`TxnTable` (create it with
    the stream's schema first); the ledger survives log checkpoints
    and is visible to every concurrent writer through the log itself.
    """

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        table.idempotent_append(batch, app_id, batch_id)

    writer = stream.writeStream.foreachBatch(apply_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_upsert_txn_table(
    stream: DataFrame,
    table,
    keys: list[str],
    app_id: str,
    seq_col: str | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """EXACTLY-ONCE streaming key-upsert into a transaction-log table.

    Each micro-batch commits through :meth:`TxnTable.idempotent_upsert`:
    the deletion vector (marking superseded target rows), the appended
    source files, and the ``(app_id, batch_id)`` txn marker land in ONE
    atomic commit. Plain merge-per-batch is only key-idempotent —
    a replayed batch still commits a new version and re-deletes rows;
    here the replay finds its batch id in the ledger and commits
    NOTHING, so both the data and the version history are replay-clean.
    CDC-style streaming upsert with Delta semantics, on vanilla parquet.

    A micro-batch can legitimately carry several rows per key (multiple
    updates within one trigger window). ``seq_col`` names the column
    that orders them (event time / source offset / CDC sequence): the
    row with the HIGHEST seq value per key wins. Without a ``seq_col``
    there is NO reliable within-batch order — physical row order tracks
    partition layout, not arrival — so duplicate keys in a batch RAISE
    instead of resolving to an arbitrary row (a CDC stream silently
    keeping the older value is a data bug; pre-dedup the batch or pass
    the ordering column).
    """

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        table.idempotent_upsert(
            _latest_per_key(batch, keys, seq_col), keys, app_id, batch_id
        )

    writer = stream.writeStream.foreachBatch(apply_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _latest_per_key(batch: DataFrame, keys: list[str], seq_col: str | None):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if seq_col is not None:
        # highest seq per key wins; monotonic id only breaks exact
        # seq ties (same-partition later row wins — best available)
        w = Window.partitionBy(*keys).orderBy(
            F.col(seq_col).desc_nulls_last(),
            F.monotonically_increasing_id().desc(),
        )
        return (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    # same single pass: the per-key count rides the dedup window
    # and converts an ambiguous batch into an error in-plan
    w = Window.partitionBy(*keys)
    return (
        batch.withColumn("__kn", F.count(F.lit(1)).over(w))
        .withColumn(
            "__guard",
            F.when(
                F.col("__kn") > 1,
                F.raise_error(F.lit(
                    "stream_upsert_txn_table: micro-batch has "
                    "multiple rows per key and no seq_col — "
                    "within-batch order is undefined; pass "
                    "seq_col (event time / offset) or pre-dedup"
                )),
            ),
        )
        .filter(F.col("__guard").isNull())
        .drop("__kn", "__guard")
    )


def stream_cdc_to_rollup(
    stream: DataFrame,
    table,
    keys: list[str],
    rollup,
    rollup_keys: list[str],
    sums: dict[str, str],
    app_id: str,
    count_col: str = "n",
    seq_col: str | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming CDC → transaction table → INCREMENTAL ROLLUP, end to
    end exactly-once. Each micro-batch (a) key-upserts into ``table``
    via :meth:`TxnTable.idempotent_upsert` (deletion vector + adds +
    ``(app_id, batch_id)`` marker in ONE commit) and (b) advances the
    downstream ``rollup`` by the source's change-feed interval via
    :func:`sync_rollup_exactly_once` (the cursor rides the rollup's own
    commit, at |rollup| + |changes| cost — never the table). A replayed
    batch applies NOTHING at either stage; a crash between (a) and (b)
    is healed by the NEXT batch's sync — the rollup lags by at most one
    interval and never double-counts. This is the 100 TB CDC-pipeline
    shape: raw stream in, maintained aggregate out, no full rebuilds
    anywhere."""
    from dbt_maxcompute_spark.materializations.materialized_view import (
        sync_rollup_exactly_once,
    )

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        table.idempotent_upsert(
            _latest_per_key(batch, keys, seq_col), keys, app_id, batch_id
        )
        sync_rollup_exactly_once(
            table, rollup, rollup_keys, sums, count_col,
            app_id=f"{app_id}_rollup",
        )

    writer = stream.writeStream.foreachBatch(apply_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
