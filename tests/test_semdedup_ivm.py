"""Round-6 part 2: SemDeDup semantic dedup + change-feed rollup IVM."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from dbt_maxcompute_spark.materializations.materialized_view import (
    maintain_rollup_from_changes,
    rollup_delta_from_feed,
)
from dbt_maxcompute_spark.operators.dedup import semantic_dedup
from dbt_maxcompute_spark.txnlog import TxnTable


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(rows, "id long, v array<float>")


def test_semantic_dedup_flags_within_cluster_neighbours(spark):
    # two well-separated cluster directions; ids 1/2/3 nearly parallel
    # (cos ~ 1), id 10 orthogonal-ish in the other cell
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, [0.998, -0.02, 0.0]),  # near-dup of 1 (and 2)
        (10, [0.0, 1.0, 0.0]),
        (11, [0.1, 1.0, 0.9]),     # same cell as 10, cosine ~0.74 -> kept
    ]
    centroids = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    out = semantic_dedup(_emb(spark, rows), "id", "v", centroids, threshold=0.95)
    got = {r["id"]: (r["cluster"], r["is_semdup"]) for r in out.collect()}
    assert got[1] == (0, False)      # lowest id of its group survives
    assert got[2] == (0, True)
    assert got[3] == (0, True)
    assert got[10] == (1, False)
    assert got[11] == (1, False)     # below threshold: not a duplicate


def test_semantic_dedup_cross_cluster_pairs_never_compared(spark):
    # identical vectors forced into DIFFERENT cells by centroid choice
    # are NOT flagged — the documented cell-bounded contract
    rows = [(1, [1.0, 1.0]), (2, [1.0, 1.0])]
    centroids = [[1.0, 1.0], [1.0, 1.0]]
    # both land in cell 0 (first-minimum tiebreak) -> id 2 flagged
    out = semantic_dedup(_emb(spark, rows), "id", "v", centroids, threshold=0.99)
    got = {r["id"]: r["is_semdup"] for r in out.collect()}
    assert got == {1: False, 2: True}


def test_semantic_dedup_single_shuffle_on_cluster(spark):
    # the only exchange in the pair join is hashpartitioning on the
    # cluster cell — assignment itself is broadcast + narrow
    rows = [(i, [float(i % 3), 1.0]) for i in range(20)]
    centroids = [[0.0, 1.0], [2.0, 1.0]]
    out = semantic_dedup(_emb(spark, rows), "id", "v", centroids, threshold=0.999)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__c" in plan or "hashpartitioning(cluster" in plan


# ---------------------------------------------------------------------------
# change-feed rollup maintenance
# ---------------------------------------------------------------------------


def _mk_table(spark):
    t = TxnTable(spark, tempfile.mkdtemp(prefix="ivm_t_") + "/t")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 40.0)],
        "id long, grp string, val double",
    )
    t.create(df)
    return t


def _rollup(t, version):
    return (
        t.read(version)
        .groupBy("grp")
        .agg(
            F.sum(F.col("val").cast("decimal(28,6)"))
            .cast("decimal(28,6)")
            .alias("sum_val"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _recompute_now(t):
    return {
        r["grp"]: (float(r["sum_val"]), r["n"])
        for r in _rollup(t, None).collect()
    }


def test_ivm_matches_recompute_through_update_delete_append(spark):
    t = _mk_table(spark)
    v0 = t.latest_version()
    old = _rollup(t, v0)
    t.delete_where_dv("id = 2")                       # delete from 'a'
    upd = spark.createDataFrame([(3, "b", 99.0)], "id long, grp string, val double")
    t.delete_insert_dv(upd, ["id"])                   # update 'b'
    t.append(
        spark.createDataFrame([(5, "d", 5.0)], "id long, grp string, val double")
    )
    out = maintain_rollup_from_changes(
        old, t.change_feed(v0), ["grp"], {"sum_val": "val"}, "n"
    )
    got = {r["grp"]: (float(r["sum_val"]), r["n"]) for r in out.collect()}
    assert got == _recompute_now(t)
    assert got["a"] == (10.0, 1)
    assert got["b"] == (99.0, 1)
    assert got["d"] == (5.0, 1)


def test_ivm_removes_emptied_group(spark):
    t = _mk_table(spark)
    v0 = t.latest_version()
    old = _rollup(t, v0)
    t.delete_where_dv("grp = 'c'")                    # group c -> empty
    out = maintain_rollup_from_changes(
        old, t.change_feed(v0), ["grp"], {"sum_val": "val"}, "n"
    )
    got = {r["grp"] for r in out.collect()}
    assert got == {"a", "b"}                           # no zero-count ghost row


def test_ivm_noop_feed_is_identity(spark):
    t = _mk_table(spark)
    v0 = t.latest_version()
    old = _rollup(t, v0)
    out = maintain_rollup_from_changes(
        old, t.change_feed(v0, v0), ["grp"], {"sum_val": "val"}, "n"
    )
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in old.collect()}


def test_delta_is_signed(spark):
    t = _mk_table(spark)
    v0 = t.latest_version()
    t.delete_where_dv("id = 1")
    delta = rollup_delta_from_feed(
        t.change_feed(v0), ["grp"], {"sum_val": "val"}, "n"
    )
    rows = {r["grp"]: (float(r["sum_val"]), r["n"]) for r in delta.collect()}
    assert rows == {"a": (-10.0, -1)}


def test_ivm_rejects_float_measures(spark):
    t = _mk_table(spark)
    v0 = t.latest_version()
    bad_old = t.read(v0).groupBy("grp").agg(F.sum("val").alias("sum_val"),
                                            F.count(F.lit(1)).alias("n"))
    t.delete_where_dv("id = 1")
    with pytest.raises(ValueError, match="floating-point"):
        maintain_rollup_from_changes(
            bad_old, t.change_feed(v0), ["grp"], {"sum_val": "val"}, "n"
        ).collect()


# ---------------------------------------------------------------------------
# exactly-once CDF -> rollup sync
# ---------------------------------------------------------------------------


def _sync(spark, src, tgt):
    from dbt_maxcompute_spark.materializations.materialized_view import (
        sync_rollup_exactly_once,
    )

    return sync_rollup_exactly_once(
        src, tgt, ["grp"], {"sum_val": "val"}, "n", app_id="test_sync"
    )


def test_sync_bootstrap_then_incremental_then_noop(spark):
    src = _mk_table(spark)
    tgt = TxnTable(spark, tempfile.mkdtemp(prefix="ivm_tgt_") + "/t")
    assert _sync(spark, src, tgt) > 0            # bootstrap: full aggregate
    assert _recompute_from(tgt) == {"a": (30.0, 2), "b": (30.0, 1), "c": (40.0, 1)}
    assert _sync(spark, src, tgt) == 0           # caught up -> no-op

    src.delete_where_dv("id = 2")
    src.append(
        src.spark.createDataFrame([(9, "b", 1.0)], "id long, grp string, val double")
    )
    assert _sync(spark, src, tgt) == 2           # two source versions applied
    assert _recompute_from(tgt) == {"a": (10.0, 1), "b": (31.0, 2), "c": (40.0, 1)}
    assert _sync(spark, src, tgt) == 0           # replay of the step: no-op


def test_sync_cursor_rides_the_data_commit(spark):
    # cursor advance and rollup replacement are ONE commit: after any
    # sync, last_batch equals the source version the data reflects
    src = _mk_table(spark)
    tgt = TxnTable(spark, tempfile.mkdtemp(prefix="ivm_tgt2_") + "/t")
    _sync(spark, src, tgt)
    assert tgt.last_batch("test_sync") == src.latest_version()
    src.delete_where_dv("grp = 'c'")
    _sync(spark, src, tgt)
    assert tgt.last_batch("test_sync") == src.latest_version()
    assert "c" not in _recompute_from(tgt)


def _recompute_from(t):
    return {
        r["grp"]: (float(r["sum_val"]), r["n"]) for r in t.read().collect()
    }


# ---------------------------------------------------------------------------
# property: IVM == recompute under ARBITRARY DML sequences
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# an op is one of:
#   ("append", [(grp, val), ...])      append fresh ids into grp
#   ("delete", grp)                    dv-delete a whole group slice
#   ("delete_id_mod", m)               dv-delete ids where id % 3 == m
#   ("upsert", [(id, grp, val), ...])  dv delete+insert on id
_GRP = st.sampled_from(["a", "b", "c"])
_VAL = st.integers(-50, 50)
_OP = st.one_of(
    st.tuples(st.just("append"), st.lists(st.tuples(_GRP, _VAL), min_size=1, max_size=3)),
    st.tuples(st.just("delete"), _GRP),
    st.tuples(st.just("delete_id_mod"), st.integers(0, 2)),
    st.tuples(
        st.just("upsert"),
        st.lists(st.tuples(st.integers(1, 8), _GRP, _VAL), min_size=1, max_size=2, unique_by=lambda r: r[0]),
    ),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(_OP, min_size=1, max_size=4))
def test_ivm_equals_recompute_for_any_dml_sequence(spark, ops):
    """The maintained invariant, adversarially: for ANY interleaving of
    appends / predicate deletes / key upserts (including ops that empty
    a group, re-create it, or touch nothing), replaying the change feed
    into the stored rollup equals re-aggregating the final snapshot."""
    t = _mk_table(spark)
    v0 = t.latest_version()
    old = _rollup(t, v0)
    next_id = 100
    for op, arg in ops:
        if op == "append":
            rows = [(next_id + i, g, float(v)) for i, (g, v) in enumerate(arg)]
            next_id += len(arg)
            t.append(spark.createDataFrame(rows, "id long, grp string, val double"))
        elif op == "delete":
            t.delete_where_dv(f"grp = '{arg}'")
        elif op == "delete_id_mod":
            t.delete_where_dv(f"id % 3 = {arg}")
        else:
            rows = [(i, g, float(v)) for i, g, v in arg]
            t.delete_insert_dv(
                spark.createDataFrame(rows, "id long, grp string, val double"), ["id"]
            )
    out = maintain_rollup_from_changes(
        old, t.change_feed(v0), ["grp"], {"sum_val": "val"}, "n"
    )
    got = {r["grp"]: (float(r["sum_val"]), r["n"]) for r in out.collect()}
    assert got == _recompute_now(t)


# ---------------------------------------------------------------------------
# round-7: degenerate-cell cap (hot-cell bomb)
# ---------------------------------------------------------------------------


def test_semdedup_hot_cell_bomb_is_subsplit_and_bounded(spark):
    """A boilerplate bomb — 1200 identical embeddings in ONE cell —
    must not go quadratic: with max_cell=100 the cell is hash
    sub-split into ceil(1200/100)=12 sub-cells, so per-key pair volume
    is bounded by ~max_cell² and the only recall cost is one surviving
    (unflagged) minimum per sub-cell instead of one per cell."""
    n_bomb = 1200
    rows = [(i, [1.0, 0.0]) for i in range(n_bomb)]
    rows += [(10_000, [0.0, 1.0]), (10_001, [0.0, 0.99])]  # healthy cell
    df = _emb(spark, rows)
    centroids = [[1.0, 0.0], [0.0, 1.0]]
    out = semantic_dedup(df, "id", "v", centroids, threshold=0.95, max_cell=100)
    got = {r["id"]: r["is_semdup"] for r in out.collect()}
    bomb_unflagged = [i for i in range(n_bomb) if not got[i]]
    # one survivor per NON-EMPTY sub-cell; 12 splits -> at most 12
    assert 1 <= len(bomb_unflagged) <= 12
    # the healthy cell is untouched by the cap
    assert got[10_000] is False and got[10_001] is True

    # per-sub-cell group sizes are bounded (hash split, 12 ways):
    from pyspark.sql import functions as F
    sizes = (
        spark.createDataFrame([(i,) for i in range(n_bomb)], "id long")
        .groupBy(F.pmod(F.xxhash64("id"), F.lit(12)).alias("s"))
        .count()
        .collect()
    )
    assert max(r["count"] for r in sizes) <= 3 * 100  # no degenerate split


def test_semdedup_cap_is_load_bearing(spark):
    """With the cap lifted the same bomb flags all but ONE row — the
    sub-split is what changes the contract, nothing else."""
    rows = [(i, [1.0, 0.0]) for i in range(300)]
    df = _emb(spark, rows)
    out = semantic_dedup(df, "id", "v", [[1.0, 0.0]], threshold=0.95,
                         max_cell=10_000)
    got = {r["id"]: r["is_semdup"] for r in out.collect()}
    assert [i for i in range(300) if not got[i]] == [0]


def test_semdedup_pair_join_keys_on_cell_and_subcell(spark):
    """Plan pin: the pair self-join partitions on (cell, sub-cell) —
    the sub-split key is load-bearing in the physical plan."""
    rows = [(i, [float(i % 3), 1.0]) for i in range(20)]
    out = semantic_dedup(_emb(spark, rows), "id", "v",
                         [[0.0, 1.0], [2.0, 1.0]], threshold=0.999,
                         max_cell=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__c" in plan
    assert "__s" in plan
