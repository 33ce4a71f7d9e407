"""MIN/MAX rollup IVM: bounded group recompute for the non-invertible
aggregates (delete of a stored extreme re-aggregates ONLY that group;
interior deletes and all inserts stay feed-sized arithmetic)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from dbt_maxcompute_spark.materializations.materialized_view import (
    maintain_minmax_rollup_from_changes,
    sync_minmax_rollup_exactly_once,
)
from dbt_maxcompute_spark.txnlog import TxnTable

_SCHEMA = "id long, grp string, val double"
_ARGS = (["grp"], {"sum_val": "val"}, {"min_val": "val"}, {"max_val": "val"})


def _mk_table(spark):
    t = TxnTable(spark, tempfile.mkdtemp(prefix="mmivm_") + "/t")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0),
         (4, "b", 5.0), (5, "b", 50.0), (6, "c", 7.0)],
        _SCHEMA,
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
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _as_dict(df):
    return {
        r["grp"]: (float(r["sum_val"]), r["min_val"], r["max_val"], r["n"])
        for r in df.collect()
    }


def _maintain(t, v0, old):
    keys, sums, mins, maxs = _ARGS
    return maintain_minmax_rollup_from_changes(
        old, t.change_feed(v0), t.read(), keys, sums, mins, maxs, "n"
    )


def test_deleting_the_stored_min_recomputes_that_group(spark):
    t = _mk_table(spark)
    v0 = t.latest_version()
    old = _rollup(t, v0)
    t.delete_where_dv("id = 1")       # 'a' loses its min (10.0)
    got = _as_dict(_maintain(t, v0, old))
    assert got == _as_dict(_rollup(t, None))
    assert got["a"] == (50.0, 20.0, 30.0, 2)


def test_interior_delete_and_inserts_stay_feed_sized(spark):
    """Delete strictly inside the bounds + inserts that extend them:
    no recompute rows exist, extremes move by pure feed arithmetic."""
    t = _mk_table(spark)
    v0 = t.latest_version()
    old = _rollup(t, v0)
    t.delete_where_dv("id = 2")       # 'a' loses interior 20.0
    t.append(spark.createDataFrame([(7, "a", 99.0), (8, "d", 1.0)], _SCHEMA))
    out = _maintain(t, v0, old)
    got = _as_dict(out)
    assert got == _as_dict(_rollup(t, None))
    assert got["a"] == (139.0, 10.0, 99.0, 3)
    assert got["d"] == (1.0, 1.0, 1.0, 1)
    # the touched-extreme set is empty for this interval
    keys, sums, mins, maxs = _ARGS
    feed = t.change_feed(v0)
    probe = maintain_minmax_rollup_from_changes(
        old, feed, t.read(), keys, sums, mins, maxs, "n"
    )
    assert probe.count() == 4


def test_update_that_moves_the_max_recomputes(spark):
    t = _mk_table(spark)
    v0 = t.latest_version()
    old = _rollup(t, v0)
    upd = spark.createDataFrame([(5, "b", 8.0)], _SCHEMA)   # old max 50 -> 8
    t.delete_insert_dv(upd, ["id"])
    got = _as_dict(_maintain(t, v0, old))
    assert got == _as_dict(_rollup(t, None))
    assert got["b"] == (13.0, 5.0, 8.0, 2)


def test_emptied_group_is_removed(spark):
    t = _mk_table(spark)
    v0 = t.latest_version()
    old = _rollup(t, v0)
    t.delete_where_dv("grp = 'c'")
    got = _as_dict(_maintain(t, v0, old))
    assert set(got) == {"a", "b"}


def test_sync_bootstrap_incremental_replay(spark):
    keys, sums, mins, maxs = _ARGS
    src = _mk_table(spark)
    tgt = TxnTable(spark, tempfile.mkdtemp(prefix="mmivm_tgt_") + "/t")
    assert sync_minmax_rollup_exactly_once(src, tgt, keys, sums, mins, maxs) > 0
    assert _as_dict(tgt.read()) == _as_dict(_rollup(src, None))
    src.delete_where_dv("id = 5")     # drop b's max
    src.append(spark.createDataFrame([(9, "c", 70.0)], _SCHEMA))
    assert sync_minmax_rollup_exactly_once(src, tgt, keys, sums, mins, maxs) > 0
    assert _as_dict(tgt.read()) == _as_dict(_rollup(src, None))
    # replay: no source commits -> noop, target untouched
    v = tgt.latest_version()
    assert sync_minmax_rollup_exactly_once(src, tgt, keys, sums, mins, maxs) == 0
    assert tgt.latest_version() == v


# ---------------------------------------------------------------------------
# property: any DML sequence == full recompute
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_GRP = st.sampled_from(["a", "b", "c"])
_VAL = st.integers(-50, 50)
_OP = st.one_of(
    st.tuples(
        st.just("append"),
        st.lists(st.tuples(_GRP, _VAL), min_size=1, max_size=3),
    ),
    st.tuples(st.just("delete"), _GRP),
    st.tuples(st.just("delete_id_mod"), st.integers(0, 2)),
    st.tuples(
        st.just("upsert"),
        st.lists(
            st.tuples(st.integers(1, 8), _GRP, _VAL),
            min_size=1,
            max_size=2,
            unique_by=lambda r: r[0],
        ),
    ),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(ops=st.lists(_OP, min_size=1, max_size=4))
def test_minmax_ivm_equals_recompute_for_any_dml_sequence(spark, ops):
    """For ANY interleaving of appends / predicate deletes / key
    upserts — extremes deleted, re-created, groups emptied — replaying
    the feed into the stored rollup equals re-aggregating the final
    snapshot, min/max included."""
    t = _mk_table(spark)
    v0 = t.latest_version()
    old = _rollup(t, v0)
    next_id = 100
    for op, arg in ops:
        if op == "append":
            rows = [(next_id + i, g, float(v)) for i, (g, v) in enumerate(arg)]
            next_id += len(arg)
            t.append(spark.createDataFrame(rows, _SCHEMA))
        elif op == "delete":
            t.delete_where_dv(f"grp = '{arg}'")
        elif op == "delete_id_mod":
            t.delete_where_dv(f"id % 3 = {arg}")
        else:
            rows = [(i, g, float(v)) for i, g, v in arg]
            t.delete_insert_dv(spark.createDataFrame(rows, _SCHEMA), ["id"])
    assert _as_dict(_maintain(t, v0, old)) == _as_dict(_rollup(t, None))


def test_minmax_recompute_branch_is_broadcast_semi_join(spark):
    """The touched-extreme recompute scans the source through a
    BROADCAST left-semi join on the touched group keys — never a
    shuffled join of source vs rollup (the 100 TB contract)."""
    t = _mk_table(spark)
    v0 = t.latest_version()
    old = _rollup(t, v0)
    t.delete_where_dv("id = 1")
    out = _maintain(t, v0, old)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    import re

    semi = [ln for ln in plan.splitlines() if "LeftSemi" in ln]
    assert all("Broadcast" in ln for ln in semi), semi
