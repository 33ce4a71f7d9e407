"""DML planner tests — the reference's partition×strategy regression
matrix (test_incremental_partition.py: "covers every
incremental_strategy x partition_by combination") plus the named
bug-pins (list unique_key delete+insert, multi-column
insert_overwrite, merge update-set rules)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from dbt_maxcompute_spark.catalog import EngineCatalog
from dbt_maxcompute_spark.materializations.incremental import run_incremental
from dbt_maxcompute_spark.plans import dml


@pytest.fixture()
def catalog(spark, tmp_path):
    return EngineCatalog(spark, str(tmp_path / "wh"))


def seed_df(spark, rows, schema="id bigint, name string, pt string"):
    return spark.createDataFrame(rows, schema)


def rows_of(catalog, name, cols=("id", "name", "pt")):
    return sorted(
        tuple(r[c] for c in cols) for r in catalog.read(name).select(*cols).collect()
    )


BASE = [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2")]
INCR = [(2, "B", "p1"), (4, "d", "p3")]


@pytest.mark.parametrize("partitioned", [False, True], ids=["flat", "partitioned"])
class TestStrategyMatrix:
    def _create(self, spark, catalog, partitioned):
        opts = {"partition_by": ["pt"]} if partitioned else {}
        catalog.create_table("t", seed_df(spark, BASE), **opts)
        return opts

    def test_append(self, spark, catalog, partitioned):
        self._create(spark, catalog, partitioned)
        dml.append(catalog, "t", seed_df(spark, INCR))
        assert rows_of(catalog, "t") == sorted(BASE + INCR)

    def test_merge_upsert(self, spark, catalog, partitioned):
        self._create(spark, catalog, partitioned)
        dml.merge(catalog, "t", seed_df(spark, INCR), unique_key="id")
        # id=2 updated (name only — pt excluded from UPDATE on
        # partitioned targets), id=4 inserted
        expect = [(1, "a", "p1"), (2, "B", "p1"), (3, "c", "p2"), (4, "d", "p3")]
        assert rows_of(catalog, "t") == sorted(expect)

    def test_delete_insert(self, spark, catalog, partitioned):
        self._create(spark, catalog, partitioned)
        dml.delete_insert(catalog, "t", seed_df(spark, INCR), unique_key="id")
        expect = [(1, "a", "p1"), (2, "B", "p1"), (3, "c", "p2"), (4, "d", "p3")]
        assert rows_of(catalog, "t") == sorted(expect)

    def test_untouched_partition_files_survive(self, spark, catalog, partitioned):
        """Partition pruning: p2 is untouched by the source, its data
        must not be rewritten (and must still be there)."""
        self._create(spark, catalog, partitioned)
        import os

        if partitioned:
            p2 = os.path.join(catalog.table_dir("t"), "pt=p2")
            before = sorted(os.listdir(p2))
        dml.merge(catalog, "t", seed_df(spark, INCR), unique_key="id")
        if partitioned:
            assert sorted(os.listdir(p2)) == before  # same files, not rewritten
        assert (3, "c", "p2") in rows_of(catalog, "t")


def test_insert_overwrite_dynamic(spark, catalog):
    catalog.create_table("t", seed_df(spark, BASE), partition_by=["pt"])
    src = seed_df(spark, [(9, "z", "p1"), (8, "y", "p3")])
    dml.insert_overwrite(catalog, "t", src)
    # p1 fully replaced, p2 untouched, p3 created
    assert rows_of(catalog, "t") == sorted([(9, "z", "p1"), (3, "c", "p2"), (8, "y", "p3")])


def test_insert_overwrite_static(spark, catalog):
    catalog.create_table("t", seed_df(spark, BASE), partition_by=["pt"])
    src = seed_df(spark, [(9, "z", "p1"), (8, "y", "p2")])
    dml.insert_overwrite(catalog, "t", src, partitions=[{"pt": "p1"}])
    # only p1 replaced; the p2 source row is filtered OUT (static list)
    assert rows_of(catalog, "t") == sorted([(9, "z", "p1"), (3, "c", "p2")])


def test_insert_overwrite_requires_partitioned(spark, catalog):
    catalog.create_table("t", seed_df(spark, BASE))
    with pytest.raises(ValueError, match="partitioned"):
        dml.insert_overwrite(catalog, "t", seed_df(spark, INCR))


def test_insert_overwrite_multi_partition(spark, catalog):
    """reference test_insert_overwrite_multi_partition.py: 2-level
    partitioning, dynamic overwrite only touches present combos."""
    df = spark.createDataFrame(
        [(1, "x", "a", "1"), (2, "y", "a", "2"), (3, "z", "b", "1")],
        "id bigint, val string, k1 string, k2 string",
    )
    catalog.create_table("m", df, partition_by=["k1", "k2"])
    src = spark.createDataFrame([(9, "X", "a", "1")], "id bigint, val string, k1 string, k2 string")
    dml.insert_overwrite(catalog, "m", src)
    got = rows_of(catalog, "m", cols=("id", "val", "k1", "k2"))
    assert got == sorted([(9, "X", "a", "1"), (2, "y", "a", "2"), (3, "z", "b", "1")])


def test_delete_insert_list_unique_key(spark, catalog):
    """reference test_delete_insert_list_unique_key.py: tuple-IN
    matching on a multi-column key."""
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (2, 1, "c")], "a bigint, b bigint, v string"
    )
    catalog.create_table("lk", df)
    src = spark.createDataFrame([(1, 2, "B2"), (3, 3, "n")], "a bigint, b bigint, v string")
    dml.delete_insert(catalog, "lk", src, unique_key=["a", "b"])
    got = rows_of(catalog, "lk", cols=("a", "b", "v"))
    assert got == sorted([(1, 1, "a"), (1, 2, "B2"), (2, 1, "c"), (3, 3, "n")])


def test_merge_update_columns(spark, catalog):
    """merge_update_columns restricts the SET list (merge.sql:7-16)."""
    df = spark.createDataFrame([(1, "a", 10.0)], "id bigint, name string, score double")
    catalog.create_table("u", df)
    src = spark.createDataFrame([(1, "CHANGED", 99.0)], "id bigint, name string, score double")
    dml.merge(catalog, "u", src, unique_key="id", merge_update_columns=["score"])
    row = catalog.read("u").first()
    assert row["name"] == "a"  # not in update set -> kept
    assert row["score"] == 99.0


def test_merge_exclude_columns(spark, catalog):
    df = spark.createDataFrame([(1, "a", 10.0)], "id bigint, name string, score double")
    catalog.create_table("u2", df)
    src = spark.createDataFrame([(1, "CHANGED", 99.0)], "id bigint, name string, score double")
    dml.merge(catalog, "u2", src, unique_key="id", merge_exclude_columns=["score"])
    row = catalog.read("u2").first()
    assert row["name"] == "CHANGED"
    assert row["score"] == 10.0


def test_merge_null_update_value(spark, catalog):
    """UPDATE SET may legitimately set NULL from source."""
    df = spark.createDataFrame([(1, "a")], "id bigint, name string")
    catalog.create_table("n", df)
    src = spark.createDataFrame([(1, None)], "id bigint, name string")
    dml.merge(catalog, "n", src, unique_key="id")
    assert catalog.read("n").first()["name"] is None


def test_microbatch(spark, catalog):
    rows = [
        (1, datetime.datetime(2025, 1, 1, 5), "a"),
        (2, datetime.datetime(2025, 1, 2, 6), "b"),
        (3, datetime.datetime(2025, 1, 3, 7), "c"),
    ]
    df = spark.createDataFrame(rows, "id bigint, event_time timestamp, v string")
    catalog.create_table(
        "mb",
        df.limit(0),
        auto_partition={"source_column": "event_time", "granularity": "day", "generated_column": "pt_day"},
    )
    n = dml.microbatch(
        catalog, "mb", df, "event_time",
        begin=datetime.datetime(2025, 1, 1), end=datetime.datetime(2025, 1, 3),
        batch_size="day",
    )
    assert n == 2  # Jan 1 and Jan 2 slices; Jan 3 outside [begin, end)
    got = sorted(r["id"] for r in catalog.read("mb").collect())
    assert got == [1, 2]
    # re-run is idempotent (dynamic overwrite per slice)
    dml.microbatch(
        catalog, "mb", df, "event_time",
        begin=datetime.datetime(2025, 1, 1), end=datetime.datetime(2025, 1, 3),
        batch_size="day",
    )
    assert sorted(r["id"] for r in catalog.read("mb").collect()) == [1, 2]


def test_microbatch_granularity_mismatch(spark, catalog):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2025, 1, 1), "a")], "id bigint, event_time timestamp, v string"
    )
    catalog.create_table(
        "mb2", df.limit(0),
        auto_partition={"source_column": "event_time", "granularity": "month", "generated_column": "pt"},
    )
    with pytest.raises(ValueError, match="granularity"):
        dml.microbatch(
            catalog, "mb2", df, "event_time",
            begin=datetime.datetime(2025, 1, 1), end=datetime.datetime(2025, 1, 2),
        )


def test_auto_partition_hidden_column(spark, catalog):
    """Auto-partition generated column derived at write, hidden from
    the logical column list (reference impl.py:206-214)."""
    df = spark.createDataFrame(
        [(1, datetime.datetime(2025, 3, 15, 10), "a")], "id bigint, ts timestamp, v string"
    )
    catalog.create_table(
        "ap", df,
        auto_partition={"source_column": "ts", "granularity": "month", "generated_column": "pt"},
    )
    cols = catalog.data_columns("ap")
    assert "pt" not in cols and set(cols) == {"id", "ts", "v"}
    # physical layout IS partitioned by the derived value
    import os

    assert any(d.startswith("pt=") for d in os.listdir(catalog.table_dir("ap")))
    # merge into an auto-partitioned table re-derives pt from source
    src = spark.createDataFrame(
        [(1, datetime.datetime(2025, 3, 20, 0), "A")], "id bigint, ts timestamp, v string"
    )
    dml.merge(catalog, "ap", src, unique_key="id")
    assert catalog.read("ap").filter(F.col("id") == 1).first()["v"] == "A"


class TestRunIncremental:
    def test_first_run_creates(self, spark, catalog):
        df = seed_df(spark, BASE)
        assert run_incremental(catalog, "ri", df, strategy="merge", unique_key="id") == "create"
        assert run_incremental(catalog, "ri", seed_df(spark, INCR), strategy="merge", unique_key="id") == "merge"
        assert rows_of(catalog, "ri") == sorted(
            [(1, "a", "p1"), (2, "B", "p1"), (3, "c", "p2"), (4, "d", "p3")]
        )

    def test_append_rejects_unique_key(self, spark, catalog):
        catalog.create_table("ri2", seed_df(spark, BASE))
        with pytest.raises(ValueError, match="append"):
            run_incremental(catalog, "ri2", seed_df(spark, INCR), strategy="append", unique_key="id")

    def test_merge_without_key_appends(self, spark, catalog):
        catalog.create_table("ri3", seed_df(spark, BASE))
        run_incremental(catalog, "ri3", seed_df(spark, INCR), strategy="merge")
        assert len(rows_of(catalog, "ri3")) == 5

    def test_invalid_strategy(self, spark, catalog):
        catalog.create_table("ri4", seed_df(spark, BASE))
        with pytest.raises(ValueError, match="invalid incremental strategy"):
            run_incremental(catalog, "ri4", seed_df(spark, INCR), strategy="bogus")

    def test_full_refresh(self, spark, catalog):
        catalog.create_table("ri5", seed_df(spark, BASE))
        run_incremental(catalog, "ri5", seed_df(spark, INCR), full_refresh=True)
        assert len(rows_of(catalog, "ri5")) == 2


def test_merge_rejects_duplicate_source_keys(spark, catalog):
    """SQL MERGE errors when a target row matches multiple source rows;
    a silent full-outer fan-out would duplicate matched rows instead."""
    catalog.create_table("t", seed_df(spark, BASE))
    dup_src = seed_df(spark, [(2, "B", "p1"), (2, "B2", "p1"), (4, "d", "p3")])
    with pytest.raises(ValueError, match="duplicate rows for unique_key"):
        dml.merge(catalog, "t", dup_src, unique_key="id")
    # target untouched
    assert rows_of(catalog, "t") == sorted(BASE)


def test_partition_scope_semi_join_above_threshold(spark, catalog):
    """>100 affected partitions: the scope filter switches from a
    literal OR-chain to a broadcast semi-join (plan-size guard), with
    identical semantics."""
    df = spark.range(0, 300).select(
        F.col("id"), F.concat(F.lit("p"), F.col("id") % 150).alias("pt")
    )
    parts = [{"pt": f"p{i}"} for i in range(120)]
    scoped = dml._scope_to_partitions(df, ["pt"], parts)
    plan = scoped._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    got = sorted(r["id"] for r in scoped.collect())
    want = sorted(i for i in range(300) if (i % 150) < 120)
    assert got == want

    # small sets stay a literal predicate (partition-prunable at the scan)
    small = dml._scope_to_partitions(df, ["pt"], parts[:3])
    small_plan = small._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in small_plan
    assert sorted(r["id"] for r in small.collect()) == sorted(
        i for i in range(300) if (i % 150) < 3
    )


# ---------------------------------------------------------------------------
# round-4 pins: cross-partition key matches + reference-dialect predicates
# ---------------------------------------------------------------------------


def test_merge_updates_matched_row_across_partitions(spark, catalog):
    """A source row whose partition value differs from its matched
    target row's partition must UPDATE that row in place (reference
    MERGE matches on the key alone, merge.sql:36-45) — not insert a
    duplicate key into the source's partition.  Pins the round-4
    pruning-soundness fix (_matched_partitions)."""
    catalog.create_table("t", seed_df(spark, BASE), partition_by=["pt"])
    # id=1 lives in p1; the update arrives tagged with a NEW pt value
    dml.merge(catalog, "t", seed_df(spark, [(1, "A", "p9")]), unique_key="id")
    # name updated, row stays in p1 (pt excluded from UPDATE), no p9 row
    expect = [(1, "A", "p1"), (2, "b", "p1"), (3, "c", "p2")]
    assert rows_of(catalog, "t") == sorted(expect)


def test_delete_insert_deletes_across_partitions(spark, catalog):
    """delete+insert matches doomed rows by key regardless of partition
    (merge.sql:75-83): the old row in p1 is deleted, the replacement
    lands in its own partition."""
    catalog.create_table("t", seed_df(spark, BASE), partition_by=["pt"])
    dml.delete_insert(catalog, "t", seed_df(spark, [(1, "A", "p9")]), unique_key="id")
    expect = [(1, "A", "p9"), (2, "b", "p1"), (3, "c", "p2")]
    assert rows_of(catalog, "t") == sorted(expect)


def test_merge_predicate_reference_aliases(spark, catalog):
    """incremental_predicates in the reference's MERGE dialect qualify
    columns with DBT_INTERNAL_DEST / DBT_INTERNAL_SOURCE
    (merge.sql:36-38); the predicate joins the ON condition, so a
    matched-but-false pair leaves the target row untouched and inserts
    the source row (genuine MERGE-with-ON-predicate semantics)."""
    catalog.create_table("t", seed_df(spark, BASE))
    dml.merge(
        catalog,
        "t",
        seed_df(spark, [(2, "B", "p1"), (3, "C", "p2")]),
        unique_key="id",
        incremental_predicates=["DBT_INTERNAL_DEST.name = 'b'"],
    )
    # id=2 matches (tgt name='b'): updated. id=3 (tgt name='c'): ON
    # fails -> target row kept AND source row inserted (duplicate id=3,
    # exactly what the generated MERGE would produce).
    expect = [(1, "a", "p1"), (2, "B", "p1"), (3, "c", "p2"), (3, "C", "p2")]
    assert rows_of(catalog, "t") == sorted(expect)


def test_delete_insert_bare_predicate_targets_dest(spark, catalog):
    """delete+insert predicates use bare target column names (the
    source is only an IN-subquery in merge.sql:75-96); a bare `name`
    must resolve to the TARGET row being considered for deletion."""
    catalog.create_table("t", seed_df(spark, BASE))
    dml.delete_insert(
        catalog,
        "t",
        seed_df(spark, [(1, "X", "p1"), (2, "Y", "p1")]),
        unique_key="id",
        incremental_predicates=["name = 'a'"],
    )
    # id=1 (name 'a'): deleted; id=2 (name 'b'): predicate false, row
    # SURVIVES the delete — both source rows are inserted regardless.
    expect = [(1, "X", "p1"), (2, "b", "p1"), (2, "Y", "p1"), (3, "c", "p2")]
    assert rows_of(catalog, "t") == sorted(expect)
