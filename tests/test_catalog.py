"""Catalog DDL/metadata operators (SURVEY.md §2.7)."""

from __future__ import annotations

import pytest

from dbt_maxcompute_spark.catalog import EngineCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return EngineCatalog(spark, str(tmp_path / "wh"))


@pytest.fixture()
def base(spark, catalog):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string")
    catalog.create_table("base", df)
    return df


def test_create_read_roundtrip(spark, catalog, base):
    got = sorted((r["id"], r["name"]) for r in catalog.read("base").collect())
    assert got == [(1, "a"), (2, "b")]
    assert catalog.exists("base")
    assert not catalog.exists("nope")


def test_create_duplicate_errors(spark, catalog, base):
    with pytest.raises(ValueError, match="exists"):
        catalog.create_table("base", catalog.read("base"))


def test_rename(spark, catalog, base):
    catalog.rename("base", "base2")
    assert not catalog.exists("base")
    assert catalog.read("base2").count() == 2


def test_rename_mv_is_error(spark, catalog):
    catalog.create_view("v", "SELECT 1 AS x")
    m = catalog.meta("v")
    m.table_type = "materialized_view"
    catalog._write_meta("v", m)
    with pytest.raises(ValueError, match="materialized"):
        catalog.rename("v", "v2")


def test_clone(spark, catalog, base):
    catalog.clone("base", "copy")
    assert catalog.read("copy").count() == 2
    # clone is independent: truncating the copy leaves src intact
    catalog.truncate("copy")
    assert catalog.read("copy").count() == 0
    assert catalog.read("base").count() == 2


def test_truncate_keeps_schema(spark, catalog, base):
    catalog.truncate("base")
    df = catalog.read("base")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["id", "name"]


def test_views(spark, catalog, base):
    catalog.create_view("v_big", "SELECT id, name FROM base WHERE id > 1")
    got = catalog.read("v_big").collect()
    assert len(got) == 1 and got[0]["name"] == "b"


def test_schema_evolution_add_remove(spark, catalog, base):
    catalog.add_remove_columns("base", add={"score": "double"}, remove=["name"])
    df = catalog.read("base")
    assert set(df.columns) == {"id", "score"}
    assert df.filter(df.score.isNull()).count() == 2


def test_alter_column_type_forced_retype(spark, catalog, base):
    # bigint->string is not a string-family expansion: rejected unless forced
    with pytest.raises(ValueError, match="only string-family expansion"):
        catalog.alter_column_type("base", "id", "string")
    catalog.alter_column_type("base", "id", "string", force=True)
    assert dict(catalog.columns("base"))["id"] == "string"


def test_alter_column_type_string_widening(spark, catalog, base):
    # string-family widening allowed without force (reference
    # column.py:78-80 can_expand_to)
    catalog.alter_column_type("base", "name", "string")
    assert dict(catalog.columns("base"))["name"] == "string"


def test_can_expand_to_rules():
    from dbt_maxcompute_spark.catalog import can_expand_to

    assert can_expand_to("varchar(5)", "varchar(10)")
    assert can_expand_to("varchar(5)", "string")
    assert can_expand_to("char(3)", "varchar(3)")
    assert can_expand_to("string", "string")
    assert not can_expand_to("varchar(10)", "varchar(5)")  # narrowing
    assert not can_expand_to("string", "varchar(99)")  # unbounded -> bounded
    assert not can_expand_to("bigint", "string")  # cross-family
    assert not can_expand_to("string", "bigint")


def test_comments_idempotent(spark, catalog, base):
    catalog.set_comment("base", "hello")
    assert catalog.meta("base").comment == "hello"
    catalog.set_column_comment("base", "id", "the key")
    assert catalog.meta("base").column_comments["id"] == "the key"


def test_grants_diff(spark, catalog, base):
    r1 = catalog.apply_grants("base", {"select": ["alice", "bob"]})
    assert r1["granted"] == {"select": ["alice", "bob"]}
    r2 = catalog.apply_grants("base", {"select": ["alice"]})
    assert r2["revoked"] == {"select": ["bob"]}


def test_list_tables_pattern(spark, catalog, base):
    df = catalog.read("base")
    catalog.create_table("base_v2", df)
    catalog.create_table("other", df)
    assert catalog.list_tables(pattern="base%") == ["base", "base_v2"]
    assert catalog.list_tables(pattern="bas_") == ["base"]
    assert set(catalog.list_tables()) == {"base", "base_v2", "other"}


def test_schemas(spark, catalog, base):
    catalog.create_schema("staging")
    catalog.create_table("staging.t1", catalog.read("base"))
    assert catalog.list_tables("staging") == ["t1"]
    assert catalog.read("staging.t1").count() == 2
    catalog.drop_schema("staging", cascade=True)
    assert not catalog.exists("staging.t1")


def test_sql_over_catalog(spark, catalog, base):
    out = catalog.sql("SELECT count(*) AS n FROM base").first()["n"]
    assert out == 2


def test_validate_sql(spark, catalog, base):
    plan = catalog.validate_sql("SELECT id FROM base")
    assert "id" in plan
    with pytest.raises(Exception):
        catalog.validate_sql("SELECT nonexistent_col FROM base")


def test_freshness(spark, catalog, base):
    age = catalog.freshness("base")
    assert 0 <= age < 300


def test_invalid_identifier(spark, catalog):
    with pytest.raises(ValueError, match="invalid identifier"):
        catalog.table_dir("bad-name; drop")


def test_info_schema_rows(spark, catalog):
    catalog.create_table("t_info", spark.createDataFrame([(1, "a")], ["id", "v"]), lifecycle=7)
    catalog.create_view("v_info", "select 1 as one")
    rows = {
        (r.table_name, r.table_type, r.n_columns, r.lifecycle)
        for r in catalog.info_schema().collect()
    }
    assert ("t_info", "table", 2, 7) in rows
    assert ("v_info", "view", 1, None) in rows


def test_lifecycle_sweep(spark, catalog):
    import time as _time

    catalog.create_table("t_ttl", spark.createDataFrame([(1,)], ["id"]), lifecycle=1)
    catalog.create_table("t_keep", spark.createDataFrame([(1,)], ["id"]))
    assert catalog.sweep_lifecycle() == []  # fresh: nothing dropped
    dropped = catalog.sweep_lifecycle(now=_time.time() + 3 * 86400)
    assert dropped == ["default.t_ttl"]
    assert not catalog.exists("t_ttl") and catalog.exists("t_keep")


def test_relation_type_swap(spark, catalog):
    """table -> view -> table swaps on re-materialization (reference
    test_relations.py BaseChangeRelationTypeValidator)."""
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    catalog.create_table("swapper", df)
    assert catalog.meta("swapper").table_type == "table"
    catalog.drop("swapper")
    catalog.create_view("swapper", "select 1 as one")
    assert catalog.meta("swapper").table_type == "view"
    assert catalog.read("swapper").collect()[0].one == 1
    catalog.drop("swapper")
    catalog.create_table("swapper", df)
    assert catalog.meta("swapper").table_type == "table"
    assert catalog.read("swapper").count() == 1


def test_compact_unpartitioned_merges_files(spark, catalog):
    import os

    from pyspark.sql import functions as F

    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    ).repartition(40)  # 40 small files
    catalog.create_table("frag", df)
    path = catalog.table_dir("frag")
    n_before = sum(f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs)
    assert n_before >= 30
    stats = catalog.compact("frag")  # tiny table -> one right-sized file
    assert stats["files_before"] == n_before
    assert stats["files_after"] == 1
    got = sorted(r["id"] for r in catalog.read("frag").collect())
    assert got == list(range(10_000))


def test_compact_partitioned_one_file_per_partition(spark, catalog):
    import os

    from pyspark.sql import functions as F

    df = spark.range(3_000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("pt")
    )
    catalog.create_table("fragp", df, partition_by=["pt"])
    # simulate fragmented appends: three more writes into the same dirs
    for _ in range(3):
        df.limit(300).write.mode("append").partitionBy("pt").parquet(
            catalog.table_dir("fragp")
        )
    stats = catalog.compact("fragp")
    assert stats["files_after"] == 3  # one per hive partition
    assert catalog.read("fragp").count() == 3_000 + 3 * 300
    # layout: exactly one parquet per partition dir
    path = catalog.table_dir("fragp")
    for d in os.listdir(path):
        if d.startswith("pt="):
            files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
            assert len(files) == 1, (d, files)


def test_compact_rejects_views_and_bucketed(spark, catalog, base):
    catalog.create_view("v1", "SELECT 1 AS x")
    with pytest.raises(ValueError, match="tables only"):
        catalog.compact("v1")
    from pyspark.sql import functions as F

    b = spark.range(100).select(F.col("id").alias("k"))
    catalog.create_bucketed_table("bkt1", b, bucket_by=["k"], bucket_num=4)
    with pytest.raises(ValueError, match="bucketed"):
        catalog.compact("bkt1")


def test_register_views_cached_across_statements(spark, tmp_path, monkeypatch):
    """Round-5 verdict finding #3: register_views must not re-register
    every catalog table on every statement — only mutated tables."""
    from pyspark.sql.classic.dataframe import DataFrame  # concrete class

    cat = EngineCatalog(spark, str(tmp_path / "wh_cache"))
    for i in range(6):
        cat.create_table(f"tbl_{i}", spark.range(5).selectExpr("id", "id*2 AS v"))
    cat.create_table(
        "hot", spark.range(5).selectExpr("id", "id AS v"),
        transactional=True, primary_keys=["id"],
    )
    calls = []
    orig = DataFrame.createOrReplaceTempView

    def counting(self, name):
        calls.append(name)
        return orig(self, name)

    monkeypatch.setattr(DataFrame, "createOrReplaceTempView", counting)
    script = "SELECT count(*) AS n FROM hot;\n" * 3 + (
        "UPDATE hot SET v = v + 1 WHERE id = 0;\n"
        + "SELECT count(*) AS n FROM tbl_0;\n" * 3
        + "DELETE FROM hot WHERE id = 4;\n"
        + "SELECT count(*) AS n FROM hot;\n" * 2
    )
    df, _hints, errors = cat.execute_script(script)
    assert not errors and df.collect()[0].n == 4
    # first statement registers all 7 tables (bare + schema-qualified =
    # 14 views); afterwards only `hot` re-registers after each of its 2
    # mutations (2 views each). Everything else is served from cache.
    assert len(calls) == 14 + 2 * 2, f"{len(calls)} registrations: {calls}"


def test_register_views_freshness_after_mutation(spark, tmp_path):
    cat = EngineCatalog(spark, str(tmp_path / "wh_fresh"))
    cat.create_table(
        "t", spark.range(4).selectExpr("id"),
        transactional=True, primary_keys=["id"],
    )
    assert cat.sql("SELECT count(*) AS n FROM t").collect()[0].n == 4
    cat.execute("DELETE FROM t WHERE id >= 2")
    # the cached view must NOT serve the old snapshot
    assert cat.sql("SELECT count(*) AS n FROM t").collect()[0].n == 2
    # a second catalog registering in the same session steals the slot;
    # the first must fully re-register, not trust its cache
    cat2 = EngineCatalog(spark, str(tmp_path / "wh_fresh2"))
    cat2.create_table("t", spark.range(9).selectExpr("id"))
    assert cat2.sql("SELECT count(*) AS n FROM t").collect()[0].n == 9
    assert cat.sql("SELECT count(*) AS n FROM t").collect()[0].n == 2
