"""Model-based property test for the catalog's DDL surface: random
sequences of add/remove-column, widen, rename, truncate, clone, and
comment ops against an in-memory model — schema, row count, and
metadata must agree after every sequence, and the relation must stay
readable at every step (no op leaves a half-rewritten table)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dbt_maxcompute_spark.catalog import EngineCatalog

_COL_TYPES = ["bigint", "double", "string"]


@st.composite
def ddl_sequences(draw):
    ops = []
    for _ in range(draw(st.integers(2, 7))):
        kind = draw(
            st.sampled_from(
                ["add", "remove", "widen", "rename", "truncate", "clone", "comment"]
            )
        )
        if kind == "add":
            ops.append(("add", draw(st.sampled_from("efgh")), draw(st.sampled_from(_COL_TYPES))))
        elif kind == "remove":
            ops.append(("remove", draw(st.sampled_from("bcefgh"))))
        elif kind == "widen":
            ops.append(("widen", draw(st.sampled_from("bc"))))
        elif kind == "comment":
            ops.append(("comment", draw(st.text(max_size=10))))
        else:
            ops.append((kind,))
    return ops


@given(ops=ddl_sequences())
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_ddl_sequence_matches_model(spark, tmp_path_factory, ops):
    catalog = EngineCatalog(spark, str(tmp_path_factory.mktemp("wh")))
    base = spark.range(0, 5).select(
        F.col("id").alias("a"),
        F.col("id").cast("string").alias("b"),
        F.lit("x").alias("c"),
    )
    catalog.create_table("t", base)

    # model: ordered {col: type}, row count, current name, comment
    cols = {"a": "bigint", "b": "string", "c": "string"}
    n_rows = 5
    name = "t"
    comment = None
    clone_i = 0

    for op in ops:
        if op[0] == "add":
            _, col, typ = op
            if col in cols:
                continue
            catalog.add_remove_columns(name, add={col: typ})
            cols[col] = typ
        elif op[0] == "remove":
            col = op[1]
            if col not in cols or len(cols) == 1:
                continue
            catalog.add_remove_columns(name, remove=[col])
            cols.pop(col)
        elif op[0] == "widen":
            col = op[1]
            if cols.get(col) != "string":
                continue  # only string-family widening is legal
            catalog.alter_column_type(name, col, "string")
        elif op[0] == "rename":
            new = f"{name}_r"
            catalog.rename(name, new)
            name = new
        elif op[0] == "truncate":
            catalog.truncate(name)
            n_rows = 0
        elif op[0] == "clone":
            clone_i += 1
            catalog.clone(name, f"c{clone_i}")
        elif op[0] == "comment":
            comment = op[1]
            catalog.set_comment(name, comment)

        # invariant: relation readable + model-consistent after EVERY op
        df = catalog.read(name)
        assert dict(catalog.columns(name)) == cols
        assert df.columns == list(cols)
        assert df.count() == n_rows
        assert catalog.meta(name).comment == comment

    # clones are independent full copies at their snapshot
    for i in range(1, clone_i + 1):
        assert catalog.exists(f"c{i}")
