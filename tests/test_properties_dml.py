"""Property tests: the DML planner against DuckDB's own DML engine.

Round-3 verdict item 7: hypothesis-generates key/partition/predicate
combos at tiny scale and compares ``plans/dml`` against DuckDB running
the equivalent statements.  DuckDB 1.0 has no MERGE INTO, so the oracle
runs the standard operational decomposition of the reference's
merge.sql:36-52 —

    UPDATE tgt SET <update cols> FROM src WHERE <on-cond>;
    INSERT INTO tgt SELECT * FROM src WHERE NOT EXISTS (<on-cond>);

which is observationally identical to MERGE when source keys are unique
(our planner enforces that precondition, merge.sql semantics reject
multi-match).  delete+insert mirrors merge.sql:75-117 directly.

Two tiers:
  * ``_merge_result`` / ``_delete_insert_survivors`` plan-level tests —
    in-memory frames, no parquet, 200+ examples each (fast).
  * end-to-end catalog tests through parquet + partition pruning +
    stage-and-swap at a reduced example count (the expensive part is
    the per-example table write, not the semantics).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbt_maxcompute_spark.catalog import EngineCatalog
from dbt_maxcompute_spark.plans import dml

# ---------------------------------------------------------------------------
# case generation: small key domain -> frequent matched/unmatched overlap;
# NULLs in keys and values pin SQL's NULL-never-matches semantics.
# ---------------------------------------------------------------------------

_KEY = st.one_of(st.none(), st.integers(0, 5))
_VAL = st.one_of(st.none(), st.integers(-99, 99))
_PT = st.sampled_from(["p1", "p2", "p3"])

_ROW = st.tuples(_KEY, _KEY, _VAL, _VAL, _PT)
_COLS = ["k1", "k2", "v1", "v2", "pt"]
_SCHEMA = "k1 bigint, k2 bigint, v1 bigint, v2 bigint, pt string"


def _dedupe_keys(rows, nkeys):
    """Planner precondition: unique source key tuples.  groupBy treats
    NULLs as equal, so dedupe the same way."""
    seen, out = set(), []
    for r in rows:
        k = tuple(r[:nkeys])
        if k not in seen:
            seen.add(k)
            out.append(r)
    return out


@st.composite
def merge_case(draw):
    nkeys = draw(st.integers(1, 2))
    tgt = draw(st.lists(_ROW, min_size=0, max_size=14))
    src = _dedupe_keys(draw(st.lists(_ROW, min_size=0, max_size=10)), nkeys)
    update_cols = draw(
        st.sampled_from(
            [None, ["v1"], ["v2"], ["v1", "v2"], ["v1", "v2", "pt"]]
        )
    )
    exclude_cols = draw(st.sampled_from([None, ["v2"], ["pt"]]))
    pred = draw(
        st.sampled_from(
            [
                None,
                "DBT_INTERNAL_DEST.v1 > 0",
                "DBT_INTERNAL_SOURCE.v2 < 10",
            ]
        )
    )
    return nkeys, tgt, src, update_cols, exclude_cols, pred


@st.composite
def delete_insert_case(draw):
    nkeys = draw(st.integers(1, 2))
    tgt = draw(st.lists(_ROW, min_size=0, max_size=14))
    src = draw(st.lists(_ROW, min_size=0, max_size=10))
    pred = draw(st.sampled_from([None, "v1 > 0", "DBT_INTERNAL_DEST.v2 < 10"]))
    return nkeys, tgt, src, pred


# ---------------------------------------------------------------------------
# oracle
# ---------------------------------------------------------------------------


def _frame(rows):
    return pd.DataFrame(rows, columns=_COLS).astype(
        {"k1": "Int64", "k2": "Int64", "v1": "Int64", "v2": "Int64", "pt": "string"}
    )


_DUCK_DDL = "(k1 BIGINT, k2 BIGINT, v1 BIGINT, v2 BIGINT, pt VARCHAR)"
_DUCK_SEL = "k1, k2, v1, v2, CAST(pt AS VARCHAR)"


def _duck(tgt_rows, src_rows):
    # explicit DDL: duckdb 1.0's pandas scan types EMPTY string columns
    # as INTEGER, so CREATE TABLE AS from a registered frame is unsafe
    con = duckdb.connect()
    con.register("tgt_src", _frame(tgt_rows))
    con.register("src_src", _frame(src_rows))
    con.execute(f"CREATE TABLE t {_DUCK_DDL}")
    con.execute(f"CREATE TABLE s {_DUCK_DDL}")
    con.execute(f"INSERT INTO t SELECT {_DUCK_SEL} FROM tgt_src")
    con.execute(f"INSERT INTO s SELECT {_DUCK_SEL} FROM src_src")
    return con


def _fetch(con):
    df = con.execute("SELECT * FROM t").fetch_df()
    return _canon_pandas(df)


def _canon_pandas(df):
    rows = []
    for r in df.itertuples(index=False):
        rows.append(tuple(None if pd.isna(v) else int(v) if not isinstance(v, str) else v for v in r))
    return sorted(rows, key=lambda t_: tuple((x is None, x) for x in t_))


def _canon_spark(df):
    rows = [tuple(r[c] for c in _COLS) for r in df.select(*_COLS).collect()]
    return sorted(rows, key=lambda t_: tuple((x is None, x) for x in t_))


def _merge_oracle(con, keys, update_cols, pred):
    """UPDATE-then-INSERT decomposition of MERGE.  The NOT MATCHED check
    runs against a PRE-UPDATE snapshot (t0): real MERGE evaluates all
    matching against the original target, and an UPDATE that modifies a
    column referenced by the ON predicate must not make its source row
    look unmatched to the subsequent INSERT."""

    def _on(talias):
        on = " AND ".join(f"{talias}.{k} = s.{k}" for k in keys)
        if pred:
            p = pred.replace("DBT_INTERNAL_DEST.", f"{talias}.").replace(
                "DBT_INTERNAL_SOURCE.", "s."
            )
            on += f" AND ({p})"
        return on

    con.execute("CREATE TABLE t0 AS SELECT * FROM t")
    if update_cols:
        sets = ", ".join(f"{c} = s.{c}" for c in sorted(update_cols))
        con.execute(f"UPDATE t SET {sets} FROM s WHERE {_on('t')}")
    con.execute(
        f"INSERT INTO t SELECT * FROM s WHERE NOT EXISTS "
        f"(SELECT 1 FROM t0 WHERE {_on('t0')})"
    )


def _delete_insert_oracle(con, keys, pred_sql):
    # duckdb 1.0 lacks row-value IN subqueries; EXISTS is equivalent to
    # the reference's tuple-IN for a positive DELETE WHERE (both treat
    # NULL-key comparisons as not-deleted)
    on = " AND ".join(f"s.{k} = t.{k}" for k in keys)
    where = f"EXISTS (SELECT 1 FROM s WHERE {on})"
    if pred_sql:
        where += f" AND ({pred_sql})"
    con.execute(f"DELETE FROM t WHERE {where}")
    con.execute("INSERT INTO t SELECT * FROM s")


def _pred_to_duck(pred, side_map):
    if pred is None:
        return None
    out = pred
    for alias, table in side_map.items():
        out = out.replace(alias + ".", table + ".")
    return out


# ---------------------------------------------------------------------------
# tier 1: plan-level, in-memory (200+ examples per property)
# ---------------------------------------------------------------------------

_FAST = settings(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(case=merge_case())
@_FAST
def test_merge_result_matches_duckdb_merge(spark, case):
    nkeys, tgt_rows, src_rows, update_columns, exclude_columns, pred = case
    keys = _COLS[:nkeys]

    # the planner's update-set rules (merge.sql:7-16), partition-free
    if update_columns:
        update_cols = set(update_columns) - set(keys)
    else:
        update_cols = set(_COLS) - set(keys) - set(exclude_columns or [])

    tgt = spark.createDataFrame(_frame(tgt_rows), _SCHEMA)
    src = spark.createDataFrame(_frame(src_rows), _SCHEMA)
    got = _canon_spark(dml._merge_result(tgt, src, keys, update_cols, [pred] if pred else None))

    con = _duck(tgt_rows, src_rows)
    _merge_oracle(con, keys, update_cols, pred)
    want = _fetch(con)
    con.close()
    assert got == want


@given(case=delete_insert_case())
@_FAST
def test_delete_insert_matches_duckdb(spark, case):
    nkeys, tgt_rows, src_rows, pred = case
    keys = _COLS[:nkeys]

    tgt = spark.createDataFrame(_frame(tgt_rows), _SCHEMA)
    src = spark.createDataFrame(_frame(src_rows), _SCHEMA)
    survivors = dml._delete_insert_survivors(tgt, src, keys, [pred] if pred else None)
    got = _canon_spark(survivors.unionByName(src))

    con = _duck(tgt_rows, src_rows)
    _delete_insert_oracle(
        con, keys, _pred_to_duck(pred, {"DBT_INTERNAL_DEST": "t"})
    )
    want = _fetch(con)
    con.close()
    assert got == want


# ---------------------------------------------------------------------------
# tier 2: end-to-end through the catalog (parquet, partition pruning,
# stage-and-swap) — fewer examples, the full write path each time
# ---------------------------------------------------------------------------

_E2E = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(case=merge_case(), partitioned=st.booleans())
@_E2E
def test_merge_end_to_end_matches_duckdb(spark, tmp_path_factory, case, partitioned):
    nkeys, tgt_rows, src_rows, update_columns, exclude_columns, pred = case
    keys = _COLS[:nkeys]
    catalog = EngineCatalog(spark, str(tmp_path_factory.mktemp("wh")))

    opts = {"partition_by": ["pt"]} if partitioned else {}
    catalog.create_table("t", spark.createDataFrame(_frame(tgt_rows), _SCHEMA), **opts)
    dml.merge(
        catalog,
        "t",
        spark.createDataFrame(_frame(src_rows), _SCHEMA),
        unique_key=keys,
        merge_update_columns=update_columns,
        merge_exclude_columns=exclude_columns,
        incremental_predicates=[pred] if pred else None,
    )
    got = _canon_spark(catalog.read("t"))

    # oracle mirrors the planner's update-set rules incl. the
    # partition-column default exclusion (merge.sql:7-16)
    if update_columns:
        update_cols = set(update_columns) - set(keys)
    else:
        update_cols = set(_COLS) - set(keys) - set(exclude_columns or [])
    if partitioned:
        # partition cols always excluded from UPDATE (dml._update_set)
        update_cols -= {"pt"}

    con = _duck(tgt_rows, src_rows)
    _merge_oracle(con, keys, update_cols, pred)
    want = _fetch(con)
    con.close()
    assert got == want


@given(case=delete_insert_case(), partitioned=st.booleans())
@_E2E
def test_delete_insert_end_to_end_matches_duckdb(
    spark, tmp_path_factory, case, partitioned
):
    nkeys, tgt_rows, src_rows, pred = case
    keys = _COLS[:nkeys]
    catalog = EngineCatalog(spark, str(tmp_path_factory.mktemp("wh")))

    opts = {"partition_by": ["pt"]} if partitioned else {}
    catalog.create_table("t", spark.createDataFrame(_frame(tgt_rows), _SCHEMA), **opts)
    dml.delete_insert(
        catalog,
        "t",
        spark.createDataFrame(_frame(src_rows), _SCHEMA),
        unique_key=keys,
        incremental_predicates=[pred] if pred else None,
    )
    got = _canon_spark(catalog.read("t"))

    con = _duck(tgt_rows, src_rows)
    _delete_insert_oracle(con, keys, _pred_to_duck(pred, {"DBT_INTERNAL_DEST": "t"}))
    want = _fetch(con)
    con.close()
    assert got == want


# ---------------------------------------------------------------------------
# insert_overwrite: dynamic + static partition replacement vs DuckDB
# DELETE-partition + INSERT (insert_overwrite.sql:39-63)
# ---------------------------------------------------------------------------


@st.composite
def overwrite_case(draw):
    tgt = draw(st.lists(_ROW, min_size=0, max_size=14))
    src = draw(st.lists(_ROW, min_size=0, max_size=10))
    static = draw(st.sampled_from([None, ["p1"], ["p1", "p3"]]))
    return tgt, src, static


@given(case=overwrite_case())
@_E2E
def test_insert_overwrite_end_to_end_matches_duckdb(
    spark, tmp_path_factory, case
):
    tgt_rows, src_rows, static = case
    catalog = EngineCatalog(spark, str(tmp_path_factory.mktemp("wh")))
    catalog.create_table(
        "t", spark.createDataFrame(_frame(tgt_rows), _SCHEMA), partition_by=["pt"]
    )
    dml.insert_overwrite(
        catalog,
        "t",
        spark.createDataFrame(_frame(src_rows), _SCHEMA),
        partitions=[{"pt": p} for p in static] if static else None,
    )
    got = _canon_spark(catalog.read("t"))

    con = _duck(tgt_rows, src_rows)
    if static:
        parts = ", ".join(f"'{p}'" for p in static)
        con.execute(f"DELETE FROM t WHERE pt IN ({parts})")
        con.execute(f"INSERT INTO t SELECT * FROM s WHERE pt IN ({parts})")
    else:
        con.execute(
            "DELETE FROM t WHERE pt IN (SELECT DISTINCT pt FROM s)"
        )
        con.execute("INSERT INTO t SELECT * FROM s")
    want = _fetch(con)
    con.close()
    assert got == want
