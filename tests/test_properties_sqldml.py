"""Property tests: the SQL MERGE router against an independent
reference simulation.

The generic merge (`plans/sqldml._exec_merge`) implements SQL:2003
first-applicable-clause semantics as one full-outer join + one
projection. Hypothesis generates target/source frames (NULL keys and
values included) and random ordered clause sets; the oracle is a plain
Python row-walk implementing the standard's definition directly —
different execution model, same contract:

- each target row pairs with at most one source row (unique source
  keys enforced by generation; multi-match is tested separately to
  RAISE);
- the FIRST matched clause whose AND-condition is TRUE (SQL
  three-valued logic: NULL ⇒ not applied) fires; later clauses are
  dead for that row;
- unmatched target rows pass through; unmatched source rows insert
  only via a satisfied WHEN NOT MATCHED clause;
- every UPDATE SET expression reads the PRE-update row pair.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dbt_maxcompute_spark.catalog import EngineCatalog

_KEY = st.one_of(st.none(), st.integers(0, 4))
_VAL = st.one_of(st.none(), st.integers(-9, 9))
_ROW = st.tuples(_KEY, _VAL, _VAL)

# (sql condition, python evaluator over (t_row, s_row) dicts) — SQL
# three-valued logic: a NULL comparison is "unknown" ⇒ clause skipped
_CONDS = [
    (None, lambda t, s: True),
    ("up.v1 > 0", lambda t, s: s["v1"] is not None and s["v1"] > 0),
    ("t.v2 < 0", lambda t, s: t is not None and t["v2"] is not None and t["v2"] < 0),
]
_NM_CONDS = [
    (None, lambda t, s: True),
    ("up.v1 > 0", lambda t, s: s["v1"] is not None and s["v1"] > 0),
]


def _py_add(a, b):
    return None if a is None or b is None else a + b


# (sql SET text, python updater (t,s) -> dict of new values)
_UPDATES = [
    ("v1 = up.v1, v2 = up.v2", lambda t, s: {"v1": s["v1"], "v2": s["v2"]}),
    ("v1 = t.v1 + up.v1", lambda t, s: {"v1": _py_add(t["v1"], s["v1"])}),
    ("v2 = up.v1", lambda t, s: {"v2": s["v1"]}),
]


@st.composite
def sql_merge_case(draw):
    tgt = draw(st.lists(_ROW, min_size=0, max_size=10))
    src_raw = draw(st.lists(_ROW, min_size=0, max_size=8))
    seen, src = set(), []
    for r in src_raw:
        if r[0] not in seen:  # unique keys; one NULL-key source row ok
            seen.add(r[0])
            src.append(r)
    n_matched = draw(st.integers(0, 2))
    matched = []
    for _ in range(n_matched):
        kind = draw(st.sampled_from(["update", "delete"]))
        cond_i = draw(st.integers(0, len(_CONDS) - 1))
        upd_i = draw(st.integers(0, len(_UPDATES) - 1)) if kind == "update" else None
        matched.append((kind, cond_i, upd_i))
    has_insert = draw(st.booleans())
    nm_cond_i = draw(st.integers(0, len(_NM_CONDS) - 1)) if has_insert else None
    return tgt, src, matched, has_insert, nm_cond_i


def _simulate(tgt, src, matched, has_insert, nm_cond_i):
    src_by_key = {r[0]: {"k": r[0], "v1": r[1], "v2": r[2]} for r in src}
    out = []
    matched_src_keys = set()
    for k, v1, v2 in tgt:
        t = {"k": k, "v1": v1, "v2": v2}
        s = src_by_key.get(k) if k is not None else None
        if s is None:
            out.append(t)
            continue
        matched_src_keys.add(k)
        fired = None
        for kind, cond_i, upd_i in matched:
            if _CONDS[cond_i][1](t, s):
                fired = (kind, upd_i)
                break
        if fired is None:
            out.append(t)
        elif fired[0] == "delete":
            pass
        else:
            new = dict(t)
            new.update(_UPDATES[fired[1]][1](t, s))
            out.append(new)
    if has_insert:
        for r in src:
            s = {"k": r[0], "v1": r[1], "v2": r[2]}
            if s["k"] is not None and s["k"] in matched_src_keys:
                continue
            if _NM_CONDS[nm_cond_i][1](None, s):
                out.append(s)
    return sorted(
        ((r["k"], r["v1"], r["v2"]) for r in out),
        key=lambda t_: tuple((x is None, x) for x in t_),
    )


@pytest.fixture(scope="module")
def merge_env(spark, tmp_path_factory):
    return spark, tmp_path_factory


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(case=sql_merge_case())
def test_sql_merge_matches_simulation(merge_env, case):
    spark, tmpf = merge_env
    tgt, src, matched, has_insert, nm_cond_i = case
    clauses = []
    for kind, cond_i, upd_i in matched:
        cond = _CONDS[cond_i][0]
        and_txt = f" AND {cond}" if cond else ""
        if kind == "delete":
            clauses.append(f"WHEN MATCHED{and_txt} THEN DELETE")
        else:
            clauses.append(
                f"WHEN MATCHED{and_txt} THEN UPDATE SET {_UPDATES[upd_i][0]}"
            )
    if has_insert:
        cond = _NM_CONDS[nm_cond_i][0]
        and_txt = f" AND {cond}" if cond else ""
        clauses.append(
            f"WHEN NOT MATCHED{and_txt} THEN INSERT (k, v1, v2) "
            f"VALUES (up.k, up.v1, up.v2)"
        )
    if not clauses:
        return  # MERGE requires >= 1 WHEN clause; parser raises — skip

    cat = EngineCatalog(spark, str(tmpf.mktemp("sqlmerge_wh")))
    schema = "k bigint, v1 bigint, v2 bigint"
    cat.create_table(
        "t",
        spark.createDataFrame(tgt, schema),
        transactional=True,
        primary_keys=["k"],
    )
    spark.createDataFrame(src, schema).createOrReplaceTempView("updates_src")
    stmt = (
        "MERGE INTO t USING (SELECT * FROM updates_src) AS up ON t.k = up.k\n"
        + "\n".join(clauses)
    )
    cat.execute(stmt)
    got = sorted(
        ((r.k, r.v1, r.v2) for r in cat.read("t").collect()),
        key=lambda t_: tuple((x is None, x) for x in t_),
    )
    want = _simulate(tgt, src, matched, has_insert, nm_cond_i)
    assert got == want, f"\nstmt:\n{stmt}\ntgt={tgt}\nsrc={src}"
