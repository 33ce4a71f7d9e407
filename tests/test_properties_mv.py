"""PROPERTY: MV auto-rewrite never changes results.

The rewriter is driver-side TEXT manipulation — precisely the kind of
code where a missed edge (literal substitution, alias capture,
conjunct binding) produces a query that still ANALYZES and silently
returns wrong rows (this round's high-severity advisory was exactly
that). The net: generate random rollup queries — random key subsets,
aggregates, WHERE conjuncts, aliases, optional view indirection — and
pin that the MV-served answer equals direct execution row-for-row.
A query the grammar refuses is fine (fallback); a query it rewrites
WRONGLY is the bug class this hunts.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dbt_maxcompute_spark.catalog import EngineCatalog
from dbt_maxcompute_spark.materializations.materialized_view import (
    create_materialized_view,
)

_FIXTURE = {}


def _cat(spark):
    """One shared catalog + MV + views (hypothesis re-enters many
    times; per-example MV builds would dominate the run)."""
    if "cat" not in _FIXTURE:
        import tempfile

        cat = EngineCatalog(spark, tempfile.mkdtemp(prefix="mvprop_wh_"))
        df = spark.range(600).select(
            F.col("id"),
            (F.col("id") % 7).alias("g1"),
            (F.col("id") % 5).alias("g2"),
            F.concat(F.lit("s"), F.col("id") % 3).alias("g3"),
            (F.col("id") * 3 % 101).cast("double").alias("x"),
            (F.col("id") % 13).alias("y"),
        )
        cat.create_table("base", df)
        create_materialized_view(
            cat,
            "mvp",
            """SELECT g1, g2, g3, count(*) AS n,
                      CAST(sum(CAST(x AS decimal(28,6))) AS double) AS sx,
                      CAST(sum(CAST(y AS decimal(28,6))) AS double) AS sy,
                      count(x) AS cx,
                      min(x) AS mnx, max(y) AS mxy
               FROM base WHERE id >= 10 GROUP BY g1, g2, g3""",
        )
        cat.create_view(
            "basev",
            "SELECT g1 AS k1, g2, g3, x, y, id FROM base WHERE id >= 10",
        )
        _FIXTURE["cat"] = cat
    return _FIXTURE["cat"]


_AGGS = [
    ("count(*)", "count(*)"),
    ("CAST(sum(CAST(x AS decimal(28,6))) AS double)", "sum-x"),
    ("CAST(sum(CAST(y AS decimal(28,6))) AS double)", "sum-y"),
    ("min(x)", "min-x"),
    ("max(y)", "max-y"),
]

_WHERES = [
    None,
    "id >= 10",
    "id >= 50",
    "g1 = 3",
    "g2 > 1",
    "g3 = 's1'",
    "g1 = 2 and g2 <= 3",
    "g3 <> 's0 weird'",  # literal containing a column-ish word
]

# HAVING pool: aggregate re-expressions, select-alias references, and a
# literal containing agg-looking text (the round-7 advisory class)
_HAVINGS = [
    None,
    "count(*) > 5",
    "min(x) >= 0",
    "max(y) < 13",
    "count(*) > 2 and min(x) >= 0",
]


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.sampled_from(["g1", "g2", "g3"]), min_size=1, max_size=3, unique=True
    ),
    aggs=st.lists(st.sampled_from(range(len(_AGGS))), min_size=1, max_size=3,
                  unique=True),
    where=st.sampled_from(_WHERES),
    having=st.sampled_from(_HAVINGS),
    alias_keys=st.booleans(),
    through_view=st.booleans(),
    order_by=st.booleans(),
)
def test_mv_rewrite_equals_direct_execution(
    spark, keys, aggs, where, having, alias_keys, through_view, order_by
):
    cat = _cat(spark)
    if through_view:
        # the view renames g1 -> k1 and pre-applies id >= 10
        colname = {"g1": "k1", "g2": "g2", "g3": "g3"}
        table = "basev"
        # id is exposed by the view, so id-conjuncts remain valid
        eff_where = where
    else:
        colname = {k: k for k in ["g1", "g2", "g3"]}
        table = "base"
        eff_where = where
    sel = []
    for k in keys:
        c = colname[k]
        sel.append(f"{c} AS a_{k}" if alias_keys else c)
    for i in aggs:
        expr, _tag = _AGGS[i]
        sel.append(f"{expr} AS agg_{i}")
    sql = f"SELECT {', '.join(sel)} FROM {table}"
    if eff_where:
        w = eff_where
        if through_view:
            for src, dst in colname.items():
                if src != dst:
                    w = w.replace(src, dst)
            # keep literals intact: our replaces above only touch g1->k1
        sql += f" WHERE {w}"
    sql += f" GROUP BY {', '.join(colname[k] for k in keys)}"
    if having:
        sql += f" HAVING {having}"
    if order_by:
        sql += f" ORDER BY {colname[keys[0]]}"

    served = cat.sql(sql)
    direct = cat.sql(sql, mv_rewrite=False)
    got = sorted(map(tuple, served.collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want, f"rewrite changed results for: {sql}"
    assert served.columns == direct.columns, sql


def test_mv_rewrite_property_fixture_actually_rewrites(spark):
    """Sanity: the fixture's MV is actually being USED for at least the
    canonical shape — otherwise the property only tests fallback."""
    cat = _cat(spark)
    df = cat.sql(
        "SELECT g1, count(*) AS n FROM base WHERE id >= 10 GROUP BY g1"
    )
    files = "\n".join(df.inputFiles())
    assert "mvp" in files and "base" not in files.replace("basev", "")
    dfv = cat.sql("SELECT k1, count(*) AS n FROM basev GROUP BY k1")
    files_v = "\n".join(dfv.inputFiles())
    assert "mvp" in files_v


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-x", "-q"])
