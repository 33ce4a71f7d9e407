"""Pins for data-mixture sampling (operators/mixture.py): the
two-phase histogram-threshold plan equals the single-window global
cumsum definition, selection is deterministic under layout changes,
quotas are never exceeded, and under-provisioned groups contribute
everything they have."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_maxcompute_spark.operators import mixture


def _docs(spark, n=500, groups=("a", "b", "c")):
    return spark.range(1, n + 1).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(*[F.lit(g) for g in groups]),
            (F.col("id") % len(groups) + 1).cast("int"),
        ).alias("grp"),
        (F.col("id") % 97 + 10).alias("w"),
    )


def _reference_selection(df, targets, budget):
    """The definitional form: global per-group cumsum in hash order."""
    h = mixture._hash_col("doc_id")
    win = (
        Window.partitionBy("grp")
        .orderBy("__h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    quota = F.lit(budget) * mixture._targets_expr("grp", targets)
    return {
        r["doc_id"]
        for r in df.filter(F.col("grp").isin(list(targets)))
        .withColumn("__h", h)
        .withColumn("__cum", F.sum("w").over(win))
        .filter(F.col("__cum") <= quota)
        .collect()
    }


def test_two_phase_equals_global_cumsum(spark):
    df = _docs(spark)
    targets = {"a": 0.5, "b": 0.3, "c": 0.2}
    budget = 6000.0
    got = {
        r["doc_id"]
        for r in mixture.mixture_sample(
            df, "doc_id", "grp", "w", targets, budget
        ).collect()
    }
    assert got == _reference_selection(df, targets, budget)
    assert got  # non-trivial


def test_deterministic_under_layout(spark):
    df = _docs(spark)
    targets = {"a": 0.6, "b": 0.4}
    args = ("doc_id", "grp", "w", targets, 4000.0)
    a = {r["doc_id"] for r in mixture.mixture_sample(df, *args).collect()}
    b = {
        r["doc_id"]
        for r in mixture.mixture_sample(df.repartition(13), *args).collect()
    }
    assert a == b


def test_quota_never_exceeded_and_underfill_takes_all(spark):
    df = _docs(spark)
    total_b = df.filter(F.col("grp") == "b").agg(F.sum("w")).collect()[0][0]
    # b's quota is far above its total mass -> every b row selected;
    # a's quota is binding -> mass <= quota
    targets = {"a": 0.1, "b": 0.9}
    budget = float(total_b) * 3
    sel = mixture.mixture_sample(df, "doc_id", "grp", "w", targets, budget)
    agg = {
        r["grp"]: r["m"]
        for r in sel.groupBy("grp").agg(F.sum("w").alias("m")).collect()
    }
    assert agg["b"] == total_b
    assert agg["a"] <= budget * 0.1
    # groups without a target are dropped entirely
    assert "c" not in agg


def test_report_shares(spark):
    df = _docs(spark)
    targets = {"a": 0.5, "b": 0.5}
    rep = {
        r["grp"]: r
        for r in mixture.mixture_report(
            df, "doc_id", "grp", "w", targets, 5000.0
        ).collect()
    }
    for g in targets:
        assert rep[g]["target_share"] == 0.5
        assert 0 < rep[g]["achieved_share"] <= 0.5 + 1e-9
        assert rep[g]["mass"] <= 2500.0
