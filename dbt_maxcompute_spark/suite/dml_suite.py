"""DML / materialization suite: each incremental strategy, snapshot
SCD2, materialized views, and seeds exercised end-to-end against the
fixture tables, with the FINAL TABLE STATE checked against a DuckDB
oracle that expresses the same semantics in pure SQL.

Each query builds a throwaway warehouse under /tmp (the driver may
collect the returned DataFrame later, so the warehouse is not
deleted — temp dirs are per-invocation and tiny at sf0.01).
"""

from __future__ import annotations

import datetime
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_maxcompute_spark.catalog import EngineCatalog
from dbt_maxcompute_spark.materializations.incremental import run_incremental
from dbt_maxcompute_spark.materializations.materialized_view import (
    apply_materialized_view,
    create_materialized_view,
)
from dbt_maxcompute_spark.materializations.snapshot import run_snapshot
from dbt_maxcompute_spark.sources.registry import load_table
from dbt_maxcompute_spark.sources.seeds import load_seed


def _wh(spark: SparkSession) -> EngineCatalog:
    return EngineCatalog(spark, tempfile.mkdtemp(prefix="dml_suite_wh_"))


# ---------------------------------------------------------------------------
# merge (upsert): target = pre-1996 orders; source = 1995H2..1996H1 orders
# with recomputed totals; final state = anti ∪ source (update-all-columns).
# ---------------------------------------------------------------------------

def q_incr_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _wh(spark)
    orders = load_table(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    source = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-06-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-06-01").cast("timestamp"))
    ).withColumn("o_totalprice", F.col("o_totalprice") * 1.1)

    run_incremental(cat, "tgt", target, strategy="merge", unique_key="o_orderkey")
    run_incremental(cat, "tgt", source, strategy="merge", unique_key="o_orderkey")
    return cat.read("tgt").orderBy("o_orderkey")


ORACLE_MERGE = """
WITH target AS (
  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
), src AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 1.1 AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-06-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
)
SELECT * FROM target WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
UNION ALL
SELECT * FROM src
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# delete+insert with a LIST unique key (reference regression
# test_delete_insert_list_unique_key.py) over lineitem.
# ---------------------------------------------------------------------------

def q_incr_delete_insert_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _wh(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    target = li.filter(F.col("l_orderkey") % 4 != 0)
    source = li.filter(F.col("l_orderkey") % 2 == 0).withColumn(
        "l_returnflag", F.lit("X")
    )
    run_incremental(
        cat, "tgt", target, strategy="delete+insert", unique_key=["l_orderkey", "l_linenumber"]
    )
    run_incremental(
        cat, "tgt", source, strategy="delete+insert", unique_key=["l_orderkey", "l_linenumber"]
    )
    return cat.read("tgt").orderBy("l_orderkey", "l_linenumber")


ORACLE_DELETE_INSERT = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
  FROM lineitem
), target AS (
  SELECT * FROM li WHERE l_orderkey % 4 != 0
), src AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, 'X' AS l_returnflag
  FROM li WHERE l_orderkey % 2 = 0
)
SELECT t.* FROM target t
WHERE NOT EXISTS (
  SELECT 1 FROM src s
  WHERE s.l_orderkey = t.l_orderkey AND s.l_linenumber = t.l_linenumber
)
UNION ALL
SELECT * FROM src
ORDER BY l_orderkey, l_linenumber
"""


# ---------------------------------------------------------------------------
# insert_overwrite (dynamic) on a month-partitioned target: only months
# present in the source are replaced (reference insert_overwrite.sql:65-81).
# ---------------------------------------------------------------------------

def q_incr_insert_overwrite_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _wh(spark)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "month", F.date_trunc("month", "ts").cast("date").cast("string")
    )
    target = ev  # all months
    # source: only the first two months, values re-scored
    months = [r["month"] for r in ev.select("month").distinct().orderBy("month").limit(2).collect()]
    source = ev.filter(F.col("month").isin(months)).withColumn("value", F.col("value") * 2.0)

    run_incremental(cat, "tgt", target, strategy="insert_overwrite", partition_by=["month"])
    run_incremental(cat, "tgt", source, strategy="insert_overwrite")
    out = cat.read("tgt")
    return out.select(
        "event_id", "ts", "user_id", "event_type", "value", "props", "month"
    ).orderBy("event_id")


ORACLE_INSERT_OVERWRITE = """
WITH ev AS (
  SELECT *, CAST(CAST(date_trunc('month', ts) AS DATE) AS VARCHAR) AS month FROM events
), two_months AS (
  SELECT DISTINCT month FROM ev ORDER BY month LIMIT 2
)
SELECT event_id, ts, user_id, event_type, value, props, month
FROM ev WHERE month NOT IN (SELECT month FROM two_months)
UNION ALL
SELECT event_id, ts, user_id, event_type, value * 2.0 AS value, props, month
FROM ev WHERE month IN (SELECT month FROM two_months)
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# microbatch over events: 3-day window reprocessed day-by-day into an
# auto-partitioned (day) target (reference microbatch.sql:1-28).
# ---------------------------------------------------------------------------

def q_incr_microbatch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _wh(spark)
    ev = load_table(spark, sf_dir, "events")
    lo = ev.agg(F.min("ts")).first()[0]
    begin = datetime.datetime(lo.year, lo.month, lo.day)
    end = begin + datetime.timedelta(days=3)

    cat.create_table(
        "tgt",
        ev.limit(0),
        auto_partition={"source_column": "ts", "granularity": "day", "generated_column": "pt"},
    )
    run_incremental(
        cat, "tgt", ev, strategy="microbatch",
        event_time="ts", begin=begin, end=end, batch_size="day",
    )
    return (
        cat.read("tgt")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy("event_id")
    )


ORACLE_MICROBATCH = """
WITH bounds AS (
  SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS lo FROM events
)
SELECT event_id, ts, user_id, event_type, value, props
FROM events, bounds
WHERE ts >= lo AND ts < lo + INTERVAL 3 DAY
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# append into an auto-partitioned target (reference merge.sql:120-146:
# partition column moved out of the INSERT list; impl.py:206-214: the
# generated trunc_time column is derived at write, hidden from the
# logical schema).  Completes the §2.3 strategy matrix in the
# driver-visible set.  Scale: append is a pure partitioned write —
# no read of existing data, dynamic partition routing only.
# Partition granularity matches data volume (year here: ~7 partitions
# of ~20k rows at sf0.1) — partitioned writes cost per FILE, so
# month-grain partitions of ~2k rows each would be the classic
# tiny-partition anti-pattern at any scale.
# ---------------------------------------------------------------------------

def q_incr_append_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _wh(spark)
    orders = load_table(spark, sf_dir, "orders")
    first = orders.filter(F.col("o_orderkey") % 3 == 0)
    second = orders.filter(F.col("o_orderkey") % 3 != 0)
    ap = {"source_column": "o_orderdate", "granularity": "year", "generated_column": "pt"}
    run_incremental(cat, "tgt", first, strategy="append", auto_partition=ap)
    run_incremental(cat, "tgt", second, strategy="append")
    # the generated pt column is NOT part of the logical schema
    return cat.read("tgt").select(*orders.columns).orderBy("o_orderkey")


ORACLE_APPEND = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM orders ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# SCD2 snapshot: orders state1 -> state2 (urgent orders flip status 30
# days later); compare versioned history minus the opaque scd_id.
# ---------------------------------------------------------------------------

def q_scd2_snapshot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _wh(spark)
    orders = load_table(spark, sf_dir, "orders")
    state1 = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_orderdate").alias("updated_at"),
    )
    state2 = state1.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit("X")).otherwise(F.col("o_orderstatus")),
    ).withColumn(
        "updated_at",
        F.when(
            F.col("o_orderkey") % 10 == 0,
            F.timestamp_add("DAY", F.lit(30), F.col("updated_at")),
        ).otherwise(F.col("updated_at")),
    )
    run_snapshot(cat, "snap", state1, "o_orderkey", "timestamp", "updated_at")
    run_snapshot(cat, "snap", state2, "o_orderkey", "timestamp", "updated_at")
    return cat.read("snap").select(
        "o_orderkey", "o_orderstatus", "updated_at", "dbt_valid_from", "dbt_valid_to"
    ).orderBy("o_orderkey", "dbt_valid_from")


ORACLE_SCD2 = """
WITH changed AS (
  SELECT o_orderkey, o_orderstatus AS old_status, o_orderdate,
         o_orderdate + INTERVAL 30 DAY AS new_updated
  FROM orders WHERE o_orderkey % 10 = 0
)
-- closed-out first versions of changed keys
SELECT o_orderkey, old_status AS o_orderstatus, o_orderdate AS updated_at,
       o_orderdate AS dbt_valid_from, new_updated AS dbt_valid_to
FROM changed
UNION ALL
-- open second versions of changed keys
SELECT o_orderkey, 'X' AS o_orderstatus, new_updated AS updated_at,
       new_updated AS dbt_valid_from, NULL AS dbt_valid_to
FROM changed
UNION ALL
-- untouched keys: single open version
SELECT o_orderkey, o_orderstatus, o_orderdate AS updated_at,
       o_orderdate AS dbt_valid_from, CAST(NULL AS TIMESTAMP) AS dbt_valid_to
FROM orders WHERE o_orderkey % 10 != 0
ORDER BY o_orderkey, dbt_valid_from
"""


# ---------------------------------------------------------------------------
# materialized view: rollup over lineitem, refreshed after new data lands
# (reference orders_daily_mv.sql pattern + refresh.sql REBUILD).
# ---------------------------------------------------------------------------

def q_mv_returnflag_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _wh(spark)
    li = load_table(spark, sf_dir, "lineitem")
    half = li.filter(F.col("l_orderkey") % 2 == 0)
    cat.create_table("li", half)
    mv_sql = (
        "SELECT l_returnflag, count(*) AS n, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS qty "
        "FROM li GROUP BY l_returnflag"
    )
    apply_materialized_view(cat, "mv", mv_sql)
    # new data lands; REBUILD refreshes the stored query's result
    from dbt_maxcompute_spark.plans.dml import append

    append(cat, "li", li.filter(F.col("l_orderkey") % 2 != 0))
    from dbt_maxcompute_spark.materializations.materialized_view import (
        refresh_materialized_view,
    )

    refresh_materialized_view(cat, "mv")
    return cat.read("mv").orderBy("l_returnflag")


ORACLE_MV = """
SELECT l_returnflag, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# seed: deterministic CSV -> typed table (agate inference + overrides)
# ---------------------------------------------------------------------------

_SEED_CSV = """id,name,amount,flag,born,seen
1,Easton,120.50,true,1981-05-20,1981-05-20 06:46:51
2,Lillian,9.99,false,1978-09-03,1978-09-03 18:23:34
3,,0.01,true,1992-01-01,1992-01-01 00:00:00
"""


def q_seed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    cat = _wh(spark)
    p = os.path.join(tempfile.mkdtemp(prefix="seed_csv_"), "seed.csv")
    with open(p, "w") as f:
        f.write(_SEED_CSV)
    load_seed(cat, "seed", p, column_types={"amount": "decimal(18,2)"})
    df = cat.read("seed")
    return df.select(
        "id", "name", F.col("amount").cast("double").alias("amount"), "flag", "born", "seen"
    ).orderBy("id")


ORACLE_SEED = """
SELECT * FROM (VALUES
  (1, 'Easton', 120.50, true, DATE '1981-05-20', TIMESTAMP '1981-05-20 06:46:51'),
  (2, 'Lillian', 9.99, false, DATE '1978-09-03', TIMESTAMP '1978-09-03 18:23:34'),
  (3, NULL, 0.01, true, DATE '1992-01-01', TIMESTAMP '1992-01-01 00:00:00')
) AS t(id, name, amount, flag, born, seen)
ORDER BY id
"""


# ---------------------------------------------------------------------------
# model contract: not_null ENFORCED end-to-end (reference impl.py:69-75 +
# test_constraints.py rollback shapes). A violating batch is rejected and
# must leave the table untouched — if enforcement failed, the zeroed
# balances from the bad batch would surface in the final state and the
# oracle hash would catch it.
# ---------------------------------------------------------------------------

_CUSTOMER_CONTRACT = {
    "enforced": True,
    "columns": [
        {"name": "c_custkey", "data_type": "bigint", "constraints": ["not_null"]},
        {"name": "c_name", "data_type": "string"},
        {"name": "c_acctbal", "data_type": "double", "constraints": ["not_null"]},
    ],
}


def q_contracts_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_maxcompute_spark.contracts import ConstraintViolation

    cat = _wh(spark)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    base = cust.filter(F.col("c_custkey") % 3 != 0)
    run_incremental(
        cat, "tgt", base, strategy="merge", unique_key="c_custkey",
        contract=_CUSTOMER_CONTRACT,
    )
    # bad batch: NULL keys + zeroed balances — must be rejected atomically
    bad = cust.withColumn(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None)).otherwise(F.col("c_custkey")),
    ).withColumn("c_acctbal", F.lit(0.0))
    try:
        run_incremental(cat, "tgt", bad, strategy="merge", unique_key="c_custkey")
        raise AssertionError("not_null violation was not enforced")
    except ConstraintViolation:
        pass
    # good batch: the remaining customers — merges cleanly
    good = cust.filter(F.col("c_custkey") % 3 == 0)
    run_incremental(cat, "tgt", good, strategy="merge", unique_key="c_custkey")
    return cat.read("tgt").orderBy("c_custkey")


# final state == all customers with ORIGINAL balances: the create kept
# %3!=0, the good batch added %3==0, the zero-balance batch was rejected.
ORACLE_CONTRACTS = """
SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey
"""


def q_mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Delta maintenance for an additive rollup: the stored MV holds
    # exact mergeable state (count + decimal sum); refresh merges the
    # DELTA's aggregate instead of re-running over all history —
    # rollup-cardinality work, not a fact-table rescan. Doubles are
    # derived only at the read boundary. Oracle = full recompute over
    # base+delta, so the merge math is value-hash-checked.
    from dbt_maxcompute_spark.materializations.materialized_view import (
        merge_additive_rollup,
    )

    cat = _wh(spark)
    li = load_table(spark, sf_dir, "lineitem")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(28,6)"))
            .cast("decimal(28,6)")
            .alias("qty_sum"),
        )

    cat.create_table("mv_store", rollup(li.filter(F.col("l_orderkey") % 2 == 0)))
    delta = rollup(li.filter(F.col("l_orderkey") % 2 != 0))
    merged = merge_additive_rollup(cat.read("mv_store"), delta, ["l_returnflag"])
    # stage-then-swap: overwriting in place would delete the very files
    # the (lazy) merged plan still reads from
    cat.create_table("mv_store_next", merged)
    cat.drop("mv_store")
    cat.rename("mv_store_next", "mv_store")
    return (
        cat.read("mv_store")
        .select(
            "l_returnflag", "n", F.col("qty_sum").cast("double").alias("qty")
        )
        .orderBy("l_returnflag")
    )


ORACLE_MV_INCR = """
SELECT l_returnflag, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_txn_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same merge as incr_merge_orders, but the target is declared
    ``transactional=true`` + primary key (reference create.sql:2-4,
    44-49: that combination ⇒ ACID upsert). The merge then commits
    through the transaction log: pinned-snapshot read, post-merge row
    set, ONE log commit — so history is exactly [create, merge] and the
    pre-merge state stays readable via time travel.

    Hard-checked contract: n_commits (from history()) and n_at_v0 (a
    time-travel read of version 0) ride along every output row; the
    DuckDB oracle predicts both, so a merge that double-commits,
    skips the log, or breaks time travel hash-mismatches."""
    cat = _wh(spark)
    orders = load_table(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    source = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-06-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-06-01").cast("timestamp"))
    ).withColumn("o_totalprice", F.col("o_totalprice") * 1.1)

    run_incremental(
        cat, "tgt", target, strategy="merge", unique_key="o_orderkey",
        transactional=True, primary_keys=["o_orderkey"],
    )
    run_incremental(cat, "tgt", source, strategy="merge", unique_key="o_orderkey")
    hist = cat.txn("tgt").history()
    n_at_v0 = cat.read("tgt", version=0).count()
    return (
        cat.read("tgt")
        .withColumn("n_commits", F.lit(len(hist)).cast("bigint"))
        .withColumn("n_at_v0", F.lit(n_at_v0).cast("bigint"))
        .orderBy("o_orderkey")
    )


ORACLE_TXN_MERGE = """
WITH target AS (
  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
), src AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 1.1 AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-06-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
), merged AS (
  SELECT * FROM target WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
  UNION ALL
  SELECT * FROM src
)
SELECT m.*,
       CAST(2 AS BIGINT) AS n_commits,
       CAST((SELECT count(*) FROM target) AS BIGINT) AS n_at_v0
FROM merged m
ORDER BY o_orderkey
"""


def q_mv_auto_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MV auto-rewrite, hard-checked from the physical plan: a user
    rollup on a SUBSET of an MV's grouping keys must be answered by
    re-aggregating the (rollup-cardinality) MV — its scan in the plan,
    the base fact table absent — while an MV created with
    ``disable_rewrite=True`` (reference _materialized_view.py:24) must
    leave its query on the base table. Both plan facts ride along as
    boolean columns the oracle predicts; the returned rows themselves
    come from the rewritten (MV-served) query, so the rewrite's VALUES
    are hash-checked against DuckDB computing from the base table."""
    cat = _wh(spark)
    cat.create_table("lineitem", load_table(spark, sf_dir, "lineitem"))
    cat.create_table("orders", load_table(spark, sf_dir, "orders"))
    create_materialized_view(
        cat,
        "mv_li",
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
                  CAST(sum(CAST(l_quantity AS decimal(28,6))) AS double) AS qty
           FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    )
    create_materialized_view(
        cat,
        "mv_ord",
        """SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus""",
        disable_rewrite=True,
    )

    def plan_of(df: DataFrame) -> str:
        return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    served = cat.sql(
        """SELECT l_returnflag, count(*) AS n_rows,
                  CAST(sum(CAST(l_quantity AS decimal(28,6))) AS double) AS qty
           FROM lineitem GROUP BY l_returnflag"""
    )
    p1 = plan_of(served)
    used_mv = ("mv_li" in p1) and ("default/lineitem" not in p1)

    p2 = plan_of(cat.sql("SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus"))
    respected_disable = ("mv_ord" not in p2) and ("default/orders" in p2)

    return (
        served.withColumn("used_mv", F.lit(bool(used_mv)))
        .withColumn("respected_disable", F.lit(bool(respected_disable)))
        .orderBy("l_returnflag")
    )


ORACLE_MV_REWRITE = """
SELECT l_returnflag, count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS qty,
       TRUE AS used_mv, TRUE AS respected_disable
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


QUERIES = {
    "incr_merge_orders": q_incr_merge_orders,
    "txn_incremental_merge": q_txn_incremental_merge,
    "mv_auto_rewrite": q_mv_auto_rewrite,
    "incr_append_partitioned": q_incr_append_partitioned,
    "incr_delete_insert_lineitem": q_incr_delete_insert_lineitem,
    "incr_insert_overwrite_events": q_incr_insert_overwrite_events,
    "incr_microbatch_events": q_incr_microbatch_events,
    "scd2_snapshot_orders": q_scd2_snapshot_orders,
    "mv_returnflag_rollup": q_mv_returnflag_rollup,
    "mv_incremental_refresh": q_mv_incremental_refresh,
    "seed_roundtrip": q_seed_roundtrip,
    "contracts_not_null": q_contracts_not_null,
}

ORACLES = {
    "incr_merge_orders": ORACLE_MERGE,
    "txn_incremental_merge": ORACLE_TXN_MERGE,
    "mv_auto_rewrite": ORACLE_MV_REWRITE,
    "incr_append_partitioned": ORACLE_APPEND,
    "incr_delete_insert_lineitem": ORACLE_DELETE_INSERT,
    "incr_insert_overwrite_events": ORACLE_INSERT_OVERWRITE,
    "incr_microbatch_events": ORACLE_MICROBATCH,
    "scd2_snapshot_orders": ORACLE_SCD2,
    "mv_returnflag_rollup": ORACLE_MV,
    "mv_incremental_refresh": ORACLE_MV_INCR,
    "seed_roundtrip": ORACLE_SEED,
    "contracts_not_null": ORACLE_CONTRACTS,
}
