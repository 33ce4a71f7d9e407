"""Incremental materialization — the strategy dispatch of the
reference (`/root/reference/dbt/include/maxcompute/macros/
materializations/incremental/incremental.sql:2-114`).

Declared strategies (reference impl.py:435-445): append, merge,
delete+insert, insert_overwrite, microbatch. Default merge
(incremental.sql:11). First run / full_refresh -> plain table build
(incremental.sql:54-63). `append` with a unique_key is a compile
error (incremental.sql:36-38); `merge` without one degenerates to
append (merge.sql:53-57).

The reference materializes the model SELECT into a temp table before
applying DML (incremental.sql:69-71) and drops it after
(incremental.sql:109-111, leak regression
test_incremental_temp_cleanup.py). Spark DataFrames are lazy plans, so
no temp table is needed — the staging write inside the DML planner
plays that role; nothing leaks by construction.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from dbt_maxcompute_spark.catalog import EngineCatalog
from dbt_maxcompute_spark.plans import dml

STRATEGIES = ("append", "merge", "delete+insert", "insert_overwrite", "microbatch")


def run_incremental(
    catalog: EngineCatalog,
    name: str,
    model: DataFrame,
    strategy: str = "merge",
    unique_key: list[str] | str | None = None,
    full_refresh: bool = False,
    incremental_predicates: list[str] | None = None,
    merge_update_columns: list[str] | None = None,
    merge_exclude_columns: list[str] | None = None,
    partitions: list[dict] | None = None,
    event_time: str | None = None,
    begin: Any = None,
    end: Any = None,
    batch_size: str = "day",
    **create_opts: Any,
) -> str:
    """Run one incremental build; returns the action taken."""
    if strategy not in STRATEGIES:
        raise ValueError(
            f"invalid incremental strategy {strategy!r} (reference impl.py:435-445)"
        )
    if strategy == "append" and unique_key:
        raise ValueError(
            "append strategy does not support unique_key (reference incremental.sql:36-38)"
        )
    if full_refresh or not catalog.exists(name):
        catalog.create_table(name, model, mode="overwrite", **create_opts)
        return "create"

    if strategy == "append":
        dml.append(catalog, name, model)
    elif strategy == "merge":
        if unique_key:
            dml.merge(
                catalog,
                name,
                model,
                unique_key,
                merge_update_columns=merge_update_columns,
                merge_exclude_columns=merge_exclude_columns,
                incremental_predicates=incremental_predicates,
            )
        else:
            dml.append(catalog, name, model)  # merge.sql:53-57
    elif strategy == "delete+insert":
        if not unique_key:
            raise ValueError("delete+insert requires unique_key")
        dml.delete_insert(
            catalog, name, model, unique_key, incremental_predicates=incremental_predicates
        )
    elif strategy == "insert_overwrite":
        dml.insert_overwrite(catalog, name, model, partitions=partitions)
    elif strategy == "microbatch":
        if event_time is None or begin is None or end is None:
            raise ValueError("microbatch requires event_time, begin, end")
        dml.microbatch(
            catalog, name, model, event_time, begin, end, batch_size=batch_size
        )
    return strategy
