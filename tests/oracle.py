"""DuckDB-oracle comparison mimicking the driver's CORRECTNESS check:
row-count + schema + order-insensitive value compare (we compare the
actual values, which is stricter than a hash)."""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

from dbt_maxcompute_spark.sources.registry import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        p = table_path(sf_dir, name)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _rows_canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def compare_to_oracle(spark_df, oracle_query: str, sf_dir: str) -> None:
    con = duckdb_connection(sf_dir)
    try:
        want_rel = con.execute(oracle_query)
        want_cols = [d[0] for d in want_rel.description]
        want = want_rel.fetchall()
    finally:
        pass
    got_cols = spark_df.columns
    got = [tuple(r) for r in spark_df.collect()]
    con.close()

    assert sorted(got_cols) == sorted(want_cols), (
        f"column mismatch: spark={sorted(got_cols)} oracle={sorted(want_cols)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    g = _rows_canon(got, got_cols)
    w = _rows_canon(want, want_cols)
    mismatches = [(a, b) for a, b in zip(g, w) if a != b]
    assert not mismatches, f"{len(mismatches)} value mismatches; first 3: {mismatches[:3]}"
