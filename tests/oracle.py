"""DuckDB-oracle comparison mirroring the driver's CORRECTNESS check.

The driver compares Spark output against DuckDB at the *pandas* level with a
type-strict order-insensitive value hash.  That means:

- DuckDB surfaces HUGEINT (``sum`` over integers) and EVERY DECIMAL as
  float64 through ``.df()`` — an oracle emitting HUGEINT against a Spark
  BIGINT column fails the hash even when values are identical (round-1
  lesson: tpch_q12, decimal_fidelity).
- int vs float is a hash-visible difference; we must NOT canonicalize
  Decimal/int/float into one another beyond what pandas itself does.

So this comparator feeds BOTH sides through the same pandas surface the
driver sees (``spark_df.toPandas()`` / ``duckdb .df()``) and compares
values exactly (floats bitwise, ints as ints).  Local green here is meant
to predict driver green.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from dbt_maxcompute_spark.sources.registry import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        p = table_path(sf_dir, name)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(v):
    """Canonicalize one pandas-level cell EXACTLY as strictly as the driver:

    - Decimal stays Decimal (the driver does NOT fold it into float64; a
      Spark decimal column vs a DuckDB DOUBLE hashed differently two rounds
      running — decimal_fidelity);
    - tz-aware timestamps keep their offset (DuckDB TIMESTAMPTZ vs Spark
      naive timestamp is a driver schema/hash fail — events_sliding);
    - list/ndarray/dict cells RAISE, mirroring the driver's pandas
      ``sort_values`` crash (``TypeError: unhashable type: 'list'``);
    - int stays int, float stays float bitwise (HUGEINT→float64 vs BIGINT
      is hash-visible).

    The one retained leniency: date widens to midnight-datetime, because
    DuckDB's ``.df()`` itself widens DATE to datetime64 while Spark keeps
    ``datetime.date`` — the driver sees those as equal (r01 date-output
    queries were green)."""
    if v is None or v is pd.NaT or v is getattr(pd, "NA", object()):
        return None
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, (bool,)):
        return v
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        f = float(v)
        return "NaN" if math.isnan(f) else f
    if isinstance(v, Decimal):
        return v
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (np.ndarray, list, tuple, dict)):
        raise TypeError(
            f"unhashable type: '{type(v).__name__}' — the driver's hasher "
            "crashes on container cells; to_json/concat_ws the column at "
            "the query output boundary"
        )
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _pdf_canon(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    rows = [tuple(_canon(v) for v in tup) for tup in pdf[cols].itertuples(index=False, name=None)]
    rows.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return cols, rows


def compare_to_oracle(spark_df, oracle_query: str, sf_dir: str) -> None:
    con = duckdb_connection(sf_dir)
    try:
        want_pdf = con.execute(oracle_query).df()
    finally:
        con.close()
    got_pdf = spark_df.toPandas()

    got_cols, got = _pdf_canon(got_pdf)
    want_cols, want = _pdf_canon(want_pdf)

    assert got_cols == want_cols, (
        f"column mismatch: spark={got_cols} oracle={want_cols}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    mismatches = [(a, b) for a, b in zip(got, want) if a != b]
    assert not mismatches, f"{len(mismatches)} value mismatches; first 3: {mismatches[:3]}"
