"""Scalar/aggregate function library (SURVEY.md §2.6).

Each function re-expresses one cross-database macro of the reference
(`/root/reference/dbt/include/maxcompute/macros/utils/*.sql`) as a
Catalyst expression builder — pure `pyspark.sql.functions`, no UDFs,
so every call stays inside whole-stage codegen and never blocks
predicate pushdown or column pruning.

Edge-case parity notes cite the reference file:line they reproduce.
ANSI mode is ON (Spark 4 default): lenient paths go through try_* forms.
"""

from __future__ import annotations

import re
from typing import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# casts & literals
# ---------------------------------------------------------------------------


def cast(col: Column, to_type: str) -> Column:
    """Plain cast (reference macros/utils/cast.sql:2-4)."""
    return col.cast(_normalize_type(to_type))


def safe_cast(col: Column, to_type: str) -> Column:
    """NULL-on-failure cast (reference: MaxCompute cast is lenient; dbt
    safe_cast default, tested test_utils.py:414)."""
    return col.try_cast(_normalize_type(to_type))


def _normalize_type(t: str) -> str:
    """Type-alias normalization (reference column.py:16-22)."""
    alias = {
        "text": "string",
        "integer": "int",
        "bool": "boolean",
        "numeric": "decimal(38,18)",
        "real": "float",
        "datetime": "timestamp",
    }
    key = t.strip().lower()
    return alias.get(key, key)


def string_literal(v) -> Column:
    """'{v}' literal (reference macros/utils/literal.sql:1-7)."""
    return F.lit(str(v))


def cast_bool_to_text(col: Column) -> Column:
    """lower(cast(b as string)) -> 'true'/'false', NULL-safe
    (reference macros/utils/cast_bool_to_text.sql:3-5)."""
    return F.lower(col.cast("string"))


# ---------------------------------------------------------------------------
# strings
# ---------------------------------------------------------------------------


def concat(*cols: Column) -> Column:
    """Variadic string concat (reference macros/utils/concat.sql:1-3)."""
    return F.concat(*cols)


def escape_single_quotes(s: str) -> str:
    """Backslash-style quote escaping for SQL generation
    (reference macros/utils/escape_single_quotes.sql:1-3)."""
    return s.replace("'", "\\'")


def hash_(col: Column) -> Column:
    """md5 with NULL -> md5('') — NOT NULL-propagating
    (reference macros/utils/hash.sql:1-7; regression test_hash_null.py)."""
    return F.when(col.isNull(), F.md5(F.lit(""))).otherwise(F.md5(col.cast("string")))


def length(col: Column) -> Column:
    return F.length(col)


def position(substring: Column | str, string: Column) -> Column:
    """1-based locate, 0 if absent (reference macros/utils/position.sql:1-7)."""
    if isinstance(substring, Column):
        # locate() needs a literal; the expression form covers column subs
        return F.call_function("locate", substring, string)
    return F.locate(substring, string)


def replace(col: Column, old: str, new: str) -> Column:
    return F.replace(col, F.lit(old), F.lit(new))


def right(col: Column, n: Column | int) -> Column:
    """Last n chars; n=0 -> '' (not NULL); n=len(s) -> whole string
    (reference macros/utils/right.sql:2-13; regression
    test_right_full_length.py)."""
    n_col = F.lit(n) if isinstance(n, int) else n
    n_int = n_col.cast("int")
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(n_int <= 0, F.lit("")).otherwise(F.substring(col, -n_int, n_int))
    )


def split_part(col: Column, delimiter: str, part: Column | int) -> Column:
    """k-th 1-based field; negative k counts from the end
    (reference macros/utils/split_part.sql:2-19 — negative index is
    computed via the count-occurrences trick; Spark's get() handles
    both directions directly). Out-of-range -> '' (MaxCompute/DuckDB
    convention)."""
    parts = F.split(col, re.escape(delimiter))
    k = F.lit(part) if isinstance(part, int) else part
    idx = F.when(k > 0, k - 1).otherwise(F.size(parts) + k)
    picked = F.get(parts, idx.cast("int"))
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.coalesce(picked, F.lit(""))
    )


def equals(a: Column, b: Column) -> Column:
    """NULL-safe equality (reference dbt default `a = b or (a is null and
    b is null)`; Spark <=>)."""
    return a.eqNullSafe(b)


# ---------------------------------------------------------------------------
# date / time
# ---------------------------------------------------------------------------

# Part alias map of the reference (macros/utils/date_trunc.sql:2-17);
# unknown part must raise (compile-error parity).
_DATE_TRUNC_PARTS = {
    "year": "year",
    "quarter": "quarter",
    "month": "month",
    "week": "week",
    "isoweek": "week",
    "day": "day",
    "hour": "hour",
    "minute": "minute",
    "second": "second",
    "millisecond": "millisecond",
}

_DATEADD_UNITS = {"year", "quarter", "month", "week", "day", "hour", "minute", "second", "millisecond", "microsecond"}


def current_timestamp() -> Column:
    return F.current_timestamp()


def date(year: int, month: int, day: int) -> Column:
    """date(y,m,d) -> to_date (reference macros/utils/date.sql:1-5)."""
    return F.make_date(F.lit(year), F.lit(month), F.lit(day))


def date_trunc(part: str, col: Column) -> Column:
    """(reference macros/utils/date_trunc.sql:2-17 — part alias map,
    unknown part = compile error)."""
    p = part.lower()
    if p not in _DATE_TRUNC_PARTS:
        raise ValueError(f"date_trunc: unsupported datepart {part!r}")
    return F.date_trunc(_DATE_TRUNC_PARTS[p], col)


def dateadd(part: str, n: Column | int, col: Column) -> Column:
    """dateadd with the reference's unit algebra: week -> n*7 day,
    quarter -> n*3 month, sub-day units force timestamp
    (reference macros/utils/dateadd.sql:2-22). Spark's timestampadd
    supports all units natively; we keep the forced-timestamp cast for
    return-type parity."""
    p = part.lower()
    if p not in _DATEADD_UNITS:
        raise ValueError(f"dateadd: unsupported datepart {part!r}")
    n_col = F.lit(n) if isinstance(n, int) else n
    target = col
    if p in ("hour", "minute", "second", "millisecond", "microsecond"):
        target = col.cast("timestamp")
    return F.timestamp_add(p.upper(), n_col.cast("int"), target)


def datediff(first: Column, second: Column, part: str) -> Column:
    """Boundary-counting datediff (reference macros/utils/datediff.sql:2-25;
    oracle: test_utils.py:187-196 — `23:59:59.999 -> 00:00:00` is 1 for
    EVERY part). Spark's timestampdiff counts full intervals, so we diff
    the part-truncated boundaries instead: exact boundary semantics."""
    p = part.lower()
    if p not in _DATE_TRUNC_PARTS:
        raise ValueError(f"datediff: unsupported datepart {part!r}")
    unit = _DATE_TRUNC_PARTS[p]
    t1 = F.date_trunc(unit, first)
    t2 = F.date_trunc(unit, second)
    return F.timestamp_diff(unit.upper(), t1, t2).cast("bigint")


def last_day(col: Column, part: str = "month") -> Column:
    """last_day composed as dateadd(day,-1,dateadd(part,1,trunc(part,d)))
    cast to date; quarter unsupported — compile-error parity
    (reference macros/utils/last_day.sql:1-16)."""
    p = part.lower()
    if p == "quarter":
        raise ValueError("last_day: datepart 'quarter' is not supported")
    if p not in ("month", "year", "week"):
        raise ValueError(f"last_day: unsupported datepart {part!r}")
    bumped = dateadd(p, 1, date_trunc(p, col))
    return dateadd("day", -1, bumped).cast("date")


def to_date(col: Column, fmt: str | None = None) -> Column:
    return F.to_date(col, fmt) if fmt else F.to_date(col)


def to_timestamp(col: Column, fmt: str | None = None) -> Column:
    return F.to_timestamp(col, fmt) if fmt else F.to_timestamp(col)


def trunc_time(col: Column, granularity: str = "day") -> Column:
    """Auto-partition generate-expression (reference
    macros/relations/partition.sql:6-8): the derived partition value."""
    return date_trunc(granularity, col)


def timestamp_add_sql(col: Column, n: int, interval: str) -> Column:
    """Python-API dateadd (reference impl.py:414-415)."""
    return dateadd(interval, n, col)


def string_add_sql(col: Column, value: str, location: str = "append") -> Column:
    """concat append/prepend (reference impl.py:417-428)."""
    if location == "append":
        return F.concat(col, F.lit(value))
    if location == "prepend":
        return F.concat(F.lit(value), col)
    raise ValueError(f"string_add_sql: invalid location {location!r}")


# ---------------------------------------------------------------------------
# arrays
# ---------------------------------------------------------------------------


def array_construct(values: Iterable, element_type: str | None = None) -> Column:
    """array(...) with typed-empty support (reference
    macros/utils/array_construct.sql:1-24 — empty array of type T built
    via `array_remove(array(x),x)`; Spark casts an empty array
    directly)."""
    vals = list(values)
    if not vals:
        t = _normalize_type(element_type or "int")
        return F.array().cast(f"array<{t}>")
    cols = [v if isinstance(v, Column) else F.lit(v) for v in vals]
    arr = F.array(*cols)
    if element_type:
        arr = arr.cast(f"array<{_normalize_type(element_type)}>")
    return arr


def array_append(arr: Column, elem: Column) -> Column:
    """(reference macros/utils/array_append.sql:1-3 — concat(a, array(e)))."""
    return F.array_append(arr, elem)


def array_concat(a: Column, b: Column) -> Column:
    """(reference macros/utils/array_concat.sql:2-4)."""
    return F.concat(a, b)


# ---------------------------------------------------------------------------
# aggregates
# ---------------------------------------------------------------------------


def any_value(col: Column) -> Column:
    """(reference macros/utils/any_value.sql:2-5)."""
    return F.any_value(col)


def bool_or(col: Column) -> Column:
    """Implemented as max(bool) in the reference
    (macros/utils/bool_or.sql:5-7); Spark has the real aggregate."""
    return F.bool_or(col)


def listagg(
    value: Column,
    delimiter: str = ",",
    order_by: Column | None = None,
    ascending: bool = True,
) -> Column:
    """Ordered string agg (reference macros/utils/listagg.sql:1-9 —
    `wm_concat(delim, col) within group (order by ...)`; no limit
    support, parity kept). Composed as collect_list(struct(order,val))
    -> array_sort -> join, which is a single partial-aggregable
    expression (no extra shuffle beyond the groupBy)."""
    if order_by is None:
        return F.array_join(F.collect_list(value.cast("string")), delimiter)
    pair = F.collect_list(F.struct(order_by.alias("o"), value.cast("string").alias("v")))
    sorted_pairs = F.array_sort(pair)
    if not ascending:
        sorted_pairs = F.reverse(sorted_pairs)
    return F.array_join(F.transform(sorted_pairs, lambda x: x["v"]), delimiter)


def md5(col: Column) -> Column:
    return F.md5(col.cast("string"))


def snapshot_hash_arguments(cols: list[Column]) -> Column:
    """scd_id = md5(coalesce(cast(a as string),'') || '|' || ...)
    (reference macros/materializations/snapshots/snapshot.sql:2-7)."""
    parts: list[Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit("|"))
        parts.append(F.coalesce(c.cast("string"), F.lit("")))
    return F.md5(F.concat(*parts))
