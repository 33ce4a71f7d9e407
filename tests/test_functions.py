"""Function-library edge cases — each test reproduces a reference
regression or golden-seed scenario (SURVEY.md §2.6 gotchas)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from dbt_maxcompute_spark.functions import scalar as fn


def one_row(spark, **cols):
    return spark.createDataFrame([cols])


def val(df, col):
    return df.select(col.alias("v")).first()["v"]


# --- hash: NULL -> md5('') (reference test_hash_null.py) -------------------

def test_hash_null_is_md5_of_empty(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], "id int, v string")
    out = {r["id"]: r["h"] for r in df.select("id", fn.hash_(F.col("v")).alias("h")).collect()}
    import hashlib

    assert out[1] == hashlib.md5(b"a").hexdigest()
    assert out[2] == hashlib.md5(b"").hexdigest()  # NOT NULL


# --- right: n=0 -> '', n=len -> whole string (test_right_full_length.py) ---

@pytest.mark.parametrize(
    "s,n,expected",
    [
        ("hello", 0, ""),
        ("hello", 5, "hello"),
        ("hello", 3, "llo"),
        ("hello", 10, "hello"),
        (None, 2, None),
    ],
)
def test_right_boundaries(spark, s, n, expected):
    df = spark.createDataFrame([(s,)], "s string")
    assert val(df, fn.right(F.col("s"), n)) == expected


# --- split_part: negative index, out-of-range (split_part.sql:2-19) --------

@pytest.mark.parametrize(
    "s,k,expected",
    [
        ("a_b_c", 1, "a"),
        ("a_b_c", 3, "c"),
        ("a_b_c", -1, "c"),
        ("a_b_c", -3, "a"),
        ("a_b_c", 5, ""),
        (None, 1, None),
    ],
)
def test_split_part(spark, s, k, expected):
    df = spark.createDataFrame([(s,)], "s string")
    assert val(df, fn.split_part(F.col("s"), "_", k)) == expected


# --- datediff boundary counting (test_utils.py:187-196) --------------------

@pytest.mark.parametrize(
    "part", ["year", "quarter", "month", "day", "hour", "minute", "second"]
)
def test_datediff_boundary_is_one_for_every_part(spark, part):
    df = one_row(
        spark,
        d1=datetime.datetime(1999, 12, 31, 23, 59, 59, 999999),
        d2=datetime.datetime(2000, 1, 1, 0, 0, 0),
    )
    assert val(df, fn.datediff(F.col("d1"), F.col("d2"), part)) == 1


def test_datediff_week_boundary(spark):
    # reference test_utils.py datediff week case: Fri 1999-12-31 ->
    # Mon 2000-01-03 crosses exactly one ISO-week (Monday) boundary
    df = one_row(
        spark,
        d1=datetime.datetime(1999, 12, 31, 23, 59, 59, 999999),
        d2=datetime.datetime(2000, 1, 3, 0, 0, 0),
    )
    assert val(df, fn.datediff(F.col("d1"), F.col("d2"), "week")) == 1
    # and Sat 2000-01-01 is still the same ISO week -> 0
    df2 = one_row(
        spark,
        d1=datetime.datetime(1999, 12, 31, 23, 59, 59, 999999),
        d2=datetime.datetime(2000, 1, 1, 0, 0, 0),
    )
    assert val(df2, fn.datediff(F.col("d1"), F.col("d2"), "week")) == 0


def test_datediff_full_interval_would_be_zero(spark):
    # sanity: plain timestamp_diff gives 0 here — proves the trunc wrapper
    df = one_row(
        spark,
        d1=datetime.datetime(2000, 1, 31),
        d2=datetime.datetime(2000, 2, 1),
    )
    assert val(df, fn.datediff(F.col("d1"), F.col("d2"), "month")) == 1
    assert val(df, F.timestamp_diff("MONTH", F.col("d1"), F.col("d2"))) == 0


def test_datediff_negative_direction(spark):
    df = one_row(
        spark,
        d1=datetime.datetime(2000, 1, 1),
        d2=datetime.datetime(1999, 12, 31),
    )
    assert val(df, fn.datediff(F.col("d1"), F.col("d2"), "day")) == -1


# --- dateadd unit algebra (dateadd.sql:2-22) --------------------------------

def test_dateadd_week_quarter_subday(spark):
    df = one_row(spark, t=datetime.datetime(2000, 1, 15, 10, 30, 0))
    assert val(df, fn.dateadd("week", 2, F.col("t"))) == datetime.datetime(2000, 1, 29, 10, 30)
    assert val(df, fn.dateadd("quarter", 1, F.col("t"))) == datetime.datetime(2000, 4, 15, 10, 30)
    assert val(df, fn.dateadd("hour", -11, F.col("t"))) == datetime.datetime(2000, 1, 14, 23, 30)


def test_dateadd_unknown_part_raises(spark):
    with pytest.raises(ValueError):
        fn.dateadd("fortnight", 1, F.lit("2000-01-01").cast("timestamp"))


# --- date_trunc alias map + unknown part error (date_trunc.sql:2-17) -------

def test_date_trunc_parts(spark):
    df = one_row(spark, t=datetime.datetime(2000, 5, 17, 10, 30, 0))
    assert val(df, fn.date_trunc("quarter", F.col("t"))) == datetime.datetime(2000, 4, 1)
    assert val(df, fn.date_trunc("isoweek", F.col("t"))) == datetime.datetime(2000, 5, 15)
    with pytest.raises(ValueError):
        fn.date_trunc("era", F.col("t"))


# --- last_day: month/year ok, quarter = error (last_day.sql:1-16) ----------

def test_last_day(spark):
    df = one_row(spark, t=datetime.datetime(2000, 2, 10))
    assert val(df, fn.last_day(F.col("t"), "month")) == datetime.date(2000, 2, 29)
    assert val(df, fn.last_day(F.col("t"), "year")) == datetime.date(2000, 12, 31)
    with pytest.raises(ValueError):
        fn.last_day(F.col("t"), "quarter")


def test_last_day_null_row(spark):
    # reference golden seed includes a NULL row (test_utils.py:263-268)
    df = spark.createDataFrame([(None,)], "t timestamp")
    assert val(df, fn.last_day(F.col("t"), "month")) is None


# --- arrays: typed empties (array_construct.sql:1-24) -----------------------

def test_array_construct_empty_typed(spark):
    df = spark.range(1)
    out = df.select(fn.array_construct([], "bigint").alias("a"))
    assert out.schema["a"].dataType.simpleString() == "array<bigint>"
    assert out.first()["a"] == []


def test_array_append_concat(spark):
    df = spark.range(1)
    a = fn.array_construct([1, 2])
    assert val(df, fn.array_append(a, F.lit(3))) == [1, 2, 3]
    assert val(df, fn.array_concat(a, fn.array_construct([9]))) == [1, 2, 9]


# --- listagg ordered (listagg.sql:1-9; test_utils.py:309-389) ---------------

def test_listagg_ordered(spark):
    df = spark.createDataFrame(
        [(1, "b", 2), (1, "a", 3), (1, "c", 1), (2, "z", 1)],
        "g int, s string, o int",
    )
    out = {
        r["g"]: r["agg"]
        for r in df.groupBy("g")
        .agg(fn.listagg(F.col("s"), "_|_", order_by=F.col("o")).alias("agg"))
        .collect()
    }
    assert out[1] == "c_|_b_|_a"
    assert out[2] == "z"


def test_listagg_descending(spark):
    df = spark.createDataFrame([(1, "a", 1), (1, "b", 2)], "g int, s string, o int")
    out = df.groupBy("g").agg(fn.listagg(F.col("s"), ",", F.col("o"), ascending=False).alias("x"))
    assert out.first()["x"] == "b,a"


# --- misc semantics ----------------------------------------------------------

def test_safe_cast_returns_null(spark):
    df = one_row(spark, s="not_a_number")
    assert val(df, fn.safe_cast(F.col("s"), "int")) is None


def test_cast_bool_to_text(spark):
    df = spark.createDataFrame([(True,), (False,), (None,)], "b boolean")
    vals = [r["v"] for r in df.select(fn.cast_bool_to_text(F.col("b")).alias("v")).collect()]
    assert vals == ["true", "false", None]


def test_equals_null_safe(spark):
    df = spark.createDataFrame([(None, None), ("a", None), ("a", "a")], "x string, y string")
    vals = [r["v"] for r in df.select(fn.equals(F.col("x"), F.col("y")).alias("v")).collect()]
    assert vals == [True, False, True]


def test_position_and_replace(spark):
    df = one_row(spark, s="hello world")
    assert val(df, fn.position("world", F.col("s"))) == 7
    assert val(df, fn.position("zzz", F.col("s"))) == 0
    assert val(df, fn.replace(F.col("s"), "world", "spark")) == "hello spark"


def test_snapshot_hash_arguments(spark):
    import hashlib

    df = spark.createDataFrame([("k1", None)], "a string, b string")
    got = val(df, fn.snapshot_hash_arguments([F.col("a"), F.col("b")]))
    assert got == hashlib.md5(b"k1|").hexdigest()


def test_date_and_literals(spark):
    df = spark.range(1)
    assert val(df, fn.date(2024, 2, 29)) == datetime.date(2024, 2, 29)
    assert val(df, fn.string_literal(42)) == "42"
    assert fn.escape_single_quotes("it's") == "it\\'s"


def test_trunc_time_and_string_add(spark):
    df = one_row(spark, t=datetime.datetime(2000, 5, 17, 10, 0), s="abc")
    assert val(df, fn.trunc_time(F.col("t"), "month")) == datetime.datetime(2000, 5, 1)
    assert val(df, fn.string_add_sql(F.col("s"), "_x")) == "abc_x"
    assert val(df, fn.string_add_sql(F.col("s"), "x_", "prepend")) == "x_abc"
