"""JSONL source/sink: explicit-schema reads, roundtrip fidelity,
corrupt-line handling, partitioned writes."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dbt_maxcompute_spark.sources import jsonl


def test_roundtrip_preserves_values(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a\nb\ttab", 1.5), (2, 'quo"te', None), (3, "üñïçødé", -0.25)],
        "id bigint, text string, score double",
    )
    path = str(tmp_path / "rt")
    jsonl.write_jsonl(df, path)
    back = jsonl.read_jsonl(spark, path, "id bigint, text string, score double")
    got = sorted((r.id, r.text, r.score) for r in back.collect())
    assert got == [(1, "a\nb\ttab", 1.5), (2, 'quo"te', None), (3, "üñïçødé", -0.25)]


def test_read_requires_schema_unless_opted_in(spark, tmp_path):
    path = str(tmp_path / "s")
    jsonl.write_jsonl(spark.range(5).select(F.col("id")), path)
    # explicit schema: no inference scan
    assert jsonl.read_jsonl(spark, path, "id bigint").count() == 5
    # explicit opt-in to inference
    inferred = jsonl.read_jsonl(spark, path, "infer", sampling_ratio=1.0)
    assert inferred.count() == 5 and "id" in inferred.columns


def test_corrupt_line_failfast_raises(spark, tmp_path):
    path = tmp_path / "bad"
    path.mkdir()
    (path / "part-0.json").write_text('{"id": 1}\nnot json at all\n{"id": 3}\n')
    ok = jsonl.read_jsonl(spark, str(path), "id bigint")
    assert ok.where(F.col("id").isNotNull()).count() == 2  # PERMISSIVE keeps rows
    with pytest.raises(Exception):
        jsonl.read_jsonl(spark, str(path), "id bigint", permissive=False).collect()


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(20)], "id bigint, lang string"
    )
    path = str(tmp_path / "bylang")
    jsonl.write_jsonl(df, path, partition_by=["lang"])
    assert os.path.isdir(os.path.join(path, "lang=en"))
    back = jsonl.read_jsonl(spark, path, "id bigint").where("lang = 'en'")
    assert back.count() == 10
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan or "lang#" in plan


def test_roundtrip_adversarial_content(spark, tmp_path):
    # the content classes that break newline-delimited JSON if escaping
    # is wrong: embedded newlines (incl. the JS line separators U+2028/9
    # that are raw-legal in JSON but line-breaking in some writers),
    # backslashes, quotes, empty strings, a 100k-char line
    nasty = [
        (1, "line1\nline2\r\nline3"),
        (2, "unicode seps   and   inline"),
        (3, 'back\\slash and "quotes" and \t tab'),
        (4, ""),
        (5, "x" * 100_000),
        (6, None),
        (7, "emoji \U0001f600 and cjk 漢字"),
    ]
    df = spark.createDataFrame(nasty, "id bigint, text string")
    path = str(tmp_path / "nasty")
    jsonl.write_jsonl(df, path)
    back = jsonl.read_jsonl(spark, path, "id bigint, text string")
    got = {r.id: r.text for r in back.collect()}
    assert got == dict(nasty)
