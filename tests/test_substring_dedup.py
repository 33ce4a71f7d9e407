"""Chunk-level exact substring dedup (Lee et al. 2022 approximation)."""

from __future__ import annotations

import re

from dbt_maxcompute_spark.operators.dedup import dedup_substring_chunks


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_dedup_known_semantics(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d e f g h"),  # both chunks recur elsewhere
            (2, "a b c d x y z"),  # 'a b c d' dup; partial 'x y z' unique
            (3, "q r s t"),  # fully unique
            (4, "e f g h e f g h"),  # same chunk twice in ONE doc...
        ],
    )
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["clean_text"])
        for r in dedup_substring_chunks(
            df, "doc_id", "text", chunk_tokens=4, min_docs=2
        ).collect()
    }
    assert out[1] == (2, 2, "")  # everything repeated -> empty survivor
    assert out[2] == (2, 1, "x y z")  # trailing partial chunk survives
    assert out[3] == (1, 0, "q r s t")
    # ...docs {1,4} share 'e f g h' -> dup in both
    assert out[4] == (2, 2, "")


def test_substring_dedup_within_doc_repeat_is_one_doc(spark):
    # a chunk repeated only WITHIN one doc is 1 distinct doc — below
    # min_docs=2, so it survives (Lee et al. count cross-corpus spans)
    df = _docs(spark, [(1, "e f g h e f g h"), (2, "totally different words here")])
    out = {
        r["doc_id"]: r["n_dup_chunks"]
        for r in dedup_substring_chunks(
            df, "doc_id", "text", chunk_tokens=4, min_docs=2
        ).collect()
    }
    assert out[1] == 0 and out[2] == 0


def test_substring_dedup_order_preserved_across_gaps(spark):
    # survivors reassemble in ORIGINAL order even when dropped chunks
    # punch holes in the middle
    df = _docs(
        spark,
        [
            (1, "one two three four DUP DUP DUP DUP five six seven eight"),
            (2, "DUP DUP DUP DUP"),
        ],
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in dedup_substring_chunks(
            df, "doc_id", "text", chunk_tokens=4, min_docs=2
        ).collect()
    }
    assert out[1] == "one two three four five six seven eight"
    assert out[2] == ""


def test_substring_dedup_plan_shuffles_digests_not_strings(spark, sf_dir):
    # scale posture: chunk spans shuffle as md5 digests; the whole op
    # is Catalyst (no Python), bounded hash exchanges, no cartesian
    from dbt_maxcompute_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = dedup_substring_chunks(docs, "doc_id", "text", chunk_tokens=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "CartesianProduct" not in plan
    hash_exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert 0 < len(hash_exchanges) <= 4
    # every exchange keys on the digest (__h) and/or the doc id — the
    # chunk text column never appears in a partitioning key
    for keys in hash_exchanges:
        assert "__chunk" not in keys, plan


def test_substring_dedup_null_and_empty_text_rows_survive(spark):
    # explicit policy (round-12 advisory): a NULL-text doc must not
    # silently vanish from the output — it appears with n_chunks=0 and
    # an empty clean column, and cannot poison other docs' dup counts
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, None), (3, "a b c d")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["clean_text"])
        for r in dedup_substring_chunks(
            df, "doc_id", "text", chunk_tokens=4, min_docs=2
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[2] == (0, 0, "")
    assert out[1] == (1, 1, "") and out[3] == (1, 1, "")


def test_substring_dedup_zero_chunk_guard_is_structural(spark):
    # the nch>=1 guard must hold even if a future tokenizer returns an
    # EMPTY array (today split('') yields ['']): sequence(0, -1) would
    # otherwise descend to [0, -1] and slice at a non-positive start
    from pyspark.sql import functions as F

    from dbt_maxcompute_spark.operators import dedup as dd

    df = spark.createDataFrame([(1, "x"), (2, "")], "doc_id long, text string")
    real_tokens = dd.tokens
    try:
        dd.tokens = lambda c: F.filter(real_tokens(c), lambda t: t != F.lit(""))
        out = {
            r["doc_id"]: (r["n_chunks"], r["clean_text"])
            for r in dedup_substring_chunks(
                df, "doc_id", "text", chunk_tokens=4, min_docs=2
            ).collect()
        }
    finally:
        dd.tokens = real_tokens
    assert out[1] == (1, "x")
    assert out[2] == (0, "")
