"""Line-level boilerplate removal: frequency threshold, trim-matched
keys, order preservation, all-boilerplate docs, custom separators."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_maxcompute_spark.operators.textanalysis import remove_boilerplate_lines


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_threshold_boundary_and_order(spark):
    rows = [
        (1, "HEADER\nalpha one\nFOOTER"),
        (2, "HEADER\nbeta two\nFOOTER"),
        (3, "HEADER\ngamma three\nFOOTER"),
        (4, "pair line\ndelta four"),
        (5, "pair line\nepsilon five"),
    ]
    out = remove_boilerplate_lines(_docs(spark, rows), "doc_id", "text", min_docs=3)
    got = {r.doc_id: (r.text, r.n_removed_lines) for r in out.collect()}
    # HEADER/FOOTER live in 3 docs -> removed; "pair line" in only 2 -> kept
    assert got[1] == ("alpha one", 2)
    assert got[2] == ("beta two", 2)
    assert got[3] == ("gamma three", 2)
    assert got[4] == ("pair line\ndelta four", 0)
    assert got[5] == ("pair line\nepsilon five", 0)


def test_trim_matching_and_duplicate_lines_within_doc(spark):
    rows = [
        (1, "  SAME  \nbody a\nSAME"),   # SAME twice in ONE doc: 1 distinct doc
        (2, "SAME\nbody b"),
        (3, "body c"),
    ]
    out = remove_boilerplate_lines(_docs(spark, rows), "doc_id", "text", min_docs=2)
    got = {r.doc_id: r.text for r in out.collect()}
    # trimmed "SAME" occurs in docs {1, 2} -> removed everywhere,
    # including both copies inside doc 1
    assert got[1] == "body a"
    assert got[2] == "body b"
    assert got[3] == "body c"


def test_all_boilerplate_doc_becomes_empty(spark):
    rows = [(1, "X"), (2, "X"), (3, "X\nunique bit")]
    out = remove_boilerplate_lines(_docs(spark, rows), "doc_id", "text", min_docs=2)
    got = {r.doc_id: (r.text, r.n_removed_lines) for r in out.collect()}
    assert got[1] == ("", 1) and got[2] == ("", 1)
    assert got[3] == ("unique bit", 1)
    assert out.count() == 3  # emptied docs are kept, not dropped


def test_custom_separator_is_escaped(spark):
    rows = [(1, "boiler. body a"), (2, "boiler. body b")]
    out = remove_boilerplate_lines(
        _docs(spark, rows), "doc_id", "text", min_docs=2, sep=". "
    )
    got = {r.doc_id: r.text for r in out.collect()}
    assert got == {1: "body a", 2: "body b"}


def test_extra_columns_survive(spark):
    rows = [(1, "H\na", "en"), (2, "H\nb", "de")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = remove_boilerplate_lines(df, "doc_id", "text", min_docs=2)
    got = {r.doc_id: (r.text, r.lang) for r in out.collect()}
    assert got == {1: ("a", "en"), 2: ("b", "de")}


def test_null_text_doc_survives_as_empty(spark):
    rows = [(1, "H\na"), (2, "H\nb"), (3, None)]
    out = remove_boilerplate_lines(_docs(spark, rows), "doc_id", "text", min_docs=2)
    got = {r.doc_id: (r.text, r.n_removed_lines) for r in out.collect()}
    assert got[3] == ("", 0)
    assert got[1] == ("a", 1) and got[2] == ("b", 1)


def test_empty_lines_never_count_as_boilerplate(spark):
    rows = [(1, "a\n\nb"), (2, "c\n\nd")]
    out = remove_boilerplate_lines(_docs(spark, rows), "doc_id", "text", min_docs=2)
    got = {r.doc_id: r.text for r in out.collect()}
    # the empty middle line is shared by both docs but is NOT treated
    # as boilerplate (blank separators are structure, not content)
    assert got == {1: "a\n\nb", 2: "c\n\nd"}


# -- incremental (store-backed) boilerplate removal ---------------------------

def test_incremental_store_accumulates_across_batches(spark, tmp_path):
    """A line that only becomes frequent in a later batch starts
    dropping FROM that batch on; earlier batches are never reprocessed;
    the store carries cumulative distinct-doc counts."""
    from dbt_maxcompute_spark.operators.textanalysis import (
        clean_boilerplate_incremental,
    )
    from dbt_maxcompute_spark.txnlog import TxnTable

    store = TxnTable(spark, str(tmp_path / "freq_store"))
    b1 = _docs(spark, [(1, "NAV\nalpha"), (2, "beta only")])
    out1 = clean_boilerplate_incremental(
        spark, store, b1, "doc_id", "text", min_docs=3
    )
    got1 = {r.doc_id: r.text for r in out1.collect()}
    assert got1 == {1: "NAV\nalpha", 2: "beta only"}  # NAV seen once: kept

    b2 = _docs(spark, [(3, "NAV\ngamma"), (4, "NAV\ndelta")])
    out2 = clean_boilerplate_incremental(
        spark, store, b2, "doc_id", "text", min_docs=3
    )
    got2 = {r.doc_id: r.text for r in out2.collect()}
    # cumulative NAV count hits 3 IN this batch: dropped from batch 2
    assert got2 == {3: "gamma", 4: "delta"}

    counts = {r.line: r.n_docs for r in store.read().collect()}
    assert counts["NAV"] == 3
    assert counts["alpha"] == 1 and counts["gamma"] == 1

    b3 = _docs(spark, [(5, "NAV\nepsilon")])
    out3 = clean_boilerplate_incremental(
        spark, store, b3, "doc_id", "text", min_docs=3
    )
    assert out3.collect()[0].text == "epsilon"  # stays boilerplate
    assert {r.line: r.n_docs for r in store.read().collect()}["NAV"] == 4


def test_incremental_within_batch_duplicates_count_once(spark, tmp_path):
    """Distinct-doc semantics: two copies of a line INSIDE one doc bump
    the store by one, matching the batch operator's count(DISTINCT id)."""
    from dbt_maxcompute_spark.operators.textanalysis import (
        clean_boilerplate_incremental,
    )
    from dbt_maxcompute_spark.txnlog import TxnTable

    store = TxnTable(spark, str(tmp_path / "freq_store2"))
    b = _docs(spark, [(1, "X\nbody\nX")])
    clean_boilerplate_incremental(spark, store, b, "doc_id", "text", min_docs=2)
    assert {r.line: r.n_docs for r in store.read().collect()}["X"] == 1


def test_incremental_matches_batch_operator_on_union(spark, tmp_path):
    """Feeding ALL docs as one incremental batch equals the plain batch
    operator (same threshold, same reassembly)."""
    from dbt_maxcompute_spark.operators.textanalysis import (
        clean_boilerplate_incremental,
        remove_boilerplate_lines,
    )
    from dbt_maxcompute_spark.txnlog import TxnTable

    rows = [
        (1, "HEAD\na\nFOOT"), (2, "HEAD\nb\nFOOT"), (3, "HEAD\nc"),
        (4, "solo\nd"),
    ]
    store = TxnTable(spark, str(tmp_path / "freq_store3"))
    inc = clean_boilerplate_incremental(
        spark, store, _docs(spark, rows), "doc_id", "text", min_docs=2
    )
    plain = remove_boilerplate_lines(_docs(spark, rows), "doc_id", "text", min_docs=2)
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, plain.collect()))


# -- property: store counts are exact for ANY batch split ---------------------

import tempfile as _tempfile  # noqa: E402

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_LINE_POOL = ["nav", "foot", "ad", "x1", "x2", "x3", "x4", "x5"]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_LINE_POOL), min_size=1, max_size=4),
        min_size=1,
        max_size=8,
    ),
    cut=st.integers(0, 8),
    min_docs=st.integers(2, 3),
)
def test_incremental_store_counts_exact_for_any_split(spark, docs, cut, min_docs):
    """PROPERTY: after feeding ANY document set in ANY two-batch split,
    the store's per-line count equals an exact count(DISTINCT doc) over
    the union — the cumulative-frequency contract the cleaning
    threshold depends on. Cleaned outputs always preserve per-doc line
    order and only ever REMOVE lines."""
    from dbt_maxcompute_spark.operators.textanalysis import (
        clean_boilerplate_incremental,
    )
    from dbt_maxcompute_spark.txnlog import TxnTable

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    cut = min(cut, len(rows))
    store = TxnTable(spark, _tempfile.mkdtemp(prefix="bp_prop_") + "/freq")
    outs = []
    for batch_rows in (rows[:cut], rows[cut:]):
        if not batch_rows:
            continue
        outs.append(
            clean_boilerplate_incremental(
                spark, store, _docs(spark, batch_rows), "doc_id", "text",
                min_docs=min_docs,
            ).collect()
        )
    got = {r.line: r.n_docs for r in store.read().collect()}
    want = {}
    for _i, lines in enumerate(docs):
        for ln in set(lines):
            want[ln] = want.get(ln, 0) + 1
    assert got == want, (docs, cut, got, want)
    # outputs only remove lines, never reorder or invent
    by_id = {i: lines for i, lines in enumerate(docs)}
    for out in outs:
        for r in out:
            kept = r.text.split("\n") if r.text else []
            orig = by_id[r.doc_id]
            it = iter(orig)
            assert all(any(k == o for o in it) for k in kept), (orig, kept)
            assert r.n_removed_lines == len(orig) - len(kept)


def test_incremental_replayed_batch_applies_counts_once(spark, tmp_path):
    """Round-10 advisory fix: a batch re-run after a downstream failure
    (same batch_id) must NOT double-count its documents in the
    frequency store — the txn-ledger cursor skips the upsert on replay,
    while the cleaned frame is still returned. A NEW batch id applies
    normally afterwards."""
    from dbt_maxcompute_spark.operators.textanalysis import (
        clean_boilerplate_incremental,
    )
    from dbt_maxcompute_spark.txnlog import TxnTable

    store = TxnTable(spark, str(tmp_path / "freq"))
    b1 = spark.createDataFrame(
        [(1, "NAV\nalpha"), (2, "NAV\nbeta")], "doc_id bigint, text string"
    )
    out1 = clean_boilerplate_incremental(
        spark, store, b1, "doc_id", "text", min_docs=3, batch_id=1
    )
    assert out1.count() == 2
    counts = {r.line: r.n_docs for r in store.read().collect()}
    assert counts["NAV"] == 2

    # replay batch 1 (downstream failure, re-run): store unchanged
    out_replay = clean_boilerplate_incremental(
        spark, store, b1, "doc_id", "text", min_docs=3, batch_id=1
    )
    assert out_replay.count() == 2  # the cleaned frame still comes back
    counts2 = {r.line: r.n_docs for r in store.read().collect()}
    assert counts2["NAV"] == 2  # NOT 4 — no double count
    assert store.last_batch("boilerplate") == 1

    # batch 2 pushes NAV over the threshold exactly when it should
    b2 = spark.createDataFrame([(3, "NAV\ngamma")], "doc_id bigint, text string")
    out2 = clean_boilerplate_incremental(
        spark, store, b2, "doc_id", "text", min_docs=3, batch_id=2
    )
    assert {r.line: r.n_docs for r in store.read().collect()}["NAV"] == 3
    row = out2.collect()[0]
    assert row.text == "gamma" and row.n_removed_lines == 1

    # and a replay of batch 2 is again a no-op on the store
    clean_boilerplate_incremental(
        spark, store, b2, "doc_id", "text", min_docs=3, batch_id=2
    )
    assert {r.line: r.n_docs for r in store.read().collect()}["NAV"] == 3
