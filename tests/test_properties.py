"""Property-based tests (hypothesis) for the pure-Python surfaces:
codec roundtrips, statement splitting, query comments, type widening.
Spark-free, so hundreds of examples run in seconds."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_maxcompute_spark.catalog import can_expand_to
from dbt_maxcompute_spark.materializations.raw import (
    inject_query_comment,
    render_query_comment,
    split_statements,
)
from dbt_maxcompute_spark.operators import multimodal


# ---------------------------------------------------------------------------
# codecs: encode -> decode roundtrips exactly for every legal parameter
# ---------------------------------------------------------------------------


@given(w=st.integers(1, 64), h=st.integers(1, 64), v=st.integers(0, 255))
@settings(max_examples=200, deadline=None)
def test_bmp_roundtrip(w, h, v):
    b = multimodal._encode_bmp(w, h, v)
    assert multimodal.sniff_format(b) == "bmp"
    assert multimodal._decode_bmp(b) == (w, h, float(v))


@given(w=st.integers(1, 64), h=st.integers(1, 64), v=st.integers(0, 255))
@settings(max_examples=200, deadline=None)
def test_ppm_roundtrip(w, h, v):
    b = multimodal._encode_ppm(w, h, v)
    assert multimodal.sniff_format(b) == "ppm"
    assert multimodal._decode_ppm(b) == (w, h, float(v))


@given(amp=st.integers(-32768, 32767), n=st.integers(1, 2000))
@settings(max_examples=200, deadline=None)
def test_wav_roundtrip(amp, n):
    b = multimodal._encode_wav(amp, n)
    assert multimodal.sniff_format(b) == "wav"
    ch, bits, got_n, mean = multimodal._decode_wav(b)
    assert (ch, bits, got_n) == (1, 16, n)
    assert mean == float(abs(amp))


# ---------------------------------------------------------------------------
# statement splitter: quoted semicolons and comments never split
# ---------------------------------------------------------------------------

_ident = st.text(alphabet="abcdefgxyz_ ", min_size=1, max_size=20).map(str.strip).filter(bool)


@given(parts=st.lists(_ident, min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_split_statements_roundtrip(parts):
    stmts = [f"select '{p};' /* block; comment */ as c" for p in parts]
    script = ";\n".join(stmts) + ";"
    got = split_statements(script)
    assert len(got) == len(stmts)
    for g, p in zip(got, parts):
        assert f"'{p};'" in g  # quoted semicolon survived intact
    # a line comment swallows a separator to end-of-line (so a ';' inside
    # '-- ...' must NOT split) — pin that too
    assert len(split_statements("select 1 -- no; split\n; select 2")) == 2


@given(payload=st.text(min_size=0, max_size=80))
@settings(max_examples=300, deadline=None)
def test_query_comment_never_breaks_out(payload):
    c = render_query_comment(payload) if payload else render_query_comment("x")
    body = c[len("/* ") : -len(" */")]
    assert "*/" not in body  # payload cannot terminate the comment early
    out = inject_query_comment("select 1", payload or "x")
    assert out.endswith("select 1")
    # injected statement still splits as exactly one statement
    assert len(split_statements(out)) == 1


# ---------------------------------------------------------------------------
# string widening: partial-order properties
# ---------------------------------------------------------------------------


@given(a=st.integers(1, 1000), b=st.integers(1, 1000))
@settings(max_examples=200, deadline=None)
def test_can_expand_to_ordering(a, b):
    va, vb = f"varchar({a})", f"varchar({b})"
    assert can_expand_to(va, va)  # reflexive
    assert can_expand_to(va, "string")  # everything widens to string
    assert not can_expand_to("string", va)  # unbounded never narrows
    assert can_expand_to(va, vb) == (b >= a)  # size-monotone
    if can_expand_to(va, vb) and can_expand_to(vb, va):
        assert a == b  # antisymmetric
    assert not can_expand_to(va, "bigint") and not can_expand_to("bigint", va)
