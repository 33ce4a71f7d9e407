"""Raw-SQL materialization: run an arbitrary multi-statement script.

Reference parity: ``materialized='raw'`` submits a user script with
hint extraction and script-mode execution
(`/root/reference/dbt/include/maxcompute/macros/materializations/raw.sql:1-6`,
`/root/reference/dbt/adapters/maxcompute/impl.py:588-627`). Here the
script's SET preamble becomes scoped Spark confs, the rest is split on
top-level semicolons (quote/comment-aware) and executed statement by
statement via ``spark.sql``; the last statement's DataFrame is
returned (lazy — no collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbt_maxcompute_spark.plans.settings import (
    parse_set_preamble,
    scoped_confs,
    split_hints,
)


def split_statements(script: str) -> list[str]:
    """Split on semicolons outside quotes/comments. Empty statements
    are dropped (trailing ';' produces none)."""
    out, buf = [], []
    i, n = 0, len(script)
    while i < n:
        ch = script[i]
        if ch in ("'", '"'):
            q = ch
            buf.append(ch)
            i += 1
            while i < n:
                buf.append(script[i])
                if script[i] == "\\" and i + 1 < n:  # escaped char inside literal
                    buf.append(script[i + 1])
                    i += 2
                    continue
                if script[i] == q:
                    i += 1
                    break
                i += 1
        elif script.startswith("--", i):
            j = script.find("\n", i)
            j = n if j < 0 else j + 1
            buf.append(script[i:j])
            i = j
        elif script.startswith("/*", i):
            j = script.find("*/", i + 2)
            j = n if j < 0 else j + 2
            buf.append(script[i:j])
            i = j
        elif ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
            i += 1
        else:
            buf.append(ch)
            i += 1
    stmt = "".join(buf).strip()
    if stmt:
        out.append(stmt)
    return out


def render_query_comment(meta: "dict | str | None") -> str:
    """dbt's query-comment block rendered as a SQL block comment
    (reference tests/functional/adapter/test_query_comment.py — dbt-core
    prepends `/* {json} */` with app/dbt_version/node_id). Dict metadata
    is JSON-encoded; `*/` inside the payload is defanged so it cannot
    terminate the comment early."""
    import json

    if not meta:
        return ""
    body = meta if isinstance(meta, str) else json.dumps(meta, sort_keys=True)
    return "/* " + body.replace("*/", "* /") + " */"


def inject_query_comment(
    sql: str, meta: "dict | str | None", append: bool = False
) -> str:
    """Prepend (default) or append the rendered comment to one
    statement — dbt's `query-comment: {comment: ..., append: ...}`."""
    comment = render_query_comment(meta)
    if not comment:
        return sql
    return f"{sql}\n{comment}" if append else f"{comment}\n{sql}"


def run_raw(
    spark: SparkSession,
    script: str,
    query_comment: "dict | str | None" = None,
    comment_append: bool = False,
) -> tuple[DataFrame | None, dict[str, str], list[str]]:
    """Execute a raw script. Returns (last statement's DataFrame or
    None for an empty script, recorded inert hints, parse errors).
    `query_comment` is injected into every executed statement (the
    statement splitter and Spark's parser both tolerate it — the
    reference's query-comment contract)."""
    parsed = parse_set_preamble(script)
    apply, record = split_hints(parsed.settings)
    last: DataFrame | None = None
    with scoped_confs(spark, apply):
        for stmt in split_statements(parsed.remaining_query):
            last = spark.sql(inject_query_comment(stmt, query_comment, comment_append))
    return last, record, parsed.errors
