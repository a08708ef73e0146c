"""ClickHouse → Spark SQL dialect translation (string level, conservative).

The reference tool's users write ClickHouse-flavored SQL (its join builder
passes raw condition strings to ClickHouse, server/server.js:837-844, and its
bootstrap emits ``now()``, server.js:165-169).  This module lets the common
ClickHouse function surface run on Spark unchanged: zero-arg and simple
renames plus a paren-matching rewriter for functions that become a different
*shape* (``toInt64(x)`` → ``CAST(x AS BIGINT)``, ``toStartOfDay(x)`` →
``date_trunc('day', x)``) — which a flat regex cannot do safely under
nesting.

Deliberately NOT a SQL parser: translation is name-level, never touches the
inside of string literals, and unknown functions pass through untouched
(Spark then errors with its own message).  ClickHouse combinator syntax
(``quantile(0.5)(x)``, ``-If``/``-Array`` suffixes) is out of scope.
"""

from __future__ import annotations

import re

# name(x) → prefix + x + suffix, paren-matched
_WRAPS: list[tuple[str, str, str]] = [
    ("toStartOfMinute", "date_trunc('minute', ", ")"),
    ("toStartOfHour", "date_trunc('hour', ", ")"),
    ("toStartOfDay", "date_trunc('day', ", ")"),
    ("toStartOfMonth", "date_trunc('month', ", ")"),
    ("toYYYYMM", "CAST(date_format(", ", 'yyyyMM') AS INT)"),
    ("uniqExact", "count(DISTINCT ", ")"),
    ("toInt8", "CAST(", " AS TINYINT)"),
    ("toInt16", "CAST(", " AS SMALLINT)"),
    ("toInt32", "CAST(", " AS INT)"),
    ("toInt64", "CAST(", " AS BIGINT)"),
    ("toUInt8", "CAST(", " AS SMALLINT)"),
    ("toUInt16", "CAST(", " AS INT)"),
    ("toUInt32", "CAST(", " AS BIGINT)"),
    ("toUInt64", "CAST(", " AS DECIMAL(20,0))"),
    ("toFloat32", "CAST(", " AS FLOAT)"),
    ("toFloat64", "CAST(", " AS DOUBLE)"),
    ("toString", "CAST(", " AS STRING)"),
]

# same-shape renames (arity and semantics line up)
_RENAMES: list[tuple[str, str]] = [
    ("toDateTime", "to_timestamp"),
    ("toDate", "to_date"),
    ("uniq", "approx_count_distinct"),
    ("arrayJoin", "explode"),
    ("lcase", "lower"),
    ("ucase", "upper"),
    ("halfMD5", "xxhash64"),  # both: fast 64-bit non-cryptographic digest
    # aggregate analogs with matching arity/semantics
    ("argMax", "max_by"),
    ("argMin", "min_by"),
    ("groupArray", "collect_list"),
    ("groupUniqArray", "collect_set"),
    ("groupBitAnd", "bit_and"),
    ("groupBitOr", "bit_or"),
    ("groupBitXor", "bit_xor"),
    ("medianExact", "median"),
]

_ZERO_ARG: list[tuple[str, str]] = [
    ("now()", "current_timestamp()"),
    ("today()", "current_date()"),
    ("yesterday()", "date_sub(current_date(), 1)"),
]


def _split_literals(sql: str) -> list[tuple[bool, str]]:
    """(is_literal, chunk) segments; '' escapes stay inside their literal."""
    out: list[tuple[bool, str]] = []
    buf: list[str] = []
    in_lit = False
    i = 0
    while i < len(sql):
        ch = sql[i]
        if in_lit and ch == "'" and i + 1 < len(sql) and sql[i + 1] == "'":
            buf.append("''")
            i += 2
            continue
        if ch == "'":
            out.append((in_lit, "".join(buf)))
            buf, in_lit = [], not in_lit
            i += 1
            continue
        buf.append(ch)
        i += 1
    out.append((in_lit, "".join(buf)))
    return out


def _wrap(chunk: str, name: str, prefix: str, suffix: str) -> str:
    """Rewrite every ``name(<args>)`` to ``prefix<args>suffix``, matching the
    close paren through arbitrary nesting."""
    pat = re.compile(r"\b" + name + r"\(")
    m = pat.search(chunk)
    while m:
        depth, j = 1, m.end()
        while j < len(chunk) and depth:
            if chunk[j] == "(":
                depth += 1
            elif chunk[j] == ")":
                depth -= 1
            j += 1
        inner = chunk[m.end() : j - 1]
        chunk = chunk[: m.start()] + prefix + inner + suffix + chunk[j:]
        m = pat.search(chunk, m.start() + len(prefix))
    return chunk


def translate_clickhouse_sql(sql: str) -> str:
    """Translate the common ClickHouse function surface to Spark SQL.

    Unknown names pass through; string literals are never modified."""
    out: list[str] = []
    for is_lit, chunk in _split_literals(sql):
        if is_lit:
            out.append(f"'{chunk}'")
            continue
        for src, dst in _ZERO_ARG:
            chunk = chunk.replace(src, dst)
        for name, prefix, suffix in _WRAPS:
            chunk = _wrap(chunk, name, prefix, suffix)
        for src, dst in _RENAMES:
            chunk = re.sub(r"\b" + src + r"\(", dst + "(", chunk)
        out.append(chunk)
    return "".join(out)
