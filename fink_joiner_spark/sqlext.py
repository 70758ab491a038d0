"""SQL macro sugar — the optional syntax layer SURVEY.md §7.2 deferred.

The reference exposes its pipeline through SQL strings
(``tEnv.sqlQuery``, ``CRMLSJoiner.scala:181-489``); Spark SQL covers
that surface except for two idioms Flink users reach for constantly.
This module adds them as TEXT MACROS expanded before ``spark.sql`` —
no Catalyst extension, no parser fork, and the expansion is plain SQL a
user could have written:

* ``LATEST_BY(tbl BY k1, k2 ORDER BY ts [, tie...])`` — the
  latest-version-per-key dedup (A1) as a derived table:
  ``ROW_NUMBER() OVER (PARTITION BY keys ORDER BY ts DESC, ties DESC)
  = 1``, with the helper rank projected away via ``SELECT * EXCEPT``.

* ``ASOF_BACKWARD(probe p, build b ON k MATCH b_ts <= p_ts COLS c1,
  c2)`` is deliberately NOT a macro: the one-liner LATERAL form
  (``, LATERAL (SELECT c FROM b WHERE b.k = p.k AND b.ts <= p.ts
  ORDER BY b.ts DESC LIMIT 1)``) works in Spark SQL as-is (tested in
  ``tests/test_sqlext.py``) but plans per-probe-row lookups; the scale
  path is ``operators.asof.asof_join`` (single-shuffle window plan).

Macros are expanded with a real tokenizer-free regex on a restricted
grammar (identifiers only — no expressions in the macro head); anything
that doesn't match is left untouched for Spark to parse, so the layer
can never change the meaning of standard SQL.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_LATEST_BY = re.compile(
    r"LATEST_BY\s*\(\s*"
    r"(?P<tbl>[A-Za-z_][\w.]*)\s+"
    r"BY\s+(?P<keys>[A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s+"
    r"ORDER\s+BY\s+(?P<ord>[A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*"
    r"\)",
    re.IGNORECASE,
)


def _split_literals(query: str) -> list[tuple[bool, str]]:
    """Split SQL text into (is_literal, chunk) spans. Literal spans are
    single-quoted strings (with '' escapes), double-quoted and
    backquoted identifiers — macro expansion must never rewrite their
    contents, or the layer would change the meaning of standard SQL."""
    spans: list[tuple[bool, str]] = []
    i, start = 0, 0
    n = len(query)
    while i < n:
        ch = query[i]
        if ch in ("'", '"', "`"):
            if start < i:
                spans.append((False, query[start:i]))
            j = i + 1
            while j < n:
                if query[j] == ch:
                    if ch == "'" and j + 1 < n and query[j + 1] == "'":
                        j += 2  # '' escape inside a string literal
                        continue
                    break
                j += 1
            j = min(j + 1, n)
            spans.append((True, query[i:j]))
            i = start = j
        else:
            i += 1
    if start < n:
        spans.append((False, query[start:]))
    return spans


def expand_macros(query: str) -> str:
    """Expand the engine's SQL macros; standard SQL passes through."""

    def _latest_by(m: re.Match) -> str:
        keys = ", ".join(k.strip() for k in m.group("keys").split(","))
        ord_cols = [c.strip() for c in m.group("ord").split(",")]
        desc = ", ".join(f"{c} DESC" for c in ord_cols)
        return (
            "(SELECT * EXCEPT (__fjs_rn) FROM "
            f"(SELECT *, ROW_NUMBER() OVER (PARTITION BY {keys} "
            f"ORDER BY {desc}) AS __fjs_rn FROM {m.group('tbl')}) "
            "WHERE __fjs_rn = 1)"
        )

    return "".join(
        chunk if is_lit else _LATEST_BY.sub(_latest_by, chunk)
        for is_lit, chunk in _split_literals(query)
    )


def sql(spark: SparkSession, query: str) -> DataFrame:
    """``spark.sql`` with the engine's macros expanded first."""
    return spark.sql(expand_macros(query))
