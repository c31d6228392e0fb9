"""Grok pattern compiler: grok syntax -> a single JVM regex.

The reference implements grok in a Rust Polars plugin
(expansions/polars/modules/ty-tableframe/src/tableframe/features/grok/engine/
functions.rs:14-61) and exposes it via TableFrame.grok (frame.py:2679-2782)
and Expr.str.grok (string.py:1122).  Contract: one new column per named
capture, cast to the user's dtype, null on non-match.

This is an independent implementation of the *public* grok idea
(%{SYNTAX:name:type} macro-expansion over a base pattern dictionary, as in
Logstash's publicly documented grok): patterns expand recursively to plain
java regex, captures become numbered groups, and extraction compiles to one
`rlike` guard + N `regexp_extract` calls — all JVM-side, fully vectorized,
no Python in the data path.
"""

from __future__ import annotations

import re as _re
from typing import Any, Sequence

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column

# Base dictionary (subset of the publicly documented grok core patterns,
# rewritten with non-capturing groups only so capture indices stay ours).
BASE_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?[0-9]+",
    "POSINT": r"\b[1-9][0-9]*\b",
    "NONNEGINT": r"\b[0-9]+\b",
    "BASE10NUM": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)",
    "NUMBER": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "EMAILADDRESS": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4": r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "IP": r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "YEAR": r"(?:\d\d){1,2}",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:0[1-9]|[12][0-9]|3[01]|[1-9])",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"[0-5][0-9]",
    "SECOND": r"(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?",
    "TIME": r"(?:2[0123]|[01]?[0-9]):[0-5][0-9](?::(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)?",
    "DATE_EU": r"(?:0[1-9]|[12][0-9]|3[01]|[1-9])[./-](?:0?[1-9]|1[0-2])[./-](?:\d\d){1,2}",
    "DATE_US": r"(?:0?[1-9]|1[0-2])[/-](?:0[1-9]|[12][0-9]|3[01]|[1-9])[/-](?:\d\d){1,2}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-](?:2[0123]|[01]?[0-9])(?::?[0-5][0-9]))",
    "TIMESTAMP_ISO8601": (
        r"(?:\d\d){1,2}-(?:0?[1-9]|1[0-2])-(?:0[1-9]|[12][0-9]|3[01]|[1-9])"
        r"[T ](?:2[0123]|[01]?[0-9]):?[0-5][0-9](?::?(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)?"
        r"(?:Z|[+-](?:2[0123]|[01]?[0-9])(?::?[0-5][0-9]))?"
    ),
    "LOGLEVEL": (
        r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|"
        r"[Ii]nfo(?:rmation)?|INFO(?:RMATION)?|[Ww]arn(?:ing)?|WARN(?:ING)?|"
        r"[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|"
        r"FATAL|[Ss]evere|SEVERE|[Ee]merg(?:ency)?|EMERG(?:ENCY)?)"
    ),
    "QUOTEDSTRING": r"(?:\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*')",
    "QS": r"(?:\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*')",
    "PATH": r"(?:/[^\s]*)+",
    "LOGLINE_PRIO": r"<[0-9]+>",
}

_GROK_TOKEN = _re.compile(r"%\{(\w+)(?::([\w.\[\]]+))?(?::(\w+))?\}")

_TYPE_MAP = {
    "int": T.LongType(),
    "long": T.LongType(),
    "float": T.DoubleType(),
    "double": T.DoubleType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
}


def compile_grok(pattern: str, extra_patterns: dict[str, str] | None = None
                 ) -> tuple[str, list[tuple[str, T.DataType]]]:
    """Expand a grok pattern into (java_regex, [(field, dtype)]).

    Named captures %{SYNTAX:field[:type]} become numbered groups in order of
    appearance; unnamed %{SYNTAX} expand without capturing."""
    library = {**BASE_PATTERNS, **(extra_patterns or {})}
    captures: list[tuple[str, T.DataType]] = []

    def expand(pat: str, depth: int = 0) -> str:
        if depth > 20:
            raise ValueError("grok pattern recursion too deep")

        def repl(m: _re.Match) -> str:
            syntax, field, typ = m.group(1), m.group(2), m.group(3)
            if syntax not in library:
                raise ValueError(f"unknown grok pattern %{{{syntax}}}")
            body = expand(library[syntax], depth + 1)
            if field:
                captures.append((field, _TYPE_MAP.get(typ or "", T.StringType())))
                return f"({body})"
            return f"(?:{body})"

        return _GROK_TOKEN.sub(repl, pat)

    regex = expand(pattern)
    return regex, captures


def grok_columns(col: Column, pattern: str,
                 schema: Sequence[Any] | None = None) -> list[tuple[str, Column]]:
    """One (name, extracted Column) per capture; null on non-match."""
    regex, captures = compile_grok(pattern)
    # user-supplied schema (list of functions.Column descriptors) overrides
    overrides: dict[str, T.DataType] = {}
    if schema:
        for c in schema:
            overrides[c.name] = c.dtype
    out: list[tuple[str, Column]] = []
    matched = col.rlike(regex)
    for idx, (field, dtype) in enumerate(captures, start=1):
        target = overrides.get(field, dtype)
        extracted = F.when(matched, F.regexp_extract(col, regex, idx))
        out.append((field, extracted.cast(target)))
    return out


def grok_to_struct(col: Column, pattern: str) -> Column:
    parts = grok_columns(col, pattern)
    return F.struct(*[c.alias(n) for n, c in parts])


def apply_grok(frame, column: str, pattern: str,
               schema: Sequence[Any] | None = None):
    """TableFrame.grok (frame.py:2679-2782): append one column per capture."""
    from .expr import Expr

    parts = grok_columns(F.col(f"`{column}`"), pattern, schema)
    named = {n: Expr(c) for n, c in parts}
    return frame.with_columns(**named)
