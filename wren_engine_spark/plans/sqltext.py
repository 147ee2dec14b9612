"""Quote-aware SQL text utilities.

The semantic layer rewrites identifiers in raw SQL text (namespace
stripping, double-quote -> backtick, model-name matching). Doing that
with bare regexes silently corrupts single-quoted string literals
(``'he said "hi"'`` must never become ``'he said `hi`'``). The helpers
here tokenize the literal spans first — honoring the ANSI ``''`` escape,
which is what both Spark's default parser and DuckDB use — and apply
rewrites only to the non-literal segments.

Reference parity: wren-core parses SQL with a real parser (sqlparser-rs)
so literals are naturally opaque there; this module is the lightweight
text-level equivalent (sqlglot is not available in this environment).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterable

_BARE_IDENT = re.compile(r'`((?:[^`]|``)+)`|"((?:[^"]|"")+)"|([A-Za-z_][A-Za-z0-9_]*)')
_LINE_COMMENT_TAIL = re.compile(r"(--[^\n]*|\s)+$")


def split_literals(sql: str) -> list[tuple[str, bool]]:
    """Split SQL into ``(text, is_literal)`` segments where literals are
    single-quoted strings with ``''`` escapes. An unterminated literal
    extends to the end of the string (matching how a parser would error
    anyway — we must not rewrite inside it)."""
    out: list[tuple[str, bool]] = []
    i, last, n = 0, 0, len(sql)
    while i < n:
        if sql[i] == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            end = min(j + 1, n)
            if last < i:
                out.append((sql[last:i], False))
            out.append((sql[i:end], True))
            i = last = end
        else:
            i += 1
    if last < n:
        out.append((sql[last:], False))
    return out


def rewrite_outside_literals(sql: str, fn: Callable[[str], str]) -> str:
    """Apply ``fn`` to every non-literal segment, passing literal
    segments through untouched."""
    return "".join(seg if lit else fn(seg) for seg, lit in split_literals(sql))


def identifiers(sql: str) -> set[str]:
    """Lower-cased identifier tokens appearing OUTSIDE string literals:
    bare identifiers, backtick-quoted, and double-quoted. Used for
    calculated-field pruning, view dependency ordering, and
    PermissionAnalyze — a name occurring only inside a string literal is
    not an identifier reference."""
    found: set[str] = set()
    for seg, lit in split_literals(sql):
        if lit:
            continue
        for m in _BARE_IDENT.finditer(seg):
            if m.group(1) is not None:
                found.add(m.group(1).replace("``", "`").lower())
            elif m.group(2) is not None:
                found.add(m.group(2).replace('""', '"').lower())
            else:
                found.add(m.group(3).lower())
    return found


def references_identifier(sql: str, name: str) -> bool:
    """True when ``name`` appears as an identifier token (not inside a
    string literal) in ``sql``."""
    return name.lower() in identifiers(sql)


def strip_trailing_comments(sql: str) -> str:
    """Drop trailing whitespace and trailing ``--`` line comments (so a
    textual suffix append cannot be swallowed by a comment). Only
    comments outside string literals are considered; iterates so stacked
    trailing comment lines are all removed."""
    while True:
        sql = sql.rstrip()
        segs = split_literals(sql)
        if segs and not segs[-1][1]:
            tail = segs[-1][0]
            m = re.search(r"--[^\n]*$", tail)
            if m:
                sql = sql[: len(sql) - (len(tail) - m.start())]
                continue
        return sql


def iter_nonliteral(sql: str) -> Iterable[str]:
    for seg, lit in split_literals(sql):
        if not lit:
            yield seg
