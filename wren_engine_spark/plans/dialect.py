"""Dialect rendering for dry-plan SQL text.

The reference emits dry-plan SQL in the target backend's dialect via
sqlglot transpile (ibis-server/app/mdl/rewriter.py:52-62,90-104). This
module provides the same surface: when sqlglot is importable it is used
directly; otherwise a best-effort textual renderer covers the
differences that actually matter for the CTE rewriter's output —
identifier quoting, a small function-name map, and file-scan syntax
(Spark's ``parquet.`path``` becomes DuckDB's ``read_parquet('path')``,
making the rendered text directly executable there).

All rewrites are literal-aware (sqltext tokenizer): string literal
content is never touched.
"""

from __future__ import annotations

import re

from wren_engine_spark.plans.sqltext import lex, rewrite_outside_literals

DIALECTS = (
    "spark", "duckdb", "postgres", "ansi", "trino", "snowflake", "bigquery"
)

# Spark function name -> per-dialect rename, applied to call sites.
# Only mismatches the CTE rewriter's output can contain are listed; both
# target engines accept the ANSI core (COUNT/SUM/COALESCE/CASE/...).
# Renames are restricted to functions whose ARGUMENT ORDER matches the
# source function (e.g. instr(str,sub) -> strpos(str,sub) is safe in
# postgres/trino/bigquery). Snowflake has NO instr at all and its
# charindex(sub,str) swaps the arguments, so it gets the argument-aware
# rewrite in _swap_two_arg_call instead of a plain rename.
_FUNC_MAP: dict[str, dict[str, str]] = {
    "postgres": {
        "instr": "strpos",
        "nvl": "coalesce",
        "ifnull": "coalesce",
        "try_cast": "cast",  # no TRY_CAST in postgres; best effort
    },
    "duckdb": {
        "nvl": "coalesce",
    },
    "ansi": {
        "nvl": "coalesce",
        "ifnull": "coalesce",
    },
    "trino": {
        "nvl": "coalesce",
        "ifnull": "coalesce",
        "instr": "strpos",  # trino strpos(string, substring)
    },
    # Snowflake accepts NVL/IFNULL/TRY_CAST natively; only quoting changes
    "snowflake": {},
    "bigquery": {
        "nvl": "ifnull",          # BQ has IFNULL, not NVL
        "try_cast": "safe_cast",  # BQ spelling of error-free cast
        "instr": "strpos",        # BQ strpos(value, subvalue)
    },
}

_BACKTICK_IDENT = re.compile(r"`((?:[^`]|``)+)`")
_FILE_SCAN = re.compile(r"\b(parquet|csv|json|orc)\s*\.\s*`([^`]+)`")


def _requote(seg: str) -> str:
    """Backtick identifiers -> ANSI double quotes."""
    return _BACKTICK_IDENT.sub(
        lambda m: '"' + m.group(1).replace("``", "`").replace('"', '""') + '"', seg
    )


def _file_scans(seg: str, dialect: str) -> str:
    """Spark direct-path scans -> dialect table functions (DuckDB) or a
    bare quoted path (others)."""
    if dialect == "duckdb":
        fn = {"parquet": "read_parquet", "csv": "read_csv_auto",
              "json": "read_json_auto"}

        def sub(m: re.Match) -> str:
            if m.group(1) not in fn:  # DuckDB cannot read ORC
                raise ValueError(
                    f"cannot render {m.group(1)} file scan for duckdb"
                )
            return f"{fn[m.group(1)]}('{m.group(2)}')"

        return _FILE_SCAN.sub(sub, seg)
    if dialect == "bigquery":  # BQ identifiers stay backtick-quoted
        return _FILE_SCAN.sub(lambda m: f"`{m.group(2)}`", seg)
    return _FILE_SCAN.sub(lambda m: f'"{m.group(2)}"', seg)


def _funcs(seg: str, dialect: str) -> str:
    fmap = _FUNC_MAP.get(dialect, {})
    if not fmap:
        return seg
    pat = re.compile(
        r"\b(" + "|".join(re.escape(k) for k in fmap) + r")\s*\(", re.IGNORECASE
    )
    return pat.sub(lambda m: fmap[m.group(1).lower()] + "(", seg)


_INSTR_CALL = re.compile(r"\binstr\s*\(", re.IGNORECASE)


def _swap_two_arg_call(sql: str, src: str, dst: str) -> str:
    """Rewrite ``src(a, b)`` -> ``dst(b, a)`` across the whole statement,
    literal/comment-aware and nested-paren safe. Calls whose top-level
    arity is not exactly 2 are left untouched (best-effort renderer;
    the sqlglot path handles the general case when installed)."""
    pat = re.compile(r"\b" + re.escape(src) + r"\s*\(", re.IGNORECASE)
    search_from = 0
    while True:
        # (re)build the CODE-offset mask — offsets shift after each edit
        mask = bytearray(len(sql))
        pos = 0
        for text, kind in lex(sql):
            if kind == "code":
                for k in range(pos, pos + len(text)):
                    mask[k] = 1
            pos += len(text)
        m = pat.search(sql, search_from)
        if not m:
            return sql
        if not all(mask[k] for k in range(m.start(), min(m.end(), len(sql)))):
            search_from = m.end()
            continue
        depth, commas, close = 0, [], -1
        for k in range(m.end() - 1, len(sql)):
            if not mask[k]:
                continue  # literals/comments are opaque
            c = sql[k]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    close = k
                    break
            elif c == "," and depth == 1:
                commas.append(k)
        if close == -1 or len(commas) != 1:
            search_from = m.end()
            continue
        a = sql[m.end():commas[0]].strip()
        b = sql[commas[0] + 1:close].strip()
        sql = sql[: m.start()] + f"{dst}({b}, {a})" + sql[close + 1:]
        search_from = m.start()  # re-scan: args may hold nested calls


def render(sql: str, dialect: str | None = None) -> str:
    """Render Spark-SQL dry-plan text for ``dialect``.

    ``None``/``"spark"`` returns the text unchanged. Uses sqlglot when
    installed; otherwise the textual fallback above.
    """
    if dialect is None or dialect == "spark":
        return sql
    if dialect not in DIALECTS:
        raise ValueError(f"unsupported dialect {dialect!r}; one of {DIALECTS}")
    # duckdb ALWAYS uses the textual renderer: its output is verified by
    # actually executing in DuckDB (tests), and sqlglot would transpile
    # Spark's parquet.`/path` scans into schema-qualified identifiers
    # instead of read_parquet(...), breaking that guarantee
    if dialect != "duckdb":
        try:  # full-fidelity path when the optional dependency exists
            import sqlglot

            return sqlglot.transpile(sql, read="spark", write=dialect
                                     if dialect != "ansi" else "postgres")[0]
        except ImportError:
            pass
        except Exception:  # noqa: BLE001 - sqlglot parse failure on
            pass  # Spark-specific syntax: the textual fallback still works

    def seg_fn(seg: str) -> str:
        seg = _file_scans(seg, dialect)
        if dialect != "bigquery":  # BQ already uses backtick identifiers
            seg = _requote(seg)
        return _funcs(seg, dialect)

    if dialect == "snowflake":
        # whole-statement (not per-segment) pass: argument swap needs to
        # see across literal boundaries inside the argument list
        sql = _swap_two_arg_call(sql, "instr", "charindex")
    return rewrite_outside_literals(sql, seg_fn)
