"""Shared tokenization constants used by BOTH the Spark operators and
the DuckDB oracle SQL.

Java regex ``\\s`` is ``[ \\t\\n\\x0B\\f\\r]`` but RE2 (DuckDB) ``\\s``
omits vertical tab ``\\x0B`` — a document containing U+000B would
tokenize differently in the two engines and break the bit-exact
signature/pair oracles (x42/x43/x44). Spelling the class out keeps one
whitespace definition everywhere; the spelled form is valid and
identical in Java regex, RE2, and Spark SQL string literals.
"""

# One portable class, usable verbatim on both engines.
WS_RE = r"[ \t\n\x0B\f\r]+"

# The same class for embedding inside single-quoted SQL regex literals
# (DuckDB string_split_regex / regexp_extract_all).
SQL_WS_RE = r"[ \t\n\x0B\f\r]+"
