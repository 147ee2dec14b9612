"""Unit tests for the quote-aware SQL text helpers (no Spark needed)."""

from wren_engine_spark.plans.sqltext import (
    identifiers,
    rewrite_outside_literals,
    split_literals,
    strip_trailing_comments,
)


class TestSplitLiterals:
    def test_plain(self):
        assert split_literals("SELECT 1") == [("SELECT 1", False)]

    def test_single_literal(self):
        assert split_literals("a 'b' c") == [("a ", False), ("'b'", True), (" c", False)]

    def test_escaped_quote(self):
        # '' is an escaped quote INSIDE one literal
        segs = split_literals("x = 'it''s' AND y")
        assert segs == [("x = ", False), ("'it''s'", True), (" AND y", False)]

    def test_adjacent_literals(self):
        segs = split_literals("'a' 'b'")
        assert [s for s, lit in segs if lit] == ["'a'", "'b'"]

    def test_unterminated_literal(self):
        segs = split_literals("a 'oops")
        assert segs == [("a ", False), ("'oops", True)]

    def test_roundtrip(self):
        sql = "SELECT 'he said \"hi\"', x FROM t WHERE s = 'don''t'"
        assert "".join(s for s, _ in split_literals(sql)) == sql


class TestRewriteOutsideLiterals:
    def test_literal_content_untouched(self):
        import re

        out = rewrite_outside_literals(
            'SELECT "col" FROM t WHERE note = \'he said "hi"\'',
            lambda s: re.sub(r'"([^"]+)"', r"`\1`", s),
        )
        assert out == 'SELECT `col` FROM t WHERE note = \'he said "hi"\''


class TestIdentifiers:
    def test_literals_excluded(self):
        ids = identifiers("SELECT a FROM t WHERE note = 'secret_col'")
        assert "a" in ids and "t" in ids and "secret_col" not in ids

    def test_quoted_forms(self):
        ids = identifiers('SELECT `Sp aced`, "Quo ted" FROM t')
        assert "sp aced" in ids and "quo ted" in ids

    def test_case_folded(self):
        assert "total" in identifiers("SELECT Total FROM m")


class TestStripTrailingComments:
    def test_plain_untouched(self):
        assert strip_trailing_comments("SELECT 1") == "SELECT 1"

    def test_trailing_line_comment(self):
        assert strip_trailing_comments("SELECT 1 -- note") == "SELECT 1"

    def test_stacked_comments(self):
        assert strip_trailing_comments("SELECT 1 -- a\n-- b") == "SELECT 1"

    def test_mid_query_comment_kept(self):
        sql = "SELECT 1 -- a\nFROM t"
        assert strip_trailing_comments(sql) == sql

    def test_dashes_in_literal_kept(self):
        sql = "SELECT '--not a comment'"
        assert strip_trailing_comments(sql) == sql

    def test_semicolon_after_comment(self):
        # the ';' after the comment previously re-exposed the comment
        assert strip_trailing_comments("SELECT 1 -- note\n;") == "SELECT 1"

    def test_block_comment_tail(self):
        assert strip_trailing_comments("SELECT 1 /* note */ ") == "SELECT 1"


class TestCommentsAndEscapes:
    def test_apostrophe_in_comment_not_a_literal(self):
        # "customer's" must not open a phantom literal poisoning the rest
        sql = 'SELECT a FROM "t" -- customer\'s orders\nWHERE "t".b = 1'
        ids = identifiers(sql)
        assert {"a", "t", "b"} <= ids
        assert "orders" not in ids  # comment content is not a reference
        import re

        out = rewrite_outside_literals(
            sql, lambda s: re.sub(r'"([^"]+)"', r"`\1`", s)
        )
        assert out.endswith("WHERE `t`.b = 1")  # rewrite continues past comment

    def test_backslash_escaped_quote(self):
        # Spark's default parser honors \' inside literals
        segs = split_literals(r"SELECT 'it\'s' AS v, x")
        lits = [s for s, lit in segs if lit]
        assert lits == [r"'it\'s'"]
        assert "x" in identifiers(r"SELECT 'it\'s' AS v, x")

    def test_identifier_in_block_comment_excluded(self):
        assert "hidden" not in identifiers("SELECT a /* hidden */ FROM t")


class TestQuotedIdentifiersOpaque:
    def test_apostrophe_in_double_quoted_identifier(self):
        # the apostrophe inside "a'b" must not open a phantom literal
        import re

        sql = "SELECT \"a'b\" AS x, 'lit' FROM m"
        segs = split_literals(sql)
        assert [s for s, lit in segs if lit] == ["'lit'"]
        out = rewrite_outside_literals(
            sql, lambda s: re.sub(r'"([^"]+)"', r"`\1`", s)
        )
        assert out == "SELECT `a'b` AS x, 'lit' FROM m"

    def test_apostrophe_in_backtick_identifier(self):
        sql = "SELECT `it's` FROM m WHERE v = 'x'"
        segs = split_literals(sql)
        assert [s for s, lit in segs if lit] == ["'x'"]
        assert "it's" in identifiers(sql)

    def test_dashes_in_quoted_identifier_not_a_comment(self):
        sql = 'SELECT "we--ird", b FROM m'
        assert {"we--ird", "b", "m"} <= identifiers(sql)

    def test_doubled_quote_escape_in_identifier(self):
        sql = 'SELECT "sa""y", x FROM m'
        ids = identifiers(sql)
        assert 'sa"y' in ids and "x" in ids

    def test_roundtrip_with_quoted_identifiers(self):
        sql = "SELECT \"a'b\", `c'd`, 'e\"f' FROM t -- note's\nWHERE 1=1"
        assert "".join(s for s, _ in split_literals(sql)) == sql
