"""The driver-window re-windowing contract (queries/fingerprints.py):
a green query whose implementation changed since its last green driver
row must sort back into the first-50 window."""

import hashlib

from wren_engine_spark.queries import fingerprints as fp


def _mods():
    return {
        "wren_engine_spark.queries.qq": "/x/qq.py",
        "wren_engine_spark.operators.op": "/x/op.py",
        "wren_engine_spark.operators.other": "/x/other.py",
        "wren_engine_spark.queries.registry": "/x/registry.py",
        "wren_engine_spark.queries.io": "/x/io.py",
    }


def _reader(srcs):
    return lambda m: srcs.get(m)


class TestDepClosure:
    def test_transitive_imports_resolved(self):
        srcs = {
            "wren_engine_spark.queries.qq": (
                "from wren_engine_spark.operators import op\n"
                "from wren_engine_spark.queries.io import load_tables\n"
                "from wren_engine_spark.queries.registry import register\n"
            ),
            "wren_engine_spark.operators.op": "import wren_engine_spark.operators.other\n",
            "wren_engine_spark.operators.other": "x = 1\n",
            "wren_engine_spark.queries.registry": (
                "from wren_engine_spark.queries.io import load_tables\n"
            ),
            "wren_engine_spark.queries.io": "y = 2\n",
        }
        got = fp.dep_closure(
            "wren_engine_spark.queries.qq", _reader(srcs), _mods()
        )
        # transitive through op; registry is EXCLUDED entirely (neither
        # hashed nor traversed — its imports would drag every query
        # module into every closure); io enters via the direct import
        assert got == set(_mods()) - fp.EXCLUDE

    def test_aliased_and_parenthesized_imports_resolved(self):
        """Aliased (`import x as y`) and parenthesized multi-line
        imports must enter the closure — llmops4 imports operators.dedup
        ONLY via `as dd`/`as _dedup` aliases, and a dropped dep would
        let a dedup rewrite coast on stale green rows."""
        srcs = {
            "wren_engine_spark.queries.qq": (
                "from wren_engine_spark.operators import op as _o\n"
                "from wren_engine_spark.operators import (\n"
                "    other,\n"
                ")\n"
            ),
            "wren_engine_spark.operators.op": "x = 1\n",
            "wren_engine_spark.operators.other": "y = 2\n",
        }
        got = fp.dep_closure("wren_engine_spark.queries.qq", _reader(srcs), _mods())
        assert "wren_engine_spark.operators.op" in got
        assert "wren_engine_spark.operators.other" in got

    def test_real_llmops4_closure_includes_aliased_dedup_import(self):
        mods = fp.module_files()
        read = fp.disk_reader(mods)
        deps = fp._direct_deps(read("wren_engine_spark.queries.llmops4"), mods)
        assert "wren_engine_spark.operators.dedup" in deps

    def test_non_package_imports_ignored(self):
        srcs = {"wren_engine_spark.queries.qq": "import os\nfrom pyspark.sql import functions\n"}
        got = fp.dep_closure("wren_engine_spark.queries.qq", _reader(srcs), _mods())
        assert got == {"wren_engine_spark.queries.qq"}


class TestFingerprint:
    def test_operator_edit_changes_fingerprint_registry_edit_does_not(self):
        srcs = {
            "wren_engine_spark.queries.qq": (
                "from wren_engine_spark.operators import op\n"
                "from wren_engine_spark.queries.registry import register\n"
            ),
            "wren_engine_spark.operators.op": "def f():\n    return 1\n",
            "wren_engine_spark.queries.registry": "REG = {}\n",
        }
        base = fp.fingerprint("wren_engine_spark.queries.qq", _reader(srcs), _mods())
        # editing a hashed dependency flips the fingerprint
        edited = dict(srcs)
        edited["wren_engine_spark.operators.op"] = "def f():\n    return 2\n"
        assert fp.fingerprint(
            "wren_engine_spark.queries.qq", _reader(edited), _mods()
        ) != base
        # editing the excluded registry bookkeeping does not
        reordered = dict(srcs)
        reordered["wren_engine_spark.queries.registry"] = "REG = {}\n# new ordering\n"
        assert fp.fingerprint(
            "wren_engine_spark.queries.qq", _reader(reordered), _mods()
        ) == base


class TestSymbolGranularity:
    """Round-6 refinement (r5 verdict item 4): touching one operator
    re-windows only the queries that call it — an edit to
    containment_pairs must not expire the TPC-H corpus."""

    def _specs_and_current(self):
        from wren_engine_spark.queries.registry import QUERIES

        specs = {n: (f.__module__, f.__name__) for n, f in QUERIES.items()}
        return specs, fp.current_fingerprints(specs)

    def _blast(self, mod: str, func: str):
        """Fingerprint diff after inserting a comment as the first body
        line of ``func`` in ``mod`` (parse-safe, segment-only edit)."""
        import ast

        specs, cur = self._specs_and_current()
        mods = fp.module_files()
        base_read = fp.disk_reader(mods)
        src = base_read(mod)
        tree = ast.parse(src)
        node = next(
            n for n in ast.walk(tree)
            if isinstance(n, ast.FunctionDef) and n.name == func
        )
        lines = src.splitlines(keepends=True)
        at = node.body[0].lineno - 1
        indent = lines[at][: len(lines[at]) - len(lines[at].lstrip())]
        patched = "".join(lines[:at] + [indent + "# tweak\n"] + lines[at:])
        ast.parse(patched)

        def read2(m):
            return patched if m == mod else base_read(m)

        graph = fp._SymbolGraph(read2, mods)
        cur2 = {
            n: fp.fingerprint_fn(s[0], s[1], read2, mods, graph)
            for n, s in specs.items()
        }
        return sorted(n for n in cur if cur[n] != cur2[n])

    def test_operator_edit_rewindows_only_callers(self):
        changed = self._blast(
            "wren_engine_spark.operators.dedup", "containment_pairs"
        )
        assert changed == ["x67_containment_pairs"]

    def test_shared_operator_edit_rewindows_all_callers(self):
        changed = self._blast(
            "wren_engine_spark.operators.dedup", "jaccard_pairs"
        )
        # every query whose pipeline goes through jaccard_pairs — and
        # nothing else (no TPC-H, no text/similarity queries)
        assert "x3_ngram_jaccard_pairs" in changed
        assert "x47_jaccard_pairs_skewproof" in changed
        assert "x64_leakage_safe_split" in changed  # split reuses dedup
        assert not any(n.startswith("q") for n in changed)
        assert "x6_token_stats" not in changed

    def test_query_edit_rewindows_only_itself(self):
        assert self._blast(
            "wren_engine_spark.queries.tpch", "q1"
        ) == ["q1_pricing_summary"]

    def test_unparsable_module_falls_back_to_whole_module(self):
        """Broken source (e.g. reading a historical rev mid-refactor)
        must go COARSE, not silent: every query touching the module
        re-windows."""
        specs, cur = self._specs_and_current()
        mods = fp.module_files()
        base_read = fp.disk_reader(mods)
        ded = "wren_engine_spark.operators.dedup"
        patched = base_read(ded) + "\ndef broken(:\n"

        def read2(m):
            return patched if m == ded else base_read(m)

        graph = fp._SymbolGraph(read2, mods)
        cur2 = {
            n: fp.fingerprint_fn(s[0], s[1], read2, mods, graph)
            for n, s in specs.items()
        }
        changed = {n for n in cur if cur[n] != cur2[n]}
        assert {"x1_exact_dedup", "x3_ngram_jaccard_pairs",
                "x67_containment_pairs"} <= changed
        assert "q1_pricing_summary" not in changed  # tpch never touches dedup


class TestSymbolResolution:
    """Unit tests for the granular reference resolver on fake modules."""

    MODS = {
        "wren_engine_spark.queries.qq": "/x/qq.py",
        "wren_engine_spark.operators.op": "/x/op.py",
        "wren_engine_spark.operators.other": "/x/other.py",
        "wren_engine_spark.operators": "/x/op_init.py",
    }

    def _fps(self, srcs):
        read = lambda m: srcs.get(m)  # noqa: E731
        g = fp._SymbolGraph(read, self.MODS)
        return fp.fingerprint_fn(
            "wren_engine_spark.queries.qq", "myq", read, self.MODS, g
        )

    BASE = {
        "wren_engine_spark.queries.qq": (
            "from wren_engine_spark.operators import op\n"
            "def myq():\n    return op.f()\n"
            "def other_query():\n    return op.g()\n"
        ),
        "wren_engine_spark.operators.op": (
            "def helper():\n    return 1\n"
            "def f():\n    return helper()\n"
            "def g():\n    return 2\n"
        ),
        "wren_engine_spark.operators": "",
        "wren_engine_spark.operators.other": "",
    }

    def test_called_symbol_and_transitive_helper_are_hashed(self):
        base = self._fps(self.BASE)
        for target in ("def f():", "def helper():"):
            edited = dict(self.BASE)
            edited["wren_engine_spark.operators.op"] = self.BASE[
                "wren_engine_spark.operators.op"
            ].replace(target, target + "\n    # c")
            assert self._fps(edited) != base, target

    def test_uncalled_symbol_edit_is_invisible(self):
        base = self._fps(self.BASE)
        edited = dict(self.BASE)
        edited["wren_engine_spark.operators.op"] = self.BASE[
            "wren_engine_spark.operators.op"
        ].replace("def g():", "def g():\n    # c")
        assert self._fps(edited) == base

    def test_sibling_query_edit_is_invisible(self):
        base = self._fps(self.BASE)
        edited = dict(self.BASE)
        edited["wren_engine_spark.queries.qq"] = self.BASE[
            "wren_engine_spark.queries.qq"
        ].replace("def other_query():", "def other_query():\n    # c")
        assert self._fps(edited) == base

    def test_residual_edit_rewindows_module_queries(self):
        """Top-level non-symbol statements (conditional imports, side
        effects) are hashed into EVERY fingerprint of that module."""
        base = self._fps(self.BASE)
        edited = dict(self.BASE)
        edited["wren_engine_spark.operators.op"] += (
            "\ntry:\n    import os\nexcept ImportError:\n    pass\n"
        )
        assert self._fps(edited) != base

    def test_bare_module_use_falls_back_to_whole_module(self):
        srcs = dict(self.BASE)
        srcs["wren_engine_spark.queries.qq"] = (
            "from wren_engine_spark.operators import op\n"
            "def myq():\n    return run(op)\n"  # module object passed around
        )
        base = self._fps(srcs)
        edited = dict(srcs)
        edited["wren_engine_spark.operators.op"] = srcs[
            "wren_engine_spark.operators.op"
        ].replace("def g():", "def g():\n    # c")
        assert self._fps(edited) != base  # ANY op edit re-windows

    def test_star_import_falls_back_to_whole_module(self):
        srcs = dict(self.BASE)
        srcs["wren_engine_spark.queries.qq"] = (
            "from wren_engine_spark.operators.op import *\n"
            "def myq():\n    return f()\n"
        )
        base = self._fps(srcs)
        edited = dict(srcs)
        edited["wren_engine_spark.operators.op"] = srcs[
            "wren_engine_spark.operators.op"
        ].replace("def g():", "def g():\n    # c")
        assert self._fps(edited) != base

    def test_reexport_through_init_resolves(self):
        srcs = dict(self.BASE)
        srcs["wren_engine_spark.operators"] = (
            "from wren_engine_spark.operators.op import f\n"
        )
        srcs["wren_engine_spark.queries.qq"] = (
            "from wren_engine_spark.operators import f\n"
            "def myq():\n    return f()\n"
        )
        base = self._fps(srcs)
        edited = dict(srcs)
        edited["wren_engine_spark.operators.op"] = srcs[
            "wren_engine_spark.operators.op"
        ].replace("def f():", "def f():\n    # c")
        assert self._fps(edited) != base

    def test_decorator_oracle_change_rewindows_query(self):
        srcs = dict(self.BASE)
        srcs["wren_engine_spark.queries.qq"] = (
            "def register(sql):\n    return lambda f: f\n"
            "@register('SELECT 1')\ndef myq():\n    return 1\n"
        )
        base = self._fps(srcs)
        edited = dict(srcs)
        edited["wren_engine_spark.queries.qq"] = srcs[
            "wren_engine_spark.queries.qq"
        ].replace("SELECT 1", "SELECT 2")
        assert self._fps(edited) != base


class TestRealRegistry:
    def test_every_query_has_a_current_fingerprint(self):
        from wren_engine_spark.queries.registry import QUERIES

        cur = fp.current_fingerprints(
            {n: (f.__module__, f.__name__) for n, f in QUERIES.items()}
        )
        assert set(cur) == set(QUERIES)
        assert all(len(v) == 64 for v in cur.values())
        # symbol granularity: queries in one module no longer share
        assert len(set(cur.values())) == len(cur)

    def test_closure_of_a_query_module_includes_its_operators(self):
        mods = fp.module_files()
        read = fp.disk_reader(mods)
        got = fp.dep_closure("wren_engine_spark.queries.llmops", read, mods)
        assert "wren_engine_spark.operators.dedup" in got
        assert "wren_engine_spark.queries.io" in got  # via registry re-export

    def test_changed_queries_sort_into_window_front(self):
        """The registered order must put never-green and
        changed-since-record queries before stable greens."""
        from wren_engine_spark.queries.registry import (
            QUERIES,
            _previously_verified,
        )

        green = _previously_verified()
        changed = fp.changed_since_record(
            {n: (f.__module__, f.__name__) for n, f in QUERIES.items()}
        )
        names = list(QUERIES)
        front = {n for n in names if n not in green or n in changed}
        if front:
            boundary = max(names.index(n) for n in front)
            assert boundary < len(front), (
                "a never-green or rewritten query sorted behind a stable green"
            )


class TestBatchModuleBlastRadius:
    """Working-tree proof that adding a batch module (llmops8) cannot
    re-window stable queries: a mutation in llmops8 is invisible to
    q1's fingerprint; a new top-level symbol is invisible even to
    llmops8's own queries; editing one query's def re-windows only
    that query."""

    def _tools(self):
        mods = fp.module_files()
        return mods, fp.disk_reader(mods)

    def test_new_symbol_in_batch_module_is_invisible(self):
        mods, read = self._tools()

        def mutated(m):
            src = read(m)
            if m == "wren_engine_spark.queries.llmops8" and src is not None:
                src += "\nZZ_NEW_HELPER = 1\n"
            return src

        for mod, fn in (
            ("wren_engine_spark.queries.tpch", "q1"),
            ("wren_engine_spark.queries.llmops8", "x98"),
        ):
            assert fp.fingerprint_fn(mod, fn, read, mods) == fp.fingerprint_fn(
                mod, fn, mutated, mods
            ), (mod, fn)

    def test_editing_one_query_def_rewindows_only_it(self):
        mods, read = self._tools()
        base = read("wren_engine_spark.queries.llmops8")
        assert base is not None and "def x98(" in base

        def mutated(m):
            src = read(m)
            if m == "wren_engine_spark.queries.llmops8":
                src = src.replace("def x98(", "def x98(  # touched\n")
            return src

        m8 = "wren_engine_spark.queries.llmops8"
        assert fp.fingerprint_fn(m8, "x98", read, mods) != fp.fingerprint_fn(
            m8, "x98", mutated, mods
        )
        for other in ("x95", "x96", "x97", "m8", "m9", "x93"):
            assert fp.fingerprint_fn(m8, other, read, mods) == fp.fingerprint_fn(
                m8, other, mutated, mods
            ), other
        assert fp.fingerprint_fn(
            "wren_engine_spark.queries.tpch", "q1", read, mods
        ) == fp.fingerprint_fn("wren_engine_spark.queries.tpch", "q1", mutated, mods)
