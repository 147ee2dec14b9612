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


class TestRealRegistry:
    def test_every_query_has_a_current_fingerprint(self):
        from wren_engine_spark.queries.registry import QUERIES

        cur = fp.current_fingerprints(
            {n: f.__module__ for n, f in QUERIES.items()}
        )
        assert set(cur) == set(QUERIES)
        assert all(len(v) == 64 for v in cur.values())

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
            {n: f.__module__ for n, f in QUERIES.items()}
        )
        names = list(QUERIES)
        front = {n for n in names if n not in green or n in changed}
        if front:
            boundary = max(names.index(n) for n in front)
            assert boundary < len(front), (
                "a never-green or rewritten query sorted behind a stable green"
            )
