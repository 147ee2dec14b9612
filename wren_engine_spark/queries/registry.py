"""Query registry backing __spark_entry__.queries()/oracle_sql().

Each registered query is a (spark, sf_dir) -> DataFrame callable plus an
optional DuckDB-runnable ANSI-SQL oracle string. Numeric determinism
convention (so Spark and DuckDB hash-match bit-for-bit): sums of doubles
are computed as SUM(CAST(x AS DECIMAL(38,6))) — exact, order-independent
— then cast back to double; ratios divide two such exact sums. Column
names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# load_tables lives in queries/io.py (hashed by the query fingerprint);
# re-exported here because every query module imports it from the registry
from wren_engine_spark.queries.io import load_tables  # noqa: E402,F401

# importing the modules below populates the registry
from wren_engine_spark.queries import tpch  # noqa: E402,F401
from wren_engine_spark.queries import analytics  # noqa: E402,F401
from wren_engine_spark.queries import llmops  # noqa: E402,F401
from wren_engine_spark.queries import semantic  # noqa: E402,F401
from wren_engine_spark.queries import advanced  # noqa: E402,F401
from wren_engine_spark.queries import compat_fns  # noqa: E402,F401
from wren_engine_spark.queries import llmops2  # noqa: E402,F401
from wren_engine_spark.queries import llmops3  # noqa: E402,F401
from wren_engine_spark.queries import llmops4  # noqa: E402,F401
from wren_engine_spark.queries import llmops5  # noqa: E402,F401
from wren_engine_spark.queries import llmops6  # noqa: E402,F401
from wren_engine_spark.queries import llmops7  # noqa: E402,F401
from wren_engine_spark.queries import llmops8  # noqa: E402,F401
from wren_engine_spark.queries import llmops9  # noqa: E402,F401
from wren_engine_spark.queries import llmops10  # noqa: E402,F401
from wren_engine_spark.queries import llmops11  # noqa: E402,F401
from wren_engine_spark.queries import llmops12  # noqa: E402,F401
from wren_engine_spark.queries import llmops13  # noqa: E402,F401

# The external correctness harness verifies the FIRST 50 registered queries
# per round. Rotate every query that already has a passing driver row (in any
# prior round's CORRECTNESS_r*.json at the repo root) to the back, so each
# round's 50-query window covers what previous rounds did not; the union
# across rounds covers every query. A `no_oracle` row counts as unverified so
# the query is rechecked once an oracle is registered. A green row also
# expires when the query's IMPLEMENTATION changes: each query's fingerprint
# (module-source closure hash, queries/fingerprints.py) is recorded at its
# last green driver row in QUERY_FINGERPRINTS.json, and any mismatch sorts
# the query back into the first-50 window alongside never-green queries —
# a rewrite can't coast on a stale green from its old code (round-4 verdict
# item 2). Registration order carries no semantic meaning beyond this.


def _previously_verified() -> set[str]:
    import glob
    import json
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    done: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except Exception:
            continue
        for name, r in rows.items():
            if not isinstance(r, dict):
                continue
            ok = (
                r.get("err") in (None, "rows_only")
                and r.get("rows_match") is True
                and r.get("schema_match") is not False
                and r.get("hash_match") is not False
            )
            if ok:
                done.add(name)
    return done


def _rotate_verified_to_back() -> None:
    from wren_engine_spark.queries import fingerprints as _fp

    green = _previously_verified()
    try:
        changed = _fp.changed_since_record(
            {n: (fn.__module__, fn.__name__) for n, fn in QUERIES.items()}
        )
    except Exception:
        changed = set(QUERIES)  # can't tell: recheck everything
    # never-green first, then green-but-rewritten (explicit re-check
    # priorities first, then registration order), then stable greens
    prio = {n: i for i, n in enumerate(_fp.RECHECK_FIRST)}
    reg_pos = {n: i for i, n in enumerate(QUERIES)}
    order = [n for n in QUERIES if n not in green]
    rewritten = [n for n in QUERIES if n in green and n in changed]
    rewritten.sort(key=lambda n: (prio.get(n, len(prio)), reg_pos[n]))
    order += rewritten
    order += [n for n in QUERIES if n in green and n not in changed]
    for d in (QUERIES, ORACLES):
        reordered = {n: d[n] for n in order if n in d}
        d.clear()
        d.update(reordered)


_rotate_verified_to_back()
