"""Record per-query implementation fingerprints at their last green row.

Run at ROUND START, before making any changes, with the git revision
whose code the driver just tested (default: HEAD — correct when run
first thing in a round, since the driver's CORRECTNESS file is
committed on top of the round's final source without modifying it):

    python tools/update_query_fingerprints.py [rev]

Updates QUERY_FINGERPRINTS.json:
  - every query with a green row in the NEWEST CORRECTNESS_r*.json
    gets its fingerprint recomputed from ``rev`` (its green row tested
    exactly that code);
  - queries green only in OLDER rounds keep their existing record
    (their last-tested code may predate ``rev``); a MISSING record
    stays missing — the query keeps sorting into the driver window
    until it earns a fresh green row (pass ``--bootstrap`` only for a
    from-scratch initialization);
  - queries with no green row anywhere get no record (they sort into
    the window regardless);
  - ``--stale=name,...`` drops records so those queries re-window.

ROUND START ONLY: running mid-round would re-record the latest round's
greens against code they were never tested on.

The registry's _rotate_verified_to_back() then re-windows any green
query whose working-tree fingerprint deviates from the record.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def green_names(path: str) -> set[str]:
    try:
        with open(path) as f:
            rows = json.load(f)
    except Exception:
        return set()
    out = set()
    for name, r in rows.items():
        if not isinstance(r, dict):
            continue
        if (
            r.get("err") in (None, "rows_only")
            and r.get("rows_match") is True
            and r.get("schema_match") is not False
            and r.get("hash_match") is not False
        ):
            out.add(name)
    return out


def git_reader(rev: str, mods: dict[str, str]):
    cache: dict[str, str | None] = {}

    def read(mod: str) -> str | None:
        if mod in cache:
            return cache[mod]
        path = mods.get(mod)
        src = None
        if path is not None:
            rel = os.path.relpath(path, REPO)
            p = subprocess.run(
                ["git", "-C", REPO, "show", f"{rev}:{rel}"],
                capture_output=True,
                text=True,
            )
            if p.returncode == 0:
                src = p.stdout
        cache[mod] = src
        return src

    return read


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    force_stale: set[str] = set()
    for a in sys.argv[1:]:
        # --stale=x3_ngram_jaccard_pairs,... : drop these records so the
        # queries sort into the next driver window regardless (used at
        # the round-5 bootstrap for implementations the round-4 verdict
        # flagged as coasting on stale greens)
        if a.startswith("--stale="):
            force_stale |= set(a[len("--stale="):].split(","))
    rev = args[0] if args else "HEAD"

    from wren_engine_spark.queries import fingerprints as fp
    from wren_engine_spark.queries.registry import QUERIES

    corr_files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    latest = green_names(corr_files[-1]) if corr_files else set()
    union = set()
    for p in corr_files:
        union |= green_names(p)

    mods = fp.module_files()
    # rev 'WORKTREE' reads the working tree (bootstrap across file
    # moves, where old revisions lack current module paths)
    read = fp.disk_reader(mods) if rev == "WORKTREE" else git_reader(rev, mods)
    memo: dict[tuple[str, str], str] = {}
    graph = fp._SymbolGraph(read, mods)

    def fp_of(fn) -> str:
        key = (fn.__module__, fn.__name__)
        if key not in memo:
            memo[key] = fp.fingerprint_fn(key[0], key[1], read, mods, graph)
        return memo[key]

    record = fp.recorded_fingerprints()
    # bootstrap (recording union-green queries that have no record) is
    # OPT-IN: after the round-5 initialization, a missing record means
    # the query was deliberately staled — its last green row predates a
    # behavior change — and it must KEEP sorting into the driver window
    # until it earns a fresh green row. Only --bootstrap overrides.
    do_bootstrap = "--bootstrap" in sys.argv
    # --migrate: recompute EVERY recorded fingerprint under the current
    # algorithm from ``rev``. ONLY valid when the worktree source of all
    # recorded queries equals their last-green tested code (true at the
    # round-6 switch to symbol-granular fingerprints: every record
    # matched its module-closure fingerprint at HEAD, so the code is
    # byte-identical to what the driver tested).
    do_migrate = "--migrate" in sys.argv
    updated, bootstrapped = 0, 0
    for name, fn in QUERIES.items():
        if name in latest or (do_migrate and name in record):
            record[name] = fp_of(fn)
            updated += 1
        elif do_bootstrap and name in union and name not in record:
            record[name] = fp_of(fn)
            bootstrapped += 1
    # drop records for queries that no longer exist
    record = {k: v for k, v in record.items() if k in QUERIES}
    for name in force_stale:
        record.pop(name, None)

    with open(fp.RECORD_PATH, "w") as f:
        json.dump(dict(sorted(record.items())), f, indent=1)
        f.write("\n")
    print(
        f"recorded {len(record)} fingerprints from {rev} "
        f"({updated} from latest round, {bootstrapped} bootstrapped)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
