"""Per-query implementation fingerprints for the driver-window contract.

The external correctness gate checks only the FIRST 50 registered
queries per round, and earlier rounds rotated every previously-green
query to the back — which let a query REWRITTEN in-round coast on a
stale green row from its old implementation (the round-4 verdict's
item 2: x3/x44/x23 all changed in r4 but carried r1-r3 greens).

Fix: fingerprint every query as the hash of the source of its defining
module plus the transitive closure of its intra-package imports. At
round start — when HEAD is exactly the code the driver just tested —
``tools/update_query_fingerprints.py`` records the fingerprint of each
query with a green row into ``QUERY_FINGERPRINTS.json``. At driver
time, a green query whose CURRENT fingerprint no longer matches its
recorded one is treated as unverified and sorts into the first-50
window alongside never-green queries.

The closure is deliberately coarse (any edit to a module re-windows
every query that transitively imports it): over-inclusion only spends
window slots re-checking, under-inclusion would ship a silent break
under a stale green row.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

PKG = "wren_engine_spark"
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
RECORD_PATH = os.path.join(_REPO_ROOT, "QUERY_FINGERPRINTS.json")

# Registration / window-ordering bookkeeping: neither hashed NOR
# traversed. Query modules import load_tables from queries/io.py
# directly (io IS hashed — loading semantics are query behavior), so
# nothing semantic hides behind these; traversing registry would drag
# its populate-the-registry imports (every query module) into every
# closure and mark all 140+ queries changed on any single edit.
EXCLUDE = {
    f"{PKG}.queries.registry",
    f"{PKG}.queries.fingerprints",
}

# Within the changed-since-record set, these names sort FIRST into the
# driver window (the round-4 verdict's explicitly-named re-checks plus
# the queries whose behavior round 5 actually touched: dedup default
# flip, LSH budget/banding, ANN vectorization, oracle fixes). The rest
# of the changed set follows in registration order and drains across
# subsequent rounds' windows (a query with no record keeps sorting
# front until it earns a fresh green row).
RECHECK_FIRST = [
    "x3_ngram_jaccard_pairs",
    "x44_repeated_passages",
    "x23_curation_pipeline",
    "x46_repeated_passages_text",
    "x47_jaccard_pairs_skewproof",
    "x4_minhash_lsh_candidates",
    "x32_scalable_dup_clusters",
    "x62_minhash_estimate_accuracy",
    "x56_neardup_decontamination",
    "m5_scd2_history",
    "x57_weighted_sample",
    "x58_curation_end_to_end",
    "x11_lsh_ann",
    "x55_ivf_probe_portable",
    "x13_embedding_near_dup",
    "x50_semantic_dedup",
    "x9_cosine_topk",
    "x10_embedding_norms",
    "x45_quantized_cosine_topk",
    "x31_label_centroids",
    "x19_bpe_token_count",
    "x24_duplicate_clusters",
    "x30_incremental_dedup",
    "x33_bloom_incremental_dedup",
    "sem1_model_projection",
    "sem2_calc_to_one",
    "sem3_calc_to_many",
    "sem4_two_hop_calc",
    "sem5_view_over_models",
    "sem6_rls_filter",
    "sem7_semantic_join_query",
]

_IMPORT_RE = re.compile(
    rf"^[ \t]*(?:from[ \t]+({PKG}(?:\.[A-Za-z_0-9]+)*)[ \t]+import[ \t]+"
    rf"([A-Za-z_0-9*, \t]+)"
    rf"|import[ \t]+({PKG}(?:\.[A-Za-z_0-9]+)*))",
    re.MULTILINE,
)


def module_files() -> dict[str, str]:
    """Map every package module name -> absolute source path."""
    pkg_root = os.path.join(_REPO_ROOT, PKG)
    out: dict[str, str] = {}
    for dirpath, _dirs, files in os.walk(pkg_root):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            rel = os.path.relpath(path, _REPO_ROOT)
            mod = rel[:-3].replace(os.sep, ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            out[mod] = path
    return out


def _direct_deps(src: str, mods: dict[str, str]) -> set[str]:
    """Intra-package imports of a module, via ``ast`` — robust to
    parenthesized multi-line imports and ``as`` aliases, which a regex
    silently drops (and a dropped dep means a stale green row could
    survive an operator rewrite — the exact failure this module
    exists to prevent). Falls back to the regex on unparsable source
    (e.g. reading a historical revision mid-edit)."""
    import ast

    try:
        tree = ast.parse(src)
    except SyntaxError:
        return _regex_deps(src, mods)
    deps: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(PKG) and a.name in mods:
                    deps.add(a.name)
        elif isinstance(node, ast.ImportFrom) and node.module:
            base = node.module
            if not base.startswith(PKG):
                continue
            if base in mods:
                deps.add(base)
            for a in node.names:
                # `from pkg.a import b` where pkg.a.b is a module
                cand = f"{base}.{a.name}"
                if cand in mods:
                    deps.add(cand)
    return deps


def _regex_deps(src: str, mods: dict[str, str]) -> set[str]:
    deps: set[str] = set()
    for m in _IMPORT_RE.finditer(src):
        base = m.group(1) or m.group(3)
        if base in mods:
            deps.add(base)
        if m.group(1) and m.group(2):
            for name in m.group(2).split(","):
                cand = f"{base}.{name.strip().split(' ')[0]}"
                if cand in mods:
                    deps.add(cand)
    return deps


def dep_closure(
    mod: str, read, mods: dict[str, str], _memo: dict | None = None
) -> set[str]:
    """Transitive intra-package import closure of ``mod`` (inclusive).

    ``read(modname) -> str | None`` supplies source text, so the same
    walk works against the working tree or any git revision.
    """
    seen: set[str] = set()
    stack = [mod]
    while stack:
        m = stack.pop()
        if m in seen or m not in mods or m in EXCLUDE:
            continue
        seen.add(m)
        src = read(m)
        if src is None:
            continue
        stack.extend(_direct_deps(src, mods) - seen)
    return seen


def disk_reader(mods: dict[str, str]):
    def read(mod: str) -> str | None:
        path = mods.get(mod)
        if path is None or not os.path.exists(path):
            return None
        with open(path, encoding="utf-8") as f:
            return f.read()

    return read


def fingerprint(mod: str, read, mods: dict[str, str]) -> str:
    parts = []
    for m in sorted(dep_closure(mod, read, mods)):
        src = read(m)
        if src is not None:
            parts.append(m + "\x00" + hashlib.sha256(src.encode()).hexdigest())
    return hashlib.sha256("\x01".join(parts).encode()).hexdigest()


def current_fingerprints(query_modules: dict[str, str]) -> dict[str, str]:
    """name -> fingerprint from the working tree, memoized per module."""
    mods = module_files()
    read = disk_reader(mods)
    per_mod: dict[str, str] = {}
    out: dict[str, str] = {}
    for name, mod in query_modules.items():
        if mod not in per_mod:
            per_mod[mod] = fingerprint(mod, read, mods)
        out[name] = per_mod[mod]
    return out


def recorded_fingerprints() -> dict[str, str]:
    try:
        with open(RECORD_PATH, encoding="utf-8") as f:
            data = json.load(f)
    except Exception:
        return {}
    return {k: v for k, v in data.items() if isinstance(v, str)}


def changed_since_record(query_modules: dict[str, str]) -> set[str]:
    """Queries whose implementation no longer matches the fingerprint
    recorded at their last green driver row. A green query with NO
    record is also 'changed' (conservative: re-window it)."""
    rec = recorded_fingerprints()
    cur = current_fingerprints(query_modules)
    return {n for n, fp in cur.items() if rec.get(n) != fp}
