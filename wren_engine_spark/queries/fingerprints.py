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

Granularity (round 6): module-level closures re-windowed ~100 queries
on any `operators/dedup.py` edit because query modules import whole
operator modules (round-5 verdict item 3/4: one containment-join fix
expired the TPC-H corpus). Fingerprints are now SYMBOL-granular inside
the `queries` and `operators` packages: a query's fingerprint hashes
its own def (decorators + oracle included), the top-level symbols it
transitively references in granular modules, each touched module's
residual top-level code, and — for everything outside those packages
(engine, streaming, sources, functions, …) — the old whole-module
closure. Any reference that static analysis cannot resolve (star
import, a module object used bare, an attribute that is not a
top-level symbol, unparsable source) falls back to hashing the WHOLE
target module: over-inclusion only spends window slots re-checking,
under-inclusion would ship a silent break under a stale green row.
"""

from __future__ import annotations

import ast
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
# driver window: the queries whose behavior THIS round actually
# touched (round 6: x67 rare/hot candidate split, x66 NULL semantics +
# budget guard, x4's honest recall scalar, the cube AVG components
# behind sem1-8, the similarity auto-pick fallback) ahead of the
# recordless backlog draining from round 5. The rest of the changed
# set follows in registration order across subsequent windows (a query
# with no record keeps sorting front until it earns a fresh green
# row).
RECHECK_FIRST = [
    "x67_containment_pairs",
    "x66_edit_distance_pairs",
    "x4_minhash_lsh_candidates",
    "f9_edit_distance",
    "sem8_cube_drill",
    "sem1_model_projection",
    "sem2_calc_to_one",
    "sem3_calc_to_many",
    "sem4_two_hop_calc",
    "sem5_view_over_models",
    "sem6_rls_filter",
    "sem7_semantic_join_query",
    "x11_lsh_ann",
    "x55_ivf_probe_portable",
    "x5_simhash",
    "x17_simhash_near_dup",
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
            # `from pkg.a import b` where pkg.a.b is a module depends
            # on pkg.a.b, NOT on everything pkg.a's __init__ imports —
            # the package __init__ only binds names (the granular
            # analyzer already resolves it this way; the coarse walker
            # must match, else one `from operators import layout` in a
            # streaming module makes every streaming query re-window
            # on any dedup/similarity edit). The base package is a dep
            # only when some imported name is a real symbol of it.
            non_module = False
            for a in node.names:
                cand = f"{base}.{a.name}"
                if cand in mods:
                    deps.add(cand)
                else:
                    non_module = True
            if non_module and base in mods:
                deps.add(base)
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
    cache: dict[str, str | None] = {}

    def read(mod: str) -> str | None:
        if mod in cache:
            return cache[mod]
        path = mods.get(mod)
        if path is None or not os.path.exists(path):
            cache[mod] = None
            return None
        with open(path, encoding="utf-8") as f:
            cache[mod] = f.read()
        return cache[mod]

    return read


def fingerprint(mod: str, read, mods: dict[str, str]) -> str:
    parts = []
    for m in sorted(dep_closure(mod, read, mods)):
        src = read(m)
        if src is not None:
            parts.append(m + "\x00" + hashlib.sha256(src.encode()).hexdigest())
    return hashlib.sha256("\x01".join(parts).encode()).hexdigest()


# ---------------------------------------------------------------------------
# Symbol-granular closures for the queries/ and operators/ packages
# ---------------------------------------------------------------------------

GRANULAR_ROOTS = (f"{PKG}.queries", f"{PKG}.operators")


def _is_granular(mod: str) -> bool:
    return mod in GRANULAR_ROOTS or mod.startswith(
        tuple(r + "." for r in GRANULAR_ROOTS)
    )


class _Refs(ast.NodeVisitor):
    """Collect dotted attribute chains rooted at a Name, bare Name
    loads, and import statements inside one symbol's AST."""

    def __init__(self) -> None:
        self.chains: list[list[str]] = []
        self.bare: set[str] = set()
        self.imports: list[ast.stmt] = []

    def visit_Import(self, node: ast.Import) -> None:
        self.imports.append(node)

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        self.imports.append(node)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        parts: list[str] = []
        cur: ast.AST = node
        while isinstance(cur, ast.Attribute):
            parts.append(cur.attr)
            cur = cur.value
        if isinstance(cur, ast.Name):
            self.chains.append([cur.id] + parts[::-1])
        else:
            self.visit(cur)  # e.g. call().attr — analyze the inner expr

    def visit_Name(self, node: ast.Name) -> None:
        self.bare.add(node.id)


class _ModInfo:
    __slots__ = ("symbols", "sym_nodes", "residual_hash", "residual_nodes",
                 "bindings", "stars")

    def __init__(self) -> None:
        self.symbols: dict[str, str] = {}       # name -> segment sha256
        self.sym_nodes: dict[str, list] = {}    # name -> ast nodes
        self.residual_hash: str = ""
        self.residual_nodes: list = []
        self.bindings: dict[str, tuple] = {}    # alias -> binding
        self.stars: list[str] = []              # star-imported pkg modules


def _seg(lines: list[str], node) -> str:
    start = node.lineno
    for d in getattr(node, "decorator_list", []) or []:
        start = min(start, d.lineno)
    return "".join(lines[start - 1 : node.end_lineno])


def _bind_imports(info: _ModInfo, stmts, mod: str, mods: dict[str, str],
                  bindings: dict) -> None:
    """Record alias bindings for package imports found in ``stmts``
    (recursing into top-level If/Try/With/For bodies but not defs)."""
    for node in stmts:
        if isinstance(node, ast.Import):
            for a in node.names:
                if not a.name.startswith(PKG):
                    continue
                if a.asname:
                    bindings[a.asname] = ("mod", a.name)
                else:
                    bindings[a.name.split(".")[0]] = ("root",)
        elif isinstance(node, ast.ImportFrom):
            base = node.module or ""
            if node.level:
                pkg = mod.rsplit(".", node.level)[0]
                base = f"{pkg}.{base}" if base else pkg
            if not base.startswith(PKG):
                continue
            for a in node.names:
                if a.name == "*":
                    info.stars.append(base)
                    continue
                full = f"{base}.{a.name}"
                tgt = ("mod", full) if full in mods else ("attr", base, a.name)
                bindings[a.asname or a.name] = tgt
        elif isinstance(node, (ast.If, ast.Try, ast.With, ast.For, ast.While)):
            for body in (getattr(node, "body", []), getattr(node, "orelse", []),
                         getattr(node, "finalbody", [])):
                _bind_imports(info, body, mod, mods, bindings)
            for h in getattr(node, "handlers", []):
                _bind_imports(info, h.body, mod, mods, bindings)


class _SymbolGraph:
    """Lazy per-module symbol analysis over an arbitrary source reader
    (working tree or a git revision)."""

    def __init__(self, read, mods: dict[str, str]) -> None:
        self.read = read
        self.mods = mods
        self._info: dict[str, _ModInfo | None] = {}

    def analyze(self, mod: str) -> _ModInfo | None:
        """None = source missing or unparsable -> whole-module fallback."""
        if mod in self._info:
            return self._info[mod]
        self._info[mod] = None  # cycle guard
        src = self.read(mod)
        if src is None:
            return None
        try:
            tree = ast.parse(src)
        except SyntaxError:
            return None
        lines = src.splitlines(keepends=True)
        info = _ModInfo()
        _bind_imports(info, tree.body, mod, self.mods, info.bindings)
        residual_src: list[str] = []
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                names = [node.name]
            elif isinstance(node, ast.Assign) and len(node.targets) == 1 and \
                    isinstance(node.targets[0], ast.Name):
                names = [node.targets[0].id]
            elif isinstance(node, ast.Assign) and len(node.targets) == 1 and \
                    isinstance(node.targets[0], (ast.Tuple, ast.List)) and \
                    all(isinstance(e, ast.Name)
                        for e in node.targets[0].elts):
                # tuple-unpack constants (`_K1, _B = 1.2, 0.75`): bind
                # every name to the shared segment — leaving them
                # unbound made any importer's reference resolve to the
                # WHOLE module, whose coarse closure (via a registry
                # import) is the entire repo: one tuple-assign constant
                # re-windowed its consumers on every edit anywhere
                names = [e.id for e in node.targets[0].elts]
            elif isinstance(node, ast.AnnAssign) and \
                    isinstance(node.target, ast.Name):
                names = [node.target.id]
            elif isinstance(node, (ast.Import, ast.ImportFrom)):
                continue  # behavior enters via binding resolution
            else:
                info.residual_nodes.append(node)
                residual_src.append(_seg(lines, node))
                continue
            for nm in names:
                # repeated top-level defs of one name: hash BOTH segments
                seg = info.symbols.get(nm, "") + _seg(lines, node)
                info.symbols[nm] = seg
                info.sym_nodes.setdefault(nm, []).append(node)
        # store segment hashes, not segments
        info.symbols = {
            n: hashlib.sha256(s.encode()).hexdigest()
            for n, s in info.symbols.items()
        }
        info.residual_hash = hashlib.sha256(
            "".join(residual_src).encode()
        ).hexdigest()
        self._info[mod] = info
        return info

    # -- dependency resolution ------------------------------------------

    def _descend(self, m: str, parts: list[str]) -> tuple[str, list[str]]:
        while parts and f"{m}.{parts[0]}" in self.mods:
            m = f"{m}.{parts[0]}"
            parts = parts[1:]
        return m, parts

    def _resolve_attr(self, m: str, attr: str, deps: set, depth: int = 0) -> None:
        if m in EXCLUDE or m not in self.mods or depth > 8:
            return
        if not _is_granular(m):
            deps.add(("m", m))
            return
        info = self.analyze(m)
        if info is None:
            deps.add(("m", m))
            return
        if attr in info.symbols:
            deps.add(("s", m, attr))
            return
        b = info.bindings.get(attr)
        if b is not None:
            self._resolve_binding(b, [], deps, depth + 1)
            return
        deps.add(("m", m))  # unknown attr (dynamic / residual-defined)

    def _resolve_binding(self, b: tuple, rest: list[str], deps: set,
                         depth: int = 0) -> None:
        if depth > 8:
            return
        if b == ("root",):
            m, rest = self._descend(PKG.split(".")[0], rest)
        elif b[0] == "mod":
            m, rest = self._descend(b[1], rest)
        else:  # ("attr", srcmod, name)
            _, srcmod, name = b
            self._resolve_attr(srcmod, name, deps, depth)
            return
        if m in EXCLUDE or m not in self.mods:
            return
        if not rest:
            deps.add(("m", m))  # module object used directly -> whole module
            return
        self._resolve_attr(m, rest[0], deps, depth)

    def deps_of_nodes(self, mod: str, nodes: list) -> set:
        info = self.analyze(mod)
        assert info is not None
        refs = _Refs()
        for n in nodes:
            refs.visit(n)
        bindings = dict(info.bindings)
        local = _ModInfo()
        _bind_imports(local, refs.imports, mod, self.mods, bindings)
        deps: set = set()
        for chain in refs.chains:
            base, rest = chain[0], chain[1:]
            b = bindings.get(base)
            if b is not None:
                self._resolve_binding(b, rest, deps)
            elif base in info.symbols:
                deps.add(("s", mod, base))
        for name in refs.bare:
            b = bindings.get(name)
            if b is not None:
                if b[0] == "attr":
                    self._resolve_attr(b[1], b[2], deps)
                elif b == ("root",):
                    pass  # bare package-root name: no resolvable target
                else:
                    m = b[1]
                    if m not in EXCLUDE and m in self.mods:
                        deps.add(("m", m))  # bare module use -> whole module
            elif name in info.symbols:
                deps.add(("s", mod, name))
        for sm in info.stars + local.stars:
            if sm not in EXCLUDE and sm in self.mods:
                deps.add(("m", sm))
        return deps


def fingerprint_fn(mod: str, fname: str, read, mods: dict[str, str],
                   graph: "_SymbolGraph | None" = None) -> str:
    """Symbol-granular fingerprint of one registered query function.

    Falls back to the whole-module closure fingerprint when the
    defining module is outside the granular packages, unreadable, or
    the function is not a resolvable top-level symbol. Pass ``graph``
    to share per-module analysis across many calls (the registry
    fingerprints all ~150 queries at import time).
    """
    if not _is_granular(mod):
        return fingerprint(mod, read, mods)
    g = graph if graph is not None else _SymbolGraph(read, mods)
    root = g.analyze(mod)
    if root is None or fname not in root.symbols:
        return fingerprint(mod, read, mods)

    items: dict[tuple, str] = {}
    stack: list[tuple] = [("s", mod, fname)]
    while stack:
        item = stack.pop()
        if item in items:
            continue
        kind = item[0]
        if kind == "m":
            m = item[1]
            # whole-module item: old coarse closure semantics
            for cm in sorted(dep_closure(m, read, mods)):
                ci = ("m", cm)
                if ci not in items:
                    src = read(cm)
                    items[ci] = hashlib.sha256(
                        (src or "").encode()
                    ).hexdigest()
            continue
        m = item[1]
        info = g.analyze(m)
        if info is None:
            stack.append(("m", m))
            continue
        if kind == "s":
            nm = item[2]
            if nm not in info.symbols:
                stack.append(("m", m))
                continue
            items[item] = info.symbols[nm]
            stack.extend(g.deps_of_nodes(m, info.sym_nodes[nm]) - set(items))
            stack.append(("r", m))
        elif kind == "r":
            items[item] = info.residual_hash
            stack.extend(g.deps_of_nodes(m, info.residual_nodes) - set(items))
    parts = [
        ":".join(map(str, k)) + "\x00" + h for k, h in sorted(items.items())
    ]
    return hashlib.sha256("\x01".join(parts).encode()).hexdigest()


def current_fingerprints(query_fns: dict[str, tuple[str, str] | str]) -> dict[str, str]:
    """name -> fingerprint from the working tree, memoized per symbol.

    Values are (module, function_name) pairs; a bare module string gets
    the legacy whole-module-closure fingerprint.
    """
    mods = module_files()
    read = disk_reader(mods)
    graph = _SymbolGraph(read, mods)
    memo: dict[tuple, str] = {}
    out: dict[str, str] = {}
    for name, spec in query_fns.items():
        key = (spec, "") if isinstance(spec, str) else tuple(spec)
        if key not in memo:
            if isinstance(spec, str):
                memo[key] = fingerprint(spec, read, mods)
            else:
                memo[key] = fingerprint_fn(spec[0], spec[1], read, mods, graph)
        out[name] = memo[key]
    return out


def recorded_fingerprints() -> dict[str, str]:
    try:
        with open(RECORD_PATH, encoding="utf-8") as f:
            data = json.load(f)
    except Exception:
        return {}
    return {k: v for k, v in data.items() if isinstance(v, str)}


def changed_since_record(query_fns: dict[str, tuple[str, str] | str]) -> set[str]:
    """Queries whose implementation no longer matches the fingerprint
    recorded at their last green driver row. A green query with NO
    record is also 'changed' (conservative: re-window it)."""
    rec = recorded_fingerprints()
    cur = current_fingerprints(query_fns)
    return {n for n, fp in cur.items() if rec.get(n) != fp}
