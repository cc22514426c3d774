"""Mechanized changed-code rotation map (judge r7 item 3).

The standing rotation rule says: any registered query whose implementation
changed since its most recent green external row must re-enter the first-50
driver window. Through round 7 the per-round re-check list
(``plans/__init__._CHANGED_SINCE_EXTERNAL``) was hand-derived — complete
that round only because a code-review pass caught three indirect consumers
(queries reaching ``minhash_band_frame`` through ``near_dup_clusters``).
This module converts that discipline into mechanism: a static AST pass over
the package builds, for every registered query, the transitive closure of
intra-repo symbols its plan construction can touch, and inverts it into a
``module file -> consuming query names`` map. Given the set of files
changed in a round (``git diff --name-only <round-open-commit>``), the
rotation list is then a lookup, not a memory exercise.

Precision notes (deliberate over-approximations are SAFE here — a false
positive costs one window slot; a false negative is a stale row):

- Edges are SYMBOL-level inside a module (a query only depends on the
  module-top-level functions/constants it actually references, including
  through its decorator's oracle f-strings and through locally-imported
  helpers), so one query touching ``operators/dedup.py`` does not rotate
  every query in its plans module.
- Attribute use off a module alias (``import pkg.mod as M; M.fn``, or
  ``from pkg import mod as M; M.fn``) takes a SYMBOL-level edge to
  ``mod.fn`` when ``fn`` is a top-level symbol of ``mod``, else collapses
  to a module-level dependency (any change rotates the consumer). A bare
  ``import pkg.mod`` with no attribute use, or an attribute not statically
  resolvable, stays module-level. (Round-9 fix: these ``\\x01``-encoded
  refs were previously dropped entirely in ``closure_modules`` — a FALSE
  NEGATIVE, the unsafe direction; e.g. ``ab_power_mde`` uses
  ``T.h48_duck`` from ``functions/text.py`` yet was absent from that
  file's consumer list. ``tests/test_rotation_map.py`` now pins known
  consumer sets.)
- The inverted map is exposed at module-file granularity because git diffs
  are file-granular; symbol-level closures are kept for tests/debugging.

Usage:
    python tools/rotation_map.py                      # dump the module map
    python tools/rotation_map.py --since <commit>     # rotation list for a
        round: consumers of every package .py changed since <commit>
        (committed AND working-tree changes).
"""

from __future__ import annotations

import ast
import subprocess
import sys
from collections import defaultdict, deque
from pathlib import Path

PKG = "flink_realtime_sessionize_sample_spark"
REPO = Path(__file__).resolve().parents[1]
PKG_ROOT = REPO / PKG


def _module_name(path: Path) -> str:
    rel = path.relative_to(REPO).with_suffix("")
    parts = list(rel.parts)
    if parts[-1] == "__init__":
        parts = parts[:-1]
    return ".".join(parts)


def _module_path(modname: str) -> Path | None:
    """Dotted module name -> repo-relative .py path (None if external)."""
    if not modname.startswith(PKG):
        return None
    rel = Path(*modname.split("."))
    for cand in (REPO / rel.with_suffix(".py"), REPO / rel / "__init__.py"):
        if cand.exists():
            return cand.relative_to(REPO)
    return None


class _ModuleInfo:
    def __init__(self, path: Path, tree: ast.Module):
        self.path = path  # repo-relative
        self.name = _module_name(REPO / path)
        # top-level symbol -> set of names referenced in its definition
        self.symbol_refs: dict[str, set[str]] = {}
        # import alias -> ("sym", module_dotted, symbol) | ("mod", module_dotted)
        self.imports: dict[str, tuple] = {}
        self._index(tree)

    @staticmethod
    def _names_in(node: ast.AST) -> set[str]:
        """Every base Name referenced under ``node``, plus aliases bound by
        any import statement nested inside (function-local imports).

        Simple attribute reads off a bare name (``M.attr``) are recorded as
        a ``\\x01M.attr`` pair INSTEAD of the bare name: if ``M`` turns out
        to be a module alias, the consumer map can then take a symbol-level
        edge to ``M.attr`` rather than a whole-module dependency (which
        would, e.g., make every user of one ``llm_queries`` helper a
        consumer of everything ``llm_queries`` itself touches)."""
        out: set[str] = set()
        attr_roots: set[int] = set()
        for n in ast.walk(node):
            if isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
                out.add(f"\x01{n.value.id}.{n.attr}")
                attr_roots.add(id(n.value))
        for n in ast.walk(node):
            if isinstance(n, ast.Name):
                if id(n) not in attr_roots:
                    out.add(n.id)
            elif isinstance(n, ast.ImportFrom) and n.module:
                # record a pseudo-reference via a reserved key the caller
                # resolves with module context; encode inline instead.
                for a in n.names:
                    out.add(f"\x00from:{n.module}:{a.name}")
            elif isinstance(n, ast.Import):
                for a in n.names:
                    out.add(f"\x00import:{a.name}")
        return out

    def _bind_import(self, node: ast.stmt) -> None:
        if isinstance(node, ast.ImportFrom) and node.module:
            for a in node.names:
                self.imports[a.asname or a.name] = ("from", node.module, a.name)
        elif isinstance(node, ast.Import):
            for a in node.names:
                alias = a.asname or a.name.split(".")[0]
                self.imports[alias] = ("mod", a.name)

    def _index(self, tree: ast.Module) -> None:
        for node in tree.body:
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                self._bind_import(node)
            elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                self.symbol_refs[node.name] = self._names_in(node)
            elif isinstance(node, ast.Assign):
                refs = self._names_in(node.value)
                for tgt in node.targets:
                    for t in ast.walk(tgt):
                        if isinstance(t, ast.Name):
                            self.symbol_refs.setdefault(t.id, set()).update(refs)
            elif isinstance(node, ast.AnnAssign) and node.value is not None:
                if isinstance(node.target, ast.Name):
                    self.symbol_refs.setdefault(node.target.id, set()).update(
                        self._names_in(node.value)
                    )


def _load_package() -> dict[str, _ModuleInfo]:
    mods: dict[str, _ModuleInfo] = {}
    for path in sorted(PKG_ROOT.rglob("*.py")):
        rel = path.relative_to(REPO)
        tree = ast.parse(path.read_text(), filename=str(rel))
        info = _ModuleInfo(rel, tree)
        mods[info.name] = info
    return mods


def closure_modules(start_module: str, start_symbol: str,
                    mods: dict[str, _ModuleInfo]) -> set[str]:
    """Repo-relative module paths reachable from (module, symbol)."""
    seen_syms: set[tuple[str, str]] = set()
    touched: set[str] = set()
    dq: deque[tuple[str, str]] = deque([(start_module, start_symbol)])
    while dq:
        modname, sym = dq.popleft()
        if (modname, sym) in seen_syms:
            continue
        seen_syms.add((modname, sym))
        info = mods.get(modname)
        if info is None:
            continue
        touched.add(str(info.path))
        for ref in info.symbol_refs.get(sym, ()):  # may be absent (external)
            if ref.startswith("\x00from:"):
                _, srcmod, name = ref.split(":", 2)
                self_resolve(srcmod, name, mods, touched, dq)
            elif ref.startswith("\x00import:"):
                p = _module_path(ref[len("\x00import:"):])
                if p is not None:
                    touched.add(str(p))
                    _pull_whole_module(ref[len("\x00import:"):], mods, dq)
            elif ref.startswith("\x01"):
                root, attr = ref[1:].split(".", 1)
                # Root may itself be a module-top-level symbol (an object
                # whose attribute is read) — symbol-level edge to it.
                if root in info.symbol_refs:
                    dq.append((modname, root))
                binding = info.imports.get(root)
                if binding is None:
                    continue  # local variable / parameter — no package edge
                if binding[0] == "from":
                    sub = f"{binding[1]}.{binding[2]}"
                    if sub in mods:
                        # ``from pkg import mod as M``: alias names a
                        # package submodule — symbol-level edge to M.attr.
                        p = _module_path(sub)
                        if p is not None:
                            touched.add(str(p))
                        if attr in mods[sub].symbol_refs:
                            dq.append((sub, attr))
                        else:
                            _pull_whole_module(sub, mods, dq)
                    else:
                        # Alias is a symbol (class/function/constant):
                        # depend on the symbol itself.
                        self_resolve(binding[1], binding[2], mods, touched, dq)
                else:  # ("mod", dotted)
                    target = binding[1]
                    p = _module_path(target)
                    if p is not None:
                        touched.add(str(p))
                    if target in mods:
                        if attr in mods[target].symbol_refs:
                            dq.append((target, attr))
                        else:
                            _pull_whole_module(target, mods, dq)
            elif ref in info.symbol_refs and (modname, ref) not in seen_syms:
                dq.append((modname, ref))
            elif ref in info.imports:
                kind = info.imports[ref]
                if kind[0] == "from":
                    self_resolve(kind[1], kind[2], mods, touched, dq)
                else:
                    p = _module_path(kind[1])
                    if p is not None:
                        touched.add(str(p))
                        _pull_whole_module(kind[1], mods, dq)
    return touched


def self_resolve(srcmod: str, name: str, mods: dict[str, _ModuleInfo],
                 touched: set[str], dq: deque) -> None:
    """Resolve ``from srcmod import name``: symbol if it exists there,
    submodule if ``srcmod.name`` is a module, else whole-module dep."""
    if srcmod in mods and name in mods[srcmod].symbol_refs:
        dq.append((srcmod, name))
        return
    sub = f"{srcmod}.{name}"
    if sub in mods:
        p = _module_path(sub)
        if p is not None:
            touched.add(str(p))
        _pull_whole_module(sub, mods, dq)
        return
    p = _module_path(srcmod)
    if p is not None:
        touched.add(str(p))
        _pull_whole_module(srcmod, mods, dq)


def _pull_whole_module(modname: str, mods: dict[str, _ModuleInfo],
                       dq: deque) -> None:
    """Module-granular dependency: attribute access on a module alias can
    reach any of its symbols, so enqueue them all (safe over-approx)."""
    info = mods.get(modname)
    if info is None:
        return
    for sym in info.symbol_refs:
        dq.append((modname, sym))


def build_consumer_map() -> dict[str, list[str]]:
    """repo-relative module path -> sorted registered query names whose
    plan construction transitively touches that module."""
    sys.path.insert(0, str(REPO))
    from flink_realtime_sessionize_sample_spark import plans

    mods = _load_package()
    out: dict[str, set[str]] = defaultdict(set)
    for qname, fn in plans.QUERIES.items():
        for mpath in closure_modules(fn.__module__, fn.__name__, mods):
            out[mpath].add(qname)
    return {m: sorted(qs) for m, qs in sorted(out.items())}


def _changed_package_files(since: str) -> list[str]:
    files: set[str] = set()
    for args in (
        ["git", "diff", "--name-only", f"{since}..HEAD"],
        ["git", "diff", "--name-only", "HEAD"],  # unstaged
        ["git", "diff", "--name-only", "--cached"],
    ):
        res = subprocess.run(args, cwd=REPO, capture_output=True, text=True)
        res.check_returncode()
        files.update(line.strip() for line in res.stdout.splitlines() if line.strip())
    return sorted(f for f in files if f.startswith(f"{PKG}/") and f.endswith(".py"))


def rotation_list(since: str) -> tuple[list[str], dict[str, list[str]]]:
    cmap = build_consumer_map()
    changed = _changed_package_files(since)
    per_file = {f: cmap.get(f, []) for f in changed}
    union = sorted({q for qs in per_file.values() for q in qs})
    return union, per_file


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--since":
        union, per_file = rotation_list(sys.argv[2])
        for f, qs in per_file.items():
            print(f"{f}: {len(qs)} consumers")
            for q in qs:
                print(f"  {q}")
        print(f"ROTATION ({len(union)}): {union}")
    else:
        cmap = build_consumer_map()
        for m, qs in cmap.items():
            print(f"{m}: {len(qs)}")
