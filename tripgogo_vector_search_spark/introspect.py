"""Per-callable transitive SOURCE closure over the package's
module-level definitions.

Two consumers, one question — "which code can this callable's result
depend on?":

* the drift gate (tools/plan_manifest.py) fingerprints ``stream_*``
  and python-path keys with it, so a result-changing source edit
  anywhere in a key's reach re-queues exactly that key for driver
  re-verification;
* the materialized-index cache (plans/registry.py:_materialized_index)
  bakes the builder's closure digest into the cache leaf, so a kernel
  or builder edit REBUILDS the index instead of silently serving one
  computed by the old code (the production analogue: index tables are
  versioned by code revision as well as corpus snapshot).

Why: ``stream_*`` keys cannot be fingerprinted by plan text (building
their plan runs a live micro-batch stream), so they are fingerprinted
at source level. Hashing the whole ``streaming/ingest.py`` module (the
r7 scheme) had both failure modes at once:

* OVER-coverage — any ingest.py edit moved every stream key's
  fingerprint, so adding ONE streaming query re-queued all ten stream
  keys into the driver's bounded verification window (10 of r8's 50
  slots were spent exactly this way);
* UNDER-coverage — a stream key whose behavior lives in another
  module (``stream_minhash_probe`` probes via
  ``operators/dedup.py:minhash_probe``) was NOT re-flagged by an edit
  to that module: a result-changing change with a green, stale
  fingerprint — precisely the hole the gate exists to close.

This module computes, for a package callable, the transitive closure
of module-level definitions it can reach through static references:
its own source, every module-level def/class/constant it names
(resolved through module- and function-level imports, including
``from ..operators import dedup as DD`` module aliases used as
``DD.minhash_probe``), and everything those definitions reach in
turn, across all modules of ``tripgogo_vector_search_spark``. The
digest over the sorted (module, name, source) set moves iff any
reachable definition's source moves — per-key, both directions.

Honest limits (documented, deliberately conservative where cheap):

* references are resolved STATICALLY — ``getattr``/string dispatch
  would be invisible (none exists in the package; grep-checked);
* a name imported from a module that does not define it at top level
  (re-export chains) falls back to hashing that module's WHOLE
  source — coarse, never silent;
* a module alias used bare (not ``alias.attr``) also hashes the whole
  target module;
* each touched module's top-level import block is hashed too, so an
  external-alias swap (``import x as F``) cannot change semantics
  invisibly. ``plans/registry.py`` — edited every round, per-definition
  sources carry the per-key meaning — contributes only its EXTERNAL
  import lines (r9): internal-import churn from adding keys cannot
  move unrelated fingerprints, while repointing an external binding
  still flags every key that can reach it.
"""

from __future__ import annotations

import ast
import hashlib
import os
from dataclasses import dataclass, field

PKG_ROOT = os.path.dirname(os.path.abspath(__file__))
PKG_NAME = os.path.basename(PKG_ROOT)

# alias -> (target module rel-dotted, symbol | None); symbol None means
# the alias IS the module object (import m / from pkg import m)
ImportMap = dict[str, tuple[str, str | None]]

# sentinel symbol meaning "the whole module's source"
WHOLE = "*"


def _def_source(lines: list[str], node: ast.stmt) -> str:
    """Source slice for a top-level statement INCLUDING decorators
    (ast.get_source_segment excludes them, but a decorator — e.g. the
    registry's @query with its oracle SQL — is part of the behavior)."""
    start = node.lineno
    for dec in getattr(node, "decorator_list", []):
        start = min(start, dec.lineno)
    return "\n".join(lines[start - 1:node.end_lineno])


def _resolve_import_from(cur_mod: str, node: ast.ImportFrom,
                         known_modules: set[str]) -> ImportMap:
    """Package-internal ImportFrom -> alias map; external imports are
    dropped. ``from ..operators import dedup as DD`` binds DD to the
    SUBMODULE operators.dedup when that module exists, else to a symbol
    in operators/__init__."""
    out: ImportMap = {}
    if node.level == 0:
        if not (node.module or "").startswith(PKG_NAME):
            return out
        base = (node.module or "")[len(PKG_NAME):].lstrip(".")
    else:
        pkg_parts = cur_mod.split(".")[:-1]
        drop = node.level - 1
        if drop > len(pkg_parts):
            return out
        kept = pkg_parts[:len(pkg_parts) - drop]
        base = ".".join(kept + ([node.module] if node.module else []))
    for alias in node.names:
        local = alias.asname or alias.name
        as_submodule = f"{base}.{alias.name}" if base else alias.name
        if as_submodule in known_modules:
            out[local] = (as_submodule, None)
        else:
            out[local] = (base or "__init__", alias.name)
    return out


def _resolve_plain_import(node: ast.Import) -> ImportMap:
    out: ImportMap = {}
    for alias in node.names:
        if alias.name == PKG_NAME or alias.name.startswith(PKG_NAME + "."):
            rel = alias.name[len(PKG_NAME):].lstrip(".") or "__init__"
            local = alias.asname or alias.name.split(".")[0]
            out[local] = (rel, None)
    return out


@dataclass
class _Def:
    source: str
    names: set[str] = field(default_factory=set)          # bare Name loads
    attrs: set[tuple[str, str]] = field(default_factory=set)  # (name, attr)
    imports: ImportMap = field(default_factory=dict)       # function-level


def _collect_refs(node: ast.AST, cur_mod: str,
                  known_modules: set[str]) -> _Def:
    d = _Def(source="")
    for sub in ast.walk(node):
        if isinstance(sub, ast.Attribute) and isinstance(sub.value, ast.Name):
            d.attrs.add((sub.value.id, sub.attr))
        elif isinstance(sub, ast.Name):
            d.names.add(sub.id)
        elif isinstance(sub, ast.ImportFrom):
            d.imports.update(_resolve_import_from(cur_mod, sub,
                                                  known_modules))
        elif isinstance(sub, ast.Import):
            d.imports.update(_resolve_plain_import(sub))
    return d


def _is_external_import(node: ast.stmt) -> bool:
    """True when a top-level import statement binds names from OUTSIDE
    this package: relative imports are internal by construction;
    absolute ones are internal iff they target the package itself."""
    if isinstance(node, ast.ImportFrom):
        if node.level > 0:
            return False
        return not (node.module or "").startswith(PKG_NAME)
    if isinstance(node, ast.Import):
        return not any(a.name.startswith(PKG_NAME) for a in node.names)
    return False


@dataclass
class ModuleInfo:
    name: str
    source: str
    defs: dict[str, _Def]
    top_imports: ImportMap
    import_block: str
    external_import_block: str


class SourceGraph:
    """Symbol graph over a set of modules. Built either from the real
    package tree (``from_package``) or from in-memory sources
    (``SourceGraph({modname: source})`` — what the unit tests use)."""

    def __init__(self, sources: dict[str, str]):
        self._mods: dict[str, ModuleInfo] = {}
        known = set(sources)
        for name, src in sources.items():
            self._mods[name] = self._parse(name, src, known)

    @classmethod
    def from_package(cls) -> "SourceGraph":
        sources: dict[str, str] = {}
        for root, _dirs, files in sorted(os.walk(PKG_ROOT)):
            for fname in sorted(files):
                if not fname.endswith(".py"):
                    continue
                path = os.path.join(root, fname)
                rel = os.path.relpath(path, PKG_ROOT)[:-3].replace(
                    os.sep, ".")
                if rel.endswith(".__init__"):
                    rel = rel[:-len(".__init__")]
                with open(path, encoding="utf-8") as f:
                    sources[rel] = f.read()
        return cls(sources)

    @staticmethod
    def _parse(name: str, src: str, known: set[str]) -> ModuleInfo:
        tree = ast.parse(src)
        lines = src.splitlines()
        defs: dict[str, _Def] = {}
        top_imports: ImportMap = {}
        import_lines: list[str] = []
        ext_import_lines: list[str] = []
        for node in tree.body:
            if isinstance(node, ast.ImportFrom):
                top_imports.update(_resolve_import_from(name, node, known))
                import_lines.append(_def_source(lines, node))
                if _is_external_import(node):
                    ext_import_lines.append(_def_source(lines, node))
            elif isinstance(node, ast.Import):
                top_imports.update(_resolve_plain_import(node))
                import_lines.append(_def_source(lines, node))
                if _is_external_import(node):
                    ext_import_lines.append(_def_source(lines, node))
            elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                   ast.ClassDef)):
                d = _collect_refs(node, name, known)
                d.source = _def_source(lines, node)
                defs[node.name] = d
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                targets = (node.targets if isinstance(node, ast.Assign)
                           else [node.target])
                d = _collect_refs(node, name, known)
                d.source = _def_source(lines, node)
                for t in targets:
                    for tn in ast.walk(t):
                        if isinstance(tn, ast.Name):
                            if tn.id in defs:  # re-assignment: append
                                prev = defs[tn.id]
                                prev.source += "\n" + d.source
                                prev.names |= d.names
                                prev.attrs |= d.attrs
                            else:
                                defs[tn.id] = d
        return ModuleInfo(name=name, source=src, defs=defs,
                          top_imports=top_imports,
                          import_block="\n".join(import_lines),
                          external_import_block="\n".join(ext_import_lines))

    # -- closure ---------------------------------------------------------

    def _resolve_def(self, mod: str, d: _Def) -> set[tuple[str, str]]:
        """Symbols one hop from a definition: resolve its bare names and
        alias.attr references through (function-level, then top-level)
        imports, then the defining module's own top-level names."""
        info = self._mods[mod]
        imaps: list[ImportMap] = [d.imports, info.top_imports]
        out: set[tuple[str, str]] = set()
        for nm in d.names:
            hit = next((m[nm] for m in imaps if nm in m), None)
            if hit is not None:
                tmod, sym = hit
                if tmod not in self._mods:
                    continue
                if sym is None:
                    # module alias: attribute uses resolve per-symbol,
                    # a bare use hashes the whole module
                    used_attrs = {a for n, a in d.attrs if n == nm}
                    if used_attrs:
                        out |= {(tmod, a) for a in used_attrs}
                    else:
                        out.add((tmod, WHOLE))
                else:
                    out.add((tmod, sym))
            elif nm in info.defs:
                out.add((mod, nm))
        return out

    def closure(self, mod: str, name: str) -> set[tuple[str, str]]:
        seen: set[tuple[str, str]] = set()
        todo: list[tuple[str, str]] = [(mod, name)]
        while todo:
            sym = todo.pop()
            if sym in seen:
                continue
            seen.add(sym)
            smod, snm = sym
            info = self._mods.get(smod)
            if info is None or snm == WHOLE:
                continue
            d = info.defs.get(snm)
            if d is None:
                # imported-and-re-exported / star-import / dynamic:
                # degrade to whole-module coverage, never to silence
                seen.add((smod, WHOLE))
                continue
            todo.extend(self._resolve_def(smod, d) - seen)
        return seen

    def digest(self, mod: str, name: str) -> str:
        """sha256 over the closure's sorted (module, symbol, source)
        set plus each touched module's import block. plans/registry.py
        is special-cased to its EXTERNAL import lines only (r9, ADVICE
        r8): hashing its full block would move every source-closure
        fingerprint on each per-round registry edit (new keys append
        internal imports), while hashing nothing left an alias swap of
        an external binding (``import x as F``) able to change every
        registry key's behavior with all fingerprints green.
        Package-internal bindings need no import-line hash anywhere —
        closure resolution follows them to the definitions they name."""
        syms = self.closure(mod, name)
        h = hashlib.sha256()
        for smod, snm in sorted(syms):
            info = self._mods.get(smod)
            if info is None:
                continue
            if snm == WHOLE:
                src = info.source
            elif snm in info.defs:
                src = info.defs[snm].source
            else:
                # unresolved symbol: its module is already covered by
                # the WHOLE entry closure() added alongside it
                continue
            h.update(f"{smod}:{snm}\0".encode())
            h.update(src.encode())
            h.update(b"\1")
        for smod in sorted({m for m, _ in syms}):
            info = self._mods.get(smod)
            if info is None:
                continue
            block = (info.external_import_block
                     if smod == "plans.registry" else info.import_block)
            h.update(f"{smod}:<imports>\0".encode())
            h.update(block.encode())
            h.update(b"\1")
        return h.hexdigest()

    def closure_sources(self, mod: str, name: str) -> dict[tuple[str, str],
                                                           str]:
        """The closure's (module, symbol) -> source text map — what the
        digest hashes; exposed so tests can assert reachability
        properties (e.g. a python-path key's closure contains its
        kernel definitions)."""
        out: dict[tuple[str, str], str] = {}
        for smod, snm in self.closure(mod, name):
            info = self._mods.get(smod)
            if info is None:
                continue
            if snm == WHOLE:
                out[(smod, snm)] = info.source
            elif snm in info.defs:
                out[(smod, snm)] = info.defs[snm].source
        return out

    def digest_for_function(self, fn) -> str:
        mod = fn.__module__
        rel = (mod[len(PKG_NAME):].lstrip(".")
               if mod.startswith(PKG_NAME) else mod)
        if rel not in self._mods or fn.__name__ not in self._mods[rel].defs:
            # a digest over an empty closure would be a stable hash of
            # NOTHING — a fingerprint that never moves. Fail loud: the
            # gate and the index cache must never key on that.
            raise ValueError(
                f"{mod}.{fn.__name__} is not a module-level definition "
                "of this package — cannot fingerprint its source reach")
        return self.digest(rel, fn.__name__)


_GRAPH: SourceGraph | None = None


def package_graph() -> SourceGraph:
    global _GRAPH
    if _GRAPH is None:
        _GRAPH = SourceGraph.from_package()
    return _GRAPH
