"""Per-function dependency slicing for evidence pins (round-8 verdict #2).

The round-5/6 spec hash was module-granular: a query's pin covered the
FILE digest of its own module plus every hiero_spark module transitively
imported.  Sound, but the blast radius was huge — editing one helper in
functions/dedup.py lapsed 100+ pins, so the 50-slot driver window spent
whole rounds re-confirming greens whose behavior never changed.

This module computes a *per-function slice*: starting from a registered
query function, follow the names it actually references — through module
aliases (``from hiero_spark.functions import dedup as dd`` + ``dd.foo``),
symbol imports (``from hiero_spark.queries._util import t``), and
re-export chains — down to the top-level function/class *segments* it can
reach, and hash only those segments' sources.  Editing ``dedup.foo``
lapses exactly the queries whose slice contains ``foo``; editing an
unrelated sibling in the same file lapses nothing.

Soundness is preserved by over-approximation at every unresolvable point:

* Names are resolved statically from the AST; a reference that cannot be
  resolved to a specific segment falls back to the WHOLE-module node,
  whose digest is the file digest plus the legacy transitive-closure
  digest (exactly the old, coarser guarantee).
* Whenever any segment of a module enters the slice, the module's
  *preamble* (every top-level non-def statement: imports, constants,
  precomputed tables, feature-gate try/excepts) enters too, and the
  preamble's own references are followed — module-level state a function
  reads is always covered.
* Local variables shadowing module names over-approximate (the shadowed
  segment is still pulled in) — never under.
* The repo bans the patterns static resolution cannot see: no wildcard
  imports, no ``getattr``/``importlib`` dispatch into hiero_spark
  internals (grep-audited; tests/test_evidence_slice.py re-asserts).

Comment-only edits between segments change nothing (segments are sliced
by AST extent), so doc passes no longer burn driver slots.
"""

from __future__ import annotations

import ast
import hashlib
import os
from dataclasses import dataclass, field

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG_DIR = os.path.join(ROOT, "hiero_spark")

# Tests inject edited sources here (module name -> source text) to measure
# blast radius without touching the working tree; clear_caches() after.
_SOURCE_OVERRIDES: dict[str, str] = {}

_MODULE_CACHE: dict[str, "_ModuleInfo"] = {}
_PATHS_CACHE: dict[str, str] = {}


def _module_paths() -> dict[str, str]:
    """module name -> file path for every .py under hiero_spark/."""
    if _PATHS_CACHE:
        return _PATHS_CACHE
    for dirpath, _dirs, files in os.walk(PKG_DIR):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, ROOT)
            mod = rel[:-3].replace(os.sep, ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            _PATHS_CACHE[mod] = path
    return _PATHS_CACHE


def clear_caches() -> None:
    _MODULE_CACHE.clear()
    _PATHS_CACHE.clear()


PREAMBLE = "<preamble>"


@dataclass
class _ModuleInfo:
    name: str
    source: str
    # top-level def/class name -> source text (decorators included)
    segments: dict[str, str] = field(default_factory=dict)
    # segment name (or PREAMBLE) -> referenced dotted chains
    refs: dict[str, set[tuple[str, ...]]] = field(default_factory=dict)
    # local name -> ("mod", module) | ("sym", module, symbol)
    imports: dict[str, tuple] = field(default_factory=dict)
    # segment name -> its FUNCTION-LOCAL import bindings (same value
    # shapes as `imports`).  Round-10 soundness fix: the repo's standard
    # query style imports its operator INSIDE the function body
    # (`def n1_x(spark, sf): from hiero_spark.functions.setsim import
    # jaccard_join; ...`); these bindings were invisible to resolution,
    # so the reference resolved to None = "external/builtin" and the
    # operator's code silently dropped out of the pin — an
    # UNDER-approximation (editing jaccard_join did not lapse n1_x).
    seg_imports: dict[str, dict[str, tuple]] = field(default_factory=dict)
    # names bound by top-level non-def statements (constants, gated defs)
    preamble_names: set[str] = field(default_factory=set)
    preamble_src: str = ""


class _RefVisitor(ast.NodeVisitor):
    """Collect dotted reference chains; an attribute chain with a pure Name
    root is recorded whole (``dd.exact_dedup`` -> ("dd","exact_dedup")) and
    its root is NOT also recorded bare — that precision is the whole point.
    """

    def __init__(self) -> None:
        self.chains: set[tuple[str, ...]] = set()

    @staticmethod
    def _chain(node: ast.Attribute) -> tuple[str, ...] | None:
        parts: list[str] = []
        cur: ast.expr = node
        while isinstance(cur, ast.Attribute):
            parts.append(cur.attr)
            cur = cur.value
        if isinstance(cur, ast.Name):
            parts.append(cur.id)
            return tuple(reversed(parts))
        return None

    def visit_Attribute(self, node: ast.Attribute) -> None:
        chain = self._chain(node)
        if chain is not None:
            self.chains.add(chain)
        else:
            self.generic_visit(node)

    def visit_Name(self, node: ast.Name) -> None:
        self.chains.add((node.id,))


def _collect_refs(node: ast.AST) -> set[tuple[str, ...]]:
    v = _RefVisitor()
    v.visit(node)
    return v.chains


def _register_import(
    into: dict[str, tuple], node: ast.AST, paths: dict[str, str]
) -> None:
    if isinstance(node, ast.Import):
        for alias in node.names:
            if not alias.name.startswith("hiero_spark"):
                continue
            local = alias.asname or alias.name.split(".")[0]
            if alias.asname:
                into[local] = ("mod", alias.name)
            else:
                # `import hiero_spark.functions.dedup` binds `hiero_spark`;
                # attribute chains walk down from the package module.
                into[local] = ("mod", "hiero_spark")
    elif isinstance(node, ast.ImportFrom) and node.module and node.module.startswith(
        "hiero_spark"
    ):
        for alias in node.names:
            local = alias.asname or alias.name
            sub = f"{node.module}.{alias.name}"
            if sub in paths:
                into[local] = ("mod", sub)
            else:
                into[local] = ("sym", node.module, alias.name)


def _segment_source(source: str, node: ast.stmt) -> str:
    parts: list[str] = []
    for dec in getattr(node, "decorator_list", []):
        parts.append(ast.get_source_segment(source, dec) or "")
    parts.append(ast.get_source_segment(source, node) or "")
    return "\n".join(parts)


def _load_module(mod: str) -> _ModuleInfo | None:
    if mod in _MODULE_CACHE:
        return _MODULE_CACHE[mod]
    paths = _module_paths()
    path = paths.get(mod)
    if path is None:
        return None
    if mod in _SOURCE_OVERRIDES:
        source = _SOURCE_OVERRIDES[mod]
    else:
        try:
            with open(path) as f:
                source = f.read()
        except OSError:
            return None
    try:
        tree = ast.parse(source)
    except SyntaxError:
        return None
    info = _ModuleInfo(name=mod, source=source)
    preamble_parts: list[str] = []
    preamble_refs: set[tuple[str, ...]] = set()
    for stmt in tree.body:
        if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            info.segments[stmt.name] = _segment_source(source, stmt)
            info.refs[stmt.name] = _collect_refs(stmt)
            # function-local hiero_spark imports: record the bindings for
            # scoped chain resolution AND keep them resolvable even when
            # the bound name is only ever CALLED (a bare Name ref)
            seg_imp: dict[str, tuple] = {}
            for sub in ast.walk(stmt):
                if isinstance(sub, (ast.Import, ast.ImportFrom)):
                    _register_import(seg_imp, sub, paths)
            if seg_imp:
                info.seg_imports[stmt.name] = seg_imp
        else:
            preamble_parts.append(ast.get_source_segment(source, stmt) or "")
            preamble_refs |= _collect_refs(stmt)
            # bindings made anywhere inside the statement (try-gated
            # imports, conditional defs, constant tables)
            for sub in ast.walk(stmt):
                if isinstance(sub, (ast.Import, ast.ImportFrom)):
                    _register_import(info.imports, sub, paths)
                elif isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                    info.preamble_names.add(sub.name)
                elif isinstance(sub, (ast.Assign, ast.AugAssign, ast.AnnAssign)):
                    targets = sub.targets if isinstance(sub, ast.Assign) else [sub.target]
                    for tgt in targets:
                        for leaf in ast.walk(tgt):
                            if isinstance(leaf, ast.Name):
                                info.preamble_names.add(leaf.id)
    info.preamble_src = "\n".join(preamble_parts)
    info.refs[PREAMBLE] = preamble_refs
    _MODULE_CACHE[mod] = info
    return info


# --- resolution ------------------------------------------------------------
# Node keys:  ("seg", module, name) | ("pre", module) | ("mod", module)


def _resolve_symbol(mod: str, name: str, depth: int = 0) -> tuple | None:
    """What does `name` mean at top level of `mod`?  None = external/builtin."""
    if depth > 20:
        return ("mod", mod)
    info = _load_module(mod)
    if info is None:
        return None
    if name in info.segments:
        return ("seg", mod, name)
    if name in info.imports:
        kind = info.imports[name]
        if kind[0] == "mod":
            return ("mod", kind[1])
        return _resolve_symbol(kind[1], kind[2], depth + 1) or ("mod", kind[1])
    if f"{mod}.{name}" in _module_paths():
        return ("mod", f"{mod}.{name}")
    if name in info.preamble_names:
        return ("pre", mod)
    return None


def _binding_node(kind: tuple) -> tuple:
    """Resolve an import binding value to a slice node."""
    if kind[0] == "mod":
        return ("mod", kind[1])
    return _resolve_symbol(kind[1], kind[2]) or ("mod", kind[1])


def _resolve_chain(
    mod: str,
    chain: tuple[str, ...],
    local_imports: dict[str, tuple] | None = None,
) -> tuple | None:
    """Resolve a dotted reference chain; `local_imports` (a segment's
    function-local bindings) takes precedence over module scope — a local
    `from hiero_spark.functions.setsim import jaccard_join` makes the bare
    name `jaccard_join` resolve to that segment, not to builtin."""
    if local_imports and chain[0] in local_imports:
        node = _binding_node(local_imports[chain[0]])
    else:
        node = _resolve_symbol(mod, chain[0])
    if node is None:
        return None
    for part in chain[1:]:
        if node[0] != "mod":
            # attribute on a function/class/constant — the segment source
            # already covers it
            return node
        inner = _resolve_symbol(node[1], part)
        if inner is None:
            info = _load_module(node[1])
            if info is None:
                # not a hiero_spark module file (package w/o __init__?) —
                # keep the whole-module node conservatively
                return node
            # unresolvable attribute on an internal module: whole module
            return node
        node = inner
    return node


def _node_digest(node: tuple, legacy_closure) -> str:
    kind = node[0]
    if kind == "seg":
        info = _load_module(node[1])
        src = info.segments.get(node[2], "") if info else ""
        return hashlib.sha256(src.encode()).hexdigest()
    if kind == "pre":
        info = _load_module(node[1])
        src = info.preamble_src if info else ""
        return hashlib.sha256(src.encode()).hexdigest()
    # whole-module fallback: file digest + the legacy transitive closure —
    # exactly the old guarantee for everything behind this node
    info = _load_module(node[1])
    src = info.source if info else ""
    closure = legacy_closure(node[1]) if legacy_closure else ""
    return hashlib.sha256((src + "\n###\n" + closure).encode()).hexdigest()


def slice_nodes(mod: str, fn_name: str) -> set[tuple]:
    """All nodes reachable from top-level function `fn_name` in `mod`."""
    start = ("seg", mod, fn_name)
    info = _load_module(mod)
    if info is None or fn_name not in info.segments:
        return {("mod", mod)}
    out: set[tuple] = set()
    stack: list[tuple] = [start]
    while stack:
        node = stack.pop()
        if node in out:
            continue
        out.add(node)
        kind = node[0]
        if kind == "mod":
            continue  # digest covers the file + legacy closure
        m = node[1]
        minfo = _load_module(m)
        if minfo is None:
            continue
        # any segment pulls in its module's preamble (module-level state)
        pre = ("pre", m)
        if pre not in out:
            stack.append(pre)
        ref_key = node[2] if kind == "seg" else PREAMBLE
        local = minfo.seg_imports.get(ref_key) if kind == "seg" else None
        # every function-local import target enters the slice outright —
        # the binding is a dependency even if the only later reference is
        # a call (bare Name) or the import is for side effects
        if local:
            for binding in local.values():
                resolved = _binding_node(binding)
                if resolved not in out:
                    stack.append(resolved)
        for chain in minfo.refs.get(ref_key, ()):
            resolved = _resolve_chain(m, chain, local)
            if resolved is not None and resolved not in out:
                stack.append(resolved)
    return out


def slice_digest(mod: str, fn_name: str, legacy_closure=None) -> str:
    """Stable digest over the slice: sorted (node-key, node-digest) pairs."""
    h = hashlib.sha256()
    for node in sorted(slice_nodes(mod, fn_name)):
        h.update("|".join(node).encode())
        h.update(_node_digest(node, legacy_closure).encode())
    return h.hexdigest()


def affected_queries(specs, mod: str, seg_name: str) -> list[str]:
    """Names whose pin would lapse if segment `seg_name` of `mod` changed —
    the blast-radius metric the round-8 verdict asked to bound."""
    target_seg = ("seg", mod, seg_name)
    target_mod = ("mod", mod)
    out = []
    for name, spec in specs.items():
        fn = spec.fn
        fmod = getattr(fn, "__module__", "") or ""
        fname = getattr(fn, "__qualname__", getattr(fn, "__name__", ""))
        if "." in fname or fmod not in _module_paths():
            out.append(name)  # non-sliceable: falls back to coarse hash
            continue
        nodes = slice_nodes(fmod, fname)
        if target_seg in nodes or target_mod in nodes:
            out.append(name)
    return out
