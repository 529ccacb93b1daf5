"""Per-function evidence slicing (round-8 verdict #2).

The old module-granular pin hash lapsed 100+ greens when one helper in
functions/dedup.py changed; the 50-slot driver window then spent whole
rounds re-confirming behaviorally-unchanged queries.  These tests pin the
narrowing (single-function edit -> <20 lapses) AND the soundness edges
(reachable helper edits still lapse; comment-only edits lapse nothing;
the static-resolution preconditions still hold repo-wide).
"""

import ast
import os

from hiero_spark import evidence, evidence_slice
from hiero_spark.registry import all_queries

DEDUP = "hiero_spark.functions.dedup"


def teardown_function(_fn):
    evidence_slice._SOURCE_OVERRIDES.clear()
    evidence_slice.clear_caches()


def test_single_function_edit_blast_radius_under_20():
    """Round-8 verdict done-criterion: a routine edit to one function in
    functions/dedup.py lapses <20 pins (module-granular: 155)."""
    specs = all_queries()
    info = evidence_slice._load_module(DEDUP)
    assert info is not None and info.segments
    worst = 0
    for seg in info.segments:
        n = len(evidence_slice.affected_queries(specs, DEDUP, seg))
        worst = max(worst, n)
    assert worst < 20, f"worst single-function blast radius {worst} >= 20"


def test_slice_contains_reached_helper_and_module_state():
    """n1_dedup_exact calls dd.exact_dedup and _util.t — both segments and
    both modules' preambles must be in its slice."""
    nodes = evidence_slice.slice_nodes("hiero_spark.queries.northstar", "n1_dedup_exact")
    assert ("seg", DEDUP, "exact_dedup") in nodes
    assert ("pre", DEDUP) in nodes
    assert ("seg", "hiero_spark.queries._util", "t") in nodes
    assert ("pre", "hiero_spark.queries.northstar") in nodes
    # and it must NOT drag in unrelated dedup machinery
    assert ("seg", DEDUP, "minhash_signatures") not in nodes
    assert ("mod", DEDUP) not in nodes, "fell back to whole-module node"


def test_comment_only_edit_lapses_nothing():
    """Doc passes must not burn driver slots: adding a comment between
    segments leaves every pin hash unchanged."""
    specs = all_queries()
    spec = specs["n1_dedup_exact"]
    h0 = evidence.spec_hash(spec)
    path = evidence_slice._module_paths()[DEDUP]
    with open(path) as f:
        src = f.read()
    evidence_slice.clear_caches()
    evidence_slice._SOURCE_OVERRIDES[DEDUP] = src + "\n# trailing comment\n"
    assert evidence.spec_hash(spec) == h0


def test_reachable_edit_lapses_unreachable_does_not():
    specs = all_queries()
    spec = specs["n1_dedup_exact"]
    h0 = evidence.spec_hash(spec)
    path = evidence_slice._module_paths()[DEDUP]
    with open(path) as f:
        src = f.read()

    # reachable: exact_dedup
    evidence_slice.clear_caches()
    evidence_slice._SOURCE_OVERRIDES[DEDUP] = src.replace(
        "def exact_dedup(", "def exact_dedup(*__pad__, ", 1
    )
    assert evidence.spec_hash(spec) != h0

    # unreachable sibling: minhash_signatures
    evidence_slice._SOURCE_OVERRIDES.clear()
    evidence_slice.clear_caches()
    evidence_slice._SOURCE_OVERRIDES[DEDUP] = src.replace(
        "def minhash_signatures(", "def minhash_signatures(*__pad__, ", 1
    )
    assert evidence.spec_hash(spec) == h0


def test_preamble_constant_edit_lapses_module_users():
    """Module-level state is covered: changing a top-level constant in the
    query's own module lapses its pin (the round-5 ADVICE hole stays
    closed under the narrower hash)."""
    specs = all_queries()
    spec = specs["n1_dedup_exact"]
    mod = spec.fn.__module__
    h0 = evidence.spec_hash(spec)
    path = evidence_slice._module_paths()[mod]
    with open(path) as f:
        src = f.read()
    evidence_slice.clear_caches()
    evidence_slice._SOURCE_OVERRIDES[mod] = src + "\n__TAMPER_CONST__ = 1\n"
    assert evidence.spec_hash(spec) != h0, (
        "own-module preamble edit must lapse the pin"
    )


def test_static_resolution_preconditions_hold():
    """The slicer's soundness rests on the repo avoiding patterns static
    resolution can't see: wildcard imports and getattr/importlib dispatch
    into hiero_spark internals.  Fail here = the slicer needs a new
    conservative fallback before the pattern lands."""
    pkg = evidence_slice.PKG_DIR
    for dirpath, _dirs, files in os.walk(pkg):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            with open(path) as f:
                tree = ast.parse(f.read())
            for node in ast.walk(tree):
                if isinstance(node, ast.ImportFrom) and node.module and (
                    node.module.startswith("hiero_spark")
                ):
                    assert not any(a.name == "*" for a in node.names), (
                        f"wildcard hiero_spark import in {path}"
                    )
                if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
                    if node.func.id in ("__import__", "getattr") and node.args:
                        arg = node.args[0]
                        if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
                            assert not arg.value.startswith("hiero_spark"), (
                                f"dynamic hiero_spark access in {path}"
                            )


def test_every_registered_fn_is_sliceable():
    """All query fns should take the precise v3 path, not the coarse v2
    fallback — a nested/lambda registration silently widens its pin."""
    specs = all_queries()
    paths = evidence_slice._module_paths()
    coarse = [
        n for n, s in specs.items()
        if "." in getattr(s.fn, "__qualname__", "") or s.fn.__module__ not in paths
    ]
    assert not coarse, f"non-sliceable query fns (v2 fallback): {coarse}"


def test_every_query_slices_cleanly_and_contains_itself():
    """Smoke over the whole registry: the slicer must resolve every
    registered fn without error, anchor the fn's own segment, include
    its own module preamble, and produce a stable digest.  A slicer
    crash would otherwise surface at window-derivation time (round
    boundary); this test moves the failure to commit time."""
    specs = all_queries()
    for name, spec in specs.items():
        mod = spec.fn.__module__
        fn_name = spec.fn.__qualname__
        nodes = evidence_slice.slice_nodes(mod, fn_name)
        assert ("seg", mod, fn_name) in nodes, name
        assert ("pre", mod) in nodes, name
        d1 = evidence_slice.slice_digest(mod, fn_name)
        d2 = evidence_slice.slice_digest(mod, fn_name)
        assert d1 == d2 and len(d1) == 64, name


def test_function_local_imports_enter_the_slice():
    """Round-10 soundness fix: the repo's standard query style imports its
    operator INSIDE the function body.  Those bindings must enter the
    slice — before the fix, `from hiero_spark.functions.setsim import
    jaccard_join` inside n1_jaccard_join resolved to None ("builtin") and
    editing jaccard_join did NOT lapse the query's pin (an
    under-approximation, the exact hole the module docstring promises
    cannot exist)."""
    nodes = evidence_slice.slice_nodes(
        "hiero_spark.queries.retrieval", "n1_jaccard_join"
    )
    assert ("seg", "hiero_spark.functions.setsim", "jaccard_join") in nodes
    # and transitively through the operator's own helpers
    assert ("seg", "hiero_spark.functions.setsim", "_jaccard_prepared") in nodes
    # module-alias form (`from hiero_spark.functions import dedup as dd`
    # at function level, then dd.foo) resolves through the local binding
    specs = all_queries()
    aff = evidence_slice.affected_queries(
        specs, "hiero_spark.functions.setsim", "jaccard_join"
    )
    assert "n1_jaccard_join" in aff and "n1_jaccard_join_hashed" in aff
    # blast radius stays function-scoped, not module-scoped
    assert "n1_containment_join" not in aff


def test_local_import_edit_lapses_dependent_green(monkeypatch):
    """End-to-end: editing the body of a locally-imported operator must
    change the dependent query's spec hash."""
    specs = all_queries()
    spec = specs["n1_jaccard_join"]
    h0 = evidence.spec_hash(spec)
    target = "hiero_spark.functions.setsim"
    with open(evidence_slice._module_paths()[target]) as f:
        original = f.read()
    edited = original.replace(
        "def jaccard_join(", "def jaccard_join(*__tamper_pad__, ", 1
    )
    assert edited != original
    try:
        evidence_slice.clear_caches()
        evidence_slice._SOURCE_OVERRIDES[target] = edited
        assert evidence.spec_hash(spec) != h0, (
            "editing jaccard_join did not lapse n1_jaccard_join — the "
            "local-import hole is back"
        )
    finally:
        evidence_slice._SOURCE_OVERRIDES.clear()
        evidence_slice.clear_caches()
