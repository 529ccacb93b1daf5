"""Durable-evidence bookkeeping for the driver correctness rotation.

The driver hashes only the first 50 registered queries per round
(CORRECTNESS_r{N}.json), so __spark_entry__ rotates never-verified
queries to the head.  A past green row is treated as durable evidence —
but that is only sound while the query's Spark body and oracle SQL are
the ones the driver actually ran.  Round 2's ADVICE flagged the hole:
editing a green query's oracle silently kept its stale evidence unless
a human remembered to list it in _FORCE_REVERIFY.

This module closes the hole mechanically.  ORACLE_SNAPSHOT.json (repo
root, committed) maps query name -> sha256 of (oracle SQL + query fn
source) *captured at verification time*.  ``verified_names`` counts a
past green only when the snapshot hash still matches the current code;
an edit changes the hash, the green lapses, and the auto-rotation puts
the query back at the head of the next round's window — no manual set
to maintain.  ``refresh_snapshot`` is run once at round start, after a
new CORRECTNESS file lands: names green in that newest file get their
hash refreshed to the current code (that IS what the driver just ran);
older greens are never overwritten, so their evidence stays pinned to
the era it was earned in.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT_PATH = os.path.join(ROOT, "ORACLE_SNAPSHOT.json")


PKG_DIR = os.path.join(ROOT, "hiero_spark")


def _py_modules() -> dict[str, str]:
    """module name -> file path for every .py under hiero_spark/."""
    out: dict[str, str] = {}
    for dirpath, _dirs, files in os.walk(PKG_DIR):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, ROOT)
            mod = rel[:-3].replace(os.sep, ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            out[mod] = path
    return out


def _module_deps(modules: dict[str, str]) -> dict[str, set[str]]:
    """Direct hiero_spark-internal imports per module, via ast.

    `from hiero_spark.functions import dedup` resolves to the submodule
    hiero_spark.functions.dedup when one exists, else to the named module.
    """
    import ast

    deps: dict[str, set[str]] = {m: set() for m in modules}
    for mod, path in modules.items():
        try:
            with open(path) as f:
                tree = ast.parse(f.read())
        except (OSError, SyntaxError):
            continue
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for alias in node.names:
                    if alias.name in modules:
                        deps[mod].add(alias.name)
            elif isinstance(node, ast.ImportFrom) and node.module:
                if not node.module.startswith("hiero_spark"):
                    continue
                for alias in node.names:
                    sub = f"{node.module}.{alias.name}"
                    deps[mod].add(sub if sub in modules else node.module)
        deps[mod] = {d for d in deps[mod] if d in modules}
    # registry.all_queries() imports the queries package purely for its
    # registration side effects; without cutting that edge every query
    # module would transitively depend on every OTHER query module (via
    # registry -> queries/__init__ -> *), making the blast radius global.
    # A query's behavior never depends on sibling query modules it doesn't
    # import directly.
    deps["hiero_spark.registry"] = {
        d for d in deps.get("hiero_spark.registry", set())
        if not d.startswith("hiero_spark.queries")
    }
    return deps


_CLOSURE_CACHE: dict[str, str] = {}
_GRAPH_CACHE: list = []


def _file_digest(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _graph() -> tuple[dict[str, str], dict[str, set[str]]]:
    """(module -> path, module -> direct deps), cached per process —
    evidence checks run against an immutable checkout."""
    if not _GRAPH_CACHE:
        modules = _py_modules()
        _GRAPH_CACHE.append((modules, _module_deps(modules)))
    return _GRAPH_CACHE[0]


def _dep_closure_digest(mod: str) -> str:
    """sha256 over the SOURCES of every hiero_spark module `mod` transitively
    imports (excluding `mod` itself — the registered fn's own source is
    already in the payload)."""
    if mod in _CLOSURE_CACHE:
        return _CLOSURE_CACHE[mod]
    modules, deps = _graph()
    seen: set[str] = set()
    stack = list(deps.get(mod, ()))
    while stack:
        m = stack.pop()
        if m in seen:
            continue
        seen.add(m)
        stack.extend(deps.get(m, ()))
    seen.discard(mod)
    h = hashlib.sha256()
    for m in sorted(seen):
        h.update(m.encode())
        h.update(_file_digest(modules[m]).encode())
    _CLOSURE_CACHE[mod] = h.hexdigest()
    return _CLOSURE_CACHE[mod]


def spec_hash(spec) -> str:
    """sha256 over the oracle SQL, the query function's source, and the
    per-function dependency SLICE digest (round-9 format).

    Rounds 4–6 hashed whole module files plus the transitive import
    closure — sound, but editing one helper in functions/dedup.py lapsed
    100+ pins, so the 50-slot driver window spent rounds re-confirming
    greens whose behavior never changed (round-8 verdict #2).  The slice
    (hiero_spark/evidence_slice.py) follows the names the query function
    actually references down to top-level function/class segments and
    hashes only those, over-approximating to the old whole-module+closure
    digest at every statically-unresolvable point.  Editing a helper now
    lapses exactly its reachable dependents; comment-only edits lapse
    nothing.  A fn the slicer can't anchor (nested def, non-package
    module) falls back to the v2 whole-module format.
    """
    from hiero_spark import evidence_slice

    try:
        src = inspect.getsource(spec.fn)
    except (OSError, TypeError):
        src = ""
    mod = getattr(spec.fn, "__module__", "") or ""
    fn_name = getattr(spec.fn, "__qualname__", "") or getattr(spec.fn, "__name__", "")
    modules, _deps = _graph()
    if "." in fn_name or mod not in modules:
        return _spec_hash_v2(spec)
    sliced = evidence_slice.slice_digest(mod, fn_name, legacy_closure=_dep_closure_digest)
    payload = (
        (spec.oracle or "")
        + "\n---\n" + src
        + "\n---v3---\n" + sliced
    )
    return hashlib.sha256(payload.encode()).hexdigest()


def _spec_hash_v2(spec) -> str:
    """Rounds 6–8 format: oracle + fn source + own-module file digest +
    transitive import-closure digest.  Still used (a) as the fallback for
    fns the slicer can't anchor and (b) by migrate_snapshot_to_v3 to carry
    still-valid v2 pins forward without a global lapse."""
    try:
        src = inspect.getsource(spec.fn)
    except (OSError, TypeError):
        src = ""
    mod = getattr(spec.fn, "__module__", "") or ""
    closure = _dep_closure_digest(mod)
    modules, _deps = _graph()
    own = _file_digest(modules[mod]) if mod in modules else ""
    payload = (
        (spec.oracle or "")
        + "\n---\n" + src
        + "\n---\n" + own
        + "\n---\n" + closure
    )
    return hashlib.sha256(payload.encode()).hexdigest()


def migrate_snapshot_to_v3(write: bool = True) -> tuple[int, int]:
    """Round-9 migration, same soundness argument as the round-6 one: a
    name migrates only when its V2 hash computed on the CURRENT committed
    code equals the pinned value — the code is byte-identical to what the
    driver verified, so the v3 pin carries exactly the same assurance.
    Names that fail the comparison stay lapsed for re-verification.
    Returns (migrated, kept_as_is_or_lapsed)."""
    from hiero_spark.registry import all_queries

    dirty = dirty_python_files()
    if dirty:
        raise SystemExit(f"migrate: commit .py edits first: {dirty}")
    specs = all_queries()
    snap = load_snapshot()
    migrated = other = 0
    for name, pinned in list(snap.items()):
        spec = specs.get(name)
        if spec is not None and _spec_hash_v2(spec) == pinned:
            snap[name] = spec_hash(spec)
            migrated += 1
        else:
            other += 1
    if write:
        with open(SNAPSHOT_PATH, "w") as f:
            json.dump(dict(sorted(snap.items())), f, indent=1)
            f.write("\n")
    return migrated, other


def _legacy_spec_hash(spec) -> str:
    """The pre-round-6 hash format (no own-module digest). Kept ONLY for
    migrate_snapshot_format; never used for new pins."""
    try:
        src = inspect.getsource(spec.fn)
    except (OSError, TypeError):
        src = ""
    closure = _dep_closure_digest(getattr(spec.fn, "__module__", "") or "")
    payload = (spec.oracle or "") + "\n---\n" + src + "\n---\n" + closure
    return hashlib.sha256(payload.encode()).hexdigest()


def migrate_snapshot_format(write: bool = True) -> tuple[int, int]:
    """One-off round-6 migration: re-express still-valid pins in the new
    hash format instead of blanket-lapsing 129 greens.

    Soundness: a name migrates only when its LEGACY hash computed on the
    CURRENT code equals the pinned legacy hash — i.e. the query's oracle,
    fn source, and dependency closure are byte-identical to the state the
    driver verified. For such names the new-format pin carries exactly
    the assurance the old pin did (no more: edits the old format couldn't
    see are equally invisible to a blanket lapse); names edited this
    round fail the legacy comparison and stay lapsed for re-verification.
    Returns (migrated, lapsed).
    """
    from hiero_spark.registry import all_queries

    dirty = dirty_python_files()
    if dirty:
        raise SystemExit(f"migrate: commit .py edits first: {dirty}")
    specs = all_queries()
    snap = load_snapshot()
    migrated = lapsed = 0
    for name, pinned in list(snap.items()):
        spec = specs.get(name)
        if spec is not None and _legacy_spec_hash(spec) == pinned:
            snap[name] = spec_hash(spec)
            migrated += 1
        else:
            lapsed += 1
    if write:
        with open(SNAPSHOT_PATH, "w") as f:
            json.dump(dict(sorted(snap.items())), f, indent=1)
            f.write("\n")
    return migrated, lapsed


def correctness_files() -> list[str]:
    return sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))


def green_names(path: str) -> set[str]:
    """Names fully green (rows+schema+hash, no err) in one driver file."""
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return set()
    return {
        name
        for name, rec in data.items()
        if isinstance(rec, dict)
        and rec.get("err") is None
        and rec.get("rows_match")
        and rec.get("schema_match")
        and rec.get("hash_match")
    }


def all_green() -> set[str]:
    out: set[str] = set()
    for p in correctness_files():
        out |= green_names(p)
    return out


def all_ran() -> set[str]:
    """Names with ANY driver correctness entry — including rows-only
    checks (err == "no_oracle") and failures.  Distinguishes
    "never driver-RUN at all" (zero evidence of any kind — front of the
    window, r8 design) from "ran, but only the weaker rows check"
    (a recent rows pass + a green hash-checked twin — behind lapsed
    oracle greens while the lapse backlog drains, round-11 refinement)."""
    out: set[str] = set()
    for p in correctness_files():
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        out |= {n for n, rec in data.items() if isinstance(rec, dict)}
    return out


def latest_green_round() -> dict[str, int]:
    """name -> newest round number in which the driver saw it fully green.

    Drives the rotation's oldest-evidence-first tail: once every query is
    verified, the surplus driver slots re-confirm the stalest greens so
    evidence keeps rolling across the registry instead of re-hashing the
    same head every round.
    """
    out: dict[str, int] = {}
    for p in correctness_files():
        m = re.search(r"_r(\d+)\.json$", p)
        rnum = int(m.group(1)) if m else 0
        for name in green_names(p):
            out[name] = max(out.get(name, 0), rnum)
    return out


def load_snapshot() -> dict[str, str]:
    try:
        with open(SNAPSHOT_PATH) as f:
            snap = json.load(f)
    except (OSError, ValueError):
        return {}
    return {k: v for k, v in snap.items() if isinstance(v, str)}


def verified_names(specs, force_reverify: frozenset[str] = frozenset()) -> set[str]:
    """Driver greens whose code+oracle still hash to the verified-era value.

    A name missing from the snapshot (or whose hash drifted) is NOT
    verified — it rotates back into the head of the window.
    """
    snap = load_snapshot()
    out: set[str] = set()
    for name in all_green():
        if name in force_reverify:
            continue
        spec = specs.get(name)
        if spec is None:
            continue
        if snap.get(name) == spec_hash(spec):
            out.add(name)
    return out


def dirty_python_files() -> list[str]:
    """Uncommitted .py changes (tracked mods or untracked files) in the repo.

    Provenance guard for refresh_snapshot: stamping is only sound while
    the working tree's query code IS the code the driver just ran, i.e.
    immediately at round start before any edits.  Non-.py noise (docs,
    driver-written JSON) is ignored — it can't change a spec hash.
    """
    try:
        out = subprocess.run(
            ["git", "status", "--porcelain"],
            capture_output=True, text=True, cwd=ROOT, check=True,
        ).stdout
    except (OSError, subprocess.SubprocessError):
        return []  # not a git checkout: nothing to check against
    return [
        line[3:] for line in out.splitlines()
        if line[3:].endswith(".py")
    ]


def code_unchanged_since_newest_correctness() -> bool:
    """True iff the working tree's .py code IS the code the driver ran for
    the newest CORRECTNESS file — the condition under which refresh_snapshot
    is a no-op formality rather than a provenance decision.

    Two cases (round-7 verdict item 1 — the recurring boundary red):

    * The newest CORRECTNESS file is already committed (normal round start):
      sound iff no .py file differs between the commit that last touched it
      (the driver's round-end commit, whose tree the driver executed) and
      the current working tree.
    * The file is not yet in git (judge-time: the driver writes it AFTER the
      round's last commit but BEFORE its own bookkeeping commit): the driver
      ran HEAD's code, so sound iff the working tree has no .py edits.
    """
    files = correctness_files()
    if not files:
        return False
    if dirty_python_files():
        return False
    rel = os.path.relpath(files[-1], ROOT)
    try:
        commit = subprocess.run(
            ["git", "log", "--format=%H", "-n", "1", "--", rel],
            capture_output=True, text=True, cwd=ROOT, check=True,
        ).stdout.strip()
        if not commit:
            return True  # untracked correctness file: driver ran HEAD == tree
        diff = subprocess.run(
            ["git", "diff", "--name-only", f"{commit}..HEAD"],
            capture_output=True, text=True, cwd=ROOT, check=True,
        ).stdout
    except (OSError, subprocess.SubprocessError):
        return False
    return not any(line.endswith(".py") for line in diff.splitlines())


def refresh_snapshot(write: bool = True, force: bool = False) -> dict[str, str]:
    """Round-start maintenance: pin hashes for the newest round's greens.

    Only the NEWEST CORRECTNESS file's greens are (re)stamped with the
    current hash — the driver just ran this exact code against them.
    Older greens keep whatever hash they were stamped with; if they have
    none, they stay unverified until a driver round re-covers them.

    Refuses to stamp while uncommitted .py edits exist (unless ``force``):
    run after editing a green query and the stamp would certify code the
    driver never executed — the provenance hole round-3 ADVICE flagged.
    """
    from hiero_spark.registry import all_queries

    dirty = dirty_python_files()
    if dirty and not force:
        raise SystemExit(
            "refresh_snapshot: uncommitted .py changes present — the current "
            "code may not be what the driver ran. Run at round start before "
            f"editing, or force=True. Dirty: {dirty}"
        )
    specs = all_queries()
    snap = load_snapshot()
    files = correctness_files()
    if files:
        for name in green_names(files[-1]):
            if name in specs:
                snap[name] = spec_hash(specs[name])
    if write:
        with open(SNAPSHOT_PATH, "w") as f:
            json.dump(dict(sorted(snap.items())), f, indent=1)
            f.write("\n")
    return snap


def _round_commit(rnum: int) -> str | None:
    """Commit that added CORRECTNESS_r{N}.json — the driver's bookkeeping
    commit.  The driver executes HEAD's .py tree, then commits the JSON on
    top without touching .py files, so this commit's Python tree IS the
    code the round's greens were earned against."""
    rel = f"CORRECTNESS_r{rnum:02d}.json"
    try:
        out = subprocess.run(
            ["git", "log", "--format=%H", "--diff-filter=A", "--", rel],
            capture_output=True, text=True, cwd=ROOT, check=True,
        ).stdout.strip().splitlines()
    except (OSError, subprocess.SubprocessError):
        return None
    return out[0] if out else None


def repin_unchanged_since_green(write: bool = True, verbose: bool = False) -> dict[str, int]:
    """Bulk re-pin: recover lapsed greens whose hash-relevant code is
    byte-identical to the commit the driver verified them at.

    Why lapses outlive their cause: pins stamped in the v2 (whole-module +
    transitive-closure) era lapsed whenever ANY module in the closure was
    edited; the round-9 v3 slice hash bounds new lapses, but a v2-era lapse
    can't be recovered by comparing against the stored pin (it's in the old
    format).  Soundness here comes from a different comparison: compute the
    CURRENT v3 hash twice — once on HEAD, once on the era commit's tree
    (temp worktree, HEAD's evidence/evidence_slice code overlaid; neither
    module is imported by any query module, so the overlay is hash-neutral)
    — and re-pin only on equality.  Equal v3 hashes mean the oracle, the fn
    source, and every hash-relevant dependency segment are byte-identical
    to what the driver ran, which is exactly the assurance a fresh stamp
    would carry.  Names whose slices genuinely changed stay lapsed.

    Returns {round: names_repinned} for reporting.
    """
    import shutil
    import tempfile

    from hiero_spark.registry import all_queries

    dirty = dirty_python_files()
    if dirty:
        raise SystemExit(f"repin: commit .py edits first: {dirty}")
    specs = all_queries()
    snap = load_snapshot()
    verified = verified_names(specs)
    green_round = latest_green_round()
    # lapsed = ever-green, still registered, hash no longer matches the pin
    by_round: dict[int, list[str]] = {}
    for name, rnum in green_round.items():
        if name in verified or name not in specs:
            continue
        by_round.setdefault(rnum, []).append(name)
    repinned: dict[str, int] = {}
    worker = (
        "import json, sys\n"
        "from hiero_spark import evidence\n"
        "from hiero_spark.registry import all_queries\n"
        "specs = all_queries()\n"
        "names = json.load(open(sys.argv[1]))\n"
        "out = {n: evidence.spec_hash(specs[n]) for n in names if n in specs}\n"
        "json.dump(out, open(sys.argv[2], 'w'))\n"
    )
    for rnum, names in sorted(by_round.items()):
        commit = _round_commit(rnum)
        if commit is None:
            continue
        wt = tempfile.mkdtemp(prefix=f"hiero_repin_r{rnum}_")
        try:
            subprocess.run(
                ["git", "worktree", "add", "--detach", wt, commit],
                capture_output=True, text=True, cwd=ROOT, check=True,
            )
            for fname in ("evidence.py", "evidence_slice.py"):
                src = os.path.join(PKG_DIR, fname)
                if os.path.exists(src):
                    shutil.copy(src, os.path.join(wt, "hiero_spark", fname))
            names_f = os.path.join(wt, "_repin_names.json")
            out_f = os.path.join(wt, "_repin_hashes.json")
            with open(names_f, "w") as f:
                json.dump(names, f)
            env = dict(os.environ, PYTHONPATH=wt)
            proc = subprocess.run(
                # sys.executable, not bare "python": on hosts exposing only
                # python3 the worker would fail and silently skip every round
                [sys.executable, "-c", worker, names_f, out_f],
                capture_output=True, text=True, cwd=wt, env=env,
            )
            if proc.returncode != 0:
                if verbose:
                    print(f"r{rnum}: era import failed, skipped "
                          f"({proc.stderr.strip().splitlines()[-1:]})")
                continue
            with open(out_f) as f:
                era_hashes = json.load(f)
            n = 0
            for name in names:
                cur = spec_hash(specs[name])
                if era_hashes.get(name) == cur:
                    snap[name] = cur
                    n += 1
                elif verbose:
                    print(f"r{rnum}: {name} changed since green, stays lapsed")
            repinned[f"r{rnum}"] = n
        finally:
            subprocess.run(["git", "worktree", "remove", "--force", wt],
                           capture_output=True, cwd=ROOT)
            shutil.rmtree(wt, ignore_errors=True)
    if write:
        with open(SNAPSHOT_PATH, "w") as f:
            json.dump(dict(sorted(snap.items())), f, indent=1)
            f.write("\n")
    return repinned


if __name__ == "__main__":
    if "--repin" in sys.argv:
        stats = repin_unchanged_since_green(verbose="-v" in sys.argv)
        print(f"repinned: {stats}")
    else:
        refreshed = refresh_snapshot()
        print(f"snapshot: {len(refreshed)} pinned hashes -> {SNAPSHOT_PATH}")
