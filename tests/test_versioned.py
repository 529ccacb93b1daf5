"""Snapshot-versioned tables: time travel, O(delta) diff, vacuum."""

import os

import pytest

from hiero_spark.sources import versioned as V


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v0 = spark.range(10).selectExpr("id", "id * 2 AS val")
    m = V.commit_version(v0, path, mode="append")
    assert m["version"] == 0 and m["op"] == "create"
    return path


def test_append_and_time_travel(spark, table):
    before = V.read_version(spark, table, 0).orderBy("id").collect()
    V.commit_version(
        spark.range(10, 15).selectExpr("id", "id * 2 AS val"), table, "append"
    )
    assert V.list_versions(table) == [0, 1]
    assert V.read_version(spark, table).count() == 15        # latest
    assert V.read_version(spark, table, 0).count() == 10     # travel
    # v0 is byte-stable: same rows after the append
    assert V.read_version(spark, table, 0).orderBy("id").collect() == before


def test_overwrite_starts_fresh_but_keeps_history(spark, table):
    V.commit_version(spark.range(3).selectExpr("id", "id AS val"), table, "overwrite")
    assert V.read_version(spark, table).count() == 3
    assert V.read_version(spark, table, 0).count() == 10


def test_diff_reads_only_delta_files(spark, table):
    V.commit_version(
        spark.range(10, 15).selectExpr("id", "id * 2 AS val"), table, "append"
    )
    diff = V.version_diff(spark, table, 0, 1, "id")
    got = {(r.id, r.change) for r in diff.collect()}
    assert got == {(i, "added") for i in range(10, 15)}
    # the scan planned ONLY the delta commit's files (commit dirs carry a
    # per-attempt unique suffix since the atomic-commit protocol)
    assert all("/c00001-" in f for f in diff.inputFiles())


def test_diff_overwrite_nets_out_common_rows(spark, table):
    # overwrite keeps ids 5..9 (rewritten) and adds 10..11; drops 0..4
    V.commit_version(
        spark.range(5, 12).selectExpr("id", "id * 2 AS val"), table, "overwrite"
    )
    got = {(r.id, r.change) for r in V.version_diff(spark, table, 0, 1, "id").collect()}
    assert got == {(i, "added") for i in (10, 11)} | {
        (i, "removed") for i in range(5)
    }


def test_vacuum_deletes_only_unreferenced(spark, table):
    V.commit_version(spark.range(3).selectExpr("id", "id AS val"), table, "overwrite")
    V.commit_version(
        spark.range(3, 6).selectExpr("id", "id AS val"), table, "append"
    )
    # keep v1+v2: v0's files are referenced by NOTHING retained
    # (retention 0 = exclusive-access mode; the default age guard is
    # exercised in test_vacuum_retention_spares_young_unreferenced)
    audit = V.vacuum(table, keep_last=2, retention_seconds=0)
    assert audit["versions_kept"] == [1, 2]
    assert audit["files_deleted"] > 0
    assert V.read_version(spark, table).count() == 6
    assert V.read_version(spark, table, 1).count() == 3
    with pytest.raises(FileNotFoundError):
        V.read_version(spark, table, 0)


def test_vacuum_keeps_append_chain_alive(spark, table):
    V.commit_version(
        spark.range(10, 15).selectExpr("id", "id * 2 AS val"), table, "append"
    )
    # v1 references v0's files, so keep_last=1 must NOT delete them
    audit = V.vacuum(table, keep_last=1, retention_seconds=0)
    assert audit["files_deleted"] == 0
    assert V.read_version(spark, table, 1).count() == 15


def test_two_writer_race_exactly_one_winner_per_version(spark, table):
    """Round-8 verdict #6: concurrent commit_version calls — each must
    win a DISTINCT version, neither may clobber the other's rows, and a
    concurrent reader must never observe a torn manifest (unparseable
    JSON or a reference to a missing file)."""
    import json as _json
    import os as _os
    import threading

    results, errors, torn = [], [], []
    barrier = threading.Barrier(2)
    stop = threading.Event()

    def writer(lo):
        try:
            barrier.wait()
            m = V.commit_version(
                spark.range(lo, lo + 5).selectExpr("id", "id * 2 AS val"),
                table,
                "append",
            )
            results.append(m["version"])
        except Exception as e:  # noqa: BLE001 - recorded for the assert
            errors.append(e)

    def poller():
        while not stop.is_set():
            for v in V.list_versions(table):
                try:
                    with open(_os.path.join(table, "_manifest", f"v{v:05d}.json")) as fh:
                        man = _json.load(fh)
                    missing = [
                        f for f in man["files"]
                        if not _os.path.exists(_os.path.join(table, f))
                    ]
                    if missing:
                        torn.append((v, missing))
                except (ValueError, OSError) as e:
                    torn.append((v, repr(e)))

    threads = [
        threading.Thread(target=writer, args=(100,)),
        threading.Thread(target=writer, args=(200,)),
    ]
    p = threading.Thread(target=poller)
    p.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    p.join()
    assert not errors, errors
    assert sorted(results) == [1, 2]      # both committed, distinct versions
    assert not torn, torn                 # no reader ever saw a torn version
    latest = V.read_version(spark, table)
    assert latest.count() == 20           # 10 base + 5 + 5: nothing clobbered
    got = {r["id"] for r in latest.collect()}
    assert got == set(range(10)) | set(range(100, 105)) | set(range(200, 205))


def test_two_stager_race_exactly_one_claims_the_stage(spark, table):
    import threading

    wins, losses, errors = [], [], []
    barrier = threading.Barrier(2)

    def stager(lo):
        try:
            barrier.wait()
            V.commit_staged(
                spark.range(lo, lo + 3).selectExpr("id", "id * 2 AS val"),
                table,
                "append",
            )
            wins.append(lo)
        except RuntimeError:
            losses.append(lo)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=stager, args=(50,)),
        threading.Thread(target=stager, args=(60,)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(wins) == 1 and len(losses) == 1
    published = V.publish_staged(table)
    assert published["version"] == 1
    assert V.read_version(spark, table).count() == 13  # base 10 + one stage


def test_publish_staged_keeps_interleaved_commits(spark, table):
    """A commit that lands while a stage is being audited must survive
    the publish: the staged append re-derives its history file list
    against the NEW latest."""
    V.commit_staged(
        spark.range(30, 33).selectExpr("id", "id * 2 AS val"), table, "append"
    )
    V.commit_version(
        spark.range(40, 44).selectExpr("id", "id * 2 AS val"), table, "append"
    )
    m = V.publish_staged(table)
    assert m["version"] == 2
    got = {r["id"] for r in V.read_version(spark, table).collect()}
    assert got == set(range(10)) | set(range(30, 33)) | set(range(40, 44))


def test_compaction_refuses_to_clobber_interleaved_commit(spark, table, monkeypatch):
    """Compaction plans against a specific latest version; if another
    commit lands before its publish, retrying would silently drop that
    commit's files — it must raise ConcurrentCommitError instead."""
    V.commit_version(
        spark.range(10, 13).selectExpr("id", "id * 2 AS val"), table, "append"
    )
    real_write = V._write_commit_files

    def interleave_then_write(df, path, hint):
        files = real_write(df, path, hint)
        # another writer sneaks a commit in AFTER the compaction planned
        # and wrote its files, BEFORE its manifest publish
        monkeypatch.setattr(V, "_write_commit_files", real_write)
        V.commit_version(
            df.sparkSession.range(90, 92).selectExpr("id", "id * 2 AS val"),
            path,
            "append",
        )
        return files

    monkeypatch.setattr(V, "_write_commit_files", interleave_then_write)
    with pytest.raises(V.ConcurrentCommitError):
        V.compact_version(spark, table, target_files=1)
    # the interleaved commit is intact and latest
    got = {r["id"] for r in V.read_version(spark, table).collect()}
    assert got == set(range(13)) | {90, 91}


def test_vacuum_spares_in_flight_staged_commit(spark, table):
    """Round-8 ADVICE: a staged commit's files are referenced only by
    staged.json; vacuum mid-stage must not delete them out from under
    publish_staged."""
    V.commit_version(
        spark.range(10, 15).selectExpr("id", "id * 2 AS val"), table, "overwrite"
    )
    V.commit_staged(
        spark.range(20, 24).selectExpr("id", "id * 2 AS val"), table, "append"
    )
    audit = V.vacuum(table, keep_last=1, retention_seconds=0)  # drops v0
    assert audit["versions_kept"] == [1]
    published = V.publish_staged(table)
    assert published["version"] == 2
    # the staged rows survived the vacuum and are readable post-publish
    assert V.read_version(spark, table).count() == 9
    assert {r["id"] for r in V.read_version(spark, table).collect()} == (
        set(range(10, 15)) | set(range(20, 24))
    )


def test_bad_inputs(spark, table):
    with pytest.raises(ValueError):
        V.commit_version(spark.range(1), table, mode="merge")
    with pytest.raises(FileNotFoundError):
        V.read_version(spark, table, 99)


def test_compaction_preserves_rows_and_history(spark, table):
    # five tiny appends -> many small files
    for i in range(1, 6):
        V.commit_version(
            spark.range(i * 100, i * 100 + 5).selectExpr("id", "id * 2 AS val"),
            table,
        )
    before = V.read_version(spark, table)
    n_files_before = len(V._load_manifest(table, 5)["files"])
    stats = V.compact_version(spark, table, target_files=1)
    assert stats["version"] == 6 and stats["compacted"] == n_files_before
    after = V.read_version(spark, table)  # latest = compacted
    assert sorted(map(tuple, after.collect())) == sorted(
        map(tuple, before.collect())
    )
    assert len(V._load_manifest(table, 6)["files"]) == 1
    # every old version still reads its own files byte-stably
    assert V.read_version(spark, table, 0).count() == 10
    assert V.read_version(spark, table, 5).count() == 35


def test_compaction_threshold_keeps_big_files(spark, table):
    # one big commit + two tiny ones; threshold compacts only the tiny
    V.commit_version(
        spark.range(1000, 6000).selectExpr("id", "id * 2 AS val"), table
    )
    big = set(V._load_manifest(table, 1)["files"])
    V.commit_version(spark.range(1, 3).selectExpr("id", "id * 2 AS val"), table)
    V.commit_version(spark.range(3, 5).selectExpr("id", "id * 2 AS val"), table)
    big_size = min(
        os.path.getsize(os.path.join(table, f)) for f in big
    )
    stats = V.compact_version(
        spark, table, target_files=1, small_threshold_bytes=big_size
    )
    files = V._load_manifest(table, stats["version"])["files"]
    assert big <= set(files)  # big files referenced verbatim, not rewritten
    assert V.read_version(spark, table).count() == 10 + 5000 + 4


def test_compaction_noop_when_nothing_small(spark, table):
    stats = V.compact_version(spark, table, target_files=2)
    # v0 wrote few files; <= target means no new commit
    if stats["compacted"] == 0:
        assert V.list_versions(table)[-1] == 0


def test_schema_evolution_add_column(spark, table):
    evolved = spark.range(100, 103).selectExpr(
        "id", "id * 2 AS val", "CONCAT('s', id) AS note"
    )
    V.commit_version(evolved, table)
    df = V.read_version_evolved(spark, table)
    assert set(df.columns) == {"id", "val", "note"}
    rows = {r.id: r.note for r in df.collect()}
    assert rows[100] == "s100" and rows[0] is None  # old rows -> NULL
    # plain read of the OLD version is untouched by evolution
    assert set(V.read_version(spark, table, 0).columns) == {"id", "val"}


def test_wap_publish_on_clean_audit(spark, table):
    from hiero_spark.functions.checks import Checks

    batch = spark.range(100, 105).selectExpr("id", "id * 2 AS val")
    res = V.wap_commit(
        spark, batch, table,
        Checks().not_null("id").unique("id").in_range("val", 0, 10_000),
    )
    assert res["published"] and res["version"] == 1
    assert V.read_version(spark, table).count() == 15
    assert all(r["passed"] for r in res["report"])


def test_wap_abort_never_publishes_bad_data(spark, table):
    from hiero_spark.functions.checks import Checks

    bad = spark.range(5, 8).selectExpr("id", "id * 2 AS val")  # id 5-7 dup v0
    res = V.wap_commit(spark, bad, table, Checks().unique("id"))
    assert not res["published"]
    # table is EXACTLY as before: one version, 10 rows, no staged leftovers
    assert V.list_versions(table) == [0]
    assert V.read_version(spark, table).count() == 10
    assert not os.path.exists(
        os.path.join(table, "_manifest", "staged.json")
    )
    # a later clean commit gets the recycled version number
    ok = spark.range(100, 102).selectExpr("id", "id * 2 AS val")
    res2 = V.wap_commit(spark, ok, table, Checks().unique("id"))
    assert res2["published"] and res2["version"] == 1


def test_staged_invisible_to_readers(spark, table):
    batch = spark.range(200, 203).selectExpr("id", "id * 2 AS val")
    V.commit_staged(batch, table)
    assert V.list_versions(table) == [0]
    assert V.read_version(spark, table).count() == 10  # reader blind to stage
    assert V.read_staged(spark, table).count() == 13   # auditor sees all
    with pytest.raises(RuntimeError):
        V.commit_staged(batch, table)  # single staged commit at a time
    V.abort_staged(table)
    assert V.read_version(spark, table).count() == 10


def test_vacuum_retention_spares_young_unreferenced(spark, table):
    """Round-9 ADVICE (medium): a commit that has written its unique
    data/c*/ dir but not yet won the manifest publish is referenced by
    nothing vacuum can see.  The default age guard must spare such young
    files; retention_seconds=0 (exclusive access) deletes them."""
    V.commit_version(
        spark.range(5).selectExpr("id", "id AS val"), table, "overwrite"
    )
    # simulate the in-flight window: data files exist, no manifest yet
    inflight = V._write_commit_files(
        spark.range(100, 103).selectExpr("id", "id AS val"), table, hint=1
    )
    audit = V.vacuum(table, keep_last=1)  # default retention: 24 h
    assert audit["files_deleted"] == 0
    assert audit["files_skipped_young"] >= len(inflight)
    for rel in inflight:
        assert os.path.exists(os.path.join(table, rel)), (
            "vacuum deleted an in-flight commit's files"
        )
    # the in-flight writer can still win its publish afterwards
    def build(new_v, prev):
        prev_files = prev["files"] if prev else []
        return {"version": new_v, "op": "append",
                "files": prev_files + inflight,
                "n_files": len(prev_files) + len(inflight)}
    V._publish_manifest(table, build)
    assert V.read_version(spark, table).count() == 8
    # exclusive-access mode still reclaims genuinely dead files
    V.commit_version(spark.range(1).selectExpr("id", "id AS val"),
                     table, "overwrite")
    audit2 = V.vacuum(table, keep_last=1, retention_seconds=0)
    assert audit2["files_deleted"] > 0 and audit2["files_skipped_young"] == 0


def test_publish_staged_legacy_create_keeps_interleaved_commit(spark, tmp_path):
    """Round-9 ADVICE (low): a legacy stage (no 'mode' field) taken with
    mode=append on an EMPTY table carries op 'staged-create'; if an
    interleaved commit publishes before the stage does, the recovered
    'create' must be promoted to append so the interleaved files are
    kept, not clobbered."""
    import json as _json

    table = str(tmp_path / "empty_tbl")  # no fixture v0: stage-on-empty
    V.commit_staged(
        spark.range(20, 23).selectExpr("id", "id AS val"), table, "append"
    )
    sp = os.path.join(table, "_manifest", "staged.json")
    with open(sp) as fh:
        staged = _json.load(fh)
    assert staged["op"] == "staged-create"  # premise: staged on empty table
    del staged["mode"]                      # make it a legacy-format stage
    with open(sp, "w") as fh:
        _json.dump(staged, fh)
    # interleaved commit lands between stage and publish
    V.commit_version(
        spark.range(5).selectExpr("id", "id AS val"), table, "append"
    )
    published = V.publish_staged(table)
    assert published["op"] == "append"
    got = {r["id"] for r in V.read_version(spark, table).collect()}
    assert got == set(range(5)) | {20, 21, 22}, (
        "interleaved commit was clobbered by the legacy-create recovery"
    )
