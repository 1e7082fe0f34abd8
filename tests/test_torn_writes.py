"""Torn-write recovery matrix (r16 adversarial axis, VERDICT r15
"Next round" #7 candidate list): every durable metadata file the
engine writes, truncated or garbled mid-byte — the power-loss /
lost-tail-block shape that kill/resume testing cannot produce.

Findings on first run: the versioned table's append-mode snapshot
log BRICKED the whole table on a torn final line (every operation
routes through _read_meta's per-line json.loads) — fixed by
tolerating exactly the torn-tail record, which is the already-
handled crash-between-rename-and-metadata-append state. The other
three writers already degraded correctly and are pinned here so they
stay that way: a torn watermark store reads as absent and an
existing mat table then REFUSES the cycle loudly (no silent
re-append duplication), a torn layout sidecar reads as
layout-unknown and the next merge migrates with a full rewrite, and
a torn M4 append journal raises the documented inspect-and-remove
error instead of guessing at rollback."""

from __future__ import annotations

import os

import pytest


def _truncate_tail(path: str, n_bytes: int = 7) -> None:
    size = os.path.getsize(path)
    with open(path, "r+b") as fh:
        fh.truncate(size - n_bytes)


def test_versioned_snapshot_log_torn_tail_does_not_brick(spark, tmp_path):
    from streaming_data_lake_spark.sources.versioned import VersionedTable

    ref = str(tmp_path / "t")
    vt = VersionedTable(spark, ref)
    vt.commit(spark.range(0, 50).selectExpr("id", "id * 2 AS v"), "append")
    vt.commit(spark.range(50, 80).selectExpr("id", "id * 2 AS v"), "append")
    meta_path = os.path.join(ref, "_snapshots.json")
    _truncate_tail(meta_path)  # tear the v2 record mid-byte

    vt2 = VersionedTable(spark, ref)
    # the torn record is dropped; the table is NOT bricked
    assert vt2.latest_version() == 1
    assert vt2.snapshots().count() == 1
    assert vt2.read(1).count() == 50
    # the unrecorded v2 DIR exists (the documented crash state) and
    # the next commit numbers PAST it instead of colliding
    assert os.path.isdir(os.path.join(ref, "v2"))
    v = vt2.commit(spark.range(80, 90).selectExpr("id", "id * 2 AS v"), "append")
    assert v == 3
    assert vt2.read(3).count() == 60  # v1-linked files + the new rows


def test_versioned_snapshot_log_torn_middle_line_raises(spark, tmp_path):
    """An append-only log tears only at the tail; an unparseable
    MIDDLE line is real corruption and must surface, not be skipped
    (skipping would silently renumber history)."""
    from streaming_data_lake_spark.sources.versioned import VersionedTable

    ref = str(tmp_path / "t")
    vt = VersionedTable(spark, ref)
    vt.commit(spark.range(0, 10).selectExpr("id"), "append")
    vt.commit(spark.range(10, 20).selectExpr("id"), "append")
    meta_path = os.path.join(ref, "_snapshots.json")
    lines = open(meta_path).read().splitlines()
    lines[0] = lines[0][: len(lines[0]) // 2]  # tear the FIRST record
    with open(meta_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    with pytest.raises(ValueError, match="NON-final"):
        VersionedTable(spark, ref).snapshots()


def test_torn_watermark_store_self_heals_by_deriving_max_ts(spark, tmp_path):
    """A torn watermark JSON reads as ABSENT (the shape-tolerant
    reader). r17: instead of refusing the cycle forever (the old
    permanent wedge — it also fired when a crash landed between M1's
    publish and the first watermark write), the cycle DERIVES the
    lost watermark from max(ts): M6's at-rest invariant is wm ==
    max(ts), so the derivation is exact, not a guess — M4 appends
    nothing already present (no silent re-append duplication, the
    hazard the old refusal guarded) and the cycle completes."""
    from streaming_data_lake_spark.plans.materialize import Materializer, MatTarget

    lake = str(tmp_path / "lake")
    src = os.path.join(lake, "src")
    os.makedirs(lake, exist_ok=True)
    spark.sql(
        "SELECT id AS event_id, timestamp'2024-06-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts,"
        " id % 7 AS user_id FROM range(200)"
    ).write.parquet(src)

    target = MatTarget(
        name="mat_torn_wm",
        view=lambda s: s.read.parquet(src),
        ts_col="ts",
    )
    m = Materializer(spark, lake)
    log = m.run(target)
    assert "M1" in log
    wm_json = m._wm_json_path()
    assert os.path.exists(wm_json)
    _truncate_tail(wm_json, 3)
    assert m.get_watermark("mat_torn_wm") is None  # torn -> absent
    log2 = m.run(target)
    assert log2.get("M6:recovery", "").startswith("derived watermark")
    # NO duplication: the derived wm == max(ts), so M4 appended nothing
    assert log2["M4"] == "appended 0"
    assert m.read_mat("mat_torn_wm").count() == 200
    # the store is healed; the next cycle is a plain no-op cycle
    log3 = m.run(target)
    assert "M6:recovery" not in log3
    assert m.read_mat("mat_torn_wm").count() == 200


def test_torn_layout_sidecar_migrates_with_full_rewrite(spark, tmp_path):
    """A torn _layout.json reads as None (layout unknown) and the
    next merge MIGRATES with one atomic full rewrite instead of
    probing buckets by a possibly-wrong hash — pinned end to end:
    merge result correct, sidecar re-written whole."""
    from streaming_data_lake_spark.layout import layout_path, read_layout_meta
    from streaming_data_lake_spark.sources.upsert import merge_upsert, read_upsert

    tdir = str(tmp_path / "t")
    base = spark.sql(
        "SELECT id AS k, timestamp'2024-06-01' + make_interval(0,0,0,id) AS ts, id * 10 AS v"
        " FROM range(100)"
    )
    merge_upsert(spark, tdir, base, ["k", "ts"], ts_col="ts")
    sidecar = layout_path(tdir)
    assert os.path.exists(sidecar)
    _truncate_tail(sidecar, 5)
    assert read_layout_meta(tdir) is None  # torn -> layout unknown

    upd = spark.sql(
        "SELECT id AS k, timestamp'2024-06-01' + make_interval(0,0,0,id) AS ts, id * 10 + 1 AS v"
        " FROM range(40)"
    )
    merge_upsert(spark, tdir, upd, ["k", "ts"], ts_col="ts")
    got = {r["k"]: r["v"] for r in read_upsert(spark, tdir).collect()}
    assert len(got) == 100
    assert all(got[k] == k * 10 + 1 for k in range(40))
    assert all(got[k] == k * 10 for k in range(40, 100))
    meta = read_layout_meta(tdir)
    assert meta is not None and meta["keys"] == ["k", "ts"]  # healed


def test_torn_m4_journal_raises_inspect_and_remove(spark, tmp_path):
    """A torn M4 append journal must SURFACE, not guess at rollback:
    the file list is unreadable, so deleting by guess could drop
    committed data and proceeding could duplicate the increment."""
    import datetime as dt

    from streaming_data_lake_spark.plans.materialize import Materializer

    lake = str(tmp_path / "lake")
    m = Materializer(spark, lake)
    os.makedirs(m.wm_dir, exist_ok=True)
    with open(m._m4_intent_path("t"), "w") as fh:
        fh.write('{"wm_us": 123, "files": ["a.parq')  # torn mid-list
    with pytest.raises(RuntimeError, match="inspect and remove"):
        m._recover_m4("t", dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc), lake)


def test_sweeper_clock_skew_only_shortens_retention(tmp_path, monkeypatch):
    """Clock-skew axis (the third VERDICT r15 #7 candidate), bounded
    pin: the orphan sweep's age guard compares the SWEEPER's clock
    against FILESYSTEM timestamps, so cross-host skew (NFS) can
    misjudge age. The safe direction is pinned — a sweeper running
    AHEAD by more than min_age reclaims retained versions early
    (shortening the straddling-reader window, acceptable) but never
    touches the live table or restores over a present base. The
    dangerous direction (restoring mid-swap when the base is
    transiently missing) is excluded by the documented deployment
    assumption |skew| << min_age (1h default), now stated in the
    remove_orphans docstring."""
    import time as _time

    import streaming_data_lake_spark.overlay as overlay
    from streaming_data_lake_spark.plans.maintenance import remove_orphans

    lake = tmp_path / "lake"
    lake.mkdir()
    live = lake / "t"
    live.mkdir()
    (live / "v1.parquet").write_text("v1")
    tmp = overlay.tmp_sibling(str(live))
    os.makedirs(tmp)
    with open(os.path.join(tmp, "v2.parquet"), "w") as fh:
        fh.write("v2")
    overlay.atomic_swap(str(live), tmp)
    # default guard, honest clock: the fresh retained version is young
    assert remove_orphans(str(lake)) == []
    # sweeper clock 2h ahead: the same entry looks stale and is
    # reclaimed EARLY — but the live table is untouched and nothing
    # is restored over it
    real_time = _time.time
    monkeypatch.setattr(_time, "time", lambda: real_time() + 7200)
    actions = remove_orphans(str(lake))
    assert len(actions) == 1 and not actions[0].startswith("restored:")
    assert os.listdir(live) == ["v2.parquet"]
    assert [e for e in os.listdir(lake) if "__" in e] == []


def test_expire_parks_versions_instead_of_inline_delete(spark, tmp_path, monkeypatch):
    """r16, last member of the dying-listing class: expire_snapshots
    used to rmtree an expiring version INLINE — a reader whose
    read.parquet LISTING raced the (non-atomic, possibly slow)
    recursive delete could plan over the surviving SUBSET of files
    and return a silently partial count. Expiry now renames the
    version to table-internal scratch in ONE atomic step: there is
    no in-between state to list, so a straddling reader gets either
    the complete version or a LOUD error (FILE_NOT_EXIST /
    PATH_NOT_FOUND) — never a quiet subset. Metadata expiry is
    immediate; the age-guarded scratch sweep reclaims the bytes at a
    later commit or expire."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from streaming_data_lake_spark.sources.versioned import VersionedTable

    ref = str(tmp_path / "t")
    vt = VersionedTable(spark, ref)
    vt.commit(spark.range(0, 50).toDF("id"))
    vt.commit(spark.range(50, 60).toDF("id"))
    vt.commit(spark.range(60, 65).toDF("id"))

    # a reader that planned over v1 BEFORE the expiry...
    reader = spark.read.parquet(os.path.join(ref, "v1"))
    assert vt.expire_snapshots(keep_last=1) == [1, 2]
    # ...fails LOUDLY afterwards — an expired-snapshot scan must
    # never return a quiet subset (Iceberg expire semantics: expiry
    # breaks concurrent readers of the expired snapshot, visibly)
    with _pytest.raises(Py4JJavaError, match="FILE_NOT_EXIST|does not exist"):
        reader.count()
    # fresh lookups fail loudly too, immediately
    with _pytest.raises(ValueError, match="does not exist"):
        vt.read(1)
    scratch = [e for e in os.listdir(ref) if "__tmp_" in e]
    assert len(scratch) == 2  # v1 and v2, parked
    # the age-guarded sweep reclaims parked bytes at the next commit
    monkeypatch.setattr(VersionedTable, "_SCRATCH_MIN_AGE_S", 0.0)
    vt.commit(spark.range(65, 70).toDF("id"))
    assert [e for e in os.listdir(ref) if "__tmp_" in e] == []
    assert vt.read(4).count() == 70  # self-contained: v3's 65 linked + 5 new


def test_commit_after_torn_tail_repairs_log_not_glue(spark, tmp_path):
    """ADVICE r16 (high): read-side torn-tail tolerance alone is
    defeated by commit() — the torn half-line has no trailing
    newline, so the next 'a'-mode append GLUES its record onto it.
    Pre-fix: that commit's metadata was silently lost (latest_version
    stale after a SUCCESSFUL commit) and the commit after that made
    the glued line non-final, permanently bricking the table. The
    repair truncates the torn suffix before appending."""
    from streaming_data_lake_spark.sources.versioned import VersionedTable

    ref = str(tmp_path / "t")
    vt = VersionedTable(spark, ref)
    vt.commit(spark.range(0, 50).selectExpr("id", "id * 2 AS v"), "append")
    vt.commit(spark.range(50, 80).selectExpr("id", "id * 2 AS v"), "append")
    meta_path = os.path.join(ref, "_snapshots.json")
    _truncate_tail(meta_path)  # tear the v2 record mid-byte

    vt2 = VersionedTable(spark, ref)
    v = vt2.commit(spark.range(80, 90).selectExpr("id", "id * 2 AS v"), "append")
    assert v == 3
    # the fresh commit's metadata is VISIBLE after re-reading — the
    # glue bug silently dropped it as "the torn tail"
    assert vt2.latest_version() == 3
    assert VersionedTable(spark, ref).latest_version() == 3
    assert vt2.read().count() == 60  # reads v3, not stale v1
    # the commit after that does not brick the table (the glued line
    # would have become NON-final here)
    v4 = vt2.commit(spark.range(90, 95).selectExpr("id", "id * 2 AS v"), "append")
    assert v4 == 4
    assert vt2.latest_version() == 4
    assert vt2.snapshots().count() == 3  # v1, v3, v4 (v2's record was torn away)
    # every surviving log line is parseable and newline-terminated
    raw = open(meta_path, "rb").read()
    assert raw.endswith(b"\n")
    import json as _json

    assert [_json.loads(ln)["version"] for ln in raw.decode().splitlines()] == [1, 3, 4]


def test_concurrent_versioned_commits_serialize_under_flock(spark, tmp_path):
    """VERDICT r16 "What's wrong" #3: two unserialized same-table
    committers race _next_version to the same v{N}; commit now holds
    a per-table flock. flock(2) conflicts between separate open file
    descriptions even within one process, so two THREADS exercise the
    real lock: both commits must succeed with distinct versions and a
    fully-parseable metadata log (no interleaved appends)."""
    import json as _json
    import threading

    from streaming_data_lake_spark.sources.versioned import VersionedTable

    ref = str(tmp_path / "t")
    VersionedTable(spark, ref).commit(spark.range(0, 10).toDF("id"), "overwrite")

    errors: list[BaseException] = []

    def worker(lo: int) -> None:
        try:
            VersionedTable(spark, ref).commit(
                spark.range(lo, lo + 10).toDF("id"), "overwrite"
            )
        except BaseException as exc:  # noqa: BLE001 — collected for the assert
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(lo,)) for lo in (100, 200)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    vt = VersionedTable(spark, ref)
    assert vt.latest_version() == 3
    meta_path = os.path.join(ref, "_snapshots.json")
    versions = [
        _json.loads(ln)["version"] for ln in open(meta_path).read().splitlines()
    ]
    assert sorted(versions) == [1, 2, 3]
    assert vt.read(2).count() == 10
    assert vt.read(3).count() == 10


def test_expire_snapshots_rename_failure_skips_not_deletes(spark, tmp_path, monkeypatch):
    """ADVICE r16: expire's OSError fallback must SKIP the version
    (a later expire retries), never inline-rmtree — that reintroduces
    the partial-listing reader race on exactly the filesystems where
    rename is flaky."""
    from streaming_data_lake_spark.sources.versioned import VersionedTable

    ref = str(tmp_path / "t")
    vt = VersionedTable(spark, ref)
    vt.commit(spark.range(0, 10).toDF("id"))
    vt.commit(spark.range(10, 20).toDF("id"))
    vt.commit(spark.range(20, 25).toDF("id"))

    real_rename = os.rename

    def flaky_rename(src, dst, *a, **kw):
        if "__tmp_" in str(dst) and str(src).endswith("v1"):
            raise OSError("simulated rename failure")
        return real_rename(src, dst, *a, **kw)

    monkeypatch.setattr(os, "rename", flaky_rename)
    # v1's rename fails -> skipped (still on disk, still readable);
    # v2's succeeds -> expired
    assert vt.expire_snapshots(keep_last=1) == [2]
    assert os.path.isdir(os.path.join(ref, "v1"))
    assert vt.read(1).count() == 10
    monkeypatch.undo()
    # a later expire retries and reclaims v1
    assert vt.expire_snapshots(keep_last=1) == [1]
    assert not os.path.isdir(os.path.join(ref, "v1"))


def test_expire_parked_version_survives_sweep_by_ctime(spark, tmp_path):
    """r17 review (high): the commit-scratch sweep age-guarded on
    getmtime, but os.rename PRESERVES a directory's mtime — an
    expire-parked version whose CONTENT is hours old read as
    instantly reclaimable, and the very next commit deleted it under
    any mid-scan time-travel reader (the exact race expire-by-rename
    exists to eliminate). The shared ctime-aware rule keeps the
    parked snapshot for the full min-age after the PARK, not after
    the write."""
    import time

    from streaming_data_lake_spark.sources.versioned import VersionedTable

    ref = str(tmp_path / "t")
    vt = VersionedTable(spark, ref)
    vt.commit(spark.range(0, 20).toDF("id"))
    vt.commit(spark.range(20, 30).toDF("id"))

    # age the v1 content: mtimes 2h in the past (rename will PRESERVE
    # these; only the inode ctime reflects the park moment)
    old = time.time() - 7200
    v1 = os.path.join(ref, "v1")
    for root, dirs, files in os.walk(v1):
        for name in dirs + files:
            os.utime(os.path.join(root, name), (old, old))
    os.utime(v1, (old, old))

    assert vt.expire_snapshots(keep_last=1) == [1]
    parked = [e for e in os.listdir(ref) if "__tmp_" in e]
    assert len(parked) == 1

    # the next commit's sweep must NOT reclaim the just-parked bytes
    # (a straddling reader may still hold them) — pre-fix, the
    # mtime-only guard deleted them right here
    vt.commit(spark.range(30, 35).toDF("id"))
    assert [e for e in os.listdir(ref) if "__tmp_" in e] == parked
