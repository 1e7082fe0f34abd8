"""Orphan-sweep vs live-publisher process race (r17, VERDICT r16
"What's wrong" #2): the scheduled ``remove_orphans`` age guard
(``young()``'s ctime rule, the newest-``__old_``-wins restore) was
certified only by single-process monkeypatched-clock pins; this probe
races a REAL sweep loop against REAL publishers under genuine rename
timing.

Processes (fresh interpreters, like probe_concurrent_mat):

- ``publisher`` x2: tight ``atomic_swap`` loops over a set of tables,
  each publish writing a complete versioned snapshot (every data file
  carries the version number). One publisher runs the renameat2
  exchange path, one is FORCED onto the two-step fallback (the path
  with the transient base-missing window the sweep must not race).
- ``sweeper``: loops ``remove_orphans(lake)`` at the SCHEDULED
  min-age. Every entry is younger than ORPHAN_MIN_AGE_S for the whole
  probe, so the invariant is sharp: the sweep must restore NOTHING
  (a restore over a live base / mid-swap would corrupt a publish) and
  remove NOTHING (anything it removed would be live scratch or a
  young retained version).
- ``reader``: loops over the tables asserting every visible snapshot
  is COMPLETE and CONSISTENT: all data files present and agreeing on
  one version. A transiently missing base is tolerated only on the
  fallback publisher's tables (the documented two-step window); a
  partial listing (mixed versions / missing files) is a failure
  anywhere.

Afterwards the parent runs ``remove_orphans(min_age_s=0)`` (the
run-after-the-fact semantics) and asserts each table still holds its
final published version, complete.

A second, heavyweight mode drives the REAL engine writers instead of
raw ``atomic_swap`` loops (the literal VERDICT ask): one child runs
``Materializer.run`` cycles (fresh facts each cycle) plus
``merge_upsert`` batches on the same lake, a sweeper loops
``remove_orphans`` at the scheduled min-age, and a Spark reader
asserts the mat table's row count and the upsert table's key count
never regress and every read succeeds (no partial version ever
becomes a visible count drop). Three concurrent JVMs — on-demand,
not a gate.

Usage: python tools/probe_orphan_race.py [seconds]          # fs mode (default 6)
       python tools/probe_orphan_race.py --spark [seconds]  # engine mode (default 45)
       (child roles are internal, selected via argv)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FILES = 4
TABLES_EXCHANGE = ["tex0", "tex1"]
TABLES_FALLBACK = ["tfb0", "tfb1"]


def _publish(table_dir: str, version: int) -> None:
    from streaming_data_lake_spark import overlay

    tmp = overlay.tmp_sibling(table_dir)
    os.makedirs(tmp)
    for i in range(N_FILES):
        # Spark part-file names embed a per-write UUID: a by-path
        # reader straddling a swap fails LOUDLY on the vanished old
        # name (the pinned expire contract), it never silently reads
        # the new snapshot's bytes under the old plan. Model that
        # with per-version-unique names.
        with open(os.path.join(tmp, f"part-{i}-v{version:06d}.txt"), "w") as fh:
            fh.write(str(version))
    if os.path.exists(table_dir):
        overlay.atomic_swap(table_dir, tmp)
    else:  # initial publish: writers create the base directly
        os.rename(tmp, table_dir)


def publisher(lake: str, tables: list[str], force_fallback: bool, until: float) -> dict:
    from streaming_data_lake_spark import overlay

    if force_fallback:
        overlay._RENAMEAT2 = None
    version = 1  # the parent pre-created v1
    while time.time() < until:
        version += 1
        for t in tables:
            _publish(os.path.join(lake, t), version)
    return {"role": "publisher", "final_version": version, "tables": tables}


def sweeper(lake: str, until: float) -> dict:
    from streaming_data_lake_spark.plans.maintenance import remove_orphans

    sweeps = 0
    bad: list[str] = []
    while time.time() < until:
        actions = remove_orphans(lake)  # SCHEDULED min-age
        sweeps += 1
        # every entry in this probe is minutes old at most: a
        # scheduled sweep acting on ANY of them raced a live writer
        bad.extend(actions)
    return {"role": "sweeper", "sweeps": sweeps, "violations": bad}


def reader(lake: str, until: float) -> dict:
    """Two lanes per pass:

    1. BY-PATH scan (a fresh Spark job): one listdir, then open each
       listed name. The listing must be a COMPLETE single-version
       snapshot (rename/exchange are atomic, so a mixed-version or
       partial listing means a reader-visible intermediate state —
       the exact class the retention model eliminates). A vanished
       file between listing and open is the documented LOUD straddle
       (Spark part names are per-write unique), counted, tolerated.
    2. RESOLVED-HANDLE scan (a long scan mid-flight): hold an O_PATH
       dir fd across several publishes, then list THROUGH it. The
       r16 finding: an inline delete of the version this fd resolved
       races readdir into a partial/empty listing. With retention +
       age guards the parked version must still list complete.
    """
    reads = 0
    missing_fb = 0
    loud_straddles = 0
    violations: list[str] = []
    all_tables = TABLES_EXCHANGE + TABLES_FALLBACK

    def snapshot_versions(entries: list[str]) -> set[int]:
        return {int(e.rsplit("-v", 1)[1].split(".")[0]) for e in entries}

    held: dict[str, int] = {}  # table -> dir fd held across passes
    while time.time() < until:
        for t in all_tables:
            base = os.path.join(lake, t)
            # lane 2: list through a dir fd resolved ~a full pass ago
            if t in held:
                fd = held.pop(t)
                try:
                    entries = [e for e in os.listdir(fd) if e.startswith("part-")]
                    vers = snapshot_versions(entries)
                    if len(entries) != N_FILES or len(vers) != 1:
                        violations.append(
                            f"{t}: resolved-handle listing PARTIAL/MIXED "
                            f"{sorted(entries)}"
                        )
                finally:
                    os.close(fd)
            try:
                held[t] = os.open(base, os.O_RDONLY | getattr(os, "O_DIRECTORY", 0))
            except FileNotFoundError:
                pass  # fallback window; lane 1 accounts for it
            # lane 1: by-path scan
            try:
                entries = sorted(
                    e for e in os.listdir(base) if e.startswith("part-")
                )
            except FileNotFoundError:
                if t in TABLES_FALLBACK:
                    missing_fb += 1
                else:
                    violations.append(f"{t}: missing base on exchange path")
                continue
            reads += 1
            vers = snapshot_versions(entries)
            if len(entries) != N_FILES or len(vers) != 1:
                violations.append(
                    f"{t}: PARTIAL/MIXED listing {entries} "
                    f"(want {N_FILES} files of one version)"
                )
                continue
            for e in entries:
                try:
                    with open(os.path.join(base, e)) as fh:
                        if int(fh.read()) != next(iter(vers)):
                            violations.append(f"{t}: {e} content != name version")
                except FileNotFoundError:
                    loud_straddles += 1  # documented loud straddle
    for fd in held.values():
        os.close(fd)
    return {
        "role": "reader",
        "reads": reads,
        "fallback_missing_transients": missing_fb,
        "loud_straddles": loud_straddles,
        "violations": violations,
    }


def spark_writer(lake: str, until: float) -> dict:
    import datetime as dt

    from pyspark.sql import functions as F  # noqa: F401

    from streaming_data_lake_spark.plans.materialize import Materializer, MatTarget
    from streaming_data_lake_spark.session import get_spark
    from streaming_data_lake_spark.sources.upsert import merge_upsert

    spark = get_spark(f"orphan-race-writer-{os.getpid()}")
    src = os.path.join(lake, "events_src")
    upsert_dir = os.path.join(lake, "upsert_t")
    base_ts = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_fact(i: int) -> None:
        spark.createDataFrame(
            [(i, base_ts + dt.timedelta(minutes=i), i, float(i))],
            "id long, ts timestamp, k int, v double",
        ).write.mode("append").parquet(src)

    write_fact(0)
    target = MatTarget("mat_race", lambda s: s.read.parquet(src), "ts")
    m = Materializer(spark, lake)
    cycles = 0
    while time.time() < until:
        write_fact(cycles + 1)
        m.run(target, lookback_hours=2)
        upd = spark.createDataFrame(
            [(cycles % 7, f"v{cycles}"), (cycles, f"w{cycles}")], "k long, v string"
        )
        merge_upsert(spark, upsert_dir, upd, ["k"], n_buckets=4)
        cycles += 1
    return {"role": "spark-writer", "cycles": cycles}


def spark_reader(lake: str, until: float) -> dict:
    from streaming_data_lake_spark.session import get_spark

    spark = get_spark(f"orphan-race-reader-{os.getpid()}")
    mat_dir = os.path.join(lake, "mat_race")
    upsert_dir = os.path.join(lake, "upsert_t")
    reads = 0
    max_mat = 0
    max_keys = 0
    loud_straddles = 0
    violations: list[str] = []
    while time.time() < until:
        for path, kind in ((mat_dir, "mat"), (upsert_dir, "upsert")):
            if not os.path.isdir(path):
                continue  # writer has not created it yet
            try:
                # fresh per-read plan: snapshot-listing at read time
                n = spark.read.parquet(path).count()
            except Exception as exc:  # noqa: BLE001 — judged below
                # Documented contract (test_torn_writes expire pin +
                # the fs mode's loud-straddle lane): a read whose file
                # listing straddles a publish fails LOUDLY on the
                # vanished old names — parquet emulation semantics; a
                # real table format reads a pinned snapshot instead.
                # Anything that is NOT a missing-path/missing-file
                # error (e.g. a torn footer) is a real violation.
                msg = str(exc)
                if any(
                    pat in msg
                    for pat in (
                        "FileNotFoundException",
                        "FILE_NOT_EXIST",
                        "PATH_NOT_FOUND",
                        "does not exist",
                        "UNABLE_TO_INFER_SCHEMA",
                    )
                ):
                    loud_straddles += 1
                else:
                    violations.append(f"{kind}: read failed: {msg[:400]}")
                continue
            reads += 1
            if kind == "mat":
                if n < max_mat:
                    violations.append(f"mat: count REGRESSED {max_mat} -> {n}")
                max_mat = max(max_mat, n)
            else:
                if n < max_keys:
                    violations.append(f"upsert: keys REGRESSED {max_keys} -> {n}")
                max_keys = max(max_keys, n)
    return {
        "role": "spark-reader",
        "reads": reads,
        "loud_straddles": loud_straddles,
        "max_mat": max_mat,
        "max_keys": max_keys,
        "violations": violations,
    }


def main_spark(seconds: float) -> int:
    lake = tempfile.mkdtemp(prefix="orphan_race_spark_")
    until = time.time() + seconds
    roles = ["spark-writer", "sweeper", "spark-reader"]
    procs = {
        r: subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", r, lake, str(until)],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for r in roles
    }
    results = {}
    ok = True
    for r, p in procs.items():
        out, _ = p.communicate(timeout=seconds + 300)
        if p.returncode != 0:
            print(f"FAIL {r}: exit {p.returncode}")
            ok = False
            continue
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        results[r] = json.loads(line[len("RESULT "):])

    sw = results.get("sweeper", {})
    rd = results.get("spark-reader", {})
    wr = results.get("spark-writer", {})
    if sw.get("violations"):
        print(f"FAIL sweeper acted on live/young entries: {sw['violations'][:5]}")
        ok = False
    if rd.get("violations"):
        print(f"FAIL spark reader: {rd['violations'][:5]}")
        ok = False
    if wr.get("cycles", 0) < 2:
        print(f"FAIL writer completed only {wr.get('cycles')} cycles")
        ok = False
    print(
        f"{'ALL OK' if ok else 'FAILED'} (spark mode): {wr.get('cycles')} "
        f"writer cycles, {sw.get('sweeps', 0)} sweeps (0 actions), "
        f"{rd.get('reads', 0)} spark reads "
        f"({rd.get('loud_straddles', 0)} loud straddles; "
        f"mat rows {rd.get('max_mat')}, upsert keys {rd.get('max_keys')})"
    )
    return 0 if ok else 1


def _child(role: str, lake: str, until: float) -> None:
    if role == "pub-exchange":
        out = publisher(lake, TABLES_EXCHANGE, False, until)
    elif role == "pub-fallback":
        out = publisher(lake, TABLES_FALLBACK, True, until)
    elif role == "sweeper":
        out = sweeper(lake, until)
    elif role == "reader":
        out = reader(lake, until)
    elif role == "spark-writer":
        out = spark_writer(lake, until)
    elif role == "spark-reader":
        out = spark_reader(lake, until)
    else:
        raise SystemExit(f"unknown role {role}")
    print("RESULT " + json.dumps(out))


def main(seconds: float) -> int:
    lake = tempfile.mkdtemp(prefix="orphan_race_")
    # Pre-create every table at v1 so the reader never races child
    # STARTUP (imports take ~1s; a missing not-yet-created base would
    # read as a false exchange-path violation).
    for t in TABLES_EXCHANGE + TABLES_FALLBACK:
        base = os.path.join(lake, t)
        os.makedirs(base)
        for i in range(N_FILES):
            with open(os.path.join(base, f"part-{i}-v{1:06d}.txt"), "w") as fh:
                fh.write("1")
    until = time.time() + seconds
    roles = ["pub-exchange", "pub-fallback", "sweeper", "reader"]
    procs = {
        r: subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", r, lake, str(until)],
            stdout=subprocess.PIPE,
            text=True,
        )
        for r in roles
    }
    results = {}
    ok = True
    for r, p in procs.items():
        out, _ = p.communicate(timeout=seconds + 60)
        if p.returncode != 0:
            print(f"FAIL {r}: exit {p.returncode}")
            ok = False
            continue
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        results[r] = json.loads(line[len("RESULT "):])

    sw = results.get("sweeper", {})
    rd = results.get("reader", {})
    if sw.get("violations"):
        print(f"FAIL sweeper acted on live/young entries: {sw['violations'][:5]}")
        ok = False
    if rd.get("violations"):
        print(f"FAIL reader saw torn/partial state: {rd['violations'][:5]}")
        ok = False

    # post-race: run-after-the-fact reclamation, then verify finals
    from streaming_data_lake_spark.plans.maintenance import remove_orphans

    remove_orphans(lake, min_age_s=0)
    for role, tables in (("pub-exchange", TABLES_EXCHANGE), ("pub-fallback", TABLES_FALLBACK)):
        final = str(results[role]["final_version"])
        for t in tables:
            base = os.path.join(lake, t)
            files = sorted(e for e in os.listdir(base) if e.startswith("part-"))
            vals = {open(os.path.join(base, f)).read() for f in files}
            if len(files) != N_FILES or vals != {str(final)}:
                print(f"FAIL {t}: final state {files} versions {vals}, want v{final}")
                ok = False
    leftovers = [e for e in os.listdir(lake) if "__old_" in e or "__tmp_" in e]
    if leftovers:
        print(f"FAIL leftovers after min_age=0 sweep: {leftovers}")
        ok = False

    print(
        f"{'ALL OK' if ok else 'FAILED'}: "
        f"{results['pub-exchange']['final_version']} exchange publishes x{len(TABLES_EXCHANGE)}, "
        f"{results['pub-fallback']['final_version']} fallback publishes x{len(TABLES_FALLBACK)}, "
        f"{sw.get('sweeps', 0)} sweeps (0 actions), "
        f"{rd.get('reads', 0)} reads "
        f"({rd.get('fallback_missing_transients', 0)} fallback missing-base + "
        f"{rd.get('loud_straddles', 0)} loud-straddle documented transients)"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2], sys.argv[3], float(sys.argv[4]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--spark":
        sys.exit(main_spark(float(sys.argv[2]) if len(sys.argv) > 2 else 45.0))
    else:
        sys.exit(main(float(sys.argv[1]) if len(sys.argv) > 1 else 6.0))
