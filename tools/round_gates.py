"""End-of-round gate runner: one command that executes every gate the
round-end checklist requires and prints a per-gate runtime table plus
a final GREEN/RED verdict. Promotes the sf0.1 full-registry parity
run from an ad-hoc step to a structural gate (VERDICT r10 "Next
round" #6) — a round is DONE only when this prints ALL GATES GREEN.

Gates, in order (fail-fast off by default so one red gate doesn't
hide another):
  1. pytest              — full unit/contract suite
  2. check @ sf0.01      — full-registry oracle parity (driver scale)
  3. check @ sf0.1       — full-registry oracle parity at 10x
  4. edge-sweep          — full-registry parity on adversarially
                           mutated tables (NULLs everywhere, edge
                           strings, degenerate vectors — see
                           tools/edge_sweep.py)
  5. empty-sweep         — full-registry parity on zero-row tables
                           (fresh-deployment / empty-partition state)
  6. bare_sweep @ sf0.01 — bare-session portability, twice
  7. ledger              — certification-window audit
  8. driver smoke        — __spark_entry__ entry/queries/oracle_sql

Usage: python tools/round_gates.py [--skip pytest,sf01,sf1,edge,bare,ledger,smoke]
"""

from __future__ import annotations

import functools
import os
import subprocess
import sys
import time

# Per-gate progress must be visible while later gates still run —
# stdout is block-buffered under pipes, which holds every line until
# exit and makes a 30-minute run look hung.
print = functools.partial(print, flush=True)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SMOKE = """
import sys
sys.path.insert(0, %r)
import __spark_entry__ as m
from streaming_data_lake_spark.session import get_spark
spark = get_spark("round-gates-smoke")
rows = m.entry(spark).collect()
assert rows, "entry() returned no rows"
qs, os_ = m.queries(), m.oracle_sql()
assert set(os_) <= set(qs), "oracle_sql keys not a subset of queries"
print(f"SMOKE OK: entry={len(rows)} rows, {len(qs)} queries, {len(os_)} oracles")
""" % (REPO,)

GATES: list[tuple[str, list[str], str]] = [
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"], "passed"),
    ("check-sf0.01", [sys.executable, "tools/check.py", "/root/testdata/sf0.01"], "ALL GREEN"),
    ("check-sf0.1", [sys.executable, "tools/check.py", "/root/testdata/sf0.1"], "ALL GREEN"),
    ("edge-sweep", [sys.executable, "tools/edge_sweep.py"], "ALL GREEN"),
    ("empty-sweep", [sys.executable, "tools/edge_sweep.py", "--empty"], "ALL GREEN"),
    ("bare-sweep", [sys.executable, "tools/bare_sweep.py", "/root/testdata/sf0.01"], "ALL OK"),
    ("ledger", [sys.executable, "tools/ledger.py"], "LEDGER GREEN"),
    ("smoke", [sys.executable, "-c", _SMOKE], "SMOKE OK"),
]

_SKIP_ALIASES = {
    "sf01": "check-sf0.01",
    "sf1": "check-sf0.1",
    "edge": "edge-sweep",
    "empty": "empty-sweep",
    "bare": "bare-sweep",
}


def main() -> int:
    skip: set[str] = set()
    args = sys.argv[1:]
    for i, arg in enumerate(args):
        if arg.startswith("--skip"):
            # accept both --skip=a,b and --skip a,b
            raw = arg.split("=", 1)[1] if "=" in arg else (
                args[i + 1] if i + 1 < len(args) else ""
            )
            skip = {_SKIP_ALIASES.get(s, s) for s in raw.split(",") if s}
    known = {name for name, _cmd, _needle in GATES}
    unknown = skip - known
    if unknown:
        print(f"unknown gate name(s) in --skip: {sorted(unknown)}; known: {sorted(known)}")
        return 2
    results: list[tuple[str, bool, float, str]] = []
    for name, cmd, needle in GATES:
        if name in skip:
            results.append((name, True, 0.0, "SKIPPED"))
            continue
        t0 = time.monotonic()
        p = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=7200
        )
        dt = time.monotonic() - t0
        tail = (p.stdout or "").strip().splitlines()[-1:] or [""]
        ok = p.returncode == 0 and needle in (p.stdout or "")
        results.append((name, ok, dt, tail[0][:100]))
        print(f"[{'PASS' if ok else 'FAIL'}] {name:14s} {dt:7.1f}s  {tail[0][:100]}")
        if not ok:
            # Show enough context to act on, then keep going: one red
            # gate must not hide another.
            for line in (p.stdout or "").splitlines()[-15:]:
                print(f"    {line}")
    print()
    red = [n for n, ok, _dt, _t in results if not ok]
    total = sum(dt for _n, _ok, dt, _t in results)
    if red:
        print(f"GATES RED ({total:.0f}s): {', '.join(red)}")
        return 1
    print(f"ALL GATES GREEN ({total:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
