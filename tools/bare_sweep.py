"""Driver-harness portability sweep: run EVERY registered query in a
bare SparkSession (no engine confs), in a fresh process, twice in a
row from the same cwd — the conditions the correctness driver runs
under. Catches session-conf dependencies (round-1 nanos bug) and
cross-process leftovers (round-2 managed-warehouse bug) that the
get_spark-based tools/check.py cannot see.

Usage: python tools/bare_sweep.py [--per-query] [sf_dir] [names...]

``--per-query`` runs EVERY query in its own fresh process (the
driver's exact granularity — each query is the FIRST reader in its
session); the default runs all queries in one process, twice.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys, time, traceback
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from streaming_data_lake_spark.queries import all_queries

sf = {sf!r}
names = {names!r}
qs = all_queries()
failed = 0
for name in names or list(qs):
    t0 = time.time()
    try:
        n = qs[name].fn(spark, sf).count()
        print(f"PASS {{name}}: {{n}} rows [{{time.time()-t0:.1f}}s]", flush=True)
    except Exception:
        failed += 1
        print(f"FAIL {{name}}", flush=True)
        traceback.print_exc()
print("SWEEP_FAILED" if failed else "SWEEP_OK", flush=True)
sys.exit(1 if failed else 0)
"""


def main() -> int:
    args = sys.argv[1:]
    per_query = "--per-query" in args
    args = [a for a in args if a != "--per-query"]
    sf = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:]
    cwd = tempfile.mkdtemp(prefix="bare_sweep_")
    rc = 0
    if per_query:
        if not names:
            sys.path.insert(0, REPO)
            from streaming_data_lake_spark.queries import all_queries

            names = list(all_queries())
        for name in names:
            script = _SCRIPT.format(repo=REPO, sf=sf, names=[name])
            proc = subprocess.run(
                [sys.executable, "-c", script], cwd=cwd, capture_output=True, text=True
            )
            line = [
                ln for ln in proc.stdout.splitlines() if ln.startswith(("PASS", "FAIL"))
            ]
            print("\n".join(line) or f"FAIL {name} (no output)", flush=True)
            if proc.returncode != 0:
                print(proc.stderr[-2000:], flush=True)
            # A clean exit without a PASS line is still a failure — the
            # printed verdict and the exit code must agree.
            rc |= proc.returncode or (0 if line else 1)
    else:
        script = _SCRIPT.format(repo=REPO, sf=sf, names=names)
        for attempt in (1, 2):
            print(f"=== bare-session process {attempt}/2 (cwd={cwd}) ===", flush=True)
            proc = subprocess.run([sys.executable, "-c", script], cwd=cwd)
            rc |= proc.returncode
    print("ALL OK" if rc == 0 else "FAILURES", flush=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
