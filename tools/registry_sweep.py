"""Whole-registry timing sweep (VERDICT r19 #7): time EVERY
registered query at the bench SF — not just the 35 headline names —
so non-headline regressions (r19 found supplier_name_near_matches at
3.22 s this way) cannot hide between rounds.

Methodology mirrors bench.py: one engine session, per query two
back-to-back ``fn().count()`` executions — run1 carries the
cold-plan/JIT/artifact-build cost, run2 is the warm steady state; the
recorded time is min (warm best-of-2). Durable artifact builds are
counted per query. Host CPU probes bracket the sweep so a degraded
window is visible in the artifact.

Writes ``plans/<round>/REGISTRY_SWEEP.json`` and, when the previous
round's artifact exists, prints a tripwire list of queries whose warm
time grew more than ``--factor`` (default 1.5x) above the previous
sweep with an absolute delta over 0.2 s (ignores sub-floor jitter).

Usage: python tools/registry_sweep.py [sf_dir] [--round rNN] [--factor 1.5]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cpu_probe() -> float:
    t0 = time.monotonic()
    x = 0
    for i in range(2_000_000):
        x += i * i
    _ = x
    return round(time.monotonic() - t0, 3)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    rnd = "r20"
    factor = 1.5
    for i, a in enumerate(sys.argv):
        if a == "--round":
            rnd = sys.argv[i + 1]
        if a == "--factor":
            factor = float(sys.argv[i + 1])

    from streaming_data_lake_spark.plans import artifacts
    from streaming_data_lake_spark.queries import all_queries
    from streaming_data_lake_spark.session import get_spark

    spark = get_spark("registry-sweep")
    queries = all_queries()
    pre = cpu_probe()
    out: dict[str, dict] = {}
    t_start = time.time()
    for name, q in queries.items():
        sc_desc = f"sweep:{name}"
        spark.sparkContext.setJobDescription(sc_desc)
        runs: list[float] = []
        builds = 0
        err = None
        for _ in range(2):
            m0 = artifacts.STATS["misses"]
            t0 = time.monotonic()
            try:
                q.fn(spark, sf_dir).count()
            except Exception as exc:  # pragma: no cover - env-gated paths
                err = f"{type(exc).__name__}: {exc}"[:200]
                break
            runs.append(round(time.monotonic() - t0, 3))
            builds += artifacts.STATS["misses"] - m0
        out[name] = {
            "warm": min(runs) if runs else None,
            "runs": runs,
            "artifact_builds": builds,
            **({"err": err} if err else {}),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    post = cpu_probe()

    payload = {
        "sf_dir": sf_dir,
        "n_queries": len(out),
        "wall_s": round(time.time() - t_start, 1),
        "cpu_probe_pre": pre,
        "cpu_probe_post": post,
        "queries": out,
    }
    dest = os.path.join(REPO, "plans", rnd, "REGISTRY_SWEEP.json")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(f"wrote {dest}")

    # Tripwire vs the previous round's sweep artifact, if present.
    prev_n = int(rnd[1:]) - 1
    prev_path = os.path.join(REPO, "plans", f"r{prev_n}", "REGISTRY_SWEEP.json")
    if os.path.exists(prev_path):
        with open(prev_path) as fh:
            prev = json.load(fh)["queries"]
        tripped = []
        for name, cur in out.items():
            p = prev.get(name, {}).get("warm")
            c = cur.get("warm")
            if p and c and c > p * factor and c - p > 0.2:
                tripped.append(f"{name}: {p} -> {c}")
        if tripped:
            print("TRIPWIRE (warm > %.1fx prev + 0.2s):" % factor)
            for t in tripped:
                print("  " + t)
            return 1
        print(f"tripwire clean vs r{prev_n}")
    else:
        print(f"no previous sweep at {prev_path} — baseline recorded")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
