"""Interleaved A/B adjudication of the r17 `pricing_summary` bench
tripwire (VERDICT r17 "Next round" #2).

The r16 protocol says an entry in the artifact's ``regressions`` list
gets an interleaved A/B before absolution. The two "codes" here are
bit-identical — ``git diff ceeecab d3c06c9 --
streaming_data_lake_spark/queries/core.py`` touches only the
funnel/leakage admission chain, nothing `pricing_summary` executes —
so the A/B isolates the remaining variable: EXECUTION POSITION.
Hypothesis (VERDICT r17 perf section): the scored pass started
JVM/JIT-cold, so the query order_seed 18 put at position 0 ate
C2/codegen warmup on BOTH best-of-2 runs (0.553, 0.441 vs the 0.27-
0.34 s it times mid-order).

Design: K fresh sessions (subprocesses — JIT state is per-JVM). Each
replicates bench.py's standard pre-scoring warmups, then measures

  arm A (head-of-run): pricing_summary best-of-2, FIRST scored work;
  prime: one untimed pass over a diverse query set (what bench.py's
         r18 priming pass now does);
  arm B (steady-state): pricing_summary best-of-2 again.

If A/B reproduces the ~1.5-1.9x the tripwire flagged on unchanged
code, the r17 entry is adjudicated a harness confound — fixed
permanently by bench.py's untimed priming pass (SPARK_GRAFT_BENCH_
PRIME). Run: ``python tools/ab_pricing_warmup.py [K]``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PRIME_SET = [
    "revenue_by_region",
    "top_busiest_hours",
    "latest_event_per_user_type",
    "interval_join_click_view",
    "token_counts",
    "consistent_hash_sample",
    "rollup_revenue_levels",
    "dedup_exact_text",
]


def child() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from streaming_data_lake_spark.catalog import TABLES, load_table
    from streaming_data_lake_spark.queries import all_queries
    from streaming_data_lake_spark.session import get_spark

    spark = get_spark("ab-pricing-warmup")
    queries = all_queries()

    # bench.py's standard pre-scoring warmups (tables only — the
    # streaming warm does not touch pricing_summary's path and the
    # r17 run had it and still measured cold at position 0).
    spark.range(1000).selectExpr("sum(id)").collect()
    load_table(spark, sf_dir, "region").groupBy("r_regionkey").count().count()
    for tbl in TABLES:
        df = load_table(spark, sf_dir, tbl)
        df.select(F.min(df.columns[0])).collect()

    def best2(name: str) -> list[float]:
        ts = []
        for _ in range(2):
            t0 = time.time()
            queries[name].fn(spark, sf_dir).count()
            ts.append(round(time.time() - t0, 3))
        return ts

    cold = best2("pricing_summary")  # arm A: first scored work
    for name in PRIME_SET:  # untimed priming pass
        queries[name].fn(spark, sf_dir).count()
    warm = best2("pricing_summary")  # arm B: steady state
    print(json.dumps({"cold": cold, "warm": warm}))


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    colds, warms = [], []
    for i in range(k):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = out.stdout.strip().splitlines()[-1]
        d = json.loads(line)
        colds.append(min(d["cold"]))
        warms.append(min(d["warm"]))
        print(f"session {i + 1}: cold(best2)={d['cold']} warm(best2)={d['warm']}")
    mc = sum(colds) / len(colds)
    mw = sum(warms) / len(warms)
    ratio = mc / mw if mw else float("nan")
    verdict = (
        "CONFOUND CONFIRMED: head-of-run position inflates the scored "
        "best-of-2 on bit-unchanged code; the r17 tripwire entry is "
        "adjudicated a harness artifact (fixed by bench.py's untimed "
        "priming pass)"
        if ratio >= 1.25
        else "NOT REPRODUCED: position explains <1.25x — treat the r17 "
        "entry as unresolved and profile the query"
    )
    print(
        json.dumps(
            {
                "query": "pricing_summary",
                "sessions": k,
                "cold_best_mean": round(mc, 3),
                "warm_best_mean": round(mw, 3),
                "cold_over_warm": round(ratio, 2),
                "r17_flagged_ratio_raw": 1.6,
                "verdict": verdict,
            },
            indent=1,
        )
    )
    return 0


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        raise SystemExit(main())
