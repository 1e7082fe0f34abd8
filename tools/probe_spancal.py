"""Validate-or-retire experiment for bench.py's post-run CPU probe
(VERDICT r13 "Next round" #6): on both final r13 recorded runs the
post-probe read ~20% FASTER than the pre-probe (0.263->0.216 driver;
0.267->0.218 judge) — if that is warm-process state rather than host
load, ``value_normalized_spancal`` systematically overstates
slowness.

Two diagnostics in one idle-host session:

1. **probe-only curve**: 12 consecutive best-of-1 probe executions
   with no query work in between. A downward drift that flattens
   after the first few runs is probe-side JIT/warm-up — the pre-run
   best-of-3 is then sampling a colder probe than the post-run
   best-of-3, and the fix is discarding warm-up probe runs before
   the FIRST measurement (rehabilitating spancal), not retiring the
   post-probe.

2. **work-interleaved cycles**: N cycles of (pre best-of-3, ~30 s of
   representative headline queries, post best-of-3, 20 s idle, again
   best-of-3). If post < pre only when work ran in between — and the
   idle re-probe stays fast — the speedup is process warmth
   (JIT/allocator/page state), not transient host load.

Usage: python tools/probe_spancal.py [sf_dir] [n_cycles]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from streaming_data_lake_spark.queries import all_queries
    from streaming_data_lake_spark.session import get_spark

    spark = get_spark("probe-spancal")
    queries = all_queries()

    def probe_once() -> float:
        t0 = time.time()
        spark.range(1_000_000_000).selectExpr(
            "sum((id * id) % 1000003) as s"
        ).collect()
        return round(time.time() - t0, 3)

    def probe_best3() -> tuple[float, list[float]]:
        ts = [probe_once() for _ in range(3)]
        return min(ts), ts

    # Diagnostic 1: the probe-only curve from a cold session.
    curve = [probe_once() for _ in range(12)]
    print(f"probe_curve_cold_session: {curve}")
    print(
        f"  head3_min={min(curve[:3])} mid_min={min(curve[3:6])} "
        f"tail_min={min(curve[6:])}"
    )

    # ~30 s of representative work: a CPU/shuffle/text mix.
    work_set = [
        "pricing_summary", "revenue_by_region", "token_counts",
        "tfidf_top_terms", "knn_bruteforce_cosine", "dedup_exact_text",
        "top_busiest_hours", "rollup_revenue_levels",
    ]

    def do_work() -> float:
        t0 = time.time()
        for name in work_set:
            queries[name].fn(spark, sf_dir).count()
        return round(time.time() - t0, 1)

    # Diagnostic 2: work-interleaved pre/post/idle cycles.
    for c in range(n_cycles):
        pre, pre_all = probe_best3()
        wsec = do_work()
        post, post_all = probe_best3()
        time.sleep(20)
        idle, idle_all = probe_best3()
        print(
            f"cycle {c}: pre {pre} {pre_all}  work {wsec}s  "
            f"post {post} {post_all}  idle+20s {idle} {idle_all}  "
            f"post/pre {round(post / pre, 3)}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
