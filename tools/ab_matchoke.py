"""Interleaved A/B for the materializer's r13 time-edge choke-point
(VERDICT r13 "Next round" #5): the one r13-flagged bench query the
time-edge contract actually touched is
``materialize_incremental_clean_events`` (driver normalized 1.51x, the
judge's idle rerun +9% raw) — mostly position-#2 warm-up, but the r13
builder's A/B covered only the HOP-window admission path, not the
materializer's ``view.filter(admissible_ts(ts_col))`` choke point
(plans/materialize.py). This closes that gap.

Runs, in ONE session, interleaved A/B/A/B... executions of the
registered query body with the live choke filter (A) and the r12
shape (B: the choke filter compiled to a constant-true predicate —
scoped by CALL SITE so the ingest-side admission, which r13 also
touched but the r13 A/B already covered, stays live in both
variants), min-of-N each — the same protocol as tools/ab_embcos.py.

Usage: python tools/ab_matchoke.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from streaming_data_lake_spark.functions import parity
    from streaming_data_lake_spark.queries.matq import (
        materialize_incremental_clean_events,
    )
    from streaming_data_lake_spark.session import get_spark

    spark = get_spark("ab-matchoke")
    real_admissible = parity.admissible_ts

    def admissible_no_choke(c):
        # r12 shape: the materializer's choke filter is a no-op; every
        # OTHER call site (ingest classification, streaming admission,
        # day-bucket projections) keeps the live predicate.
        caller = traceback.extract_stack(limit=2)[0].filename
        if caller.endswith("materialize.py"):
            return F.lit(True)
        return real_admissible(c)

    def run(patched: bool) -> tuple[float, int]:
        parity.admissible_ts = admissible_no_choke if patched else real_admissible
        try:
            t0 = time.monotonic()
            cnt = materialize_incremental_clean_events(spark, sf_dir).count()
            return time.monotonic() - t0, cnt
        finally:
            parity.admissible_ts = real_admissible

    variants = {
        "A-live-choke": lambda: run(False),
        "B-r12-no-choke": lambda: run(True),
    }
    print(f"sf_dir={sf_dir} n={n}")
    # warm-up: one run each, discarded (JIT, footers, shuffle classes)
    for fn in variants.values():
        fn()
    times: dict[str, list[float]] = {k: [] for k in variants}
    counts: dict[str, int] = {}
    for _ in range(n):
        for name, fn in variants.items():
            dt, cnt = fn()
            times[name].append(dt)
            counts[name] = cnt
    for name, ts in times.items():
        print(
            f"{name}: min {min(ts):.3f}s  median {sorted(ts)[len(ts)//2]:.3f}s  "
            f"all {[round(t, 3) for t in ts]}  rows={counts[name]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
