"""Per-pass profile of materialize_incremental_clean_events (VERDICT
r19 #6): decompose the query's bench seconds into source-prep writes,
cycle-1 (M1) and cycle-2 (M2/M4/M6) passes using Materializer's own
last_timings marks, repeated N times warm.

Usage: python tools/profile_mat.py [sf_dir] [n]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from streaming_data_lake_spark.catalog import load_table
    from streaming_data_lake_spark.operators.ingest import clean_events
    from streaming_data_lake_spark.plans.materialize import Materializer, MatTarget
    from streaming_data_lake_spark.queries.matq import _CUTOFF
    from streaming_data_lake_spark.scratch import scratch_dir as _scratch_dir
    from streaming_data_lake_spark.session import get_spark

    spark = get_spark("profile-mat")
    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    late = (
        (F.col("ts") > cutoff - F.expr("INTERVAL 3 HOURS"))
        & (F.col("ts") <= cutoff)
        & (F.col("event_id") % 7 == 0)
    )
    batch1 = events.filter((F.col("ts") <= cutoff) & ~late)
    batch2 = events.filter((F.col("ts") > cutoff) | late)

    for i in range(n):
        lake = _scratch_dir("lake_prof_")
        src_dir = os.path.join(lake, "events_src")
        marks: dict[str, float] = {}
        t = time.monotonic()

        def mark(key: str) -> None:
            nonlocal t
            now = time.monotonic()
            marks[key] = round(now - t, 3)
            t = now

        batch1.write.mode("overwrite").parquet(src_dir)
        mark("src_write_1")
        target = MatTarget(
            name="mat_events_clean",
            view=lambda s: clean_events(s.read.parquet(src_dir)),
            ts_col="ts",
        )
        mat = Materializer(spark, lake)
        mat.run(target, lookback_hours=4)
        mark("cycle1_total")
        c1 = dict(mat.last_timings)
        batch2.write.mode("append").parquet(src_dir)
        mark("src_write_2")
        mat.run(target, lookback_hours=4)
        mark("cycle2_total")
        c2 = dict(mat.last_timings)
        mat.read_mat("mat_events_clean", target).count()
        mark("read_count")
        total = sum(marks.values())
        print(f"run {i}: total {total:.3f}  marks {marks}")
        print(f"  cycle1 passes: {c1}")
        print(f"  cycle2 passes: {c2}")
        # leaf/file census of the published table
        mat_dir = os.path.join(lake, "mat_events_clean")
        n_files = sum(len(fs) for _, _, fs in os.walk(mat_dir))
        n_days = len([d for d in os.listdir(mat_dir) if d.startswith("day_pt=")])
        print(f"  mat table: {n_days} day dirs, {n_files} files total")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
