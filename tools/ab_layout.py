"""A/B the upsert sink's table layout at a given scale factor
(VERDICT r8 "Next round" #3): same session, same data, interleaved
repetitions — the only honest way to split host-noise drift from
layout overhead on this shared machine.

Configurations, both driving the EXACT streaming_upsert_hourly
workload (update-mode hourly aggregate over the events table,
availableNow replay, foreachBatch MERGE):

- ``old``: the r7 layout — single-level, fixed 16 hash buckets
  (``ts_col=None, n_buckets=16``).
- ``new``: the r8/r9 layout — two-level ``day_pt x kb`` with
  auto-sized bucket counts and the r9 sidecar-cached table bytes.

Also times the full materializer-cycle query (current code only —
its "old" variant no longer exists) for the round-over-round record.

Usage::

    python tools/ab_layout.py [sf_dir] [reps]

Prints one JSON line per measurement and a summary line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streaming_data_lake_spark.functions.parity import dsum  # noqa: E402
from streaming_data_lake_spark.scratch import scratch_dir  # noqa: E402
from streaming_data_lake_spark.session import get_spark  # noqa: E402
from streaming_data_lake_spark.sources.streams import stream_table  # noqa: E402
from streaming_data_lake_spark.sources.upsert import foreach_batch_upsert  # noqa: E402
from streaming_data_lake_spark.streaming.pipelines import _state_partitions  # noqa: E402


def _run_upsert(spark, sf_dir: str, ts_col: str | None, n_buckets: int | None) -> float:
    base = scratch_dir("ab_") + f"/t_{uuid.uuid4().hex[:8]}"
    ckpt = scratch_dir("ab_ckpt_")
    src = stream_table(spark, sf_dir, "events")
    agg = (
        src.withWatermark("ts", "30 seconds")
        .groupBy(F.window(F.col("ts"), "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "decimal(12,2)").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    t0 = time.time()
    with _state_partitions(spark):
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(
                foreach_batch_upsert(
                    spark, base, ["hour_start", "event_type"],
                    ts_col=ts_col, n_buckets=n_buckets,
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return time.time() - t0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-layout")
    # warm the streaming/codegen path once outside the measurements
    _run_upsert(spark, sf_dir, None, 4)

    results: dict[str, list[float]] = {"old_single16": [], "new_two_level": []}
    for rep in range(reps):
        for label, ts_col, nb in (
            ("old_single16", None, 16),
            ("new_two_level", "hour_start", None),
        ):
            dt = _run_upsert(spark, sf_dir, ts_col, nb)
            results[label].append(round(dt, 3))
            print(json.dumps({"rep": rep, "config": label, "sec": round(dt, 3)}))

    mat_times = []
    from streaming_data_lake_spark.queries import all_queries

    qfn = all_queries()["materialize_incremental_clean_events"].fn
    for rep in range(reps):
        t0 = time.time()
        qfn(spark, sf_dir).count()
        mat_times.append(round(time.time() - t0, 3))
        print(json.dumps({"rep": rep, "config": "materializer_cycle", "sec": mat_times[-1]}))

    print(json.dumps({
        "sf_dir": sf_dir,
        "reps": reps,
        "median_old_single16": statistics.median(results["old_single16"]),
        "median_new_two_level": statistics.median(results["new_two_level"]),
        "ratio_new_over_old": round(
            statistics.median(results["new_two_level"])
            / statistics.median(results["old_single16"]), 3,
        ),
        "median_materializer_cycle": statistics.median(mat_times),
        "runs": results,
        "materializer_runs": mat_times,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
