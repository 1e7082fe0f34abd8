"""Empirical probe (VERDICT r10 "Next round" #3): can Spark 4.1.2's
multiple-stateful-operator support run the reference's LITERAL chained
stream-stream LEFT interval-join funnel (funnel_jobs.sql:54-63) in
append mode — view LEFT click (<=10 min) LEFT purchase (<=60 min)?

The r7-era docstring at streaming/pipelines.py claimed the chain is
unsound because the second join's event-time key (click ts) is NULL
for unmatched views and NULL-event-time rows can never be
watermark-evicted. That was verified on the Spark-3 lineage; Spark
4.1's multiple-stateful-operator work may handle it. This probe runs
the literal chain over the bounded events replay (sentinel-staged so
the final watermark passes every join window) and diffs the per-day
funnel counts against the batch chained-LEFT-join oracle.

Run: python tools/probe_chained_funnel.py [sf_dir]
Prints PROBE RESULT: SUPPORTED | UNSUPPORTED(<error class>) | DIVERGES
"""

from __future__ import annotations

import sys
import traceback

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from streaming_data_lake_spark.catalog import normalize_timestamps  # noqa: E402
from streaming_data_lake_spark.scratch import scratch_dir  # noqa: E402
from streaming_data_lake_spark.session import get_spark  # noqa: E402
from streaming_data_lake_spark.sources.streams import physical_schema  # noqa: E402
from streaming_data_lake_spark.streaming.sessionize import (  # noqa: E402
    _stage_with_sentinels,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("probe-chained-funnel")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    stage = _stage_with_sentinels(sf_dir)

    def side(alias: str, event_type: str):
        raw = (
            spark.readStream.schema(physical_schema(spark, sf_dir, "events"))
            .format("parquet")
            .option("maxFilesPerTrigger", 1)
            .load(stage)
        )
        df = normalize_timestamps(raw, "events")
        # Watermark BEFORE the type filter: the far-future sentinel
        # row must advance this side's watermark so outer state
        # flushes on the trailing no-data batch.
        return (
            df.withWatermark("ts", "30 seconds")
            .filter(F.col("event_type") == event_type)
            .alias(alias)
        )

    variant = sys.argv[2] if len(sys.argv) > 2 else "literal"
    v, c, p = side("v", "view"), side("c", "click"), side("p", "purchase")
    vc = v.join(
        c,
        (F.col("c.user_id") == F.col("v.user_id"))
        & (F.col("c.ts") >= F.col("v.ts"))
        & (F.col("c.ts") <= F.col("v.ts") + F.expr("INTERVAL 10 MINUTES")),
        "leftOuter",
    )
    if variant == "literal":
        # The reference's chain verbatim: both v.ts and c.ts flow into
        # the second join as event-time columns.
        vcp = vc.join(
            p,
            (F.col("p.user_id") == F.col("c.user_id"))
            & (F.col("p.ts") >= F.col("c.ts"))
            & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 60 MINUTES")),
            "leftOuter",
        )
        out = vcp.select(
            F.col("v.ts").alias("view_ts"),
            F.col("v.event_id").alias("view_id"),
            F.col("c.event_id").alias("click_id"),
            F.col("p.event_id").alias("purchase_id"),
        )
    else:
        # Closest expressible form: strip the VIEW ts's event-time
        # metadata (rebuild the value through unix_micros so only
        # c.ts stays watermarked), then chain the second LEFT join on
        # the single remaining event-time column — which is NULL for
        # unmatched views, the exact soundness question.
        vc2 = vc.select(
            F.timestamp_micros(F.unix_micros(F.col("v.ts"))).alias("view_ts"),
            F.col("v.event_id").alias("view_id"),
            F.col("c.event_id").alias("click_id"),
            F.col("c.user_id").alias("click_user"),
            F.col("c.ts").alias("click_ts"),
        )
        vcp = vc2.join(
            p,
            (F.col("p.user_id") == F.col("click_user"))
            & (F.col("p.ts") >= F.col("click_ts"))
            & (F.col("p.ts") <= F.col("click_ts") + F.expr("INTERVAL 60 MINUTES")),
            "leftOuter",
        )
        out = vcp.select(
            "view_ts",
            "view_id",
            "click_id",
            F.col("p.event_id").alias("purchase_id"),
        )
    sink = scratch_dir("probe_chain_")
    try:
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", scratch_dir("probe_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    except Exception as e:  # noqa: BLE001 — the probe's whole point
        print(f"PROBE RESULT: UNSUPPORTED({type(e).__name__})")
        traceback.print_exc(limit=3)
        return 0

    got = (
        spark.read.schema(out.schema)
        .parquet(sink)
        .groupBy(F.date_trunc("day", F.col("view_ts")).alias("event_day"))
        .agg(
            F.countDistinct("view_id").alias("n_views"),
            F.countDistinct("click_id").alias("n_clicks"),
            F.countDistinct("purchase_id").alias("n_purchases"),
        )
    )

    from streaming_data_lake_spark.queries.core import _funnel_daily_counts

    want = _funnel_daily_counts(spark, sf_dir)
    cols = ["event_day", "n_views", "n_clicks", "n_purchases"]
    g = sorted(tuple(r[c] for c in cols) for r in got.collect())
    w = sorted(tuple(r[c] for c in cols) for r in want.collect())
    if g == w:
        print(f"PROBE RESULT: SUPPORTED ({len(g)} days match batch oracle)")
    else:
        print("PROBE RESULT: DIVERGES")
        print(f"  streaming rows: {len(g)}  batch rows: {len(w)}")
        for row in g[:5]:
            print(f"  stream: {row}")
        for row in w[:5]:
            print(f"  batch:  {row}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
