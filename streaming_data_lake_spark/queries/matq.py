"""Materializer query: drives the full M1→M2→M4→M6 incremental
maintenance cycle end-to-end and certifies that the converged
materialized table equals a from-scratch recompute (the DuckDB
oracle over the complete fact set).

Scenario (FIXTURES.md scenario 4 — out-of-order/late):
 1. facts arriving before a cutoff (minus some "late" rows) land in
    the source; run 1 does the M1 full load.
 2. the remaining facts — including late rows whose ts falls BEFORE
    the watermark but inside the lookback horizon — arrive; run 2
    must pick up the post-watermark rows via M4 *and* repair the
    late ones via M2.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_lake_spark.catalog import load_table
from streaming_data_lake_spark.operators.ingest import clean_events
from streaming_data_lake_spark.plans.materialize import Materializer, MatTarget
from streaming_data_lake_spark.queries import register
from streaming_data_lake_spark.queries.core import _EVENTS_CLEAN_ORACLE

_CUTOFF = "2024-01-20 00:00:00"


@register(
    "materialize_incremental_clean_events",
    _EVENTS_CLEAN_ORACLE,
    "M1/M2/M4/M6: two-cycle incremental materialization with late arrivals; "
    "converged mat table equals the full recompute.",
)
def materialize_incremental_clean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    # "late" rows: inside the 3h pre-cutoff horizon, arriving in batch 2
    late = (
        (F.col("ts") > cutoff - F.expr("INTERVAL 3 HOURS"))
        & (F.col("ts") <= cutoff)
        & (F.col("event_id") % 7 == 0)
    )
    batch1 = events.filter((F.col("ts") <= cutoff) & ~late)
    batch2 = events.filter((F.col("ts") > cutoff) | late)

    lake = tempfile.mkdtemp(prefix="lake_")
    src_dir = os.path.join(lake, "events_src")
    batch1.write.mode("overwrite").parquet(src_dir)

    target = MatTarget(
        name="mat_events_clean",
        view=lambda s: clean_events(s.read.parquet(src_dir)),
        ts_col="ts",
    )
    mat = Materializer(spark, lake)
    mat.run(target, lookback_hours=4)  # M1 full load
    batch2.write.mode("append").parquet(src_dir)  # late + new facts arrive
    mat.run(target, lookback_hours=4)  # M2 repair + M4 append
    return mat.read_mat("mat_events_clean")
