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


_TT_CUTOFF = "2024-01-20 00:00:00"

_TIME_TRAVEL_ORACLE = f"""
SELECT event_id, ts, user_id, event_type, value
FROM events WHERE ts <= TIMESTAMP '{_TT_CUTOFF}'
"""


@register(
    "time_travel_read_v1",
    _TIME_TRAVEL_ORACLE,
    "S10: snapshot versioning + time travel — two commits, read back "
    "version 1 (the pre-cutoff state) after version 2 superseded it.",
)
def time_travel_read_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark.sources.versioned import VersionedTable

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    cutoff = F.lit(_TT_CUTOFF).cast("timestamp")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_") + "/events_versioned")
    vt.commit(events.filter(F.col("ts") <= cutoff), operation="append")
    vt.commit(events, operation="overwrite")
    return vt.read(version=1)


_SNAPSHOTS_ORACLE = f"""
SELECT 1 AS version, 'append' AS operation,
       count(*) FILTER (ts <= TIMESTAMP '{_TT_CUTOFF}') AS n_rows FROM events
UNION ALL
SELECT 2 AS version, 'overwrite' AS operation, count(*) AS n_rows FROM events
"""


@register(
    "snapshot_metadata",
    _SNAPSHOTS_ORACLE,
    "S10: the table$snapshots metadata view over the versioned table.",
)
def snapshot_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark.sources.versioned import VersionedTable

    events = load_table(spark, sf_dir, "events").select("event_id", "ts")
    cutoff = F.lit(_TT_CUTOFF).cast("timestamp")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_") + "/events_versioned")
    vt.commit(events.filter(F.col("ts") <= cutoff), operation="append")
    vt.commit(events, operation="overwrite")
    return vt.snapshots()


_COMPACTION_ORACLE = """
SELECT 64 AS n_files_before, 1 AS n_files_after, count(*) AS n_rows FROM events
"""


@register(
    "maintenance_compaction",
    _COMPACTION_ORACLE,
    "X1-X3: small-file compaction (64 fragments -> 128MB-target files) with "
    "atomic swap + orphan sweep; row count is preserved.",
)
def maintenance_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark.plans.maintenance import (
        compact_parquet,
        remove_orphans,
    )

    def parquet_files(d: str) -> int:
        return sum(
            1
            for f in os.listdir(d)
            if f.endswith(".parquet") or f.startswith("part-")
        )

    lake = tempfile.mkdtemp(prefix="lake_")
    tdir = os.path.join(lake, "events_small_files")
    events = load_table(spark, sf_dir, "events")
    events.repartition(64).write.mode("overwrite").parquet(tdir)
    before = parquet_files(tdir)
    compact_parquet(spark, tdir)
    after = parquet_files(tdir)
    remove_orphans(lake)
    n_rows = spark.read.parquet(tdir).count()
    return spark.createDataFrame(
        [(before, after, n_rows)],
        "n_files_before int, n_files_after int, n_rows long",
    )
