"""Partitioned table layout — the reference's Iceberg partition
specs (``days(ts)`` / identity transforms, SURVEY.md S5,
iceberg/apply_tables.py:105-136) as a Spark partitioned-parquet
layout.

Writing facts partitioned by day means every time-ranged query scans
only the matching day directories (partition pruning happens at file
listing, before any I/O); at 100 TB this is what turns "last 6 hours"
repair and lookback queries (M2) into reads of a handful of
partitions instead of a full-table scan. On Delta/Iceberg the same
write is ``PARTITIONED BY (days(ts))`` and the pruning is
metadata-driven rather than directory-driven — semantics identical.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_lake_spark.catalog import load_table

_LAYOUTS: dict[tuple[str, str], str] = {}


def day_partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table rewritten day-partitioned (once per process);
    reads carry an ``event_date`` partition column that time filters
    prune on."""
    key = (sf_dir, "events")
    path = _LAYOUTS.get(key)
    if path is None or not os.path.isdir(path):
        path = os.path.join(tempfile.mkdtemp(prefix="layout_"), "events_by_day")
        (
            load_table(spark, sf_dir, "events")
            .withColumn("event_date", F.to_date("ts"))
            .write.partitionBy("event_date")
            .mode("overwrite")
            .parquet(path)
        )
        _LAYOUTS[key] = path
    return spark.read.parquet(path)


def time_ranged_events(
    spark: SparkSession, sf_dir: str, start: str, end: str
) -> DataFrame:
    """Default read path for time-windowed events queries: the
    day-partitioned layout restricted to ``[start, end)`` (dates as
    ``YYYY-MM-DD``, end exclusive at midnight UTC).

    Two predicates do two jobs: ``event_date`` prunes whole day
    partitions at file listing (shows up as PartitionFilters in the
    plan), and ``ts`` is the exact bound — and because the rewritten
    copy stores real TIMESTAMP micros (not the raw TIMESTAMP(NANOS)
    the source files carry), the ts predicate also reaches parquet
    row-group statistics, which the nanos→timestamp conversion on
    the direct read path defeats."""
    ev = day_partitioned_events(spark, sf_dir)
    return ev.filter(
        (F.col("event_date") >= F.lit(start))
        & (F.col("event_date") < F.lit(end))
        & (F.col("ts") >= F.to_timestamp(F.lit(start)))
        & (F.col("ts") < F.to_timestamp(F.lit(end)))
    )
