"""Bucketed co-located joins — the pre-shuffle that removes the
join Exchange entirely (SURVEY.md §4; the reference leaves physical
layout to Iceberg partitioning, `iceberg/apply_tables.py:105-136`).

Writing both fact tables bucketed by the join key means every future
join on that key reads already-co-partitioned data: no Exchange on
either side, which at 100 TB is the difference between a join that
moves nothing and one that moves both tables across the network.
Bucket counts must match (or divide evenly) for the bucket-join rule
to fire; ``sortBy`` on the same key additionally allows the
sort-merge join to skip its per-partition sort when each bucket is a
single file.
"""

from __future__ import annotations

import contextlib
import os
import re

from pyspark.sql import DataFrame, SparkSession

from streaming_data_lake_spark.catalog import load_table

_BUCKETS = 8
_READY: set[tuple[str, str]] = set()
_FRAMES_READY: set[str] = set()


def _safe_tag(sf_dir: str) -> str:
    return re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.strip("/"))


def _write_bucketed(spark: SparkSession, df: DataFrame, tbl: str, key: str, buckets: int) -> None:
    """Write ``df`` as an EXTERNAL bucketed+sorted table at a unique
    per-process temp location. External (not managed) matters for
    harness portability: a managed table's location is derived from
    ``spark.sql.warehouse.dir``, which under a bare session is
    cwd-relative — a second process with a fresh in-memory catalog
    but the same cwd then hits LOCATION_ALREADY_EXISTS on the
    leftover directory. A unique external path makes the write
    correct under ANY session, and DROP TABLE IF EXISTS clears a
    same-process catalog entry."""
    import tempfile

    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    path = os.path.join(tempfile.mkdtemp(prefix=f"bkt_{tbl}_"), tbl)
    (
        df.write.bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .option("path", path)
        .saveAsTable(tbl)
    )


def bucketed_table(
    spark: SparkSession, sf_dir: str, name: str, key: str
) -> DataFrame:
    """The table as a bucketed managed table (written once per
    session per sf_dir), bucketed+sorted by ``key``."""
    tbl = f"bkt_{name}_{_safe_tag(sf_dir)}"
    if (sf_dir, name) not in _READY:
        _write_bucketed(spark, load_table(spark, sf_dir, name), tbl, key, _BUCKETS)
        _READY.add((sf_dir, name))
    return spark.table(tbl)


def bucketed_frame(
    spark: SparkSession, df: DataFrame, tbl: str, key: str, buckets: int = _BUCKETS
) -> DataFrame:
    """Write an arbitrary frame bucketed+sorted by ``key`` (once per
    process per name) and read it back. Self-joins on ``key`` over
    the returned frame are co-located: the expensive subtree that
    produced ``df`` executes exactly once (at write time), and the
    join needs no Exchange on either side.

    The cache key is the table NAME: callers must encode everything
    that changes the frame's content in ``tbl`` (the query layer
    embeds the sf_dir tag; parameter variants need distinct names),
    or the second call silently reads the first call's table."""
    if tbl not in _FRAMES_READY:
        _write_bucketed(spark, df, tbl, key, buckets)
        _FRAMES_READY.add(tbl)
    return spark.table(tbl)


def bucketed_join(
    spark: SparkSession, sf_dir: str, build: "callable"
) -> DataFrame:
    """Run ``build(orders, lineitem)`` over the bucketed copies. The
    caller's join should carry a ``hint("merge")`` so the plan is the
    co-located shuffle-free sort-merge join even where test-scale
    stats would pick a broadcast (at real scale neither side
    broadcasts — the hint makes the test plan the production plan)."""
    orders = bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    lineitem = bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    return build(orders, lineitem)
