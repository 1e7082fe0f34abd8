"""Keyed upsert sink over parquet — the engine's MERGE analog.

The reference's streaming aggregates land in Iceberg upsert tables
keyed on ``identifier_fields`` (SURVEY.md S7/T4: equality deletes,
merge-on-read). On a real lake this is exactly
``DeltaTable.merge(...).whenMatchedUpdateAll().whenNotMatchedInsertAll()``
(or Iceberg ``MERGE INTO``) inside ``foreachBatch``; neither format's
runtime jars ship in this environment, so :func:`merge_upsert` gives
the same semantics over plain parquet with an atomic directory swap.

Layout: the table is partitioned into ``kb=N`` key-hash buckets
(murmur3 of the key columns mod ``N_BUCKETS``). A MERGE batch
rewrites ONLY the buckets its update keys hash into and hard-links
the rest from the live version before one atomic swap
(:mod:`streaming_data_lake_spark.overlay`) — the emulation of a real
format's merge touching only the data files that contain matched
keys. At 100 TB with processing-time triggers, a micro-batch updates
recent keys only, so merge IO is proportional to the batch's key
spread, not the table. The bucket column is an internal layout key:
``read_upsert`` (and the format adapter's ``read_table``) drops it.

Semantics: incoming rows win on key collision (last-writer-wins per
micro-batch, like the reference's continuously-updated windows).
Idempotent per batchId: replaying a batch converges to the same
table state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_lake_spark.overlay import (
    atomic_swap,
    has_partition_dirs,
    link_untouched_partitions,
    tmp_sibling,
)

#: Key-hash bucket count. A layout constant, not a tuning parameter
#: per table: at real scale this maps to the format's file/partition
#: granularity. Internal only — never part of a table's contract.
N_BUCKETS = 16
BUCKET_COL = "kb"


def _with_bucket(df: DataFrame, keys: list[str]) -> DataFrame:
    # Spark's hash() is seeded murmur3 — deterministic across
    # sessions and processes, so an existing row and its update
    # always land in the same bucket.
    return df.withColumn(BUCKET_COL, F.pmod(F.hash(*keys), F.lit(N_BUCKETS)))


def read_upsert(spark: SparkSession, table_dir: str) -> DataFrame:
    """The upsert table without its internal bucket column. The drop
    applies ONLY when the table physically carries the ``kb=``
    partition layout — that layout is this sink's signature, and
    merge_upsert rejects updates with a ``kb`` column, so a
    bucket-partitioned table's ``kb`` can never be user data. A FLAT
    table with a ``kb`` column is the ambiguous case merge_upsert
    refuses to merge into; reading returns it untouched (reads are
    nondestructive — hiding a possibly-genuine user column is not).
    The engine's own maintenance preserves the layout (compaction is
    partition-aware), so managed tables never reach the flat case."""
    df = spark.read.parquet(table_dir)
    if BUCKET_COL in df.columns and has_partition_dirs(table_dir, BUCKET_COL):
        return df.drop(BUCKET_COL)
    return df


def merge_upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    keys: list[str],
) -> None:
    """MERGE ``updates`` into the parquet table at ``table_dir`` keyed
    on ``keys``: matched rows are replaced, new rows inserted. Only
    the key-hash buckets touched by ``updates`` are rewritten — when
    the live table actually carries the bucket layout; a table whose
    layout is flat (pre-layout legacy, or a foreign rewrite) is
    migrated with one atomic full rewrite that establishes it."""
    if BUCKET_COL in updates.columns:
        raise ValueError(
            f"{BUCKET_COL!r} is a reserved layout column of managed "
            f"upsert tables; rename the update column"
        )
    updates_b = _with_bucket(updates, keys)
    if not os.path.exists(table_dir):
        # Atomic initial publish: Spark writing straight into the
        # final dir would leave a half-written table on crash, which
        # the next call would then try to MERGE into. foreachBatch is
        # single-writer, so the rename cannot race another creator.
        tmp = tmp_sibling(table_dir)
        updates_b.repartition(BUCKET_COL).write.mode("overwrite").partitionBy(
            BUCKET_COL
        ).parquet(tmp)
        os.rename(tmp, table_dir)
        return
    current = spark.read.parquet(table_dir)
    if not has_partition_dirs(table_dir, BUCKET_COL):
        # Legacy/flattened layout: there are no bucket dirs to link,
        # so a bucket-scoped rewrite would DROP everything outside
        # the touched buckets. Migrate: merge + (re)bucket the whole
        # table in one atomic swap; subsequent merges take the
        # bucket-scoped path.
        if BUCKET_COL in current.columns:
            # Ambiguous: either a layout column demoted to data by a
            # foreign flat rewrite, or a GENUINE user column in a
            # table never written through this sink. Dropping would
            # silently destroy the latter — refuse loudly.
            raise ValueError(
                f"flat table {table_dir!r} carries a {BUCKET_COL!r} "
                f"column; cannot tell a demoted layout key from user "
                f"data — rebuild the table (or rename the column) "
                f"before merging"
            )
        keep_all = current.join(updates_b.select(*keys), on=keys, how="left_anti")
        merged = _with_bucket(keep_all, keys).unionByName(updates_b)
        tmp = tmp_sibling(table_dir)
        merged.repartition(BUCKET_COL).write.mode("overwrite").partitionBy(
            BUCKET_COL
        ).parquet(tmp)
        atomic_swap(table_dir, tmp)
        return
    # The micro-batch drives two jobs (touched-bucket probe + the
    # merged write); cache it so the batch transform computes once.
    updates_b = updates_b.cache()
    try:
        # Bounded control-flow collect: at most N_BUCKETS small ints,
        # independent of update or table size (the same class as the
        # materializer's watermark probe).
        touched = sorted(
            r[0] for r in updates_b.select(BUCKET_COL).distinct().collect()
        )
        if not touched:
            # Empty micro-batch (availableNow commonly schedules one):
            # no bucket is touched, so the table state is unchanged —
            # skip the write + link + swap publish cycle entirely
            # rather than paying a full no-op publish with its
            # non-atomic rename window.
            return
        # Anti-join keys come off the CACHED updates_b plan — the raw
        # `updates` plan would not match the cache and the batch
        # transform would recompute in the write job.
        keep = current.filter(F.col(BUCKET_COL).isin(touched)).join(
            updates_b.select(*keys), on=keys, how="left_anti"
        )
        merged = keep.unionByName(updates_b)
        tmp = tmp_sibling(table_dir)
        # One task per rewritten bucket -> one file per bucket:
        # emulation-scale file hygiene (a real format's merge
        # parallelizes within the rewritten file set instead).
        merged.repartition(BUCKET_COL).write.mode("overwrite").partitionBy(
            BUCKET_COL
        ).parquet(tmp)
        link_untouched_partitions(
            table_dir, tmp, BUCKET_COL, {f"{BUCKET_COL}={b}" for b in touched}
        )
        atomic_swap(table_dir, tmp)
    finally:
        updates_b.unpersist()


def foreach_batch_upsert(spark: SparkSession, table_dir: str, keys: list[str]):
    """``foreachBatch`` hook writing each micro-batch through
    :func:`merge_upsert` — the Spark equivalent of the reference's
    Iceberg upsert sink."""

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert(spark, table_dir, batch_df, keys)

    return _fn
