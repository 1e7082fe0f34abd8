"""Keyed upsert sink over parquet — the engine's MERGE analog.

The reference's streaming aggregates land in Iceberg upsert tables
keyed on ``identifier_fields`` (SURVEY.md S7/T4: equality deletes,
merge-on-read). On a real lake this is exactly
``DeltaTable.merge(...).whenMatchedUpdateAll().whenNotMatchedInsertAll()``
(or Iceberg ``MERGE INTO``) inside ``foreachBatch``; neither format's
runtime jars ship in this environment, so :func:`merge_upsert` gives
the same semantics over plain parquet with an atomic directory swap.

Semantics: incoming rows win on key collision (last-writer-wins per
micro-batch, like the reference's continuously-updated windows).
Idempotent per batchId: replaying a batch converges to the same
table state.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def merge_upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    keys: list[str],
) -> None:
    """MERGE ``updates`` into the parquet table at ``table_dir`` keyed
    on ``keys``: matched rows are replaced, new rows inserted."""
    if os.path.exists(table_dir):
        current = spark.read.parquet(table_dir)
        keep = current.join(updates.select(*keys), on=keys, how="left_anti")
        merged = keep.unionByName(updates)
    else:
        merged = updates
    tmp = f"{table_dir}__tmp_{uuid.uuid4().hex}"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(table_dir):
        old = f"{table_dir}__old_{uuid.uuid4().hex}"
        os.rename(table_dir, old)
        os.rename(tmp, table_dir)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(tmp, table_dir)


def foreach_batch_upsert(spark: SparkSession, table_dir: str, keys: list[str]):
    """``foreachBatch`` hook writing each micro-batch through
    :func:`merge_upsert` — the Spark equivalent of the reference's
    Iceberg upsert sink."""

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert(spark, table_dir, batch_df, keys)

    return _fn
