"""Table maintenance — the reference's scheduled optimize/expire/
orphan cycle (SURVEY.md §2.9; scripts/maintenance.sh) over the
engine's parquet tables.

 - X1 compaction to a target file size: rewrite a table directory so
   files average ~128 MB (the reference's optimize threshold,
   maintenance.sh:66-67). On Iceberg/Delta this is
   ``rewrite_data_files`` / ``OPTIMIZE``; here it is a coalesced
   rewrite with an atomic swap.
 - X2/X3 snapshot/orphan cleanup: the parquet tables keep no
   snapshots, but the atomic-swap writers leave ``__tmp_``/``__old_``
   directories behind on crash — :func:`remove_orphans` sweeps them
   (maintenance.sh:72-79).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024  # reference compaction target


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(spark: SparkSession, table_dir: str, target_bytes: int = TARGET_FILE_BYTES) -> int:
    """X1: rewrite ``table_dir`` into ceil(size/target) files.
    Returns the resulting file count."""
    n_files = max(1, math.ceil(dir_bytes(table_dir) / target_bytes))
    df = spark.read.parquet(table_dir)
    tmp = f"{table_dir}__tmp_{uuid.uuid4().hex}"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    old = f"{table_dir}__old_{uuid.uuid4().hex}"
    os.rename(table_dir, old)
    os.rename(tmp, table_dir)
    shutil.rmtree(old, ignore_errors=True)
    return n_files


def remove_orphans(lake_dir: str) -> list[str]:
    """X2/X3: remove leftover atomic-swap scratch directories."""
    removed = []
    for entry in os.listdir(lake_dir):
        if "__tmp_" in entry or "__old_" in entry:
            shutil.rmtree(os.path.join(lake_dir, entry), ignore_errors=True)
            removed.append(entry)
    return removed
