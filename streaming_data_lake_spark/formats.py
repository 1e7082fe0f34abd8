"""Table-format adapter: one lake interface, pluggable backends.

The reference's lake layer is Iceberg v2 — upsert tables with
equality deletes (iceberg/tables/hourly_impressions_by_geo.yml:18-22),
snapshot metadata / time travel (scripts/query-examples.sh:91-95) and
a scheduled optimize/expire/orphan cycle (scripts/maintenance.sh).
This engine re-expresses those operations (SURVEY.md S7/S10/T4/X1-X3)
behind one interface so the storage format is a deployment choice,
not something queries know about:

 - :class:`ParquetEmulationFormat` — always available; delegates to
   the atomic-swap parquet implementations in ``sources/upsert.py``,
   ``sources/versioned.py`` and ``plans/maintenance.py``. This is the
   backend exercised in this environment (no format jars ship here).
 - :class:`DeltaFormat` — used when the ``delta-spark`` package and
   its JVM classes are present: MERGE INTO for upsert, DESCRIBE
   HISTORY for snapshots, ``versionAsOf`` for time travel, VACUUM for
   expiry/orphans, OPTIMIZE for compaction.

``resolve_format(spark)`` picks the best available backend; the env
var ``SPARK_GRAFT_TABLE_FORMAT`` (``parquet`` | ``delta``) forces one.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class TableFormat:
    """Uniform lake-table operations over one storage format.

    A *table reference* is a filesystem path (both backends here are
    path-addressed; a catalog-addressed backend would accept
    ``db.table`` names in the same slot).
    """

    name: str = "abstract"

    @classmethod
    def available(cls, spark: SparkSession) -> bool:
        raise NotImplementedError

    # --- S7/T4: keyed upsert (MERGE) ---
    def merge_upsert(
        self,
        spark: SparkSession,
        table_ref: str,
        updates: DataFrame,
        keys: list[str],
        ts_col: str | None = None,
        n_buckets: int | None = None,
    ) -> None:
        """``ts_col`` (one of ``keys``) declares the table's time
        dimension so the backend can lay it out day-partitioned and
        keep a micro-batch's merge IO proportional to its day spread
        (a real format expresses this as the table's partition spec —
        ``day(ts)`` — which MERGE respects for free; the parquet
        emulation needs it declared at the merge API). ``n_buckets``
        pins the emulation's key-hash bucket count (default:
        auto-sized toward ~128 MB leaves with amortized growth);
        backends whose format manages file sizing itself ignore it,
        like ``ts_col`` (ADVICE r8 #4)."""
        raise NotImplementedError

    def foreach_batch_upsert(
        self,
        spark: SparkSession,
        table_ref: str,
        keys: list[str],
        ts_col: str | None = None,
        n_buckets: int | None = None,
    ):
        """``foreachBatch`` hook running :meth:`merge_upsert` per
        micro-batch (the streaming upsert sink, SURVEY.md T4)."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            self.merge_upsert(
                spark, table_ref, batch_df, keys, ts_col=ts_col, n_buckets=n_buckets
            )

        return _fn

    def read_table(self, spark: SparkSession, table_ref: str) -> DataFrame:
        """Read the current contents of a (non-versioned) lake table,
        e.g. an upsert sink target."""
        raise NotImplementedError

    # --- S10: snapshots + time travel ---
    def commit_snapshot(
        self, spark: SparkSession, table_ref: str, df: DataFrame, operation: str = "append"
    ) -> int:
        """Write a new table version; returns its version number.

        ``operation="append"``: ``df`` holds ONLY the rows to add —
        the backend reuses the previous version's data (Delta appends
        to the log; the parquet emulation hard-links the prior
        version's files, its manifest-reuse analog) and commit IO is
        proportional to the appended rows. ``"overwrite"``: ``df`` is
        the full new contents."""
        raise NotImplementedError

    def read(
        self, spark: SparkSession, table_ref: str, version: int | None = None
    ) -> DataFrame:
        raise NotImplementedError

    def snapshots(self, spark: SparkSession, table_ref: str) -> DataFrame:
        """(version, operation, n_rows) metadata table."""
        raise NotImplementedError

    # --- X1-X3: maintenance ---
    def expire_snapshots(
        self, spark: SparkSession, table_ref: str, keep_last: int = 1
    ) -> list[int]:
        raise NotImplementedError

    def compact(self, spark: SparkSession, table_ref: str) -> int:
        raise NotImplementedError

    def remove_orphans(
        self, spark: SparkSession, lake_dir: str, min_age_s: float | None = None
    ) -> list[str]:
        """``min_age_s=None`` → the backend's concurrency-safe default
        (skip scratch younger than ~1h); a single-process maintenance
        cycle that knows no writer is in flight passes ``0.0``."""
        raise NotImplementedError


class ParquetEmulationFormat(TableFormat):
    """Atomic-swap parquet backend (always available)."""

    name = "parquet"

    @classmethod
    def available(cls, spark: SparkSession) -> bool:
        return True

    def merge_upsert(self, spark, table_ref, updates, keys, ts_col=None, n_buckets=None):
        from streaming_data_lake_spark.sources.upsert import merge_upsert

        merge_upsert(spark, table_ref, updates, keys, ts_col=ts_col, n_buckets=n_buckets)

    def read_table(self, spark, table_ref):
        # Upsert tables carry an internal key-hash bucket layout
        # column; reading through the adapter hides it, like a real
        # format hides its file/partition organization.
        from streaming_data_lake_spark.sources.upsert import read_upsert

        return read_upsert(spark, table_ref)

    def _vt(self, spark, table_ref):
        from streaming_data_lake_spark.sources.versioned import VersionedTable

        return VersionedTable(spark, table_ref)

    def commit_snapshot(self, spark, table_ref, df, operation="append"):
        return self._vt(spark, table_ref).commit(df, operation)

    def read(self, spark, table_ref, version=None):
        return self._vt(spark, table_ref).read(version)

    def snapshots(self, spark, table_ref):
        return self._vt(spark, table_ref).snapshots()

    def expire_snapshots(self, spark, table_ref, keep_last=1):
        return self._vt(spark, table_ref).expire_snapshots(keep_last)

    def compact(self, spark, table_ref):
        from streaming_data_lake_spark.plans.maintenance import compact_parquet

        return compact_parquet(spark, table_ref)

    def remove_orphans(self, spark, lake_dir, min_age_s=None):
        from streaming_data_lake_spark.plans.maintenance import remove_orphans

        if min_age_s is None:
            return remove_orphans(lake_dir)
        return remove_orphans(lake_dir, min_age_s=min_age_s)


class DeltaFormat(TableFormat):
    """Delta Lake backend — used when ``delta-spark`` + jars exist.

    Not exercisable in this environment (no jars); every method is
    the standard public Delta API call for the operation, selected
    only after :meth:`available` has probed both the Python package
    and the JVM class.
    """

    name = "delta"

    #: Contract note: the 1-based version mapping and the
    #: one-row-per-commit snapshots() parity hold while
    #: ``commit_snapshot`` is the sole writer of a versioned table.
    #: snapshots() reconstructs the contract's full-table n_rows
    #: (Iceberg total-records) from Delta's per-commit numOutputRows
    #: by running-summing appends within overwrite epochs — which is
    #: exact under the same single-writer assumption.
    #: Maintenance operations (OPTIMIZE/VACUUM/MERGE) write their own
    #: Delta commits, so interleaving them with snapshot commits on
    #: the SAME table yields non-dense logical versions and extra
    #: history rows — keep versioned tables and maintenance targets
    #: separate (as every engine query does), or address snapshots by
    #: timestamp instead.

    @classmethod
    def available(cls, spark: SparkSession) -> bool:
        try:
            import delta  # noqa: F401

            spark._jvm.io.delta.tables.DeltaTable  # noqa: B018 — JVM probe
            return True
        except Exception:  # noqa: BLE001 — any missing layer means unavailable
            return False

    def _dt(self, spark, table_ref):
        from delta.tables import DeltaTable

        return DeltaTable.forPath(spark, table_ref)

    def merge_upsert(self, spark, table_ref, updates, keys, ts_col=None, n_buckets=None):
        # ts_col and n_buckets are not needed here: Delta MERGE
        # already prunes matched files via per-file min/max stats on
        # the key columns (data skipping), so a time-keyed table's
        # merge touches only recent files without an explicit day
        # layout, and OPTIMIZE manages file sizing.
        from delta.tables import DeltaTable

        from streaming_data_lake_spark.sources.upsert import (
            _last_writer_wins,
            _null_key_check_col,
            _raise_null_keys,
        )

        # Adapter semantics are backend-uniform: a batch holding
        # several rows for one key collapses to the same deterministic
        # winner the parquet emulation keeps — raw multi-matching
        # sources would make Delta MERGE throw
        # DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE where
        # the emulation succeeds, a divergence queries can't paper over.
        # NULL merge keys are rejected for the same uniformity: Delta's
        # `t.k = s.k` never matches NULL, so a null-keyed update would
        # silently INSERT a fresh duplicate per batch where the parquet
        # emulation raises (Iceberg identifier_fields are non-null).
        if updates.where(_null_key_check_col(keys)).limit(1).count():
            _raise_null_keys(table_ref, keys)
        updates = _last_writer_wins(updates, keys)
        if not DeltaTable.isDeltaTable(spark, table_ref):
            updates.write.format("delta").mode("overwrite").save(table_ref)
            return
        # Quote each key literally (`` escapes a literal backtick) —
        # same rule as the parquet path's _qcol.
        def bq(k: str) -> str:
            return "`" + k.replace("`", "``") + "`"

        cond = " AND ".join(f"t.{bq(k)} = s.{bq(k)}" for k in keys)
        (
            self._dt(spark, table_ref)
            .alias("t")
            .merge(updates.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )

    def read_table(self, spark, table_ref):
        return spark.read.format("delta").load(table_ref)

    def commit_snapshot(self, spark, table_ref, df, operation="append"):
        # The adapter contract numbers versions 1..N (the parquet
        # emulation's convention); Delta numbers its own commits from
        # 0, so expose version = delta_version + 1 and read() maps
        # back. The logical operation label rides userMetadata (a
        # path-mode Delta write logs operation=WRITE regardless).
        mode = "overwrite" if operation == "overwrite" else "append"
        (
            df.write.format("delta")
            .mode(mode)
            .option("userMetadata", operation)
            .save(table_ref)
        )
        return int(self._dt(spark, table_ref).history(1).head()["version"]) + 1

    def read(self, spark, table_ref, version=None):
        reader = spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", version - 1)
        return reader.load(table_ref)

    def snapshots(self, spark, table_ref):
        # n_rows honors the adapter contract (FULL table count at
        # each version — Iceberg total-records), not Delta's raw
        # numOutputRows (rows written by the commit): under the
        # single-writer commit_snapshot contract an overwrite resets
        # the count and an append adds its written rows, so the full
        # count is a running sum within overwrite "epochs". History
        # frames are commit-count sized, so the windows are trivial.
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        h = self._dt(spark, table_ref).history().select(
            (F.col("version").cast("int") + 1).alias("version"),
            F.coalesce(F.col("userMetadata"), F.lower("operation")).alias("operation"),
            F.col("operationMetrics.numOutputRows").cast("long").alias("n_written"),
        )
        epoch = F.sum(
            F.when(F.col("operation") == "overwrite", 1).otherwise(0)
        ).over(Window.orderBy("version"))
        return (
            h.withColumn("_epoch", epoch)
            .withColumn(
                "n_rows",
                F.sum("n_written").over(
                    Window.partitionBy("_epoch").orderBy("version")
                ),
            )
            .select("version", "operation", "n_rows")
        )

    def expire_snapshots(self, spark, table_ref, keep_last=1):
        # Delta expires by retention age, not count; a 0-hour vacuum
        # drops everything unreferenced by the current version, and
        # needs the retention safety check scoped off around the call.
        key = "spark.databricks.delta.retentionDurationCheck.enabled"
        prev = spark.conf.get(key, "true")
        spark.conf.set(key, "false")
        try:
            self._dt(spark, table_ref).vacuum(0)
        finally:
            spark.conf.set(key, prev)
        return []

    def compact(self, spark, table_ref):
        self._dt(spark, table_ref).optimize().executeCompaction()
        return int(self._dt(spark, table_ref).detail().head()["numFiles"] or 1)

    def remove_orphans(self, spark, lake_dir, min_age_s=None):
        # Delta VACUUM expresses the age guard in hours; None → the
        # same 1h concurrency-safe default as the parquet backend.
        # Any retention below Delta's 168h default trips the safety
        # check and the resulting exception would be swallowed by the
        # not-a-delta-table except below (silent no-op sweep) — scope
        # the check off around the loop, exactly like
        # expire_snapshots does for its 0-hour vacuum.
        retain_h = (3600.0 if min_age_s is None else min_age_s) / 3600.0
        key = "spark.databricks.delta.retentionDurationCheck.enabled"
        prev = spark.conf.get(key, "true")
        spark.conf.set(key, "false")
        removed = []
        try:
            for entry in os.listdir(lake_dir):
                path = os.path.join(lake_dir, entry)
                if os.path.isdir(path):
                    try:
                        self._dt(spark, path).vacuum(retain_h)
                        removed.append(entry)
                    except Exception:  # noqa: BLE001 — not a delta table
                        continue
        finally:
            spark.conf.set(key, prev)
        return removed


#: Preference order when no override is given.
BACKENDS: tuple[type[TableFormat], ...] = (DeltaFormat, ParquetEmulationFormat)


def resolve_format(spark: SparkSession, prefer: str | None = None) -> TableFormat:
    """Pick the lake backend: explicit ``prefer`` (or the
    ``SPARK_GRAFT_TABLE_FORMAT`` env var) wins; otherwise the first
    available backend in preference order (Delta when its jars ship,
    else the parquet emulation)."""
    choice = prefer or os.environ.get("SPARK_GRAFT_TABLE_FORMAT")
    if choice:
        for cls in BACKENDS:
            if cls.name == choice:
                if not cls.available(spark):
                    raise RuntimeError(
                        f"table format {choice!r} requested but not available"
                    )
                return cls()
        raise ValueError(f"unknown table format {choice!r}")
    for cls in BACKENDS:
        if cls.available(spark):
            return cls()
    raise RuntimeError("no table format backend available")  # pragma: no cover
