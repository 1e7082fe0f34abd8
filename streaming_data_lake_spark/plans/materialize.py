"""Incremental view materialization — the reference's 3-pass
watermark-based maintenance algorithm (SURVEY.md §2.8,
scripts/materialize.sh:74-333) as a PySpark batch job.

Targets are (view definition, timestamp column, optional SCD2
dimension dependencies). State lives in a ``_watermarks`` table
(table_name, last_materialized_at), exactly like the reference's
``materialization_watermarks`` (materialize.sh:66-71, M6).

Passes per run:
 - M1  full load (CTAS) when the mat table does not exist.
 - M2  pass 0 lookback repair: if view-count ≠ mat-count inside
   [watermark - lookback, watermark], DELETE + re-INSERT that window
   (materialize.sh:123-173). Catches late-arriving facts within the
   lookback horizon; later ones are the reference's documented
   hour-boundary gap (M7, .design:2329).
 - M3  pass 1 dimension-change repair: for each SCD2 dim dependency
   with versions newer than the watermark, DELETE mat rows carrying
   affected foreign keys and re-INSERT them from the view
   (materialize.sh:175-224).
 - M4  pass 2 append: INSERT view rows with ts > watermark
   (materialize.sh:226-241).
 - M5  pass 3 EXISTS repair: rows whose funnel flags were false at
   materialization time but whose downstream event has since arrived
   are deleted + re-inserted (materialize.sh:243-321).
 - M6  watermark upsert.

Row-level DELETE is emulated with read-filter-overwrite on parquet;
on Delta/Iceberg the same passes map to ``DELETE FROM ... WHERE`` and
``MERGE`` (the reference's Trino statements).

Mat tables are DAY-PARTITIONED on the ts column (``day_pt=``), which
is what makes the passes survive 100 TB:

 - M2's repair REWRITES ONLY THE LOOKBACK-WINDOW PARTITIONS. The new
   table version is published with the same single atomic directory
   swap as before (keeping the crash-recovery contract), but its
   unchanged day partitions are hard-linked from the previous
   version instead of rewritten — the filesystem emulation of an
   Iceberg overwrite snapshot that reuses every untouched manifest
   and rewrites only the affected partition's files. Repair IO is
   proportional to the lookback window, not the table.
 - M2's mat-side count probe carries a partition predicate, so the
   scan prunes to the lookback days.
 - M4 appends new day partitions/files, touching nothing else.
 - M3/M5 repairs key on FKs/flags that scatter across all
   partitions (equality deletes, merge-on-read in Iceberg terms), so
   they keep the full rewrite — same as the reference's contract.
"""

from __future__ import annotations

import datetime as dt
import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_lake_spark.formats import resolve_format
from streaming_data_lake_spark.overlay import (
    atomic_swap,
    has_partition_dirs,
    link_untouched_partitions,
    tmp_sibling,
)

_EPOCH_UTC = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)


def _utc_from_micros(us: int) -> dt.datetime:
    """Epoch micros -> aware-UTC datetime, with timedelta arithmetic
    (``fromtimestamp`` would route through the OS timezone)."""
    return _EPOCH_UTC + dt.timedelta(microseconds=int(us))


@dataclass(frozen=True)
class DimDependency:
    """An SCD2 dimension the view joins; used by the M3 repair pass."""

    dim: Callable[[SparkSession], DataFrame]  # full dim incl. history
    dim_key: str  # business key column in the dim
    fact_fk: str  # FK column in the materialized view output
    valid_from_col: str = "valid_from"


@dataclass(frozen=True)
class ExistsRepair:
    """M5 spec: mat rows whose ``flag_cols`` were false at
    materialization time but have since flipped true in the view
    (a downstream event arrived late) are deleted and re-inserted —
    the reference's funnel-repair pass (materialize.sh:243-321)."""

    key_col: str
    flag_cols: tuple[str, ...]


@dataclass(frozen=True)
class MatTarget:
    name: str
    view: Callable[[SparkSession], DataFrame]
    ts_col: str
    dims: tuple[DimDependency, ...] = field(default_factory=tuple)
    exists_repair: ExistsRepair | None = None


#: Partition column of materialized tables. Derived from the target's
#: ts column at write time and dropped on read — an internal layout
#: key, never part of the view contract. No leading underscore: Spark
#: file listing hides `_`/`.`-prefixed paths.
DAY_COL = "day_pt"


class Materializer:
    def __init__(self, spark: SparkSession, lake_dir: str) -> None:
        self.spark = spark
        self.lake_dir = lake_dir
        self.wm_dir = os.path.join(lake_dir, "_watermarks")

    # -- state ---------------------------------------------------------
    def _mat_dir(self, name: str) -> str:
        return os.path.join(self.lake_dir, name)

    def _read_raw(self, name: str) -> DataFrame:
        """The mat table WITH its day_pt partition column."""
        return self.spark.read.parquet(self._mat_dir(name))

    def read_mat(self, name: str) -> DataFrame:
        df = self._read_raw(name)
        return df.drop(DAY_COL) if DAY_COL in df.columns else df

    @staticmethod
    def _with_day(df: DataFrame, ts_col: str) -> DataFrame:
        # Session tz is pinned UTC by the engine session factory, and
        # the derivation is only ever compared against values derived
        # the same way in the same process — the column is a layout
        # key, not a semantic output.
        return df.withColumn(DAY_COL, F.to_date(F.col(ts_col)))

    def get_watermark(self, name: str) -> dt.datetime | None:
        """Returns the watermark as an AWARE-UTC datetime. The stored
        instant round-trips as epoch micros (``unix_micros``) rather
        than a collected timestamp: Python-side timestamp conversion
        goes through the driver OS timezone, where naive values shift
        across DST boundaries when the lookback arithmetic re-enters
        a plan literal. Epoch micros are TZ-free."""
        if not os.path.exists(self.wm_dir):
            return None
        row = (
            resolve_format(self.spark)
            .read_table(self.spark, self.wm_dir)
            .filter(F.col("table_name") == name)
            .select(F.unix_micros(F.col("last_materialized_at")).alias("us"))
            .collect()
        )
        return _utc_from_micros(row[0][0]) if row else None

    def _set_watermark(self, name: str, ts: dt.datetime) -> None:
        updates = self.spark.createDataFrame(
            [(name, ts)], "table_name string, last_materialized_at timestamp"
        )
        resolve_format(self.spark).merge_upsert(
            self.spark, self.wm_dir, updates, ["table_name"]
        )

    # -- passes ----------------------------------------------------------
    def run(self, target: MatTarget, lookback_hours: int = 1) -> dict[str, str]:
        """Run one maintenance cycle; returns {pass: action} audit log."""
        log: dict[str, str] = {}
        view = target.view(self.spark)
        if DAY_COL in view.columns:
            # Checked BEFORE M1 too: _with_day's withColumn would
            # silently replace a user column of the same name on the
            # initial load and wedge every later cycle.
            raise ValueError(
                f"{DAY_COL!r} is a reserved layout column of "
                f"materialized tables; rename the view column"
            )
        mat_dir = self._mat_dir(target.name)
        ts = F.col(target.ts_col)

        if not os.path.exists(mat_dir):  # M1 full load
            # sortWithinPartitions: no shuffle, but each task's rows
            # cluster by day, so a task emits ~one file per day it
            # covers instead of one per (task, day) — the standard
            # partitioned-write small-file fix that also holds at
            # scale (repartitioning BY day would serialize a whole
            # day into one task).
            self._with_day(view, target.ts_col).sortWithinPartitions(
                DAY_COL
            ).write.mode("overwrite").partitionBy(DAY_COL).parquet(mat_dir)
            log["M1"] = "full load"
        else:
            if not has_partition_dirs(mat_dir, DAY_COL):
                # Legacy/flattened table (e.g. written before the
                # day layout, or compacted flat by a foreign tool):
                # a partition-scoped M2 repair would have nothing to
                # link and would drop everything outside the lookback
                # window, and M4 appends would produce a mixed
                # layout. Re-establish the layout with one atomic
                # full rewrite first.
                flat = self._read_raw(target.name)
                if DAY_COL in flat.columns:
                    # Demoted layout key or genuine user column? Not
                    # decidable — refuse instead of silently dropping.
                    raise ValueError(
                        f"flat mat table {target.name!r} carries a "
                        f"{DAY_COL!r} column; rebuild it before running "
                        f"maintenance cycles against it"
                    )
                self._overwrite(mat_dir, flat, target.ts_col)
                log["layout"] = "migrated to day partitions"
            wm = self.get_watermark(target.name)
            if wm is None:
                raise RuntimeError(f"mat table {target.name} exists but no watermark")
            lo = wm - dt.timedelta(hours=lookback_hours)
            # The lookback window's day partitions — pure arithmetic
            # on the aware-UTC bounds, no job. Every windowed row's
            # day lies in [date(lo), date(wm)].
            days = []
            d = lo.date()
            while d <= wm.date():
                days.append(d)
                d += dt.timedelta(days=1)
            day_in_window = F.col(DAY_COL).isin([str(x) for x in days])

            # M2 — pass 0: lookback repair on count drift. Both
            # window counts come from ONE job (union + tag + groupBy)
            # instead of two sequential actions: at scale the two
            # scans run as one stage — and the mat side carries the
            # day-partition predicate, so it scans only the lookback
            # partitions.
            in_window = (ts > F.lit(lo)) & (ts <= F.lit(wm))
            mat_raw = self._read_raw(target.name)
            tagged = view.filter(in_window).select(F.lit("v").alias("side")).unionAll(
                mat_raw.filter(day_in_window)
                .filter(in_window)
                .select(F.lit("m").alias("side"))
            )
            counts = {r["side"]: r["count"] for r in tagged.groupBy("side").count().collect()}
            view_cnt, mat_cnt = counts.get("v", 0), counts.get("m", 0)
            if view_cnt != mat_cnt:
                # Rewrite ONLY the lookback-day partitions: windowed
                # view rows plus the same days' out-of-window remnant;
                # every other partition is reused (hard-linked) into
                # the new table version by _overwrite_partitions.
                repaired = (
                    mat_raw.filter(day_in_window)
                    .filter(~in_window)
                    .unionByName(self._with_day(view.filter(in_window), target.ts_col))
                )
                self._overwrite_partitions(mat_dir, repaired, days)
                log["M2"] = f"repaired window ({mat_cnt}→{view_cnt} rows)"
            else:
                log["M2"] = "no drift"

            # M3 — pass 1: dimension-change repair
            for dep in target.dims:
                dim = dep.dim(self.spark)
                changed = (
                    dim.filter(F.col(dep.valid_from_col) > F.lit(wm))
                    .select(F.col(dep.dim_key).alias(dep.fact_fk))
                    .distinct()
                )
                if changed.isEmpty():
                    log[f"M3:{dep.fact_fk}"] = "no dim change"
                    continue
                mat = self.read_mat(target.name)
                keep = mat.join(changed, on=dep.fact_fk, how="left_anti")
                reinsert = view.join(
                    F.broadcast(changed), on=dep.fact_fk, how="left_semi"
                ).filter(ts <= F.lit(wm))
                self._overwrite(mat_dir, keep.unionByName(reinsert), target.ts_col)
                log[f"M3:{dep.fact_fk}"] = "repaired changed keys"

            # M4 — pass 2: append new facts. The increment is cached
            # so the audit count and the append share one computation
            # of the view transform (an increment is micro-batch
            # sized by construction — safe to cache at any scale,
            # unlike the full view).
            new_rows = view.filter(ts > F.lit(wm)).cache()
            try:
                n_new = new_rows.count()
                if n_new:
                    # Micro-batch-sized increment: one file per day.
                    self._with_day(new_rows, target.ts_col).repartition(
                        DAY_COL
                    ).write.mode("append").partitionBy(DAY_COL).parquet(mat_dir)
            finally:
                new_rows.unpersist()
            log["M4"] = f"appended {n_new}"

            # M5 — pass 3: EXISTS repair (funnel flag flips). A late
            # downstream event changes an already-materialized row's
            # CONTENT without changing the window's row count, so M2
            # never sees it; compare flags row-by-row instead.
            if target.exists_repair is not None:
                er = target.exists_repair
                mat = self.read_mat(target.name)
                flips = [
                    (~F.col(f"m.{c}")) & F.col(f"v.{c}") for c in er.flag_cols
                ]
                flip_any = flips[0]
                for f in flips[1:]:
                    flip_any = flip_any | f
                changed = (
                    mat.alias("m")
                    .join(
                        view.alias("v"),
                        F.col(f"m.{er.key_col}") == F.col(f"v.{er.key_col}"),
                    )
                    .filter(flip_any)
                    .select(F.col(f"m.{er.key_col}").alias(er.key_col))
                    .distinct()
                )
                if changed.isEmpty():
                    log["M5"] = "no flag flips"
                else:
                    keep = mat.join(changed, on=er.key_col, how="left_anti")
                    reinsert = view.join(changed, on=er.key_col, how="left_semi")
                    self._overwrite(mat_dir, keep.unionByName(reinsert), target.ts_col)
                    log["M5"] = "repaired flipped keys"

        # M6 — watermark upsert. After the passes above the mat table
        # contains every view row newer than the old watermark (M4)
        # plus repaired older windows, so max(ts) over the MAT table
        # equals max(ts) over the view — one narrow column scan of
        # already-materialized parquet (footer-stats friendly;
        # Iceberg/Delta read this from manifest metadata) instead of
        # recomputing the view transform a fourth time.
        max_us = (
            self.read_mat(target.name)
            .agg(F.unix_micros(F.max(ts)).alias("us"))
            .collect()[0][0]
        )
        if max_us is not None:
            max_ts = _utc_from_micros(max_us)
            self._set_watermark(target.name, max_ts)
            log["M6"] = f"watermark={max_ts.isoformat()}"
        return log

    def _overwrite(self, path: str, df: DataFrame, ts_col: str) -> None:
        """Full-table rewrite (M3/M5: keyed repairs scatter across all
        partitions), republished day-partitioned so the layout — and
        M2's partition-scoped repair — survives every pass. ``df``
        carries view columns only; the day key is re-derived."""
        tmp = tmp_sibling(path)
        self._with_day(df, ts_col).sortWithinPartitions(DAY_COL).write.mode(
            "overwrite"
        ).partitionBy(DAY_COL).parquet(tmp)
        atomic_swap(path, tmp)

    def _overwrite_partitions(
        self, path: str, df: DataFrame, days: list[dt.date]
    ) -> None:
        """Publish a new table version that REWRITES only the ``days``
        partitions (``df`` must hold exactly those days' rows, day
        column included) and reuses every other partition from the
        current version via hard links — the filesystem analog of an
        Iceberg overwrite snapshot keeping untouched manifests. The
        publish is the same single atomic swap as a full rewrite, so
        the crash-recovery contract (remove_orphans' restore rule) is
        unchanged."""
        tmp = tmp_sibling(path)
        # The repair set is window-sized: one task per rewritten day
        # keeps the partition at one file.
        df.repartition(DAY_COL).write.mode("overwrite").partitionBy(
            DAY_COL
        ).parquet(tmp)
        link_untouched_partitions(
            path, tmp, DAY_COL, {f"{DAY_COL}={d.isoformat()}" for d in days}
        )
        atomic_swap(path, tmp)
