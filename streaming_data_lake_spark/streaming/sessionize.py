"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the Spark construct for operators the
built-in streaming surface lacks (SURVEY.md §2.7; the reference's
closest analog is its continuously-updated keyed aggregates, T4).

Semantics: per user, consecutive events closer than ``gap`` belong to
one session; a session closes when the next event is further than
``gap`` away, or when the event-time watermark passes
``session_end + gap`` (the state times out, so state size is bounded
by the number of *open* sessions, never by history — the property
that matters at 100 TB).

Bounded replays can't rely on timeouts alone: a timed-out state only
fires in a batch that *processes data* after the watermark has
advanced. :func:`sessionize_replay` therefore stages the input as
(events, sentinel₁, sentinel₂) files consumed one per micro-batch
(``maxFilesPerTrigger=1`` under ``availableNow``): batch 1 folds all
real events and emits every gap-closed session, batch 2's far-future
sentinel advances the watermark past every open session, and batch 3
delivers the timeout callbacks that flush them. In production the
continuous arrival of new data plays the sentinels' role.

Numeric parity: per-session value totals are accumulated as exact
integer cents (the inputs are 2-dp money), so emission order and
pandas' pairwise summation cannot perturb the double result the
DuckDB oracle computes via decimal SUM.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)

_STATE_SCHEMA = "start long, end long, n long, cents long"

_SENTINEL_USER = -1


def sessionize(src: DataFrame, gap_minutes: int = 120) -> DataFrame:
    """Stateful sessionization over a watermarked event stream."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60_000_000

    def _row(user_id: int, start_us: int, end_us: int, n: int, cents: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": np.array([user_id], dtype="int64"),
                "session_start": pd.to_datetime([start_us], unit="us"),
                "session_end": pd.to_datetime([end_us], unit="us"),
                "n_events": np.array([n], dtype="int64"),
                "total_value": np.array([cents / 100.0], dtype="float64"),
            }
        )

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            start, end, n, cents = state.get
            state.remove()
            yield _row(user_id, start, end, n, cents)
            return
        if user_id == _SENTINEL_USER:
            return  # watermark carrier, not data
        parts = [pdf[["ts", "value"]] for pdf in pdfs]
        ev = pd.concat(parts).sort_values("ts")
        if ev.empty:
            return
        ts_us = (ev["ts"].astype("int64") // 1_000).to_numpy()
        cents_arr = np.rint(ev["value"].to_numpy() * 100).astype("int64")

        if state.exists:
            start, end, n, cents = state.get
        else:
            start = end = int(ts_us[0])
            n, cents = 1, int(cents_arr[0])
            ts_us, cents_arr = ts_us[1:], cents_arr[1:]

        closed: list[pd.DataFrame] = []
        for t, c in zip(ts_us, cents_arr):
            if t - end > gap_us:
                closed.append(_row(user_id, start, end, n, cents))
                start, end, n, cents = t, t, 1, int(c)
            else:
                end = max(end, int(t))
                n += 1
                cents += int(c)
        state.update((int(start), int(end), int(n), int(cents)))
        state.setTimeoutTimestamp((int(end) + gap_us) // 1000 + 1)
        if closed:
            yield pd.concat(closed)

    return (
        src.withWatermark("ts", "30 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _stage_with_sentinels(sf_dir: str) -> str:
    """Stage (events, sentinel₁, sentinel₂) as three files with
    strictly increasing mtimes so the file source replays them as
    three ordered micro-batches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from streaming_data_lake_spark.catalog import table_path

    src = table_path(sf_dir, "events")
    d = tempfile.mkdtemp(prefix="sessionize_")
    main = os.path.join(d, "a_events.parquet")
    os.symlink(src, main)
    schema = pq.read_schema(src)
    base = os.stat(src).st_mtime

    def sentinel(name: str, iso_ts: str, mtime: float) -> None:
        tbl = pa.table(
            {
                "event_id": pa.array([-1], pa.int64()),
                "ts": pa.array([pd.Timestamp(iso_ts)], pa.timestamp("ns")),
                "user_id": pa.array([_SENTINEL_USER], pa.int64()),
                "event_type": pa.array(["sentinel"], pa.string()),
                "value": pa.array([0.0], pa.float64()),
                "props": pa.array(["{}"], pa.string()),
            },
            schema=schema,
        )
        path = os.path.join(d, name)
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    sentinel("b_sentinel1.parquet", "2030-01-01", base + 3600)
    sentinel("c_sentinel2.parquet", "2035-01-01", base + 7200)
    return d


def sessionize_replay(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 120
) -> DataFrame:
    """Run sessionization over the bounded events table to completion
    (availableNow, one staged file per micro-batch) and return every
    emitted session."""
    import uuid

    from streaming_data_lake_spark.catalog import normalize_timestamps
    from streaming_data_lake_spark.sources.streams import physical_schema

    stage = _stage_with_sentinels(sf_dir)
    raw = (
        spark.readStream.schema(physical_schema(spark, sf_dir, "events"))
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(stage)
    )
    sessions = sessionize(normalize_timestamps(raw, "events"), gap_minutes)

    name = f"sessions_{uuid.uuid4().hex[:12]}"
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
