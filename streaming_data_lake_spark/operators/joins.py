"""Join operators: dimension enrichment, interval joins, funnel chains.

Re-expresses SURVEY.md §2.3 on the engine's tables:
 - broadcast dimension joins with SCD2 ``is_current`` filtering (J6/J7)
 - pre-aggregated subquery joins that avoid fan-out (J8/J9)
 - semi/anti joins (J10)
 - batch interval (time-bounded) joins (J1-J3)
 - the 4-stage chained LEFT funnel join (J4/J5)

Scale notes: dims are broadcast (no shuffle of the fact side on the
dim key); interval joins are equi-joins on the entity key with the
time bound as a post-join filter — the range condition never forces
a cartesian because the equality key carries the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_current(dim: DataFrame) -> DataFrame:
    """Filter an SCD Type-2 dimension to current versions — the
    reference's `is_current = true` join guard (J6;
    trino/sql/v_event_enriched_bid_responses.sql:40-55)."""
    return dim.filter(F.col("is_current"))


def enrich(fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str, cols: dict[str, str]) -> DataFrame:
    """LEFT broadcast-join a (small, current-filtered) dimension onto
    a fact, projecting renamed dim attributes. The certified J6 path
    (queries/core.scd2_current_enrichment) routes through here."""
    d = F.broadcast(
        scd2_current(dim).select(
            F.col(dim_key), *[F.col(src).alias(dst) for src, dst in cols.items()]
        )
    )
    # Drop the DIM-side key by reference: drop(name) removes EVERY
    # column of that name from the joined frame, so when fact_key ==
    # dim_key it silently destroyed the fact's key column too.
    return fact.join(d, fact[fact_key] == d[dim_key], "left").drop(d[dim_key])


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    how: str = "inner",
    aliases: tuple[str, str] = ("l", "r"),
) -> DataFrame:
    """Time-bounded join: rows match when keys are equal and
    ``right_ts`` ∈ [left_ts + lower_s, left_ts + upper_s] (J1-J3;
    aggregation_jobs.sql:42-52). Key equality drives the shuffle; the
    interval is a residual filter. Sides are aliased internally so
    self-joins (the common case: one event table split by type)
    resolve unambiguously — reference downstream columns as
    ``{alias}.{col}``."""
    la, ra = aliases
    l, r = left.alias(la), right.alias(ra)
    cond = (
        (F.col(f"{la}.{key}") == F.col(f"{ra}.{key}"))
        & (F.col(f"{ra}.{right_ts}") >= F.col(f"{la}.{left_ts}") + F.expr(f"INTERVAL {lower_s} SECOND"))
        & (F.col(f"{ra}.{right_ts}") <= F.col(f"{la}.{left_ts}") + F.expr(f"INTERVAL {upper_s} SECOND"))
    )
    return l.join(r, cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    tolerance_s: int | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single most recent right
    row with ``right_ts <= left_ts`` on the same key (no match →
    dropped, i.e. inner as-of). With ``tolerance_s``, a match older
    than the tolerance also drops the row — the bounded-staleness
    point-in-time lookup. An operator Spark lacks natively
    (SURVEY.md §2.3 notes the reference has none either; this is the
    training-pipeline point-in-time enrichment primitive).

    Spark-first plan: NOT a range join (whose candidate fan-out is
    |left| × |matching right| before picking the max) but a
    union + running ``last_value(ignoreNulls)`` window:

      1. tag both sides, union them into one stream of (key, ts, tag)
      2. one shuffle on key, one sort on (ts, tag)
      3. each left row reads the latest right payload carried forward

    Cost at 100 TB: a single hash shuffle + per-partition sort —
    the same price as any keyed window, with zero join fan-out.
    Right rows are pre-deduped per (key, ts) keeping the
    lexicographically greatest payload struct (ordered by
    ``right_cols`` order — the rule the certified oracles mirror),
    so the carried payload is deterministic under timestamp ties;
    the operator never sees a right-side id column to break ties on.
    """
    payload_src = list(right_cols.keys())
    payload_dst = list(right_cols.values())
    # NULL guards on the RIGHT side: a NULL right_ts would sort
    # nulls-first in the window and be carried forward as a spurious
    # "match" for every left row until a real one appears (ASOF's
    # right_ts <= left_ts is NULL for NULL ts → no match, as the
    # DuckDB oracle behaves), and a NULL key must never pair with
    # NULL-key left rows (equi-join semantics). Left rows with NULL
    # key simply find no match — their partition has no right rows.
    right = right.filter(F.col(right_ts).isNotNull() & F.col(key).isNotNull())
    # deterministic winner under (key, ts) duplicates: max over the
    # payload struct orders by the first payload column first
    r = (
        right.groupBy(F.col(key), F.col(right_ts).alias("__ts"))
        .agg(F.max(F.struct(*[F.col(c) for c in payload_src])).alias("__p"))
        .select(
            F.col(key),
            "__ts",
            F.lit(0).alias("__tag"),
            F.col("__p"),
        )
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        F.struct("*").alias("__l"),
    )
    unioned = r.select(key, "__ts", "__tag", "__p", F.lit(None).cast(l.schema["__l"].dataType).alias("__l")).unionByName(l)

    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry (right ts, payload) forward so a tolerance bound can see
    # how stale the match is
    carried = unioned.withColumn(
        "__match",
        F.last(
            F.when(
                F.col("__tag") == 0,
                F.struct(F.col("__ts").alias("__rts"), F.col("__p").alias("__pp")),
            ),
            ignorenulls=True,
        ).over(w),
    )
    matched = carried.filter((F.col("__tag") == 1) & F.col("__match").isNotNull())
    if tolerance_s is not None:
        matched = matched.filter(
            F.col("__match.__rts")
            >= F.col("__ts") - F.expr(f"INTERVAL {int(tolerance_s)} SECOND")
        )
    out_left = F.col("__l")
    return matched.select(
        *[out_left.getField(f).alias(f) for f in left.columns],
        *[
            F.col("__match.__pp").getField(src).alias(dst)
            for src, dst in zip(payload_src, payload_dst)
        ],
    )


def range_join_bucketed(
    left: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    step: float = 20000.0,
) -> DataFrame:
    """Range-only join (value ∈ [lo, hi)) without a nested-loop plan —
    a join class the reference never uses (SURVEY.md §2.3 notes its
    absence) but a banding/classification pipeline needs.

    Scale shape: a pure range condition gives Catalyst no equi-key,
    so it plans a (broadcast) nested-loop — |left| × |bands|
    comparisons. Bucketizing both sides restores an equi-key: the
    left side maps each value to ``floor(value/step)``; each band
    explodes to the buckets it covers (cheap: bands are dim-sized).
    The join is then hash-based on the bucket with the range as a
    residual filter, and scales like any keyed join. With
    non-overlapping bands each value survives at most once, so no
    dedup is needed.
    """
    lb = left.withColumn("__bucket", F.floor(F.col(value_col) / F.lit(step)))
    bb = bands.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(step)),
                F.floor(F.col(hi_col) / F.lit(step)),
            )
        ).alias("__bucket"),
    )
    residual = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return lb.join(F.broadcast(bb), "__bucket").filter(residual).drop("__bucket")
