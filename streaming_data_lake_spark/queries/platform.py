"""Platform-layer queries: SQL-over-views entry point (§3.3),
deterministic dimension seeding (S8), and skew-mitigation operators —
each oracle-checked like every other registry entry.
"""

from __future__ import annotations

import os
from streaming_data_lake_spark.scratch import scratch_dir as _scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_lake_spark.catalog import load_table
from streaming_data_lake_spark.functions.parity import DUCK_TS_ADMISSIBLE, dsum, finite

#: Event-time admission snippet on raw ``ts`` (r13 time-edge contract).
_TS_ADM = DUCK_TS_ADMISSIBLE.format(c="ts")
from streaming_data_lake_spark.queries import register


# ---------------------------------------------------------------------------
# §3.3 — ad-hoc SQL over the registered view layer
# ---------------------------------------------------------------------------

_SQL_VIEWS_ORACLE = f"""
SELECT date_trunc('hour', ts) AS event_hour,
       count(*) AS n_purchases,
       count(DISTINCT user_id) AS n_buyers
FROM events
-- mirrors the v_events_clean contract, including event-time
-- admission (non-NULL AND in-range — the r13 time-edge contract,
-- operators/ingest.py) and value finiteness (NaN/+Inf pass
-- `value > 0` in both engines but the clean contract routes them to
-- NON_FINITE_VALUE — ADVICE r11)
WHERE value > 0 AND isfinite(value) AND event_type = 'purchase'
  AND {_TS_ADM}
GROUP BY 1
ORDER BY n_purchases DESC, event_hour ASC
LIMIT 15
"""


@register(
    "sql_over_views_adhoc",
    _SQL_VIEWS_ORACLE,
    "§3.3: ad-hoc spark.sql over the registered v_* view layer (the "
    "Trino-CLI/Superset entry path).",
)
def sql_over_views_adhoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark import views

    return views.sql(
        spark,
        sf_dir,
        """
        SELECT event_hour,
               count(*) AS n_purchases,
               count(DISTINCT user_id) AS n_buyers
        FROM v_events_clean
        WHERE event_class = 'Revenue'
        GROUP BY event_hour
        ORDER BY n_purchases DESC, event_hour ASC
        LIMIT 15
        """,
    )


# ---------------------------------------------------------------------------
# S8 — deterministic SCD2 dimension seeding + hierarchy enrichment
# ---------------------------------------------------------------------------

#: applicationId -> seeded scratch lake (see the query's memo note).
_SEEDED_DIMS_MEMO: dict[str, str] = {}

_SEEDED_DIM_ORACLE = """
SELECT CASE user_id % 10 % 3 WHEN 0 THEN 'casual'
                             WHEN 1 THEN 'regular'
                             ELSE 'power' END AS segment_name,
       count(*) AS n_events,
       count(DISTINCT user_id % 10) AS n_tiers,
       -- isfinite: raw-events finiteness contract (analytics.py
       -- _CUBE_ORACLE note) — rows count, non-finite values don't
       CAST(sum(CAST((CASE WHEN isfinite(value) THEN value END) AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
-- dim key domain: the seeded hierarchy has buckets 0-9 only; a
-- negative or NULL user_id has no dim row and the engine's inner
-- enrichment join drops it — the unguarded CASE would invent a
-- segment for it (NULL % lands in ELSE 'power'; edge-sweep finding)
WHERE user_id % 10 BETWEEN 0 AND 9
GROUP BY 1
"""


@register(
    "seeded_dim_hierarchy_enrichment",
    _SEEDED_DIM_ORACLE,
    "S8/J6: idempotently-seeded deterministic SCD2 hierarchy (tier → segment) "
    "joined through is_current, rolled up per segment.",
)
def seeded_dim_hierarchy_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark.datagen import seed_dimensions

    # Memoized per session: the seeded dims are deterministic and
    # sf-independent, so repeat invocations (bench best-of-N,
    # certification loops) must not re-seed a fresh scratch dir each
    # time. Keyed by applicationId like analytics._KM_MEMO so a new
    # session re-seeds rather than reading a stopped session's state.
    key = spark.sparkContext.applicationId
    lake = _SEEDED_DIMS_MEMO.get(key)
    if lake is None:
        lake = _scratch_dir("dims_")
        log1 = seed_dimensions(spark, lake)
        log2 = seed_dimensions(spark, lake)  # idempotent second call
        expected = {k: "skipped (non-empty)" for k in log1}
        if log2 != expected:
            # A real raise, not an assert: this IS the S8 idempotency
            # contract the query certifies, and asserts vanish under
            # python -O.
            raise AssertionError(f"seeding not idempotent: {log2} != {expected}")
        _SEEDED_DIMS_MEMO.clear()  # drop stopped sessions' entries
        _SEEDED_DIMS_MEMO[key] = lake

    tier = F.broadcast(
        spark.read.parquet(os.path.join(lake, "dim_tier")).filter("is_current")
    )
    seg = F.broadcast(
        spark.read.parquet(os.path.join(lake, "dim_segment")).filter("is_current")
    )
    e = load_table(spark, sf_dir, "events").withColumn(
        "bucket", F.col("user_id") % 10
    )
    return (
        e.join(tier, "bucket")
        .join(seg, "segment_id")
        .groupBy("segment_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("bucket").alias("n_tiers"),
            dsum(finite(F.col("value")), "decimal(12,2)").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Skew mitigation — salted two-phase aggregation + replicated join
# ---------------------------------------------------------------------------

_SALTED_AGG_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       -- isfinite: raw-events finiteness contract
       CAST(sum(CAST((CASE WHEN isfinite(value) THEN value END) AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
"""


@register(
    "salted_skew_aggregation",
    _SALTED_AGG_ORACLE,
    "Skew path: 5 hot keys aggregated via salted two-phase groupBy "
    "(key,salt partials -> combine); equals the direct aggregate exactly.",
)
def salted_skew_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark.operators.skew import salt_expr, salted_two_phase_agg

    e = load_table(spark, sf_dir, "events")
    return salted_two_phase_agg(
        e,
        keys=["event_type"],
        salt=salt_expr("event_id", 16),
        counts=[("n_events", "*")],
        sums=[(finite(F.col("value")).cast("decimal(12,2)"), "total_value")],
    ).withColumn("total_value", F.col("total_value").cast("double"))


_REPL_JOIN_ORACLE = """
SELECT CASE user_id % 10 % 3 WHEN 0 THEN 'casual'
                             WHEN 1 THEN 'regular'
                             ELSE 'power' END AS segment_name,
       count(*) AS n_events
FROM events
-- dim key domain — see _SEEDED_DIM_ORACLE. The segment dim is keyed
-- on user_id % 10 % 3 in {0,1,2}; negative/NULL users derive a key
-- outside it and the engine's inner join drops them
WHERE user_id % 10 % 3 BETWEEN 0 AND 2
GROUP BY 1
"""


@register(
    "replicated_skew_join_rollup",
    _REPL_JOIN_ORACLE,
    "Skew path: fact->dim join with dim replicated per salt so hot keys "
    "spread across reducers; equals the plain join exactly.",
)
def replicated_skew_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark.datagen import SEGMENTS
    from streaming_data_lake_spark.operators.skew import replicated_skew_join, salt_expr

    e = load_table(spark, sf_dir, "events").withColumn(
        "segment_id", F.col("user_id") % 10 % 3
    )
    dim = spark.createDataFrame(
        [(s, n) for s, n in SEGMENTS.items()], "segment_id long, segment_name string"
    )
    # shuffle_hash hint: without it the optimizer broadcasts the
    # FACT-side projection at test scale (the ExistingRDD dim has no
    # stats), so the certified plan never exercised the shuffled
    # (key, salt) join this operator exists for. The hint pins the
    # production shape — fact shuffled on (segment_id, __salt), hot
    # keys spread across the 8 salts, tiny replicated dim as the hash
    # build side (guarded in tests/test_window_plans_r12.py).
    joined = replicated_skew_join(
        e, dim.hint("shuffle_hash"), key="segment_id",
        salt=salt_expr("event_id", 8), n_salts=8
    )
    return joined.groupBy("segment_name").agg(F.count(F.lit(1)).alias("n_events"))


# ---------------------------------------------------------------------------
# S5 follow-on — schema evolution: BACKWARD-compatible read over a
# two-generation table (reference iceberg/apply_tables.py:146-218;
# evolution workflow .design/adtech-data-playground.md:1004-1061)
# ---------------------------------------------------------------------------

_EVOLVED_SPLIT = "2024-01-16 00:00:00"

_SCHEMA_EVOLUTION_ORACLE = f"""
-- isfinite: raw-events finiteness contract — a non-finite value is a
-- data error treated as NULL at aggregation (n_evolved counts usable
-- evolved values; the decimal sum would abort on NaN in both engines)
SELECT event_type,
       count(*) AS n_events,
       CAST(count(CASE WHEN ts >= TIMESTAMP '{_EVOLVED_SPLIT}'
                        AND isfinite(value) THEN 1 END) AS BIGINT)
         AS n_evolved,
       CAST(sum(CASE WHEN ts >= TIMESTAMP '{_EVOLVED_SPLIT}'
                     THEN CAST((CASE WHEN isfinite(value) THEN value END)
                               AS DECIMAL(12,2)) END) AS DOUBLE)
         AS evolved_value
FROM events
GROUP BY event_type
"""


@register(
    "schema_evolution_read",
    _SCHEMA_EVOLUTION_ORACLE,
    "S5 schema evolution: a two-generation table (gen1 written without "
    "the `value` column, gen2 with it added as nullable) is gated by "
    "check_evolution(BACKWARD) and read through the DECLARED v2 schema — "
    "gen1 rows surface value=NULL, exactly the registry evolution "
    "contract. The declared-schema read is also the 100 TB posture: "
    "no schema inference/merge pass over the file listing.",
)
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from streaming_data_lake_spark.catalog import check_evolution, table_path
    from streaming_data_lake_spark.plans import artifacts

    v1 = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    v2 = T.StructType(v1.fields + [T.StructField("value", T.DoubleType())])
    violations = check_evolution(v1, v2)
    if violations:  # the gate the reference runs before ALTERing
        raise ValueError(f"incompatible evolution: {violations}")

    split = F.lit(_EVOLVED_SPLIT).cast("timestamp")

    def build(tmp: str) -> None:
        ev = load_table(spark, sf_dir, "events")
        base = ["event_id", "ts", "user_id", "event_type"]
        # NULL-total split: unknown-time rows belong to gen1 (they
        # predate the evolution by assumption); a bare </>= pair
        # dropped them from BOTH generations (edge-sweep finding)
        ev.filter((F.col("ts") < split) | F.col("ts").isNull()).select(*base).write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, "gen1"))
        ev.filter(F.col("ts") >= split).select(*base, "value").write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, "gen2"))

    art = artifacts.ensure(
        "evolved_events",
        [table_path(sf_dir, "events")],
        {"split": _EVOLVED_SPLIT, "v": 2},  # v2: NULL-total split
        build,
    )
    evolved = spark.read.schema(v2).parquet(
        os.path.join(art, "gen1"), os.path.join(art, "gen2")
    )
    fv = finite(F.col("value"))
    return evolved.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(fv).cast("long").alias("n_evolved"),
        dsum(fv, "decimal(12,2)").alias("evolved_value"),
    )


# ---------------------------------------------------------------------------
# Runtime Bloom-filter join pruning (dynamic-filter analog)
# ---------------------------------------------------------------------------

_BLOOM_SEGMENT = "BUILDING"

_BLOOM_PRUNE_ORACLE = f"""
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = '{_BLOOM_SEGMENT}')
GROUP BY o_orderpriority
"""


@register(
    "bloom_semi_join_prune",
    _BLOOM_PRUNE_ORACLE,
    "Runtime-filter path (Trino dynamic filters / Spark "
    "InjectRuntimeFilter analog): the filtered customer keys fold into a "
    "2 KiB Bloom bitmap (bit_or aggregate) that is INJECTED into the "
    "orders scan as a literal predicate, so orders are pruned in the "
    "scan's own Filter — below the exact semi-join that removes Bloom "
    "false positives (plan-guarded in tests/test_plans.py). Result is "
    "exactly the plain semi-join — the Bloom pass is plan-only, which is "
    "the point: at 100 TB the shuffle/join input carries only probable "
    "matches while the bitmap stays 2 KiB regardless of fact size.",
)
def bloom_semi_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark.operators.bloom import bloom_bitmap, bloom_prefilter

    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == _BLOOM_SEGMENT)
        .select("c_custkey")
    )
    bitmap = bloom_bitmap(dim, "c_custkey")
    candidates = bloom_prefilter(
        load_table(spark, sf_dir, "orders"), "o_custkey", bitmap
    )
    exact = candidates.join(
        dim,
        candidates["o_custkey"] == dim["c_custkey"],
        "left_semi",
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# SCD2 point-in-time enrichment (historical-correctness dim join)
# ---------------------------------------------------------------------------

_PIT_ORACLE = """
SELECT CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
            THEN 'tier_' || CAST(user_id % 10 AS VARCHAR) || '_v1'
            ELSE 'tier_' || CAST(user_id % 10 AS VARCHAR) || '_v2' END
         AS tier_label,
       count(*) AS n_events,
       -- isfinite: raw-events finiteness contract
       CAST(sum(CAST((CASE WHEN isfinite(value) THEN value END) AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
-- dim key domain (buckets 0-9) AND event-time admission: a fact with
-- no dim bucket or no event time matches no validity interval in the
-- engine's PIT join — the unguarded CASE fabricated tier_-1 labels
-- and routed NULL ts to the ELSE version (edge-sweep finding).
-- ts >= dim-history start: the engine's validity join drops facts
-- before the FIRST version's valid_from (2020-01-01, datagen._V0);
-- the bare CASE would mislabel them _v1 (r13 time-edge finding — an
-- ancient garbage timestamp fabricated a _v1 row here)
WHERE user_id % 10 BETWEEN 0 AND 9 AND ts >= TIMESTAMP '2020-01-01 00:00:00'
GROUP BY 1
"""


@register(
    "scd2_point_in_time_enrichment",
    _PIT_ORACLE,
    "J6 historical variant — the PIT join is_current cannot express: "
    "facts join the SCD2 version VALID AT EVENT TIME "
    "(valid_from <= ts < valid_to, open-ended current row), so events "
    "before the 2024-01-15 flip land on _v1 labels and later ones on "
    "_v2 — as-reported history, not as-of-today. Plan: broadcast dim, "
    "equi-join on the bucket with the validity range as residual "
    "condition — no fact shuffle; at 100 TB the validity check rides "
    "the broadcast hash probe.",
)
def scd2_point_in_time_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark.datagen import build_dim_tier_history

    dim = build_dim_tier_history(spark)
    e = load_table(spark, sf_dir, "events").withColumn(
        "bucket", F.col("user_id") % 10
    )
    joined = e.join(
        F.broadcast(dim),
        (e["bucket"] == dim["bucket"])
        & (e["ts"] >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (e["ts"] < dim["valid_to"])),
    )
    return joined.groupBy("tier_label").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(finite(F.col("value")), "decimal(12,2)").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Schema drift detection + declared-schema read-through (S5 drift path)
# ---------------------------------------------------------------------------

_DRIFT_ORACLE = """
SELECT 'events' AS table_name,
       'missing column props; unexpected column extra_tag' AS drift,
       count(*) AS n_rows,
       CAST(0 AS BIGINT) AS n_props,
       -- isfinite: raw-events finiteness contract
       CAST(sum(CAST((CASE WHEN isfinite(value) THEN value END) AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
"""


@register(
    "schema_drift_check",
    _DRIFT_ORACLE,
    "S5 drift detection end-to-end (reference iceberg/apply_tables.py:"
    "146-218): a physically drifted events table (writer dropped the "
    "declared `props` column and added an undeclared `extra_tag`) is "
    "diffed against the declared contract -- the detector WARNS (sorted "
    "deterministic messages), never mutates -- and the read then goes "
    "THROUGH the declared schema: the unexpected column is pruned at "
    "the scan, the missing one surfaces as NULL. That declared-schema "
    "read is the 100 TB posture (no inference/mergeSchema listing "
    "pass), and the value aggregate proves the non-drifted columns "
    "read intact.",
)
def schema_drift_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark.catalog import diff_schemas, table_path
    from streaming_data_lake_spark.plans import artifacts
    from streaming_data_lake_spark.schemas import DECLARED_SCHEMAS

    declared = DECLARED_SCHEMAS["events"]

    def build(tmp: str) -> None:
        ev = load_table(spark, sf_dir, "events")
        drifted = ev.select(
            "event_id", "ts", "user_id", "event_type", "value",
            F.concat(F.lit("tag_"), (F.col("event_id") % 3).cast("string")).alias(
                "extra_tag"
            ),
        )
        drifted.write.mode("overwrite").parquet(os.path.join(tmp, "t"))

    art = artifacts.ensure(
        "drifted_events",
        [table_path(sf_dir, "events")],
        {"drop": "props", "add": "extra_tag", "v": 1},
        build,
    )
    tdir = os.path.join(art, "t")
    observed = spark.read.parquet(tdir).schema
    msgs = diff_schemas(declared, observed)
    # Read THROUGH the declared contract despite the drift.
    through = spark.read.schema(declared).parquet(tdir)
    return through.agg(
        F.lit("events").alias("table_name"),
        F.lit("; ".join(msgs)).alias("drift"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count("props").cast("long").alias("n_props"),
        dsum(finite(F.col("value")), "decimal(12,2)").alias("total_value"),
    )
