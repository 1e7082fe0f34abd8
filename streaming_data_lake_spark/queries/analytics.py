"""OLAP-breadth + sketch queries added in round 4.

Two families:

- **Warehouse analytics breadth**: ROLLUP grouping sets, exact
  interpolated quantiles, lead/lag event gaps, running-total window
  frames, NTILE deciles — the window/grouping surface a warehouse
  user expects beyond the reference's aggregate set (SURVEY.md §2.5,
  §2.8; the reference's Trino layer exposes full ANSI window/grouping
  SQL, e.g. `trino/queries.md`).

- **Portable probabilistic sketches + corpus prep**: HyperLogLog
  distinct estimation and Count-Min frequency estimation built
  entirely from the portable md5 ``h32`` hash (functions/hashing.py)
  so the DuckDB oracle reproduces every register bit-for-bit; plus
  overlapping-token chunking (training-sequence prep) and
  SemDeDup-style centroid-bucketed semantic dedup.

All Spark-side expressions are JVM built-ins (no Python UDFs); every
query has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streaming_data_lake_spark.catalog import load_table
from streaming_data_lake_spark.functions.hashing import duck_h32, duck_h32_seeded, h32
from streaming_data_lake_spark.functions.parity import (
    DUCK_TS_ADMISSIBLE,
    admissible_ts,
    davg,
    dsum,
    duck_davg,
    duck_dsum,
    finite,
)

#: Event-time admission snippet on raw ``ts`` (r13 time-edge contract).
_TS_ADM = DUCK_TS_ADMISSIBLE.format(c="ts")
from streaming_data_lake_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings restricted to valid vectors — the similarity
    family's admission contract (similarity.valid_vectors; oracles
    mirror it via DUCK_EMB)."""
    from streaming_data_lake_spark.operators.similarity import valid_vectors

    return valid_vectors(_t(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# ROLLUP grouping sets — subtotal + grand-total levels in one pass
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
WITH base AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
         n_name AS nation_name, o_totalprice
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
SELECT
  CAST(grouping(order_month) AS INTEGER) AS g_month,
  CAST(grouping(nation_name) AS INTEGER) AS g_nation,
  coalesce(CAST(order_month AS VARCHAR), '<all>') AS order_month,
  coalesce(nation_name, '<all>') AS nation_name,
  count(*) AS n_orders,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM base
GROUP BY ROLLUP(order_month, nation_name)
-- HAVING: over an EMPTY input the SQL standard (and DuckDB) still
-- emit the grand-total grouping set as one zero-count row, but
-- Spark's rollup/cube emit nothing — empty grouping sets are not
-- reported, by engine contract (empty-input sweep finding; on any
-- non-empty input the grand total has count > 0, so certified
-- results are unchanged)
HAVING count(*) > 0
"""


@register(
    "rollup_revenue_levels",
    _ROLLUP_ORACLE,
    "ROLLUP grouping sets: (month, nation) / (month) / () subtotal levels "
    "with GROUPING flags in ONE aggregation pass — at scale one shuffle "
    "computes all levels via partial aggs instead of three scans.",
)
def rollup_revenue_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
            F.col("n_name").alias("nation_name"),
            "o_totalprice",
        )
    )
    return (
        base.rollup("order_month", "nation_name")
        .agg(
            F.grouping("order_month").cast("int").alias("g_month"),
            F.grouping("nation_name").cast("int").alias("g_nation"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
        .select(
            "g_month",
            "g_nation",
            F.coalesce(F.col("order_month").cast("string"), F.lit("<all>")).alias("order_month"),
            F.coalesce(F.col("nation_name"), F.lit("<all>")).alias("nation_name"),
            "n_orders",
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# Exact interpolated quantiles per group
# ---------------------------------------------------------------------------

_QUANTILE_ORACLE = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       round(CAST(quantile_cont(l_extendedprice, 0.25) AS DOUBLE), 4) AS p25,
       round(CAST(quantile_cont(l_extendedprice, 0.50) AS DOUBLE), 4) AS p50,
       round(CAST(quantile_cont(l_extendedprice, 0.75) AS DOUBLE), 4) AS p75,
       round(CAST(quantile_cont(l_extendedprice, 0.90) AS DOUBLE), 4) AS p90
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "price_quantiles_by_flag",
    _QUANTILE_ORACLE,
    "Exact linear-interpolated quantiles (p25/p50/p75/p90) per group. Exact "
    "percentile needs the group's values together (a sort within each hash "
    "partition); the approx_percentile sketch is the mergeable map-side "
    "variant when exactness can be traded at 100 TB.",
)
def price_quantiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pct = F.percentile(F.col("l_extendedprice"), F.array(*[F.lit(p) for p in (0.25, 0.5, 0.75, 0.9)]))
    return (
        li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_items"), pct.alias("pcts"))
        .select(
            "l_returnflag",
            "n_items",
            F.round(F.element_at("pcts", 1), 4).alias("p25"),
            F.round(F.element_at("pcts", 2), 4).alias("p50"),
            F.round(F.element_at("pcts", 3), 4).alias("p75"),
            F.round(F.element_at("pcts", 4), 4).alias("p90"),
        )
    )


# ---------------------------------------------------------------------------
# Lead/lag inter-event gaps per user
# ---------------------------------------------------------------------------

_GAPS_ORACLE = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS gap_us
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(gap_us) AS DOUBLE) / CAST(count(gap_us) AS DOUBLE) AS avg_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us
FROM g
WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


@register(
    "user_event_gaps",
    _GAPS_ORACLE,
    "LAG window over (user, ts): inter-event gap stats per user — the "
    "window-function complement to the stateful sessionizer. One shuffle on "
    "user_id; ties broken by event_id so both engines order identically.",
)
def user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    g = e.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        (F.sum("gap_us").cast("double") / F.count("gap_us").cast("double")).alias("avg_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.min("gap_us").alias("min_gap_us"),
    )


# ---------------------------------------------------------------------------
# Running (cumulative) revenue per nation — window frame aggregation
# ---------------------------------------------------------------------------

_ODATE_ADM = DUCK_TS_ADMISSIBLE.format(c="o_orderdate")

_RUNNING_ORACLE = f"""
WITH monthly AS (
  -- bucket-safe month (r13 time-edge contract) — see
  -- _MONTHLY_NATION_ORACLE; NULLS FIRST already orders the
  -- unknown-month group deterministically at the frame head
  SELECT n_name AS nation_name,
         CASE WHEN {_ODATE_ADM}
              THEN CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) END
           AS order_month,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT nation_name, order_month,
       CAST(rev AS DOUBLE) AS month_revenue,
       CAST(sum(rev) OVER (
         PARTITION BY nation_name ORDER BY order_month NULLS FIRST
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS cumulative_revenue
FROM monthly
"""


@register(
    "running_revenue_by_nation",
    _RUNNING_ORACLE,
    "Running-total window frame (ROWS UNBOUNDED PRECEDING) over pre-agged "
    "monthly revenue: aggregate FIRST, window over the small rollup — the "
    "frame never sees fact-table cardinality. Decimal-exact partial sums.",
)
def running_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.when(
                admissible_ts(F.col("o_orderdate")),
                F.date_trunc("month", F.col("o_orderdate")),
            ).alias("order_month"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w = (
        Window.partitionBy("nation_name")
        .orderBy("order_month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.select(
        "nation_name",
        "order_month",
        F.col("rev").cast("double").alias("month_revenue"),
        F.sum("rev").over(w).cast("double").alias("cumulative_revenue"),
    )


# ---------------------------------------------------------------------------
# NTILE deciles of order value
# ---------------------------------------------------------------------------

_DECILE_ORACLE = """
WITH d AS (
  SELECT o_totalprice,
         -- NULLS FIRST: DuckDB defaults ASC to NULLS LAST where Spark
         -- puts NULLS FIRST — unpinned, a NULL price lands in decile 10
         -- there and decile 1 here (edge-sweep finding)
         ntile(10) OVER (ORDER BY o_totalprice NULLS FIRST, o_orderkey) AS decile
  FROM orders
)
SELECT CAST(decile AS INTEGER) AS decile,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(o_totalprice) AS DOUBLE) AS min_price,
       CAST(max(o_totalprice) AS DOUBLE) AS max_price,
       {dsum} AS total_price
FROM d
GROUP BY decile
""".format(dsum=duck_dsum("o_totalprice"))


@register(
    "order_value_deciles",
    _DECILE_ORACLE,
    "NTILE(10) decile bands over a global order. The single-partition "
    "global sort is the honest cost of exact ntile; ties broken by key so "
    "both engines bucket identically. At 100 TB the same report comes from "
    "quantile cut-points (price_quantiles_by_flag) + a parallel range join.",
)
def order_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    d = o.select("o_totalprice", F.ntile(10).over(w).alias("decile"))
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
        dsum(F.col("o_totalprice")).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Overlapping token chunking — training-sequence prep
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48

from streaming_data_lake_spark.functions.duckql import DUCK_DOT, DUCK_EMB, DUCK_TOKS

_DUCK_EMB = DUCK_EMB

_DUCK_TOKS = DUCK_TOKS

_CHUNK_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
),
sized AS (SELECT doc_id, toks, len(toks) AS n_tok FROM tk WHERE len(toks) > 0),
-- build ALL chunks per doc in one list_transform pass, then unnest:
-- the previous LATERAL-unnest shape carried the FULL toks list once
-- per chunk row, i.e. O(n_tok²/stride) materialized elements — a
-- single 1 MB scraped-binary document (225k tokens ≈ 4,700 chunks ×
-- 225k-element list copies) hung the oracle outright (r13 huge-doc
-- probe). Chunks are built from PLAIN ELEMENT ACCESS (O(1); the
-- winnowing oracle proved it), NOT list_slice: DuckDB's list slice
-- inside a lambda copies the SOURCE list per invocation — the packed
-- list_slice shape still took 80 s on the r14 huge-doc gate's
-- 220k-token document vs 0.2 s here. Out-of-bounds accesses in the
-- trailing short chunk return NULL and are filtered (tokens are
-- never NULL, so the filter only trims the tail).
packed AS (
  SELECT doc_id,
         list_transform(
           range(CAST(ceil(CAST(n_tok AS DOUBLE) / {_CHUNK_STRIDE}) AS BIGINT)),
           i -> struct_pack(
                  chunk_idx := CAST(i AS INTEGER),
                  chunk := list_filter(
                    list_transform(range(1, {_CHUNK_SIZE} + 1),
                                   j -> toks[CAST(i AS INTEGER) * {_CHUNK_STRIDE}
                                             + CAST(j AS INTEGER)]),
                    x -> x IS NOT NULL))) AS cs
  FROM sized
),
ch AS (SELECT doc_id, unnest(cs) AS u FROM packed)
SELECT doc_id, u.chunk_idx AS chunk_idx,
       CAST(len(u.chunk) AS INTEGER) AS n_tokens,
       md5(array_to_string(u.chunk, ' ')) AS chunk_md5
FROM ch
WHERE len(u.chunk) > 0
"""


@register(
    "doc_chunks_overlap",
    _CHUNK_ORACLE,
    f"Overlapping token chunking (size {_CHUNK_SIZE}, stride {_CHUNK_STRIDE}) "
    "for training-sequence prep: per-doc narrow explode of slice() windows — "
    "no shuffle at all; chunk identity as md5 for dedup/packing downstream.",
)
def doc_chunks_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark.operators.dedup import tokens

    d = _t(spark, sf_dir, "documents")
    toked = d.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).withColumn("n_tok", F.size("toks")).filter(F.col("n_tok") > 0)
    n_chunks = F.ceil(F.col("n_tok").cast("double") / F.lit(float(_CHUNK_STRIDE)))
    # Build ALL chunks per doc inside ONE transform over the chunk
    # indices, then explode the packed structs — the previous
    # explode-then-slice shape materialized the FULL toks array once
    # per chunk row (Tungsten copies the array into every exploded
    # UnsafeRow), i.e. O(n_tok²/stride) bytes: the 220k-token huge-doc
    # gate document took 182 s (r14; the r13 oracle fix had covered
    # only the DuckDB side). Packed, the array is bound once per doc
    # and output is the linear ~1.33 x n_tok elements. 0.8 s after.
    chunks = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.slice(
                F.col("toks"), i * _CHUNK_STRIDE + 1, _CHUNK_SIZE
            ).alias("chunk"),
        ),
    )
    chunked = toked.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk").alias("chunk"),
    )
    return chunked.filter(F.size("chunk") > 0).select(
        "doc_id",
        "chunk_idx",
        F.size("chunk").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.col("chunk"))).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup: centroid bucket, then in-bucket pairs
# ---------------------------------------------------------------------------

# Same scale as the sign-LSH near-dup threshold (pipeline.py:513) —
# the synthetic embeddings are near-orthogonal, so "semantically
# close" sits around 0.4, not the 0.9+ a trained encoder would give.
_SEM_THRESHOLD = 0.40
# k scales with corpus size in SemDeDup (k ~ sqrt(n) in the paper's
# setups): more clusters shrink the quadratic in-cluster pair work —
# 32 centroids cut candidate pairs 4x vs 8 at sf0.1 with the same
# verify semantics.
_SEM_K = 32
_DUCK_DOT = DUCK_DOT

_SEMDEDUP_ORACLE = f"""
WITH n AS (
  SELECT vec_id, embedding AS v,
         sqrt({_DUCK_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM {_DUCK_EMB} embeddings
),
cent AS (SELECT * FROM n WHERE vec_id < {_SEM_K}),
scored AS (
  SELECT v.vec_id, v.v, v.nrm, c.vec_id AS cluster_id,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY {_DUCK_DOT.format(a='v.v', b='c.v')} / (v.nrm * c.nrm) DESC,
                    c.vec_id ASC
         ) AS rn
  FROM n v JOIN cent c ON true
),
assigned AS (
  SELECT vec_id, v, nrm, cluster_id,
         CAST(floor((row_number() OVER (
             PARTITION BY cluster_id ORDER BY vec_id) - 1) / 4096) AS INTEGER)
           AS shard
  FROM scored WHERE rn = 1)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(a.cluster_id AS BIGINT) AS cluster_id,
       {_DUCK_DOT.format(a='a.v', b='b.v')} / (a.nrm * b.nrm) AS cosine_sim
FROM assigned a
JOIN assigned b
  ON a.cluster_id = b.cluster_id AND a.shard = b.shard AND a.vec_id < b.vec_id
WHERE {_DUCK_DOT.format(a='a.v', b='b.v')} / (a.nrm * b.nrm) >= {_SEM_THRESHOLD}
"""


@register(
    "semantic_dedup_centroid",
    _SEMDEDUP_ORACLE,
    "SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540): "
    "argmax-cosine centroid assignment "
    "(zero-shuffle narrow map, centroids broadcast) buckets the corpus, then "
    "exact pairwise cosine runs only WITHIN each cluster — the cluster "
    "equi-join replaces the corpus cartesian, same pruning discipline as IVF.",
)
def semantic_dedup_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark.operators.similarity import (
        dot,
        ivf_assign,
        norm,
        occupancy_shards,
        spread,
    )

    e = _emb(spark, sf_dir)
    cents = e.filter(F.col("vec_id") < _SEM_K)
    # Occupancy guard: a skewed centroid makes the within-cluster
    # join quadratic in its occupancy; sub-sharding caps any cluster
    # at 4096 members per pair group. The ORACLE replicates the exact
    # shard rule (row_number over (cluster ORDER BY vec_id), floor-div
    # 4096), so Spark/oracle parity holds even when a cluster exceeds
    # the cap — previously the oracle joined on cluster alone and
    # certification would have diverged on any over-full cluster. At
    # sf0.1 (2000 vecs) shard == 0 everywhere; at 100 TB the cap —
    # with k ~ corpus/target_occupancy — bounds the join.
    # Property-tested in tests/test_analytics_plans.py.
    # The assignment feeds BOTH sides of the pair join; materialize it
    # once (it is corpus-size, tiny next to the argmax work it saves —
    # the centroid-cosine narrow map would otherwise execute twice).
    # spread(): the O(Nc·k·d) argmax assignment folds run where the
    # corpus rows sit — a single-file corpus executes them in one
    # task otherwise (no-op at real scale, similarity.spread).
    assigned = occupancy_shards(
        ivf_assign(spread(e), cents).select(
            "vec_id", "embedding", "cluster_id", F.col("vec_norm").alias("nrm")
        ),
        max_occupancy=4096,
    ).localCheckpoint()
    a = assigned.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("v_a"),
        F.col("nrm").alias("n_a"),
        "cluster_id",
        "shard",
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("v_b"),
        F.col("nrm").alias("n_b"),
        F.col("cluster_id").alias("cluster_id_b"),
        F.col("shard").alias("shard_b"),
    )
    # Explicit-N repartition on the join keys: the pair join's own
    # ENSURE_REQUIREMENTS exchanges carry only ~kilobytes here, so
    # AQE coalesces them to ONE partition — and the per-pair cosine
    # folds (the query's CPU, which AQE's byte-based sizing cannot
    # see) then run in one task. A user repartition with an explicit
    # count is exempt from coalescing and satisfies the join's
    # distribution, so it REPLACES the planner's exchange rather than
    # adding one (verified on the executed plan; interleaved A/B
    # 1.35 → 0.91 s). N = defaultParallelism scales with the cluster;
    # skew stays bounded by the occupancy shards, not by AQE's
    # skew-split (which user repartitions opt out of).
    n_par = spark.sparkContext.defaultParallelism
    a = a.repartition(n_par, F.col("cluster_id"), F.col("shard"))
    b = b.repartition(n_par, F.col("cluster_id_b"), F.col("shard_b"))
    # Memoized pair-cosine tree (fixed internal names; the O(dim)
    # fold costs hundreds of py4j calls per build — scalar.memo_column).
    from streaming_data_lake_spark.functions.scalar import memo_column

    sim = memo_column(
        ("semdedup_pair_sim",),
        lambda: dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")),
    )
    return (
        a.join(
            b,
            (F.col("cluster_id") == F.col("cluster_id_b"))
            & (F.col("shard") == F.col("shard_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", F.col("cluster_id").cast("long").alias("cluster_id"), sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= _SEM_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-user estimation — portable registers
# ---------------------------------------------------------------------------

from streaming_data_lake_spark.operators.sketches import (  # noqa: E402
    HLL_ALPHA as _HLL_ALPHA,
    HLL_M as _HLL_M,
    hll_lc_case_sql as _hll_lc_case_sql,
)

_HLL_ORACLE = f"""
WITH h AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS event_day,
         user_id,
         {duck_h32("CAST(user_id AS VARCHAR)")} AS hv
  FROM events
  -- admission (r13 time-edge contract): registers are keyed on the
  -- day bucket; matches the streaming twin's pre-watermark filter
  WHERE user_id IS NOT NULL AND {_TS_ADM}
),
reg AS (
  SELECT event_day,
         hv % {_HLL_M} AS bucket,
         max(CASE WHEN (hv >> 6) = 0 THEN 27
                  ELSE 27 - length(bin(hv >> 6)) END) AS m_j
  FROM h
  GROUP BY 1, 2
),
est AS (
  SELECT event_day,
         CAST(count(*) AS BIGINT) AS n_buckets,
         sum(1.0 / CAST(CAST(1 AS BIGINT) << m_j AS DOUBLE))
           + ({_HLL_M} - count(*)) AS denom
  FROM reg
  GROUP BY 1
),
exact AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS event_day,
         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events
  WHERE {_TS_ADM}
  GROUP BY 1
)
SELECT e.event_day, exact.exact_users, e.n_buckets,
       round(
         CASE WHEN {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / e.denom <= 2.5 * {_HLL_M}
                   AND e.n_buckets < {_HLL_M}
              THEN {_hll_lc_case_sql('e.n_buckets')}
              ELSE {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / e.denom
         END, 4) AS hll_estimate
FROM est e JOIN exact ON e.event_day = exact.event_day
"""


@register(
    "hll_distinct_users_daily",
    _HLL_ORACLE,
    "HyperLogLog daily distinct users from portable md5 registers (m=64): "
    "groupBy(day, bucket)+MAX is map-side combinable, so 100 TB of events "
    "reduce to 64 register rows per day — the mergeable-sketch alternative "
    "to exact COUNT(DISTINCT)'s full shuffle; exact count kept alongside "
    "to exhibit the estimation error.",
)
def hll_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark.operators.sketches import hll_estimate, hll_registers

    # admission (r13 time-edge contract) — matches the streaming twin
    e = _t(spark, sf_dir, "events").filter(admissible_ts(F.col("ts")))
    day = F.date_trunc("day", F.col("ts")).alias("event_day")
    reg = hll_registers(e.select(day, "user_id"), ["event_day"], F.col("user_id").cast("string"))
    est = hll_estimate(reg, ["event_day"])
    exact = e.groupBy(day).agg(F.countDistinct("user_id").alias("exact_users"))
    return est.join(exact, "event_day").select(
        "event_day", "exact_users", "n_buckets", "hll_estimate"
    )


# ---------------------------------------------------------------------------
# Count-Min sketch — heavy-hitter token frequency estimation
# ---------------------------------------------------------------------------

from streaming_data_lake_spark.operators.sketches import (  # noqa: E402
    CMS_D as _CMS_D,
    CMS_TOPK as _CMS_TOPK,
    CMS_W as _CMS_W,
)

_CMS_SEEDS = list(range(_CMS_D))

# The seeded bucket expression depends on the seed VALUE, so the
# sketch and the candidate probes are each a UNION ALL over the d
# seeds (constant-folded per branch in both engines).
_CMS_SKETCH_BRANCH = (
    "SELECT {seed} AS seed, "
    "{h} % " + str(_CMS_W) + " AS bucket, "
    "CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1, 2"
)

_CMS_LOOKUP_BRANCH = (
    "SELECT token, true_n, {seed} AS seed, "
    "{h} % " + str(_CMS_W) + " AS bucket FROM cand"
)

_CMS_ORACLE = f"""
WITH tok AS (
  SELECT unnest({_DUCK_TOKS}) AS token FROM documents
),
truth AS (
  SELECT token, CAST(count(*) AS BIGINT) AS true_n
  FROM tok GROUP BY token
),
top AS (
  SELECT token, true_n,
         row_number() OVER (ORDER BY true_n DESC, token ASC) AS rn
  FROM truth
),
cand AS (SELECT token, true_n FROM top WHERE rn <= {_CMS_TOPK}),
sketch AS (
  {" UNION ALL ".join(_CMS_SKETCH_BRANCH.format(seed=s, h=duck_h32_seeded("token", s)) for s in _CMS_SEEDS)}
),
probes AS (
  {" UNION ALL ".join(_CMS_LOOKUP_BRANCH.format(seed=s, h=duck_h32_seeded("token", s)) for s in _CMS_SEEDS)}
)
SELECT p.token, p.true_n, CAST(min(s.cnt) AS BIGINT) AS cms_estimate
FROM probes p
JOIN sketch s ON s.seed = p.seed AND s.bucket = p.bucket
GROUP BY p.token, p.true_n
"""


@register(
    "cms_heavy_hitter_tokens",
    _CMS_ORACLE,
    f"Count-Min sketch (d={_CMS_D}, w={_CMS_W}) from the portable seeded "
    "hash: token stream folds into a 1024-cell grid via map-side-combinable "
    "groupBy — the fixed-size mergeable summary that answers frequency "
    "queries at 100 TB without re-scanning; estimates (min over rows, "
    "always >= truth) exhibited against the exact top-20.",
)
def cms_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark.operators.dedup import tokens

    d = _t(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("token"))
    # One pass is shared by truth + sketch: materialize the exploded
    # token stream once (same discipline as the jaccard shingles).
    # (spread() before the explode was measured-and-rejected r19:
    # 0.631 vs 0.614 s interleaved — plain tokenize is too cheap for
    # the extra exchange to pay, unlike the shingle checkpoints.)
    tok = tok.localCheckpoint()
    from streaming_data_lake_spark.operators.sketches import (
        cms_cells,
        cms_lookup,
        cms_topk_candidates,
    )

    return cms_lookup(cms_topk_candidates(tok), cms_cells(tok))


# ---------------------------------------------------------------------------
# K-means training — 2 unrolled Lloyd iterations, exact-decimal means
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_ITERS = 2
# Derived, not an independent literal (ADVICE r15): the kmeans/IVF
# training dim must track the declared corpus admission contract.
from streaming_data_lake_spark.schemas import EMBEDDING_DIM as _KM_DIM  # noqa: E402

_KM_ASSIGN = """
s{it} AS (
  SELECT n.vec_id, n.v,
         row_number() OVER (
           PARTITION BY n.vec_id
           ORDER BY {dot} / (n.nrm * c.cnrm) DESC, c.cluster_id ASC
         ) AS rn,
         c.cluster_id
  FROM nv n CROSS JOIN c{prev}n c
),
a{it} AS (SELECT vec_id, v, cluster_id FROM s{it} WHERE rn = 1),
m{it} AS (
  SELECT cluster_id, CAST(t.i AS INTEGER) AS dim_idx,
         CAST(sum(CAST(CAST(v[CAST(t.i AS INTEGER) + 1] AS DOUBLE) AS DECIMAL(27,10))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS c_val
  FROM a{it}, LATERAL unnest(range({dim})) AS t(i)
  GROUP BY 1, 2
),
c{it} AS (SELECT cluster_id, list(c_val ORDER BY dim_idx) AS cv FROM m{it} GROUP BY 1),
c{it}n AS (SELECT cluster_id, cv, sqrt({cvdot}) AS cnrm FROM c{it})
"""

_KMEANS_ORACLE = (
    f"""
WITH n AS (
  SELECT vec_id, embedding AS v,
         sqrt({_DUCK_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM {_DUCK_EMB} embeddings
),
-- TRAINING admits only dim-{_KM_DIM} vectors (r14: kmeans_train
-- drops mis-shaped vectors instead of aborting on element_at OOB;
-- the FAISS add()-time contract). The search tail keeps the
-- unfiltered corpus `n`, mirroring the engine, whose fold-based
-- dots yield NULL sims for mis-shaped vectors in both engines.
nv AS (SELECT * FROM n WHERE len(v) = {_KM_DIM}),
c0n AS (
  SELECT vec_id AS cluster_id, v AS cv, nrm AS cnrm
  FROM nv ORDER BY vec_id LIMIT {_KM_K}
),
"""
    + ",\n".join(
        _KM_ASSIGN.format(
            it=i + 1,
            prev=i,
            dim=_KM_DIM,
            dot=_DUCK_DOT.format(a="n.v", b="c.cv"),
            cvdot=_DUCK_DOT.format(a="cv", b="cv"),
        ).strip().lstrip()
        for i in range(_KM_ITERS)
    )
    + f""",
nm AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members FROM a{_KM_ITERS} GROUP BY 1)
SELECT m.cluster_id, m.dim_idx, nm.n_members,
       round(m.c_val, 6) AS centroid_val
FROM m{_KM_ITERS} m JOIN nm ON m.cluster_id = nm.cluster_id
"""
)


# Trained-centroid memo: kmeans_train runs its Lloyd iterations
# EAGERLY (localCheckpoint per round), and two registered queries
# need the identical centroids — without sharing, a bench or
# certification pass pays the full training twice. Keyed by the
# SparkContext applicationId so a stopped session's checkpointed
# RDDs are never reused by a new session.
_KM_MEMO: dict[tuple[str, str], DataFrame] = {}


def _trained_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark.operators.similarity import kmeans_train

    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir)
    if key not in _KM_MEMO:
        # Evict other sessions' entries: their DataFrame plans are
        # bound to stopped SparkContexts and can never be reused, so
        # keeping them just grows the dict for the process lifetime.
        for stale in [k for k in _KM_MEMO if k[0] != app_id]:
            del _KM_MEMO[stale]
        e = _emb(spark, sf_dir)
        _KM_MEMO[key] = kmeans_train(e, k=_KM_K, iters=_KM_ITERS, dim=_KM_DIM)
    return _KM_MEMO[key]


@register(
    "kmeans_train_centroids",
    _KMEANS_ORACLE,
    f"In-engine k-means training (k={_KM_K}, {_KM_ITERS} Lloyd iterations): "
    "argmax-cosine assignment is a zero-shuffle narrow map (centroids "
    "broadcast), recentering reduces the corpus map-side to k wide rows of "
    "exact decimal sums — per round the corpus is scanned once and never "
    "shuffled, the textbook distributed k-means cost. Trains the centroids "
    "the IVF index consumes; oracle unrolls both iterations in SQL.",
)
def kmeans_train_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = _trained_centroids(spark, sf_dir)
    return cents.select(
        F.col("vec_id").alias("cluster_id"),
        "n_members",
        F.posexplode("embedding").alias("dim_idx", "centroid_val"),
    ).select(
        "cluster_id",
        "dim_idx",
        "n_members",
        F.round("centroid_val", 6).alias("centroid_val"),
    )


# ---------------------------------------------------------------------------
# Typed JSON extraction over the props payload column
# ---------------------------------------------------------------------------

_PROPS_ORACLE = """
WITH p AS (
  -- Total over malformed payloads, mirroring Spark's PERMISSIVE
  -- from_json: non-JSON props -> NULL (json_valid guard — DuckDB's
  -- json_extract ERRORS on malformed input), a k that is not a JSON
  -- integer -> NULL (json_type guard — Spark's LongType field nulls
  -- on strings/fractions where a bare CAST would coerce or raise),
  -- integer overflow -> NULL (TRY_CAST).
  SELECT event_type,
         CASE WHEN json_valid(props)
                   AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
              THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) END AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(k) AS BIGINT) AS n_with_k,
       CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k,
       CAST(sum(k) AS DOUBLE) / CAST(count(k) AS DOUBLE) AS avg_k
FROM p
GROUP BY event_type
"""


@register(
    "props_json_stats",
    _PROPS_ORACLE,
    "Typed JSON extraction: from_json parses the props payload into a typed "
    "struct ONCE per row (schema declared, JVM-side Jackson parse — not the "
    "regexp fallback events_clean uses for its boolean flag), then plain "
    "typed aggregation. At 100 TB the parse cost is the scan cost; a "
    "semi-structured lake would materialize the struct column at ingest.",
)
def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    e = _t(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    p = e.select(
        "event_type", F.from_json(F.col("props"), schema).getField("k").alias("k")
    )
    return p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.countDistinct("k").alias("n_distinct_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        (F.sum("k").cast("double") / F.count("k").cast("double")).alias("avg_k"),
    )


# ---------------------------------------------------------------------------
# IVF search over TRAINED centroids — kmeans feeding the index
# ---------------------------------------------------------------------------

_KM_SEARCH_TAIL = f"""
corpus_scored AS (
  SELECT n.vec_id, n.v, n.nrm,
         row_number() OVER (
           PARTITION BY n.vec_id
           ORDER BY {_DUCK_DOT.format(a='n.v', b='c.cv')} / (n.nrm * c.cnrm) DESC,
                    c.cluster_id ASC
         ) AS rn,
         c.cluster_id
  FROM n CROSS JOIN c{_KM_ITERS}n c
),
asg AS (SELECT vec_id, v, nrm, cluster_id FROM corpus_scored WHERE rn = 1),
q AS (SELECT * FROM asg WHERE vec_id < 50),
pair_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DUCK_DOT.format(a='q.v', b='c.v')} / (q.nrm * c.nrm) AS cosine_sim
  FROM q JOIN asg c ON c.cluster_id = q.cluster_id AND c.vec_id <> q.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC
  ) AS rank
  FROM pair_scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine_sim
FROM ranked WHERE rank <= 5
"""

_KNN_TRAINED_ORACLE = (
    _KMEANS_ORACLE.rsplit(",\nnm AS", 1)[0] + ",\n" + _KM_SEARCH_TAIL
)


@register(
    "knn_ivf_trained_cosine",
    _KNN_TRAINED_ORACLE,
    "End-to-end ANN: IVF top-5 search over centroids TRAINED in-engine "
    "(kmeans_train_centroids' 2 Lloyd iterations) instead of seed vectors — "
    "the full index lifecycle (train -> assign -> cluster-pruned search) as "
    "one declarative plan; oracle unrolls training + search in SQL.",
)
def knn_ivf_trained_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark.operators.similarity import ivf_knn

    e = _emb(spark, sf_dir)
    cents = _trained_centroids(spark, sf_dir)
    return ivf_knn(e, e.filter(F.col("vec_id") < 50), cents, k=5)


# ---------------------------------------------------------------------------
# Set operations — INTERSECT / EXCEPT (distinct semantics)
# ---------------------------------------------------------------------------

_SETOPS_ORACLE = """
SELECT 'nations_with_both' AS tag, CAST(k AS BIGINT) AS key
FROM (SELECT c_nationkey AS k FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier) t
UNION ALL
SELECT 'customers_no_orders' AS tag, CAST(k AS BIGINT) AS key
FROM (SELECT c_custkey AS k FROM customer
      EXCEPT
      SELECT o_custkey FROM orders) t
"""


@register(
    "keyset_intersect_except",
    _SETOPS_ORACLE,
    "ANSI set operations with distinct semantics: INTERSECT (nations present "
    "on both the customer and supplier side) and EXCEPT (customers that never "
    "ordered). Catalyst rewrites both into semi/anti joins over map-side-"
    "distinct inputs — the same plan the explicit EXISTS queries get, so the "
    "set-op surface costs nothing extra at scale.",
)
def keyset_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    both = (
        c.select(F.col("c_nationkey").alias("key"))
        .intersect(s.select(F.col("s_nationkey").alias("key")))
        .select(F.lit("nations_with_both").alias("tag"), "key")
    )
    no_orders = (
        c.select(F.col("c_custkey").alias("key"))
        .subtract(o.select(F.col("o_custkey").alias("key")))
        .select(F.lit("customers_no_orders").alias("tag"), "key")
    )
    return both.unionAll(no_orders)


# ---------------------------------------------------------------------------
# Scalar subquery — orders above the global average
# ---------------------------------------------------------------------------

_ABOVE_AVG_ORACLE = f"""
WITH g AS (
  SELECT {duck_davg("o_totalprice")} AS avg_price FROM orders
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_above,
       {duck_dsum("o_totalprice")} AS revenue_above
FROM orders, g
WHERE o_totalprice > g.avg_price
GROUP BY o_orderpriority
"""


@register(
    "orders_above_global_avg",
    _ABOVE_AVG_ORACLE,
    "Scalar-subquery pattern: a one-row global aggregate joined (broadcast) "
    "against the fact scan as the filter bound — two passes, no recompute "
    "per row; the exact-decimal average keeps the comparison boundary "
    "identical in both engines.",
)
def orders_above_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    g = o.agg(davg(F.col("o_totalprice")).alias("avg_price"))
    return (
        o.crossJoin(F.broadcast(g))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            dsum(F.col("o_totalprice")).alias("revenue_above"),
        )
    )


# ---------------------------------------------------------------------------
# Fuzzy string matching — Levenshtein near-match pairs over a dimension
# ---------------------------------------------------------------------------

_LEV_ORACLE = """
SELECT a.s_suppkey AS key_a, b.s_suppkey AS key_b,
       CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS edit_distance
FROM supplier a
JOIN supplier b
  ON a.s_suppkey < b.s_suppkey
 AND levenshtein(a.s_name, b.s_name) <= 1
"""


@register(
    "supplier_name_near_matches",
    _LEV_ORACLE,
    "Fuzzy entity matching: supplier-name pairs within edit distance 1. "
    "All-pairs is acceptable ONLY because a dimension table is broadcast-"
    "small by definition; for fact-scale string dedup the engine's blocked "
    "paths (MinHash bands, exact-substring windows) are the candidate "
    "generators and Levenshtein is the verify stage.",
)
def supplier_name_near_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark.operators.similarity import spread

    s = _t(spark, sf_dir, "supplier")
    # spread() (guide §2.5): the all-pairs probe evaluates |dim|²
    # Levenshtein calls, and on the single-file scan that whole
    # product ran in ONE task. Scale-adaptive no-op on any input
    # wider than the core count.
    a = spread(
        s.select(F.col("s_suppkey").alias("key_a"), F.col("s_name").alias("name_a"))
    )
    b = s.select(F.col("s_suppkey").alias("key_b"), F.col("s_name").alias("name_b"))
    # Threshold form (guide §1.2 per-task work): levenshtein(l, r, 1)
    # band-limits the DP to the threshold and short-circuits on a
    # length gap, returning -1 above the bound — so `>= 0` selects
    # exactly the `dist <= 1` rows and equals the distance on every
    # kept row. Interleaved A/B at sf0.1 (with spread, min-of-4):
    # all-pairs one-task 3.22 s -> 0.21 s, results bit-identical.
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"), 1)
    return (
        a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))
        .filter(dist >= 0)
        .select("key_a", "key_b", dist.cast("int").alias("edit_distance"))
    )


# ---------------------------------------------------------------------------
# Corpus-trained bigram LM quality score (CCNet-style signal)
# ---------------------------------------------------------------------------

_LM_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
),
sized AS (SELECT doc_id, toks, len(toks) AS n FROM tk WHERE len(toks) >= 2),
-- build ALL bigrams per doc in one list_transform pass, then unnest:
-- the previous LATERAL-unnest shape carried the FULL toks list once
-- per bigram row, i.e. O(n_tok²) materialized elements — the 220k-
-- token huge-doc gate document ground the oracle for minutes (r14,
-- same class as the r13 chunking-oracle hang). The packed shape is
-- linear: one struct per bigram.
packed AS (
  SELECT doc_id,
         list_transform(range(1, CAST(n AS BIGINT)),
                        i -> struct_pack(w1 := toks[CAST(i AS INTEGER)],
                                         w2 := toks[CAST(i AS INTEGER) + 1])) AS bs
  FROM sized
),
bgu AS (SELECT doc_id, unnest(bs) AS u FROM packed),
bg AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM bgu),
c12 AS (SELECT w1, w2, count(*) AS n12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY 1),
v AS (
  SELECT count(DISTINCT tok) AS vocab
  FROM (SELECT unnest(toks) AS tok FROM tk)
)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(CAST(sum(CAST(
          CAST(c12.n12 + 1 AS DOUBLE) / CAST(c1.n1 + v.vocab AS DOUBLE)
          AS DECIMAL(27,18))) AS DOUBLE) / CAST(count(*) AS DOUBLE), 12)
         AS avg_bigram_p
FROM bg
JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
JOIN c1 ON bg.w1 = c1.w1
CROSS JOIN v
GROUP BY bg.doc_id
"""


@register(
    "bigram_lm_quality",
    _LM_ORACLE,
    "Corpus-trained bigram LM quality score (the CCNet/KenLM signal class): "
    "add-one-smoothed P(w2|w1) trained on the corpus itself, scored per doc "
    "as the mean bigram probability. Bit-exact across engines WITHOUT "
    "transcendentals: each probability is one IEEE double division of exact "
    "integers, summed through decimal. Train = two map-side-combinable "
    "groupBys; score = two equi-joins — at 100 TB the count tables are the "
    "reusable model artifact.",
)
def bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_lake_spark.operators.dedup import tokens

    d = _t(spark, sf_dir, "documents")
    tk = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    sized = tk.withColumn("n", F.size("toks")).filter(F.col("n") >= 2)
    bg = sized.select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice(F.col("toks"), 1, F.col("n") - 1),
                lambda w, i: F.struct(
                    w.alias("w1"),
                    F.element_at(F.col("toks"), (i + 2).cast("int")).alias("w2"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    # One token pass feeds model training AND scoring.
    bg = bg.localCheckpoint()
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    vocab = (
        tk.select(F.explode("toks").alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab"))
    )
    prob = (F.col("n12") + F.lit(1)).cast("double") / (
        F.col("n1") + F.col("vocab")
    ).cast("double")
    return (
        bg.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            # Rounded to 12 dp: the per-term double->decimal cast
            # rounds differently across engines in the 18th digit.
            F.round(
                F.sum(prob.cast("decimal(27,18)")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                12,
            ).alias("avg_bigram_p"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic domain-mixture resampling (data mixing)
# ---------------------------------------------------------------------------

_MIX_TARGETS = {"en": 0.40, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}

_MIX_VALUES = ", ".join(f"('{k}', {v})" for k, v in _MIX_TARGETS.items())

_MIX_ORACLE = f"""
WITH counts AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
targets(lang, share) AS (VALUES {_MIX_VALUES}),
scale AS (
  SELECT min(CAST(n AS DOUBLE) / share) AS s
  FROM counts JOIN targets USING (lang)
),
rates AS (
  SELECT c.lang, c.n,
         CAST(round(1000000 * least(1.0, t.share * sc.s / CAST(c.n AS DOUBLE))) AS BIGINT) AS ppm
  FROM counts c JOIN targets t ON c.lang = t.lang CROSS JOIN scale sc
)
SELECT r.lang,
       r.n AS n_total,
       r.ppm AS rate_ppm,
       CAST(count(*) FILTER ({duck_h32("CAST(d.doc_id AS VARCHAR)")} % 1000000 < r.ppm) AS BIGINT)
         AS n_kept
FROM documents d JOIN rates r ON d.lang = r.lang
GROUP BY r.lang, r.n, r.ppm
"""


@register(
    "domain_mixture_resample",
    _MIX_ORACLE,
    "Deterministic data mixing: downsample each domain (lang) by a "
    "hash-threshold acceptance rate computed so the OUTPUT matches a target "
    "mixture (largest feasible corpus, downsampling only). Two passes: a "
    "k-row count aggregate derives per-domain ppm rates; the filter is then "
    "a stateless hash compare — reproducible across runs, engines, and "
    "cluster sizes, no shuffle of the kept data.",
)
def domain_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    targets = d.sparkSession.createDataFrame(
        list(_MIX_TARGETS.items()), "lang string, share double"
    )
    # Tiny after the aggregate (one row per domain): materialize it so
    # the scale subquery and the rates projection read it once instead
    # of re-running the counts scan under each join input.
    joined = counts.join(targets, "lang").localCheckpoint()
    scale = joined.agg(
        F.min(F.col("n").cast("double") / F.col("share")).alias("s")
    )
    rates = (
        joined.crossJoin(F.broadcast(scale))
        .select(
            "lang",
            "n",
            F.round(
                1_000_000
                * F.least(
                    F.lit(1.0),
                    F.col("share") * F.col("s") / F.col("n").cast("double"),
                )
            )
            .cast("long")
            .alias("ppm"),
        )
    )
    keep = h32(F.col("doc_id").cast("string")) % 1_000_000 < F.col("ppm")
    return (
        d.join(F.broadcast(rates), "lang")
        .groupBy("lang", F.col("n").alias("n_total"), F.col("ppm").alias("rate_ppm"))
        .agg(F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"))
        .select("lang", "n_total", "rate_ppm", "n_kept")
    )


# ---------------------------------------------------------------------------
# Statistical profiling — z-score outlier detection per group
# ---------------------------------------------------------------------------

_ZSCORE_ORACLE = """
WITH m AS (
  -- moments divide by count(l_extendedprice), NOT count(*): the sum
  -- skips NULL prices, so dividing by the all-rows count mixes
  -- populations and understates the mean the moment a NULL price
  -- exists (edge-sweep finding; n_items stays count(*) by contract)
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(count(l_extendedprice) AS DOUBLE) AS mean_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(count(l_extendedprice) AS DOUBLE) AS mean_sq
  FROM lineitem
  GROUP BY l_returnflag
),
stats AS (
  -- mean*mean (IEEE multiply, deterministic) not pow(); variance
  -- clamped at 0 so float cancellation on near-constant groups
  -- cannot push sqrt's argument negative (Spark would yield NaN,
  -- DuckDB would error -- diverging instead of failing together).
  SELECT l_returnflag, n_items, mean_price,
         sqrt(greatest(0.0, mean_sq - mean_price * mean_price)) AS sd_price
  FROM m
)
SELECT s.l_returnflag,
       s.n_items,
       round(s.mean_price, 4) AS mean_price,
       round(s.sd_price, 4) AS sd_price,
       CAST(count(*) FILTER (abs(l.l_extendedprice - s.mean_price)
                             > 3 * s.sd_price) AS BIGINT) AS n_outliers
FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag
GROUP BY s.l_returnflag, s.n_items, s.mean_price, s.sd_price
"""


@register(
    "price_outliers_zscore",
    _ZSCORE_ORACLE,
    "Statistical profiling: per-group mean/stddev from EXACT decimal sums "
    "of x and x-squared (order-independent, so the distributed moments match "
    "the oracle bit-for-bit; sqrt/divide are IEEE-deterministic), then a "
    "3-sigma outlier count via a broadcast stats join — two scans, no sort.",
)
def price_outliers_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    xdec = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        davg(F.col("l_extendedprice")).alias("mean_price"),
        # divide by the non-NULL count — davg's convention — so the
        # variance is a moment of ONE population (see oracle note)
        (F.sum(xdec * xdec).cast("double") / F.count(xdec).cast("double")).alias("mean_sq"),
    )
    # mean*mean (IEEE multiply) not pow() — Math.pow vs libm pow can
    # differ in the last ulp; greatest(0, var) guards the sqrt against
    # cancellation on near-constant groups (see oracle comment).
    stats = m.select(
        "l_returnflag",
        "n_items",
        "mean_price",
        F.sqrt(
            F.greatest(
                F.lit(0.0), F.col("mean_sq") - F.col("mean_price") * F.col("mean_price")
            )
        ).alias("sd_price"),
    )
    outlier = F.abs(F.col("l_extendedprice") - F.col("mean_price")) > 3 * F.col("sd_price")
    return (
        li.join(F.broadcast(stats), "l_returnflag")
        .groupBy("l_returnflag", "n_items", "mean_price", "sd_price")
        .agg(F.sum(F.when(outlier, 1).otherwise(0)).cast("long").alias("n_outliers"))
        .select(
            "l_returnflag",
            "n_items",
            F.round("mean_price", 4).alias("mean_price"),
            F.round("sd_price", 4).alias("sd_price"),
            "n_outliers",
        )
    )


# ---------------------------------------------------------------------------
# Explicit pivot — wide per-category columns from a long aggregate
# ---------------------------------------------------------------------------

_PIVOT_FLAGS = ["A", "N", "R"]

_PIVOT_ORACLE = """
SELECT l_linestatus,
       CAST(count(*) FILTER (l_returnflag = 'A') AS BIGINT) AS n_A,
       CAST(count(*) FILTER (l_returnflag = 'N') AS BIGINT) AS n_N,
       CAST(count(*) FILTER (l_returnflag = 'R') AS BIGINT) AS n_R,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
            FILTER (l_returnflag = 'A') AS DOUBLE) AS rev_A,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
            FILTER (l_returnflag = 'N') AS DOUBLE) AS rev_N,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
            FILTER (l_returnflag = 'R') AS DOUBLE) AS rev_R
FROM lineitem
GROUP BY l_linestatus
"""


@register(
    "lineitem_flag_pivot",
    _PIVOT_ORACLE,
    "Explicit pivot: groupBy().pivot(col, values).agg(...) with the pivot "
    "VALUES declared up front — declaring them keeps the plan a single "
    "two-phase aggregate (no extra distinct-values job) and fixes the "
    "output schema, which is what makes pivot safe at 100 TB.",
)
def lineitem_flag_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", _PIVOT_FLAGS)
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_extendedprice")).alias("rev"),
        )
    )
    # coalesce the counts: an absent (status, flag) combo is NULL out
    # of Spark's pivot but 0 from the oracle's count(*) FILTER — the
    # testdata populates every combo today, but the parity must not
    # depend on that.
    return wide.select(
        "l_linestatus",
        *[F.coalesce(F.col(f"{v}_n"), F.lit(0)).alias(f"n_{v}") for v in _PIVOT_FLAGS],
        *[F.col(f"{v}_rev").alias(f"rev_{v}") for v in _PIVOT_FLAGS],
    )


# ---------------------------------------------------------------------------
# Pearson correlation from exact moments
# ---------------------------------------------------------------------------

_CORR_ORACLE = f"""
WITH m AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n_items,
         {duck_dsum('l_quantity')} AS sx,
         {duck_dsum('l_extendedprice')} AS sy,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n_items,
       round(
         (CAST(n_items AS DOUBLE) * sxy - sx * sy)
         / nullif(sqrt(greatest(0.0, CAST(n_items AS DOUBLE) * sxx - sx * sx)), 0.0)
         / nullif(sqrt(greatest(0.0, CAST(n_items AS DOUBLE) * syy - sy * sy)), 0.0),
         10) AS corr_qty_price
FROM m
"""


@register(
    "corr_quantity_price",
    _CORR_ORACLE,
    "Pearson correlation per group from EXACT decimal co-moments (sums of "
    "x, y, xy, x-squared, y-squared): one map-side-combinable aggregate "
    "carries five exact sums, then the correlation is a fixed IEEE "
    "expression over them — the distributed-moments discipline that makes "
    "a statistic both single-pass at 100 TB and bit-reproducible.",
)
def corr_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(F.col("l_quantity")).alias("sx"),
        dsum(F.col("l_extendedprice")).alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n = F.col("n_items").cast("double")
    # nullif'd denominators: a zero-variance group (all x equal) makes
    # the sqrt exactly 0, where Spark's ANSI mode throws DIVIDE_BY_ZERO
    # but DuckDB returns NULL — NULL correlation is also the right
    # answer for an undefined statistic.
    sdx = F.nullif(
        F.sqrt(F.greatest(F.lit(0.0), n * F.col("sxx") - F.col("sx") * F.col("sx"))),
        F.lit(0.0),
    )
    sdy = F.nullif(
        F.sqrt(F.greatest(F.lit(0.0), n * F.col("syy") - F.col("sy") * F.col("sy"))),
        F.lit(0.0),
    )
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / sdx / sdy
    return m.select(
        "l_returnflag", "n_items", F.round(corr, 10).alias("corr_qty_price")
    )


# ---------------------------------------------------------------------------
# Analytic window breadth: first/last_value + percent_rank + cume_dist
# ---------------------------------------------------------------------------

_WINDOW_BREADTH_ORACLE = """
WITH w AS (
  SELECT o_orderpriority,
         first_value(o_totalprice) OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_orderdate NULLS FIRST, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
         ) AS first_price,
         last_value(o_totalprice) OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_orderdate NULLS FIRST, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
         ) AS last_price,
         -- NULLS FIRST on every ORDER BY: Spark's ASC default (the
         -- oracle pins DuckDB's NULLS-LAST default to match)
         percent_rank() OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice NULLS FIRST, o_orderkey
         ) AS pr,
         cume_dist() OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice NULLS FIRST, o_orderkey
         ) AS cd
  FROM orders
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(first_price) AS DOUBLE) AS first_price,
       CAST(min(last_price) AS DOUBLE) AS last_price,
       CAST(count(*) FILTER (pr <= 0.25) AS BIGINT) AS n_bottom_quartile,
       CAST(count(*) FILTER (cd <= 0.5) AS BIGINT) AS n_lower_half
FROM w
GROUP BY o_orderpriority
"""


@register(
    "priority_window_profile",
    _WINDOW_BREADTH_ORACLE,
    "Analytic-window breadth in one plan: first_value/last_value over an "
    "explicit full frame (earliest/latest order price per priority) plus "
    "percent_rank and cume_dist over a total order (ties broken by key, so "
    "ranks are unique and both engines agree). Both windows share the "
    "priority partitioning — one shuffle.",
)
def priority_window_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w_time = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_price = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    per_row = o.select(
        "o_orderpriority",
        F.first("o_totalprice").over(w_time).alias("first_price"),
        F.last("o_totalprice").over(w_time).alias("last_price"),
        F.percent_rank().over(w_price).alias("pr"),
        F.cume_dist().over(w_price).alias("cd"),
    )
    return per_row.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("first_price").cast("double").alias("first_price"),
        F.min("last_price").cast("double").alias("last_price"),
        F.sum(F.when(F.col("pr") <= 0.25, 1).otherwise(0)).cast("long").alias("n_bottom_quartile"),
        F.sum(F.when(F.col("cd") <= 0.5, 1).otherwise(0)).cast("long").alias("n_lower_half"),
    )


# ---------------------------------------------------------------------------
# CUBE grouping sets — all four (type, day) marginal levels in one pass
# ---------------------------------------------------------------------------

_CUBE_ORACLE = """
WITH base AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS event_day,
         user_id, value
  FROM events
)
SELECT
  CAST(grouping(event_type) AS INTEGER) AS g_type,
  CAST(grouping(event_day) AS INTEGER) AS g_day,
  coalesce(event_type, '<all>') AS event_type,
  coalesce(CAST(event_day AS VARCHAR), '<all>') AS event_day,
  count(*) AS n_events,
  count(DISTINCT user_id) AS n_users,
  -- isfinite: non-finite value is a data error excluded from value
  -- aggregates (rows still count) — raw-events finiteness contract,
  -- parity.finite / DUCK_FINITE (nonfinite-sweep finding, r12)
  CAST(sum(CAST((CASE WHEN isfinite(value) THEN value END) AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM base
GROUP BY CUBE(event_type, event_day)
-- HAVING: see _ROLLUP_ORACLE — Spark emits no rows for empty
-- grouping sets where the standard emits the grand total
HAVING count(*) > 0
"""


@register(
    "cube_device_day_metrics",
    _CUBE_ORACLE,
    "CUBE grouping sets: (type, day) / (type) / (day) / () — BOTH "
    "marginals plus the grand total in one aggregation pass with "
    "GROUPING flags, completing the grouping-sets surface next to "
    "ROLLUP's prefix levels. One shuffle computes all four levels via "
    "partial aggs; the distinct-user count re-expands per level inside "
    "the same exchange rather than four scans of the fact.",
)
def cube_device_day_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("event_day"),
        "user_id",
        "value",
    )
    return (
        base.cube("event_type", "event_day")
        .agg(
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("event_day").cast("int").alias("g_day"),
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum(finite(F.col("value")), "decimal(12,2)").alias("total_value"),
        )
        .select(
            "g_type",
            "g_day",
            F.coalesce(F.col("event_type"), F.lit("<all>")).alias("event_type"),
            F.coalesce(F.col("event_day").cast("string"), F.lit("<all>")).alias(
                "event_day"
            ),
            "n_events",
            "n_users",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Histogram-sketch quantiles — mergeable one-pass P50/P95 estimates
# ---------------------------------------------------------------------------

# Bin math is exact cross-engine: 2-dp values -> integer cents via
# round (never lands on .5), then floor(cents / 500.0) (double floor is
# boundary-safe because exact multiples of 500 divide exactly).
_HISTQ_BIN = (
    "cast(floor(cast(round(value * 100) as bigint) / 500.0) as bigint)"
)

_HISTQ_ORACLE = f"""
WITH b AS (
  -- isfinite: a NULL or non-finite value has no bin (the bin cast
  -- aborts on NaN/Inf in BOTH engines; the engines also disagree on
  -- where a NULL bin sorts in the cumulative window). isfinite(NULL)
  -- is NULL, so one predicate covers both shapes.
  SELECT event_type, {_HISTQ_BIN} AS bin FROM events WHERE isfinite(value)
),
h AS (SELECT event_type, bin, count(*) AS cnt FROM b GROUP BY event_type, bin),
c AS (
  SELECT event_type, bin,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS total
  FROM h
)
SELECT event_type,
       CAST(max(total) AS BIGINT) AS n_events,
       count(*) AS n_bins,
       CAST((min(CASE WHEN cum >= (50 * total + 99) // 100 THEN bin END) + 1)
            * 5.0 AS DOUBLE) AS p50_est,
       CAST((min(CASE WHEN cum >= (95 * total + 99) // 100 THEN bin END) + 1)
            * 5.0 AS DOUBLE) AS p95_est
FROM c
GROUP BY event_type
"""


@register(
    "value_histogram_quantiles",
    _HISTQ_ORACLE,
    "Quantile estimation the way it survives 100 TB: a fixed-width "
    "histogram sketch (one map-side-combinable groupBy into ~100 bins per "
    "key) instead of a global sort — P50/P95 read off the cumulative bin "
    "counts as upper bin edges, thresholds in pure integer arithmetic so "
    "both engines agree bit-for-bit. The per-key window runs over bin "
    "counts (tiny), never over events; histograms from different shards "
    "merge by adding counts, which is what makes this the streaming/"
    "backfill-compatible quantile path next to the exact "
    "percentile_cont queries.",
)
def value_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL/non-finite values take no bin (oracle: WHERE isfinite) —
    # the bin cast would abort the whole job on one NaN row
    b = (
        _t(spark, sf_dir, "events")
        .filter(finite(F.col("value")).isNotNull())
        .select("event_type", F.expr(_HISTQ_BIN).alias("bin"))
    )
    h = b.groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("event_type")
    c = h.select(
        "event_type",
        "bin",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_tot).alias("total"),
    )
    t50 = F.expr("(50 * total + 99) div 100")
    t95 = F.expr("(95 * total + 99) div 100")
    edge = lambda m: ((m + 1) * F.lit(5.0)).cast("double")  # noqa: E731
    return c.groupBy("event_type").agg(
        F.max("total").cast("long").alias("n_events"),
        F.count(F.lit(1)).alias("n_bins"),
        edge(F.min(F.when(F.col("cum") >= t50, F.col("bin")))).alias("p50_est"),
        edge(F.min(F.when(F.col("cum") >= t95, F.col("bin")))).alias("p95_est"),
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) layout keys — multi-dimensional clustering stats
# ---------------------------------------------------------------------------

# 16-bit -> 32-bit bit-spread, as plain `<< | &` SQL that parses
# identically in Spark SQL and DuckDB. Applied stepwise via projected
# columns so the expression text stays linear.
_Z_SPREAD_STEPS = [(8, 16711935), (4, 252645135), (2, 858993459), (1, 1431655765)]

# dimension 1: user bucket (10 bits). The double-% is a sign-safe
# modulus: both engines' % keeps the dividend's sign, and a negative
# bucket feeding the bit-spread is undefined (DuckDB errors on
# left-shifting negatives; Spark silently wraps two's-complement —
# edge-sweep finding). A Morton input must be a non-negative bucket
# index by construction.
_Z_X = "((user_id % 1024) + 1024) % 1024"
_Z_Y = "day(ts) * 24 + hour(ts)"  # dimension 2: corpus hour (10 bits)
_Z_BUCKETS = 16


def _z_step(col: str, shift: int, mask: int) -> str:
    return f"(({col} | ({col} << {shift})) & {mask})"


def _z_cte() -> str:
    """DuckDB CTE chain computing zx/zy spreads and the Morton key."""
    layers = [f"l0 AS (SELECT {_Z_X} AS zx, {_Z_Y} AS zy, user_id FROM events)"]
    for i, (sh, mask) in enumerate(_Z_SPREAD_STEPS):
        layers.append(
            f"l{i + 1} AS (SELECT {_z_step('zx', sh, mask)} AS zx, "
            f"{_z_step('zy', sh, mask)} AS zy, user_id FROM l{i})"
        )
    n = len(_Z_SPREAD_STEPS)
    layers.append(
        f"zed AS (SELECT (zx | (zy << 1)) AS zkey, user_id FROM l{n})"
    )
    return ",\n".join(layers)


_ZORDER_ORACLE = f"""
WITH {_z_cte()},
m AS (SELECT max(zkey) AS maxz FROM zed)
SELECT CAST((zkey * {_Z_BUCKETS}) // (maxz + 1) AS INTEGER) AS bucket,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(min(zkey) AS BIGINT) AS min_z,
       CAST(max(zkey) AS BIGINT) AS max_z
FROM zed, m
GROUP BY 1
"""


@register(
    "zorder_layout_keys",
    _ZORDER_ORACLE,
    "Z-order (Morton) clustering — the lakehouse OPTIMIZE ZORDER layout "
    "path: (user bucket, corpus hour) bit-interleave into one key via "
    "pure `<< | &` arithmetic (the SAME expression text runs in both "
    "engines), then equal-width zkey ranges stand in for target files. "
    "Per-range stats show the point: both dimensions stay bounded within "
    "a range, so scans filtered on EITHER user or time prune files. "
    "Scale shape: the interleave is map-side; range assignment needs only "
    "a one-row max broadcast (at real scale: repartitionByRange(zkey) "
    "before the write, same key, no extra shuffle beyond the layout's "
    "own).",
)
def zorder_layout_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    zed = _t(spark, sf_dir, "events").select(
        F.expr(_Z_X).alias("zx"), F.expr(_Z_Y).alias("zy"), "user_id"
    )
    for sh, mask in _Z_SPREAD_STEPS:
        zed = zed.select(
            F.expr(_z_step("zx", sh, mask)).alias("zx"),
            F.expr(_z_step("zy", sh, mask)).alias("zy"),
            "user_id",
        )
    zed = zed.select(F.expr("zx | (zy << 1)").alias("zkey"), "user_id")
    maxz = zed.agg(F.max("zkey").alias("maxz"))
    return (
        zed.crossJoin(F.broadcast(maxz))
        .select(
            F.expr(f"cast((zkey * {_Z_BUCKETS}) div (maxz + 1) as int)").alias(
                "bucket"
            ),
            "zkey",
            "user_id",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("zkey").cast("long").alias("min_z"),
            F.max("zkey").cast("long").alias("max_z"),
        )
    )


# ---------------------------------------------------------------------------
# Unpivot (melt) — wide counters back to long metric series
# ---------------------------------------------------------------------------

_UNPIVOT_TYPES = ["click", "view", "purchase", "signup", "error"]

_UNPIVOT_ORACLE = f"""
WITH wide AS (
  -- bucket-safe day (r13 time-edge contract): out-of-range ts joins
  -- the NULL-ts rows in the unknown-day group; rows still count
  SELECT CASE WHEN {_TS_ADM}
              THEN CAST(date_trunc('day', ts) AS TIMESTAMP) END AS event_day,
         {", ".join(
             f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}"
             for t in _UNPIVOT_TYPES
         )}
  FROM events GROUP BY 1
)
UNPIVOT wide ON {", ".join(_UNPIVOT_TYPES)}
INTO NAME metric VALUE n_events
"""


@register(
    "event_counters_unpivot",
    _UNPIVOT_ORACLE,
    "Unpivot/melt — the inverse of the declared-values pivot: per-day "
    "wide counters (one pivot pass, fixed schema) relational-ized back "
    "to (day, metric, value) rows, the normalization step that turns "
    "wide telemetry into a long metric store. Spark's native unpivot "
    "is a zero-shuffle Expand over the aggregated frame — rows grow "
    "x5 AFTER aggregation (30 days x 5), never on the fact table.",
)
def event_counters_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bucket-safe day (r13 time-edge contract) — see the oracle
    day = F.when(admissible_ts(F.col("ts")), F.date_trunc("day", F.col("ts")))
    wide = (
        _t(spark, sf_dir, "events")
        .select(day.alias("event_day"), "event_type")
        .groupBy("event_day")
        .pivot("event_type", _UNPIVOT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _UNPIVOT_TYPES)
    )
    return wide.unpivot(
        ["event_day"], _UNPIVOT_TYPES, "metric", "n_events"
    )


# ---------------------------------------------------------------------------
# Time-RANGE rolling window features (7-day user activity)
# ---------------------------------------------------------------------------

_ROLLING_7D_ORACLE = """
WITH daily AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS epoch_day,
         -- isfinite: raw-events finiteness contract (see _CUBE_ORACLE)
         sum(CAST((CASE WHEN isfinite(value) THEN value END) AS DECIMAL(12,2))) AS day_value,
         count(*) AS day_events
  FROM events GROUP BY 1, 2
)
SELECT user_id, epoch_day,
       CAST(day_value AS DOUBLE) AS day_value,
       CAST(sum(day_value) OVER w AS DOUBLE) AS rolling_7d_value,
       CAST(sum(day_events) OVER w AS BIGINT) AS rolling_7d_events,
       CAST(count(*) OVER w AS BIGINT) AS active_days_7d
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@register(
    "user_rolling_7day_value",
    _ROLLING_7D_ORACLE,
    "Time-RANGE window frame (RANGE BETWEEN 6 PRECEDING) over per-day "
    "pre-aggregates: the rolling-feature shape of behavioral feature "
    "engineering. A RANGE frame on epoch day — unlike ROWS — is correct "
    "under gaps (a user inactive for a week contributes nothing to the "
    "window). Aggregate FIRST: the frame scans the (user, day) rollup, "
    "never fact cardinality. Decimal-exact sums.",
)
def user_rolling_7day_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("epoch_day"),
    ).agg(
        F.sum(finite(F.col("value")).cast("decimal(12,2)")).alias("day_value"),
        F.count(F.lit(1)).alias("day_events"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_day")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "epoch_day",
        F.col("day_value").cast("double").alias("day_value"),
        F.sum("day_value").over(w).cast("double").alias("rolling_7d_value"),
        F.sum("day_events").over(w).cast("long").alias("rolling_7d_events"),
        F.count(F.lit(1)).over(w).cast("long").alias("active_days_7d"),
    )
