"""Plan-shape guards for the round-4 analytics/sketch queries."""

from __future__ import annotations

import contextlib
import io

from tests.conftest import SF_DIR


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _query(spark, name):
    from streaming_data_lake_spark.queries import all_queries

    return all_queries()[name].fn(spark, SF_DIR)


def test_rollup_is_single_expand_aggregate(spark):
    """ROLLUP computes all 3 levels in one Expand + two-phase agg —
    not one scan per grouping level."""
    plan = _executed(_query(spark, "rollup_revenue_levels"))
    assert plan.count("Expand") >= 1
    # one scan of orders only
    assert plan.count("orders.parquet") == 1


def test_chunking_is_narrow(spark):
    """Overlapping chunk explode is per-row: zero Exchange. AND the
    token array binds once per doc (r14 huge-doc gate): the slice
    must sit INSIDE the explode's packed-struct lambda — the old
    explode-then-slice shape re-materialized the full toks array
    into every exploded chunk row (O(n_tok²/stride) bytes; 182 s on
    a 220k-token document), which shows in the plan as `toks`
    referenced ABOVE the Generate node."""
    plan = _executed(_query(spark, "doc_chunks_overlap"))
    assert "Exchange" not in plan, "chunking must not shuffle"
    assert "Generate explode" in plan
    above_generate = plan.split("Generate", 1)[0]
    assert "toks" not in above_generate, (
        "toks consumed above the explode — the per-chunk array-copy "
        "shape is back"
    )
    assert "slice(toks" in plan, "chunks must be built from slice inside the lambda"


def test_hll_registers_partial_agg(spark):
    """The register fold groupBy(day,bucket)+MAX must be two-phase
    (map-side partial) — that is the whole point of a mergeable
    sketch."""
    plan = _executed(_query(spark, "hll_distinct_users_daily"))
    assert "partial_max" in plan


def test_cms_sketch_lookup_broadcasts(spark):
    """The 1024-cell sketch is broadcast to the candidate probes —
    never a shuffle join against the full token stream."""
    plan = _executed(_query(spark, "cms_heavy_hitter_tokens"))
    assert "BroadcastHashJoin" in plan


def test_semantic_dedup_pairs_by_cluster_equijoin(spark):
    """In-cluster pairing is an EQUI-join on cluster_id — never a
    corpus cartesian. (A BroadcastNestedLoopJoin against a ONE-ROW
    build side does appear: that is ivf_assign's collected centroid
    array being attached to every corpus row — the zero-shuffle
    narrow-map assignment, not a pair product.)"""
    plan = _executed(_query(spark, "semantic_dedup_centroid"))
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), "pair join must be hash-based on cluster_id"
    # r19: the pair join's exchanges are explicit-N repartitions on
    # the join keys — exempt from AQE coalescing, so the per-pair
    # cosine folds (CPU the byte-based coalescer cannot see) never
    # collapse into one task. They REPLACE the planner's exchanges:
    # exactly the two, no ENSURE_REQUIREMENTS exchange added on top.
    assert plan.count("REPARTITION_BY_NUM") == 2
    assert "ENSURE_REQUIREMENTS" not in plan


def test_running_total_windows_over_preagg(spark):
    """The window frame runs over the monthly rollup (small), and the
    fact scan aggregates BEFORE the window — no window over raw
    orders rows."""
    plan = _executed(_query(spark, "running_revenue_by_nation"))
    # Window appears after (above) the aggregate in the plan tree:
    # the first Window line index is smaller than the scan line index.
    assert "Window" in plan and "HashAggregate" in plan
    w = plan.index("Window")
    agg = plan.index("HashAggregate")
    assert agg > w, "aggregate must feed the window, not vice versa"


def test_gaps_single_shuffle_on_user(spark):
    """LAG + per-user agg reuse ONE hash partitioning on user_id: the
    window's Exchange is the only one over events."""
    plan = _executed(_query(spark, "user_event_gaps"))
    assert plan.count("Exchange hashpartitioning(user_id") == 1, (
        "window and groupBy should share the user_id partitioning"
    )


def test_occupancy_shards_bound_pair_counts(spark):
    """Adversarial SemDeDup fixture: every vector lands in ONE
    cluster. The occupancy guard must split it so no (cluster, shard)
    pair group exceeds max_occupancy members — bounding the pair join
    at cap*(cap-1)/2 per shard no matter how skewed assignment is —
    while clusters at/under the cap keep shard == 0 (bit-identical
    small-scale results)."""
    from pyspark.sql import functions as F

    from streaming_data_lake_spark.operators.similarity import occupancy_shards

    n, cap = 97, 10
    assigned = spark.range(n).select(
        F.col("id").alias("vec_id"), F.lit(7).alias("cluster_id")
    )
    sharded = occupancy_shards(assigned, max_occupancy=cap)
    sizes = sharded.groupBy("cluster_id", "shard").count().collect()
    assert sum(r["count"] for r in sizes) == n
    assert max(r["count"] for r in sizes) <= cap
    # worst-case pair count across all shards is bounded
    pairs = (
        sharded.alias("a")
        .join(
            sharded.alias("b"),
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.shard") == F.col("b.shard"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .count()
    )
    import math

    n_shards = math.ceil(n / cap)
    assert pairs <= n_shards * cap * (cap - 1) // 2
    # determinism: same input -> same shard assignment
    again = occupancy_shards(assigned, max_occupancy=cap)
    assert sharded.orderBy("vec_id").collect() == again.orderBy("vec_id").collect()
    # under-cap cluster keeps shard 0 for every member
    small = occupancy_shards(assigned.limit(cap), max_occupancy=cap)
    assert small.agg(F.max("shard")).first()[0] == 0


def test_blocklist_filter_no_preagg_shuffle(spark):
    """The blocklist hit test is a narrow JVM-side projection
    (arrays_overlap on a plan literal) — exactly one Exchange in the
    whole plan: the final small (source, lang) aggregate. No UDF, no
    join."""
    plan = _executed(_query(spark, "blocklist_filter_retention"))
    assert "arrays_overlap" in plan
    assert plan.count("Exchange") == 1, plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_quality_percentile_single_lang_shuffle(spark):
    """Per-language percent_rank: the corpus shuffles ONCE on lang
    for the window; the final per-lang aggregate piggybacks on that
    partitioning (no second corpus exchange). Feature extraction is
    narrow — no join back to the source."""
    plan = _executed(_query(spark, "quality_percentile_filter"))
    assert "Window" in plan
    assert "Join" not in plan, "lang must ride the projection, not a re-join"
    # one exchange for the lang window; the groupBy(lang) reuses it
    assert plan.count("Exchange") <= 2, plan


def test_recall_query_reuses_ivfpq_artifact_and_checkpointed_brute(spark):
    """knn_ivf_recall_at_k composes the three registered KNN queries;
    its value is certifying the CERTIFIED paths' recall, so it must
    (a) serve the IVFPQ codes from the durable artifact cache — zero
    builds once knn_ivf_pq_adc has ever run — and (b) pin the exact
    brute-force top-k once (localCheckpoint) instead of recomputing
    the full N x Q scoring for the second variant."""
    from streaming_data_lake_spark.plans import artifacts

    # Warm the artifact (first-ever run on this machine may build).
    _query(spark, "knn_ivf_pq_adc").count()
    m0 = artifacts.STATS["misses"]
    df = _query(spark, "knn_ivf_recall_at_k")
    rows = df.collect()
    assert artifacts.STATS["misses"] == m0, "recall query rebuilt the IVFPQ index"
    plan = _executed(df)
    assert "CartesianProduct" not in plan
    # Both variants present; recall in [0, 1]; IVF nprobe=1 cannot
    # beat exact search.
    by_variant: dict[str, list] = {}
    for r in rows:
        assert 0 <= r["n_hits"] <= 5 and 0.0 <= r["recall_at_k"] <= 1.0
        by_variant.setdefault(r["variant"], []).append(r)
    assert set(by_variant) == {"ivf_nprobe1", "ivfpq_nprobe2"}
    assert len(by_variant["ivf_nprobe1"]) == 50
    assert len(by_variant["ivfpq_nprobe2"]) == 10


def test_ivf_knn_join_does_not_reexpand_assignment(spark):
    """The cluster-pruned scoring join keys on a DERIVED column (the
    corpus side's argmax cluster assignment). With a plain `==` key
    the optimizer infers IsNotNull(cluster_id) and pushes it below
    the Project, re-expanding the whole interpreted argmax fold into
    the broadcast join's condition — the O(k·d) assignment ran twice
    per corpus row (r19 before-plan). The null-safe key suppresses
    that inference; this pins (a) no element_at/argmax tree inside
    any join condition, (b) the join still plans hash-based (never a
    filter-only nested-loop over the pair product)."""
    df = _query(spark, "knn_ivf_cosine")
    formatted = _formatted(df)
    saw_join_condition = False
    for line in formatted.splitlines():
        if "Join condition" in line:
            saw_join_condition = True
            assert "element_at(transform" not in line, (
                "assignment fold re-expanded into a join condition"
            )
    assert saw_join_condition, "expected at least one join-condition line"
    assert "BroadcastHashJoin" in _executed(df)


def test_threshold_levenshtein_equals_full_form(spark):
    """supplier_name_near_matches filters with the banded
    levenshtein(a, b, 1) (-1 above the bound) instead of the full
    levenshtein <= 1. Pin the equivalence on the edge cases the swap
    relies on: NULLs (both forms yield NULL -> dropped), empty
    strings, equality, distance exactly at and just above the bound,
    and a length gap that short-circuits the banded form."""
    from pyspark.sql import functions as F

    rows = [
        ("a", "a"), ("a", "b"), ("a", "ab"), ("ab", "a"), ("", ""),
        ("", "x"), ("", "xy"), ("abc", "axc"), ("abc", "xyz"),
        ("abc", "abcde"), ("abcdef", "abc"), (None, "a"), ("a", None),
        (None, None), ("Supplier#01", "Supplier#02"),
        ("Supplier#01", "Supplier#123"),
    ]
    df = spark.createDataFrame(rows, "l string, r string")
    full = df.select(
        "l", "r", (F.levenshtein("l", "r") <= 1).alias("keep"),
        F.levenshtein("l", "r").alias("d"),
    ).where("keep").select("l", "r", "d")
    banded = df.select(
        "l", "r", F.levenshtein("l", "r", 1).alias("d3"),
    ).where("d3 >= 0").select("l", "r", F.col("d3").alias("d"))
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, banded.collect())
    )
