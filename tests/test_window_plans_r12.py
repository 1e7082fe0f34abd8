"""Plan-shape guards for the r12 certification window queries that
had none (31 of 50 predated the plan-guard discipline). Each guard
asserts the property that matters at 100 TB — broadcast dim joins,
top-k pushdown instead of global sorts, two-phase aggregation,
single-shuffle dedup, no cartesian anywhere in the KNN ladder —
pinned from the audited plans (CHANGELOG_r12 §11)."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _executed(spark, name) -> str:
    from streaming_data_lake_spark.queries import all_queries

    df = all_queries()[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_topk_queries_use_take_ordered_not_global_sort(spark):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-
    partition top-k + driver merge of k rows), never a global sort of
    the full aggregate output."""
    for name in ("top_nations_by_customers", "top_tokens", "sql_over_views_adhoc"):
        plan = _executed(spark, name)
        assert "TakeOrderedAndProject" in plan, name


def test_dim_joins_broadcast(spark):
    """Dimension-sized join sides must broadcast: a SortMergeJoin
    against a 25-row nation table would shuffle the fact side for
    nothing. (AQE can only fix this after a shuffle exists; the plan
    should never produce one.)"""
    for name in (
        "monthly_nation_revenue",
        "scd2_current_enrichment",
        "currency_normalized_revenue",
        "seeded_dim_hierarchy_enrichment",
        "top_nations_by_customers",
    ):
        plan = _executed(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_exists_queries_compile_to_semi_anti_joins(spark):
    """EXISTS / NOT EXISTS must stay hash semi/anti joins — never a
    count-then-filter or a full outer shape."""
    plan = _executed(spark, "customers_with_orders")
    assert "LeftSemi" in plan
    plan = _executed(spark, "customers_without_orders")
    assert "LeftAnti" in plan


def test_knn_ladder_no_cartesian_topk_pushed(spark):
    """The windowed KNN ladder: candidate generation is either a
    broadcast of the SMALL side (queries / one-row codebook) or an
    equi-join on cluster_id — never CartesianProduct — and the
    rank<=k filter is pushed into the window operator
    (WindowGroupLimit, Spark 4's top-k pushdown) so no partition ever
    materializes a full ranking."""
    for name in (
        "knn_bruteforce_cosine",
        "knn_ivf_cosine",
        "knn_ivf_multiprobe_cosine",
        "knn_ivf_trained_cosine",
        "knn_pq_adc_l2",
    ):
        plan = _executed(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "WindowGroupLimit" in plan, name


def test_count_distinct_is_two_phase(spark):
    """COUNT(DISTINCT user_id) per day must run as the two-shuffle
    expand/partial plan (dedup keys map-side first), not a single
    global aggregation."""
    plan = _executed(spark, "daily_distinct_users")
    assert plan.count("HashAggregate") >= 4
    assert "partial" in plan


def test_dedup_canonicalization_single_shuffle(spark):
    """Keyed canonicalization (min_by family) needs exactly ONE
    exchange: hash-partition by the dedup key, map-side partial
    collapse before it."""
    plan = _executed(spark, "events_dedup_canonical")
    assert plan.count("Exchange") == 1
    assert "partial" in plan


def test_sliding_window_single_shuffle_via_expand(spark):
    """The HOP window materializes slide assignments with Expand and
    aggregates with ONE keyed shuffle — not one pass per window
    offset. r20 reverted the r19 spread before the ×5 Expand (the
    driver bench measured it +57% and the r20 interleaved A/B agreed:
    the Expand feeds a map-side partial aggregate that collapses rows
    before the exchange, so pre-shuffling raw events buys nothing),
    so the plan is back to exactly ONE exchange total — the keyed
    aggregation one."""
    plan = _executed(spark, "sliding_window_metrics")
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange") == 1


def test_asof_join_no_nested_loop(spark):
    """The tolerance-bounded as-of join must stay a sort/window
    composition over co-partitioned inputs — no CartesianProduct, no
    broadcast nested loop over fact-scale rows."""
    plan = _executed(spark, "asof_view_within_6h")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_agg_is_two_phase_with_salt_exchange(spark):
    """salted_skew_aggregation (r13 window): the first Exchange must
    partition on (event_type, __salt) — the hot-key fan-out that is
    the operator's whole point — followed by a combine Exchange on
    the bare key. Exactly these two shuffles, no join."""
    plan = _executed(spark, "salted_skew_aggregation")
    assert "Exchange hashpartitioning(event_type" in plan
    assert "__salt" in plan.split("Exchange")[2], (
        "salt column missing from the partial-aggregate shuffle"
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "Join" not in plan


def test_replicated_skew_join_shuffles_on_salted_key(spark):
    """replicated_skew_join_rollup (r13 window): the join must be a
    ShuffledHashJoin keyed on (segment_id, __salt) — the fact side
    spread across the 8 salts. Without the shuffle_hash hint the
    optimizer broadcast the FACT projection at test scale (stats-less
    ExistingRDD dim), certifying a plan the operator never produces
    at 100 TB."""
    plan = _executed(spark, "replicated_skew_join_rollup")
    assert "ShuffledHashJoin [segment_id" in plan
    assert "__salt" in plan.split("ShuffledHashJoin")[1].splitlines()[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" not in plan
