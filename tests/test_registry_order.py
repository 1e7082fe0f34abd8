"""The driver certifies only the first 50 registered queries, so the
registry order IS part of the correctness contract: every query that
needs a round-6 verdict must sit inside the window, and the order
list must stay in exact sync with the registry. tools/ledger.py
additionally cross-references every CORRECTNESS_r*.json against this
order (tests/test_ledger.py)."""

from __future__ import annotations

from streaming_data_lake_spark.queries import all_queries

WINDOW = 50

# (a) Queries whose latest driver verdict is round 3 — stale under
# the ledger's max-age-2 rule the moment CORRECTNESS_r06 lands
# (VERDICT r5 "Next round" #1: ~the whole ballgame for round 6).
R3_STALE = {
    "time_travel_read_v1",
    "snapshot_metadata",
    "maintenance_compaction",
    "materialize_dim_change_repair",
    "materialize_funnel_exists_repair",
    "sql_over_views_adhoc",
    "seeded_dim_hierarchy_enrichment",
    "salted_skew_aggregation",
    "replicated_skew_join_rollup",
    "knn_ivf_cosine",
    "knn_ivf_multiprobe_cosine",
    "knn_bruteforce_cosine",
    "multimodal_media_features",
    "multimodal_frame_sample",
    "embedding_label_stats",
    "events_clean",
    "events_rejected",
    "daily_distinct_users",
    "conditional_distinct_users",
    "events_dedup_canonical",
    "user_engagement_ratios",
    "user_daily_landscape",
    "sliding_window_metrics",
    "latest_event_per_user_type",
    "interval_join_click_view",
    "funnel_conversion_daily",
    "value_distribution_by_class",
    "flag_distribution",
    "avg_value_spread",
    "funnel_leakage_daily",
    "asof_latest_view_before_purchase",
    "asof_view_within_6h",
}

# (b) r4-certified, but their modules took review-pass-4 crash-safety
# / plan fixes AFTER the verdict — ride on changed code until r6.
R4_POST_CERT_CHANGED = {
    "cms_heavy_hitter_tokens",
    "streaming_cms_token_counts",
    "token_budget_packing",
}

# (c) Code changed in round 6: bloom_condition's single-literal
# forall predicate; the pq_encode keep_cols / _adc_rank refactor.
CHANGED_R6 = {
    "bloom_semi_join_prune",
    "knn_pq_adc_l2",
}

# (d) New queries this round — never seen by any driver run.
NEW_R6 = {
    "knn_ivf_pq_adc",
    "schema_drift_check",
}

# (e) Streaming family: the round-6 replay-harness perf work and the
# TWS probe TTL ride under all of them (streaming_cms_token_counts
# is counted in (b)).
STREAMING_R6 = {
    "streaming_clean_events",
    "streaming_fanout_ingest",
    "streaming_interval_join_daily",
    "streaming_hourly_metrics",
    "streaming_dedup_keys",
    "streaming_dedup_within_watermark",
    "streaming_sessionize",
    "streaming_hll_daily_users",
    "streaming_funnel_daily",
    "streaming_upsert_hourly",
}

MUST_BE_IN_WINDOW = (
    R3_STALE
    | R4_POST_CERT_CHANGED
    | CHANGED_R6
    | NEW_R6
    | STREAMING_R6
    | {"materialize_incremental_clean_events"}
)


def test_order_in_sync_and_window_covers_uncertified_families():
    qs = all_queries()
    names = list(qs)
    assert len(names) == len(set(names))
    window = set(names[:WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_has_room_for_the_priority_sets():
    """Guard against silent displacement: the priority groups must
    fit in 50 — if a future round adds queries without rebalancing,
    this fails before the driver silently skips a query we claim is
    certified."""
    assert len(MUST_BE_IN_WINDOW) <= WINDOW
    # Groups must be pairwise disjoint (each name counted once) — a
    # silent overlap would make the size check pass while the window
    # holds fewer distinct obligations than the bookkeeping claims.
    groups = [R3_STALE, R4_POST_CERT_CHANGED, CHANGED_R6, NEW_R6, STREAMING_R6]
    for i, g1 in enumerate(groups):
        for g2 in groups[i + 1:]:
            assert not (g1 & g2), sorted(g1 & g2)


def test_every_query_is_callable_and_oracle_typed():
    for name, q in all_queries().items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
