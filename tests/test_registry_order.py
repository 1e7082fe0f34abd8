"""The driver certifies only the first 50 registered queries, so the
registry order IS part of the correctness contract: every query that
needs a round-7 verdict must sit inside the window, and the order
list must stay in exact sync with the registry. tools/ledger.py
additionally cross-references every CORRECTNESS_r*.json against this
order (tests/test_ledger.py)."""

from __future__ import annotations

from streaming_data_lake_spark.queries import all_queries

WINDOW = 50

# (a) Queries whose latest driver verdict is round 4 — stale under
# the ledger's max-age-2 rule the moment CORRECTNESS_r07 lands
# (VERDICT r6 "Next round" #1: 34 obligatory slots).
R4_STALE = {
    "rollup_revenue_levels",
    "price_quantiles_by_flag",
    "user_event_gaps",
    "running_revenue_by_nation",
    "order_value_deciles",
    "doc_chunks_overlap",
    "hll_distinct_users_daily",
    "kmeans_train_centroids",
    "knn_ivf_trained_cosine",
    "props_json_stats",
    "keyset_intersect_except",
    "orders_above_global_avg",
    "supplier_name_near_matches",
    "bigram_lm_quality",
    "domain_mixture_resample",
    "batch_sessionize_windows",
    "price_outliers_zscore",
    "lineitem_flag_pivot",
    "corr_quantity_price",
    "priority_window_profile",
    "tfidf_top_terms",
    "stratified_sample_by_lang",
    "pii_redaction",
    "repetition_signals",
    "benchmark_decontamination",
    "embedding_int8_quantization",
    "multimodal_resize",
    "dedup_keep_best_quality",
    "exact_substring_dups",
    "winnowing_fingerprints",
    "top_busiest_hours",
    "duplicate_rates_hourly",
    "event_quality_spine_hourly",
    "ngram_jaccard_near_dups",
}

# (b) Engine code changed in round 7: the sessionize port to the
# built-in session_window; the upsert-sink family over the overlay/
# merge changes (empty-batch no-op, recursive linking, layout-scoped
# kb drop); the materializer passes over the same overlay code; and
# compaction (two-level layout support).
CHANGED_R7 = {
    "streaming_sessionize",
    "streaming_upsert_hourly",
    "streaming_hll_daily_users",
    "streaming_cms_token_counts",
    "materialize_incremental_clean_events",
    "materialize_dim_change_repair",
    "materialize_funnel_exists_repair",
    "maintenance_compaction",
}

# (c) New queries this round — never seen by any driver run.
NEW_R7 = {
    "two_level_overlay_maintenance",
    "user_rolling_7day_value",
    "consistent_hash_sample",
    "user_event_type_paths",
}

# (d) Rest of the streaming family: the stream-source physical-schema
# cache keying (realpath) changed under all of them. Three members
# (hourly_metrics, dedup_keys, dedup_within_watermark) were displaced
# to 51+ by the NEW_R7 additions — they hold fresh r6 verdicts, ride
# only the cache-keying change, and lead the r8 rotation.
STREAMING_R7 = {
    "streaming_clean_events",
    "streaming_fanout_ingest",
    "streaming_interval_join_daily",
    "streaming_funnel_daily",
}

MUST_BE_IN_WINDOW = R4_STALE | CHANGED_R7 | NEW_R7 | STREAMING_R7


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
    groups = [R4_STALE, CHANGED_R7, NEW_R7, STREAMING_R7]
    for i, g1 in enumerate(groups):
        for g2 in groups[i + 1:]:
            assert not (g1 & g2), sorted(g1 & g2)


def test_every_query_is_callable_and_oracle_typed():
    for name, q in all_queries().items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
