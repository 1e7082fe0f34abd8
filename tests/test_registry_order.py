"""The driver certifies only the first 50 registered queries, so the
registry order IS part of the correctness contract: every query that
needs a round-4 verdict must sit inside the window, and the order
list must stay in exact sync with the registry."""

from __future__ import annotations

from streaming_data_lake_spark.queries import all_queries

WINDOW = 50

# (a) New in round 4 — never seen by any driver run.
NEW_R4 = {
    "rollup_revenue_levels",
    "price_quantiles_by_flag",
    "user_event_gaps",
    "running_revenue_by_nation",
    "order_value_deciles",
    "doc_chunks_overlap",
    "semantic_dedup_centroid",
    "hll_distinct_users_daily",
    "cms_heavy_hitter_tokens",
    "kmeans_train_centroids",
    "knn_ivf_trained_cosine",
    "props_json_stats",
    "keyset_intersect_except",
    "orders_above_global_avg",
    "supplier_name_near_matches",
    "streaming_hll_daily_users",
    "streaming_cms_token_counts",
    "bigram_lm_quality",
    "domain_mixture_resample",
    "batch_sessionize_windows",
    "price_outliers_zscore",
    "lineitem_flag_pivot",
    "corr_quantity_price",
    "priority_window_profile",
}

# (b) Registered after position 50 in round 3 — no driver verdict yet.
NEVER_CERTIFIED = {
    "tfidf_top_terms",
    "dup_clusters_connected",
    "stratified_sample_by_lang",
    "token_budget_packing",
    "pii_redaction",
    "repetition_signals",
    "benchmark_decontamination",
    "embedding_int8_quantization",
    "multimodal_resize",
    "dedup_keep_best_quality",
    "knn_ivf_materialized_cosine",
    "exact_substring_dups",
    "winnowing_fingerprints",
}

# (c) Physical read path changed in round 4 (durable artifact cache /
# shingle materialization) — certified before, needs re-certification.
CHANGED_R4 = {
    "minhash_lsh_near_dups",
    "embedding_cosine_near_dups",
    "bucketed_colocated_join",
    "top_busiest_hours",
    "partition_pruned_scan",
    "duplicate_rates_hourly",
    "event_quality_spine_hourly",
    "ngram_jaccard_near_dups",
}

MUST_BE_IN_WINDOW = (
    NEW_R4
    | NEVER_CERTIFIED
    | CHANGED_R4
    | {
        "pricing_summary",
        "streaming_funnel_daily",
        "streaming_sessionize",
        "materialize_incremental_clean_events",
    }
)


def test_order_in_sync_and_window_covers_uncertified_families():
    qs = all_queries()
    names = list(qs)
    assert len(names) == len(set(names))
    window = set(names[:WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_has_room_for_the_priority_sets():
    """Guard against silent displacement: the three priority groups
    plus the flagship must fit in 50 with the remaining slots going
    to explicitly chosen high-risk fillers — if a future round adds
    queries without rebalancing, this fails before the driver
    silently skips a query we claim is certified."""
    assert len(MUST_BE_IN_WINDOW) <= WINDOW
    # Groups must be disjoint (each name counted once).
    assert not (NEW_R4 & NEVER_CERTIFIED)
    assert not (NEW_R4 & CHANGED_R4)
    assert not (NEVER_CERTIFIED & CHANGED_R4)


def test_every_query_is_callable_and_oracle_typed():
    for name, q in all_queries().items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
