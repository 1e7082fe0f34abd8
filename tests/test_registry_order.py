"""The driver certifies only the first 50 registered queries, so the
registry order IS part of the correctness contract: every family the
round-1 run could not score must sit inside the window, and the order
list must stay in exact sync with the registry."""

from __future__ import annotations

from streaming_data_lake_spark.queries import all_queries

WINDOW = 50

# Round-4 window priorities: the new queries, the round-2/3
# additions that have never received a driver verdict, and
# representatives of the paths whose physical layout changed this
# round (durable artifact cache).
MUST_BE_IN_WINDOW = {
    # new in round 4
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
    # never driver-certified (registered 51+ in round 3)
    "tfidf_top_terms",
    "dup_clusters_connected",
    "knn_ivf_materialized_cosine",
    "exact_substring_dups",
    "winnowing_fingerprints",
    # physical read path changed in round 4
    "minhash_lsh_near_dups",
    "embedding_cosine_near_dups",
    "bucketed_colocated_join",
    "top_busiest_hours",
    "partition_pruned_scan",
    # standing high-risk block
    "streaming_funnel_daily",
    "streaming_sessionize",
    "materialize_incremental_clean_events",
}


def test_order_in_sync_and_window_covers_uncertified_families():
    qs = all_queries()
    names = list(qs)
    assert len(names) == len(set(names))
    window = set(names[:WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_every_query_is_callable_and_oracle_typed():
    for name, q in all_queries().items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
