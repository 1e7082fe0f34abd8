"""The driver certifies only the first 50 registered queries, so the
registry order IS part of the correctness contract: every query that
needs a round-5 verdict must sit inside the window, and the order
list must stay in exact sync with the registry. tools/ledger.py
additionally cross-references every CORRECTNESS_r*.json against this
order (tests/test_ledger.py)."""

from __future__ import annotations

from streaming_data_lake_spark.queries import all_queries

WINDOW = 50

# (a) Queries whose ONLY driver verdict is round 1 — three refactor
# waves stale (sketch refactor, durable artifact cache, float-parity
# waves). The round-4 verdict's top lead: re-certify all 19.
R1_ONLY = {
    "revenue_by_region",
    "top_nations_by_customers",
    "customers_with_orders",
    "customers_without_orders",
    "order_priority_rollup",
    "monthly_nation_revenue",
    "priority_decode_rollup",
    "scd2_current_enrichment",
    "top_tokens",
    "like_pattern_source_classes",
    "nested_double_unnest_roundtrip",
    "currency_normalized_revenue",
    "range_band_pricing",
    "dedup_exact_text",
    "doc_fingerprints",
    "token_counts",
    "quality_scores",
    "lang_id_heuristic",
    "simhash_fingerprints",
}

# (b) Certified in round 3, then their scratch-dir lifetime changed
# in round 4 (checkpoint dirs atexit-cleaned) without a driver re-run.
STREAM_R4_TOUCHED = {
    "streaming_clean_events",
    "streaming_fanout_ingest",
    "streaming_interval_join_daily",
    "streaming_hourly_metrics",
    "streaming_dedup_keys",
    "streaming_dedup_within_watermark",
}

# (d) Physical path changed in round 5: the sessionize dispatch
# (transformWithState preferred when protobuf exists), the SemDeDup
# occupancy guard, and the durable-artifact readers whose cache keys
# changed (per-user cache root; PAIRS_GEN now in signature params).
# Letters match queries/__init__._CERTIFICATION_ORDER's markers.
CHANGED_R5 = {
    "streaming_sessionize",
    "semantic_dedup_centroid",
    "minhash_lsh_near_dups",
    "embedding_cosine_near_dups",
    "dup_clusters_connected",
    "knn_ivf_materialized_cosine",
    "bucketed_colocated_join",
    "partition_pruned_scan",
}

# (c) New queries this round — never seen by any driver run.
NEW_R5 = {
    # first wave
    "schema_evolution_read",
    "blocklist_filter_retention",
    "quality_percentile_filter",
    # second wave
    "crossdoc_boilerplate_ngrams",
    "bloom_semi_join_prune",
    "large_orders_having",
    "cube_device_day_metrics",
    "value_histogram_quantiles",
    "zorder_layout_keys",
    "topn_customers_per_nation",
    "knn_pq_adc_l2",
    "event_counters_unpivot",
    "scd2_point_in_time_enrichment",
}

MUST_BE_IN_WINDOW = (
    R1_ONLY
    | STREAM_R4_TOUCHED
    | CHANGED_R5
    | NEW_R5
    | {
        "pricing_summary",
        "streaming_funnel_daily",
        "streaming_upsert_hourly",
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
    # Groups must be pairwise disjoint (each name counted once) — a
    # silent overlap would make the size check pass while the window
    # holds fewer distinct obligations than the bookkeeping claims.
    groups = [R1_ONLY, STREAM_R4_TOUCHED, CHANGED_R5, NEW_R5]
    for i, g1 in enumerate(groups):
        for g2 in groups[i + 1:]:
            assert not (g1 & g2), sorted(g1 & g2)


def test_every_query_is_callable_and_oracle_typed():
    for name, q in all_queries().items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
