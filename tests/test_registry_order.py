"""The driver certifies only the first 50 registered queries, so the
registry order IS part of the correctness contract. Round 11 executes
the rotation CHANGELOG_r10.md committed: the 26 r8-verdict names the
r10 window deferred (§"r11 drain") are stale-obligatory now and lead
the window, followed by the 5 r10-code-touched names the changelog
pinned for the free slots, this round's own 9 code-touched names, and
10 edge-sweep code-touched names. This module pins the r11 window AND
the committed r12 remainder (40 drain + 7 code-touched names at
positions 51-97), so
the next session cannot repeat the r8 rotation miss (VERDICT r8
"What's wrong" #1). tools/ledger.py cross-references every
CORRECTNESS_r*.json against this order (tests/test_ledger.py)."""

from __future__ import annotations

import os
import sys

from streaming_data_lake_spark.queries import all_queries

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import ledger  # noqa: E402

WINDOW = 50

# (a) The 26 queries whose latest driver verdict is round 8 — the
# committed r11 drain (CHANGELOG_r10.md §"r11 drain"). Every one went
# stale the moment CORRECTNESS_r10 landed; they take the first 26
# slots unconditionally.
R11_DRAIN = {
    "rollup_revenue_levels",
    "price_quantiles_by_flag",
    "user_event_gaps",
    "running_revenue_by_nation",
    "order_value_deciles",
    "doc_chunks_overlap",
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
    "top_busiest_hours",
    "repetition_signals",
    "benchmark_decontamination",
    "duplicate_rates_hourly",
    "user_rolling_7day_value",
    "consistent_hash_sample",
    "user_event_type_paths",
}

# (b) The 5 names the r10 review passes code-touched while they
# carried r9 verdicts — NULL-semantics oracle-text fixes + the
# versioned-append schema guard — committed to the r11 free slots by
# CHANGELOG_r10.md §"review pass 4".
R10_CODE_TOUCHED = {
    "events_clean",
    "events_rejected",
    "dedup_exact_text",
    "time_travel_read_v1",
    "snapshot_metadata",
}

# (c) Queries whose code changed in ROUND 11: the streaming replay
# harness moved fact-scale intermediates from driver-memory sinks to
# durable parquet sinks (VERDICT r10 "What's wrong" #1), and the
# upsert sink's batch key-collapse gained literal-column handling
# (ADVICE r10). Their r9/r10 verdicts certify the old sink path.
R11_ROUND_CODE_TOUCHED = {
    "streaming_clean_events",
    "streaming_interval_join_daily",
    "streaming_funnel_daily",
    "streaming_sessionize",
    "streaming_dedup_keys",
    "streaming_dedup_within_watermark",
    "streaming_upsert_hourly",
    "streaming_hll_daily_users",
    "streaming_cms_token_counts",
}

# (d) r11 edge-sweep code-touched: the embeddings admission contract
# (valid_vectors + DUCK_EMB oracle rewrites), the multimodal
# NULL-text/char-budget contract, and the clean-events event-time
# contract (ts IS NOT NULL — shared oracle fragment). Three of these
# were already windowed as r12 pre-drain fills; the other seven
# displaced the seven untouched fills (now in R12_DRAIN).
R11_EDGE_CODE_TOUCHED = {
    "semantic_dedup_centroid",
    "embedding_cosine_near_dups",
    "knn_ivf_materialized_cosine",
    "materialize_incremental_clean_events",
    "streaming_fanout_ingest",
    "multimodal_media_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    "embedding_label_stats",
    "embedding_int8_quantization",
}

MUST_BE_IN_WINDOW = (
    R11_DRAIN | R10_CODE_TOUCHED | R11_ROUND_CODE_TOUCHED | R11_EDGE_CODE_TOUCHED
)

# The committed r12 drain: the 40 r9-verdict names NOT certified in
# r11 — the 33 committed in CHANGELOG_r11.md "r12 drain" plus the 7
# pre-drain fills the edge-sweep rotation displaced. They go stale
# (age 3) the moment CORRECTNESS_r11 lands and MUST lead the r12
# window — positions 51-90 here so the r12 rotation is a pure list
# rotation.
R12_DRAIN = {
    "streaming_hourly_metrics",
    "pricing_summary",
    "minhash_lsh_near_dups",
    "dup_clusters_connected",
    "bucketed_colocated_join",
    "partition_pruned_scan",
    "schema_drift_check",
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
    "doc_fingerprints",
    "token_counts",
    "quality_scores",
    "lang_id_heuristic",
    "simhash_fingerprints",
    "schema_evolution_read",
    "blocklist_filter_retention",
    "quality_percentile_filter",
    "crossdoc_boilerplate_ngrams",
    "large_orders_having",
    "cube_device_day_metrics",
    "value_histogram_quantiles",
    "zorder_layout_keys",
    "topn_customers_per_nation",
    "event_counters_unpivot",
    "scd2_point_in_time_enrichment",
    "sql_over_views_adhoc",
    "seeded_dim_hierarchy_enrichment",
    "daily_distinct_users",
    "events_dedup_canonical",
}

# r12 code-touched commitment: the r11 edge sweep rewrote these
# oracles (DUCK_EMB admission) and engine paths (valid_vectors), but
# the r11 window had no free slots left; their r10 verdicts certify
# the pre-admission text. They MUST take r12 free slots, directly
# after the drain (positions 91-97).
R12_CODE_TOUCHED = {
    "knn_ivf_cosine",
    "knn_ivf_multiprobe_cosine",
    "knn_bruteforce_cosine",
    "knn_pq_adc_l2",
    "knn_ivf_pq_adc",
    "kmeans_train_centroids",
    "knn_ivf_trained_cosine",
    # time-keyed admission contract (second edge-sweep pass)
    "sliding_window_metrics",
    "asof_latest_view_before_purchase",
    "asof_view_within_6h",
}


def test_order_in_sync_and_window_covers_obligatory_drain():
    qs = all_queries()
    names = list(qs)
    assert len(names) == len(set(names))
    window = set(names[:WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_drain_plan():
    """The r11 window is exactly full — 26 + 5 + 9 + 10 with no
    filler — and the r12 obligations sit contiguously after it (the
    40-name drain at 51-90, the 7 code-touched commitments at 91-97)
    so the next rotation is mechanical."""
    assert len(MUST_BE_IN_WINDOW) == WINDOW
    names = list(all_queries())
    assert set(names[:WINDOW]) == MUST_BE_IN_WINDOW
    assert set(names[WINDOW : WINDOW + len(R12_DRAIN)]) == R12_DRAIN
    r12_ct = slice(WINDOW + len(R12_DRAIN), WINDOW + len(R12_DRAIN) + len(R12_CODE_TOUCHED))
    assert set(names[r12_ct]) == R12_CODE_TOUCHED
    # Groups pairwise disjoint — a silent overlap would make the
    # size check pass while the window holds fewer obligations.
    groups = [
        R11_DRAIN,
        R10_CODE_TOUCHED,
        R11_ROUND_CODE_TOUCHED,
        R11_EDGE_CODE_TOUCHED,
        R12_DRAIN,
        R12_CODE_TOUCHED,
    ]
    for i, g1 in enumerate(groups):
        for g2 in groups[i + 1 :]:
            assert not (g1 & g2), sorted(g1 & g2)


def test_r12_drain_fits_after_r11_lands():
    """Forward simulation: pretend CORRECTNESS_r11 lands all-green
    over this window. The resulting AGE-obligatory r12 set must be
    exactly R12_DRAIN — and drain + code-touched commitments fill
    the r12 window exactly. The simulation base is
    FROZEN at the r10 verdict state (later CORRECTNESS files are
    ignored) so the assertion stays meaningful — and green — after
    the real r11 verdict lands mid-/post-round."""
    verdicts = {
        name: v for name, v in ledger.load_verdicts().items() if v[0] <= 10
    }
    assert verdicts, "no verdicts at or before r10 — baseline moved?"
    order = list(all_queries())
    simulated = dict(verdicts)
    for name in order[:WINDOW]:
        simulated[name] = (11, True, "")
    due = {name for name, _rnd in ledger.plan_next(max_age=2, verdicts=simulated, order=order)}
    assert due == R12_DRAIN, (
        f"unexpected r12 obligatory set: extra={sorted(due - R12_DRAIN)} "
        f"missing={sorted(R12_DRAIN - due)}"
    )
    assert len(R12_DRAIN) + len(R12_CODE_TOUCHED) == WINDOW


def test_every_query_is_callable_and_oracle_typed():
    for name, q in all_queries().items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
