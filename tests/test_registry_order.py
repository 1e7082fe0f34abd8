"""The driver certifies only the first 50 registered queries, so the
registry order IS part of the correctness contract. Round 9 runs the
two-round certification DRAIN the r8 verdict mandates: 76 queries go
stale-obligatory when CORRECTNESS_r09 lands (38 r5 verdicts at age 4
plus 38 r6 verdicts aging out) against a 50-slot window. This module
pins BOTH halves of the drain — the r9 window (38 r5-stale + 12 r6)
and the committed r10 remainder (26 r6 names at positions 51-76) —
so the next session cannot repeat the r8 rotation miss (VERDICT r8
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

# (a) The 38 queries whose latest driver verdict is round 5 — every
# one already outside the ledger's max-age-2 policy (age 3 at r8).
# They are the entire reason round 9 exists and take the first 38
# window slots unconditionally.
R5_STALE = {
    "pricing_summary",
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
    "semantic_dedup_centroid",
    "minhash_lsh_near_dups",
    "embedding_cosine_near_dups",
    "dup_clusters_connected",
    "knn_ivf_materialized_cosine",
    "bucketed_colocated_join",
    "partition_pruned_scan",
}

# (b) Round-9 code change: snapshots hard-link unchanged partitions
# instead of copying whole table versions (sources/versioned.py) —
# the two certifying queries ride the new mechanism and must earn an
# r9 verdict on it.
VERSIONED_R9 = {"time_travel_read_v1", "snapshot_metadata"}

# (c) First half of the r6 drain: 10 foundational r6 names (base
# ingest, displaced-streaming debt from r7, catalog/SQL surface,
# core dedup). All 38 r6 verdicts go stale when r9 lands; these 10
# plus (b) certify now, the other 26 are the committed r10 window.
R6_PICKS = {
    "events_clean",
    "events_rejected",
    "streaming_hourly_metrics",
    "streaming_dedup_keys",
    "streaming_dedup_within_watermark",
    "sql_over_views_adhoc",
    "schema_drift_check",
    "seeded_dim_hierarchy_enrichment",
    "daily_distinct_users",
    "events_dedup_canonical",
}

MUST_BE_IN_WINDOW = R5_STALE | VERSIONED_R9 | R6_PICKS

# The committed r10 drain: the 26 r6-verdict names NOT certified in
# r9. They go stale (age 4) the moment CORRECTNESS_r09 lands and
# MUST lead the r10 window — positions 51-76 here so the r10
# rotation is a pure list rotation, plus the r9 code-touched
# upsert/materializer family (R10_CODE_TOUCHED) whose r8 verdicts
# predate this round's sidecar-cache/null-guard/stray-link changes.
R10_DRAIN = {
    "salted_skew_aggregation",
    "replicated_skew_join_rollup",
    "knn_ivf_cosine",
    "knn_ivf_multiprobe_cosine",
    "knn_bruteforce_cosine",
    "multimodal_media_features",
    "multimodal_frame_sample",
    "embedding_label_stats",
    "conditional_distinct_users",
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
    "cms_heavy_hitter_tokens",
    "token_budget_packing",
    "bloom_semi_join_prune",
    "knn_pq_adc_l2",
    "knn_ivf_pq_adc",
}

R10_CODE_TOUCHED = {
    "streaming_upsert_hourly",
    "materialize_incremental_clean_events",
    "materialize_dim_change_repair",
    "materialize_funnel_exists_repair",
    "maintenance_compaction",
    "two_level_overlay_maintenance",
}


def test_order_in_sync_and_window_covers_obligatory_drain():
    qs = all_queries()
    names = list(qs)
    assert len(names) == len(set(names))
    window = set(names[:WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_drain_plan():
    """The r9 window is exactly full — 38 + 2 + 10 with no filler —
    and the 26-name r10 remainder sits contiguously at 51-76 so the
    next rotation is mechanical."""
    assert len(MUST_BE_IN_WINDOW) == WINDOW
    names = list(all_queries())
    assert set(names[:WINDOW]) == MUST_BE_IN_WINDOW
    assert set(names[WINDOW : WINDOW + len(R10_DRAIN)]) == R10_DRAIN
    # Groups pairwise disjoint — a silent overlap would make the
    # size check pass while the window holds fewer obligations.
    groups = [R5_STALE, VERSIONED_R9, R6_PICKS, R10_DRAIN, R10_CODE_TOUCHED]
    for i, g1 in enumerate(groups):
        for g2 in groups[i + 1 :]:
            assert not (g1 & g2), sorted(g1 & g2)


def test_r10_drain_fits_after_r9_lands():
    """Forward simulation: pretend CORRECTNESS_r09 lands all-green
    over this window. The resulting obligatory r10 set must be
    exactly R10_DRAIN (the judge's arithmetic floor of 26) — and
    together with the r9 code-touched family it must fit in 50.
    This is the executable form of the two-round drain commitment
    (VERDICT r8 "Next round" #1-#2). The simulation base is FROZEN
    at the r8 verdict state (later CORRECTNESS files are ignored) so
    the assertion stays meaningful — and green — after the real r9
    verdict lands mid-/post-round."""
    verdicts = {
        name: v for name, v in ledger.load_verdicts().items() if v[0] <= 8
    }
    assert verdicts, "no verdicts at or before r8 — baseline moved?"
    order = list(all_queries())
    simulated = dict(verdicts)
    for name in order[:WINDOW]:
        simulated[name] = (9, True, "")
    due = {name for name, _rnd in ledger.plan_next(max_age=2, verdicts=simulated, order=order)}
    assert due == R10_DRAIN, (
        f"unexpected r10 obligatory set: extra={sorted(due - R10_DRAIN)} "
        f"missing={sorted(R10_DRAIN - due)}"
    )
    assert len(R10_DRAIN | R10_CODE_TOUCHED) <= WINDOW


def test_every_query_is_callable_and_oracle_typed():
    for name, q in all_queries().items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
