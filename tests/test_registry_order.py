"""The driver certifies only the first 50 registered queries, so the
registry order IS part of the correctness contract. Round 10 closes
the two-round certification DRAIN the r8 verdict mandated: the 26
r6-verdict names r9 deferred (CHANGELOG_r9.md §"r10 drain") are
stale-obligatory now and lead the window. This module pins the r10
window (26 drain + 10 r9-code-touched + 14 r11 pre-drain fills) AND
the committed r11 remainder (26 r8-verdict names at positions
51-76), so the next session cannot repeat the r8 rotation miss
(VERDICT r8 "What's wrong" #1). tools/ledger.py cross-references
every CORRECTNESS_r*.json against this order (tests/test_ledger.py)."""

from __future__ import annotations

import os
import sys

from streaming_data_lake_spark.queries import all_queries

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import ledger  # noqa: E402

WINDOW = 50

# (a) The 26 queries whose latest driver verdict is round 6 — the
# committed r10 drain (CHANGELOG_r9.md). Every one goes stale the
# moment CORRECTNESS_r09 lands; they take the first 26 slots
# unconditionally.
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

# (b) Queries whose observable behavior or oracle changed in the r9
# review passes, so their standing r8 verdicts certify code that no
# longer exists: the upsert/materializer/maintenance family (sidecar
# watermark store, compaction oracle rewrite) plus the four names
# ADVICE r9 explicitly flagged (sessionize start min-merge, fanout
# bid= sink layout, HLL null-key filter + linear-counting path).
R9_CODE_TOUCHED = {
    "streaming_upsert_hourly",
    "materialize_incremental_clean_events",
    "materialize_dim_change_repair",
    "materialize_funnel_exists_repair",
    "maintenance_compaction",
    "two_level_overlay_maintenance",
    "streaming_sessionize",
    "streaming_fanout_ingest",
    "streaming_hll_daily_users",
    "hll_distinct_users_daily",
}

# (c) r11 pre-drain: 14 of the 40 remaining r8-certified names
# (all 40 go stale at r11; these certify now so the r11 obligatory
# set is exactly the 26 below — a window that fits).
R11_PREDRAIN = {
    "streaming_clean_events",
    "streaming_cms_token_counts",
    "streaming_interval_join_daily",
    "streaming_funnel_daily",
    "kmeans_train_centroids",
    "knn_ivf_trained_cosine",
    "embedding_int8_quantization",
    "ngram_jaccard_near_dups",
    "winnowing_fingerprints",
    "exact_substring_dups",
    "dedup_keep_best_quality",
    "multimodal_resize",
    "pii_redaction",
    "event_quality_spine_hourly",
}

MUST_BE_IN_WINDOW = R10_DRAIN | R9_CODE_TOUCHED | R11_PREDRAIN

# The committed r11 drain: the 26 r8-verdict names NOT certified in
# r10. They go stale (age 3) the moment CORRECTNESS_r10 lands and
# MUST lead the r11 window — positions 51-76 here so the r11
# rotation is a pure list rotation, plus whatever r10 code changes
# touch (tracked in CHANGELOG_r10.md as they land).
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


# Queries whose ORACLE TEXT or adjacent behavior changed in r10 while
# carrying r9 verdicts (outputs on certified data verified unchanged):
# the NULL-semantics oracle fixes and the versioned-append schema
# guard. They MUST occupy r11 free slots next to R11_DRAIN so no
# verdict certifies a query that no longer exists (ADVICE r9 class).
R11_CODE_TOUCHED = {
    "events_clean",
    "events_rejected",
    "dedup_exact_text",
    "snapshot_metadata",
    "time_travel_read_v1",
}


def test_order_in_sync_and_window_covers_obligatory_drain():
    qs = all_queries()
    names = list(qs)
    assert len(names) == len(set(names))
    window = set(names[:WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_drain_plan():
    """The r10 window is exactly full — 26 + 10 + 14 with no filler —
    and the 26-name r11 remainder sits contiguously at 51-76 so the
    next rotation is mechanical."""
    assert len(MUST_BE_IN_WINDOW) == WINDOW
    names = list(all_queries())
    assert set(names[:WINDOW]) == MUST_BE_IN_WINDOW
    assert set(names[WINDOW : WINDOW + len(R11_DRAIN)]) == R11_DRAIN
    # Groups pairwise disjoint — a silent overlap would make the
    # size check pass while the window holds fewer obligations.
    groups = [R10_DRAIN, R9_CODE_TOUCHED, R11_PREDRAIN, R11_DRAIN]
    for i, g1 in enumerate(groups):
        for g2 in groups[i + 1 :]:
            assert not (g1 & g2), sorted(g1 & g2)


def test_r11_drain_fits_after_r10_lands():
    """Forward simulation: pretend CORRECTNESS_r10 lands all-green
    over this window. The resulting obligatory r11 set must be
    exactly R11_DRAIN — and it must leave 24 free slots for r10
    code-touched names and fresh pre-drain. The simulation base is
    FROZEN at the r9 verdict state (later CORRECTNESS files are
    ignored) so the assertion stays meaningful — and green — after
    the real r10 verdict lands mid-/post-round."""
    verdicts = {
        name: v for name, v in ledger.load_verdicts().items() if v[0] <= 9
    }
    assert verdicts, "no verdicts at or before r9 — baseline moved?"
    order = list(all_queries())
    simulated = dict(verdicts)
    for name in order[:WINDOW]:
        simulated[name] = (10, True, "")
    due = {name for name, _rnd in ledger.plan_next(max_age=2, verdicts=simulated, order=order)}
    assert due == R11_DRAIN, (
        f"unexpected r11 obligatory set: extra={sorted(due - R11_DRAIN)} "
        f"missing={sorted(R11_DRAIN - due)}"
    )
    assert len(R11_DRAIN) + 24 == WINDOW
    # The r10 code-touched names must fit the free slots with room
    # for fresh r12 pre-drain.
    assert not (R11_DRAIN & R11_CODE_TOUCHED)
    assert len(R11_DRAIN | R11_CODE_TOUCHED) <= WINDOW


def test_every_query_is_callable_and_oracle_typed():
    for name, q in all_queries().items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
