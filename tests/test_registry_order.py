"""The driver certifies only the first 50 registered queries, so the
registry order IS part of the correctness contract. Round 12 executes
the rotation CHANGELOG_r11.md committed, with ZERO free slots: the
40-name drain (33 committed in CHANGELOG_r11 "r12 drain" + the 7
displaced pre-drain fills — all r9 verdicts, age 3 the moment
CORRECTNESS_r11 landed) at positions 1-40, then the 10 r12
code-touched commitments (7 KNN/kmeans DUCK_EMB oracle rewrites + the
time-keyed admission trio) at 41-50. This module pins the r12 window
AND the committed r13 drain (the 26 r10-verdict names at positions
51-76, which CONTAINS all nine late-r11 code-touched obligations from
CHANGELOG_r11 §r12-notes #2), so the next session cannot repeat the
r8 rotation miss (VERDICT r8 "What's wrong" #1). tools/ledger.py
cross-references every CORRECTNESS_r*.json against this order
(tests/test_ledger.py)."""

from __future__ import annotations

import os
import sys

from streaming_data_lake_spark.queries import all_queries

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import ledger  # noqa: E402

WINDOW = 50

# (a) The 40 queries whose latest driver verdict is round 9 — the
# committed r12 drain (CHANGELOG_r11.md §"r12 drain" 33 names + the 7
# pre-drain fills the r11 edge-sweep rotation displaced). Every one
# went stale the moment CORRECTNESS_r11 landed; they take the first
# 40 slots unconditionally.
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

# (b) r12 code-touched commitment: the r11 edge sweep rewrote these
# oracles (DUCK_EMB admission) and engine paths (valid_vectors /
# ts IS NOT NULL) while they carried r10 verdicts, and the r11 window
# had no free slots left. They take the 10 free r12 slots, directly
# after the drain (positions 41-50).
R12_CODE_TOUCHED = {
    "knn_ivf_cosine",
    "knn_ivf_multiprobe_cosine",
    "knn_bruteforce_cosine",
    "knn_pq_adc_l2",
    "knn_ivf_pq_adc",
    "kmeans_train_centroids",
    "knn_ivf_trained_cosine",
    "sliding_window_metrics",
    "asof_latest_view_before_purchase",
    "asof_view_within_6h",
}

MUST_BE_IN_WINDOW = R12_DRAIN | R12_CODE_TOUCHED

# The committed r13 drain: the 26 names whose latest verdict is r10
# and which the r12 window cannot hold (it is exactly full). They go
# stale (age 3) the moment CORRECTNESS_r12 lands and MUST lead the
# r13 window — positions 51-76 here so the r13 rotation is a pure
# list rotation. r13 then has 24 free slots.
R13_DRAIN = {
    "salted_skew_aggregation",
    "replicated_skew_join_rollup",
    "conditional_distinct_users",
    "user_engagement_ratios",
    "user_daily_landscape",
    "latest_event_per_user_type",
    "interval_join_click_view",
    "funnel_conversion_daily",
    "value_distribution_by_class",
    "flag_distribution",
    "avg_value_spread",
    "funnel_leakage_daily",
    "cms_heavy_hitter_tokens",
    "token_budget_packing",
    "bloom_semi_join_prune",
    "materialize_dim_change_repair",
    "materialize_funnel_exists_repair",
    "maintenance_compaction",
    "two_level_overlay_maintenance",
    "hll_distinct_users_daily",
    "ngram_jaccard_near_dups",
    "winnowing_fingerprints",
    "exact_substring_dups",
    "dedup_keep_best_quality",
    "pii_redaction",
    "event_quality_spine_hourly",
}

# Names code-touched DURING round 12 while carrying r11 verdicts —
# they cannot enter the exactly-full r12 window, so they take r13
# free slots directly after the drain (positions 77+). Every r12
# session code-touch of a tail name MUST be appended here.
R12_ROUND_CODE_TOUCHED = [
    # stub decoders gained the undecodable-payload skip contract
    # (ADVICE r11; operators/multimodal.py resize_media+sample_frames)
    "multimodal_resize",
    "multimodal_frame_sample",
    # raw-events finiteness contract (parity.finite + isfinite oracle
    # text; r12 nonfinite-sweep findings). The other 14 touched names
    # sit in the r12 window or the R13_DRAIN, both already obligatory.
    "batch_sessionize_windows",
    "streaming_sessionize",
    "streaming_upsert_hourly",
    "user_rolling_7day_value",
    # GEN-3 similarity admission: non-finite-element exclusion
    # (valid_vectors + DUCK_VALID_VEC + artifact-key GEN bump). The
    # 7 windowed KNN/kmeans names absorb the same change in r12.
    "semantic_dedup_centroid",
    "embedding_cosine_near_dups",
    "knn_ivf_materialized_cosine",
    "embedding_label_stats",
    "embedding_int8_quantization",
]

# Queries REGISTERED during round 12 (never certified): the r12
# window has zero free slots, so they park directly after the
# r12-code-touched block — inside the committed r13 window and inside
# ledger.audit's pending-next-window region (positions 51-100).
R12_NEW_QUERIES = [
    "knn_ivf_recall_at_k",  # ANN recall accounting (VERDICT r11 #6)
]

# The nine late-r11 code-touched names carrying r10 verdicts that
# CHANGELOG_r11 §r12-notes #2 obligates for r13. All nine are age-due
# at r13 anyway; test_r13_obligations_inside_drain proves the window
# arithmetic instead of trusting the prose.
R13_CODE_TOUCHED_OBLIGATIONS = {
    "ngram_jaccard_near_dups",
    "exact_substring_dups",
    "winnowing_fingerprints",
    "materialize_dim_change_repair",
    "materialize_funnel_exists_repair",
    "two_level_overlay_maintenance",
    "replicated_skew_join_rollup",
    "event_quality_spine_hourly",
    "maintenance_compaction",
}


def test_order_in_sync_and_window_covers_obligatory_drain():
    qs = all_queries()
    names = list(qs)
    assert len(names) == len(set(names))
    window = set(names[:WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_drain_plan():
    """The r12 window is exactly full — 40 drain + 10 code-touched
    with no filler — and the r13 drain sits contiguously after it
    (positions 51-76) so the next rotation is mechanical."""
    assert len(MUST_BE_IN_WINDOW) == WINDOW
    names = list(all_queries())
    assert set(names[:WINDOW]) == MUST_BE_IN_WINDOW
    assert set(names[: len(R12_DRAIN)]) == R12_DRAIN
    assert set(names[len(R12_DRAIN) : WINDOW]) == R12_CODE_TOUCHED
    assert set(names[WINDOW : WINDOW + len(R13_DRAIN)]) == R13_DRAIN
    # r12-session code-touches and new registrations sit contiguously
    # after the drain so the r13 window (26 drain + these + fills) is
    # a prefix rotation — and new names stay inside ledger.audit's
    # pending-next-window region.
    r13_head = R12_ROUND_CODE_TOUCHED + R12_NEW_QUERIES
    ct = slice(WINDOW + len(R13_DRAIN), WINDOW + len(R13_DRAIN) + len(r13_head))
    assert names[ct] == r13_head
    assert len(R13_DRAIN) + len(r13_head) <= WINDOW, (
        "r13 window overflow: committed drain + r12 code-touches + new queries exceed 50"
    )
    # Groups pairwise disjoint — a silent overlap would make the
    # size check pass while the window holds fewer obligations.
    groups = [
        R12_DRAIN,
        R12_CODE_TOUCHED,
        R13_DRAIN,
        set(R12_ROUND_CODE_TOUCHED),
        set(R12_NEW_QUERIES),
    ]
    for i, g1 in enumerate(groups):
        for g2 in groups[i + 1 :]:
            assert not (g1 & g2), sorted(g1 & g2)


def test_r13_drain_fits_after_r12_lands():
    """Forward simulation: pretend CORRECTNESS_r12 lands all-green
    over this window. The resulting AGE-obligatory r13 set must be
    exactly R13_DRAIN — 26 obligatory + 24 free slots. The simulation
    base is FROZEN at the r11 verdict state (later CORRECTNESS files
    are ignored) so the assertion stays meaningful — and green —
    after the real r12 verdict lands mid-/post-round."""
    verdicts = {
        name: v for name, v in ledger.load_verdicts().items() if v[0] <= 11
    }
    assert verdicts, "no verdicts at or before r11 — baseline moved?"
    order = list(all_queries())
    simulated = dict(verdicts)
    for name in order[:WINDOW]:
        simulated[name] = (12, True, "")
    due = {name for name, _rnd in ledger.plan_next(max_age=2, verdicts=simulated, order=order)}
    expected = R13_DRAIN | set(R12_NEW_QUERIES)  # never-certified is always due
    assert due == expected, (
        f"unexpected r13 obligatory set: extra={sorted(due - expected)} "
        f"missing={sorted(expected - due)}"
    )
    assert len(expected) <= WINDOW


def test_r13_obligations_inside_drain():
    """The nine late-r11 code-touched names (r10 verdicts, no r11/r12
    slot) MUST land in the r13 window. They are a subset of the
    age-due drain, so the obligation is automatic — this pins it as a
    failing-if-violated fact (VERDICT r11 "Next round" #3) instead of
    a changelog note."""
    assert R13_CODE_TOUCHED_OBLIGATIONS <= R13_DRAIN, sorted(
        R13_CODE_TOUCHED_OBLIGATIONS - R13_DRAIN
    )


def test_every_query_is_callable_and_oracle_typed():
    for name, q in all_queries().items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
