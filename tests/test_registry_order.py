"""The driver certifies only the first 50 registered queries, so the
registry order IS part of the correctness contract. Round 13 executes
the rotation CHANGELOG_r12.md committed (and the r12 revision of this
module pinned): the 26-name r10-verdict drain at positions 1-26,
`knn_ivf_recall_at_k` (registered r12, never certified) at 27, the 11
R12_ROUND_CODE_TOUCHED names at 28-38, and 12 oldest-r11 fills at
39-50 pre-draining the r14 cliff. This module pins the r13 window AND
the committed r14 drain (the 27 remaining r11-verdict names at
positions 51-77) with a forward simulation, so the next session
cannot repeat the r8 rotation miss (VERDICT r8 "What's wrong" #1).
tools/ledger.py cross-references every CORRECTNESS_r*.json against
this order (tests/test_ledger.py)."""

from __future__ import annotations

import os
import sys

from streaming_data_lake_spark.queries import all_queries

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import ledger  # noqa: E402

WINDOW = 50

# (a) The 26 queries whose latest driver verdict is round 10 — the
# committed r13 drain (CHANGELOG_r12.md §2; age 3 the moment
# CORRECTNESS_r12 landed). They take the first 26 slots
# unconditionally, and contain all nine late-r11 code-touched
# obligations from CHANGELOG_r11 §r12-notes #2.
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

# (b) Registered during r12, never certified — the ledger's
# pending-next-window grace (CHANGELOG_r12 §6) expires this round;
# its first driver verdict MUST land here (VERDICT r12 #2).
R12_NEW_QUERIES = ["knn_ivf_recall_at_k"]

# (c) Names code-touched DURING round 12 while carrying r11 verdicts
# (CHANGELOG_r12 §5/§12/§13): the multimodal skip-contract pair, four
# raw-events-finiteness names, five GEN-3 admission names. Committed
# to the r13 head by the r12 revision of this module.
R12_ROUND_CODE_TOUCHED = [
    "multimodal_resize",
    "multimodal_frame_sample",
    "batch_sessionize_windows",
    "streaming_sessionize",
    "streaming_upsert_hourly",
    "user_rolling_7day_value",
    "semantic_dedup_centroid",
    "embedding_cosine_near_dups",
    "knn_ivf_materialized_cosine",
    "embedding_label_stats",
    "embedding_int8_quantization",
]

# (d) The 12 free slots: oldest-verdict fills (all r11, ties broken
# by prior registry position — `tools/ledger.py --emit-order`),
# pre-draining the r14 cliff from 39 r11 tail names to 27.
R13_FILLS = [
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
]

MUST_BE_IN_WINDOW = (
    R13_DRAIN | set(R12_NEW_QUERIES) | set(R12_ROUND_CODE_TOUCHED) | set(R13_FILLS)
)

# The committed r14 drain: the 27 r11-verdict names the 12 r13 fills
# could NOT pre-drain. They go stale (age 3) the moment
# CORRECTNESS_r13 lands and MUST lead the r14 window — positions
# 51-77 here so the r14 rotation is a pure prefix rotation. r14 then
# has 23 free slots (VERDICT r12 #3: the cliff arithmetic as a test).
R14_DRAIN = {
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
    "consistent_hash_sample",
    "user_event_type_paths",
    "events_clean",
    "events_rejected",
    "dedup_exact_text",
    "time_travel_read_v1",
    "snapshot_metadata",
    "streaming_clean_events",
    "streaming_interval_join_daily",
    "streaming_funnel_daily",
    "streaming_dedup_keys",
    "streaming_dedup_within_watermark",
    "streaming_hll_daily_users",
    "streaming_cms_token_counts",
    "materialize_incremental_clean_events",
    "streaming_fanout_ingest",
    "multimodal_media_features",
}

# Names code-touched DURING round 13 while carrying sub-window (r12)
# verdicts — the time-edge admission contract (CHANGELOG_r13 §11)
# changed their engine filters and/or oracle texts. Every r13 session
# code-touch of a tail name MUST be appended here (they take r14 free
# slots directly after the drain). The eight R14_DRAIN names the same
# contract touched (events_clean/rejected, streaming_clean_events,
# streaming_fanout_ingest, materialize_incremental_clean_events,
# time_travel_read_v1, streaming_dedup_within_watermark,
# streaming_hll_daily_users) are already obligatory as drain members.
R13_ROUND_CODE_TOUCHED: list[str] = [
    "sql_over_views_adhoc",
    "scd2_point_in_time_enrichment",
    "daily_distinct_users",
    "event_counters_unpivot",
    "sliding_window_metrics",
    "streaming_hourly_metrics",
    # warehouse-date extension of the same contract (bucket-safe month)
    "monthly_nation_revenue",
]


def test_order_in_sync_and_window_covers_obligatory_drain():
    qs = all_queries()
    names = list(qs)
    assert len(names) == len(set(names))
    window = set(names[:WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_drain_plan():
    """The r13 window is exactly the committed composition — 26 drain
    + recall + 11 code-touched + 12 fills, in that block order — and
    the committed r14 drain sits contiguously after it (positions
    51-77) so the next rotation is mechanical."""
    assert len(MUST_BE_IN_WINDOW) == WINDOW
    names = list(all_queries())
    assert set(names[:WINDOW]) == MUST_BE_IN_WINDOW
    n_drain = len(R13_DRAIN)
    assert set(names[:n_drain]) == R13_DRAIN
    head = R12_NEW_QUERIES + R12_ROUND_CODE_TOUCHED + R13_FILLS
    assert names[n_drain:WINDOW] == head
    assert set(names[WINDOW : WINDOW + len(R14_DRAIN)]) == R14_DRAIN
    # r13-session code-touches sit contiguously after the r14 drain
    # so the r14 window (27 drain + these + fills) stays a prefix
    # rotation.
    ct = slice(WINDOW + len(R14_DRAIN), WINDOW + len(R14_DRAIN) + len(R13_ROUND_CODE_TOUCHED))
    assert names[ct] == R13_ROUND_CODE_TOUCHED
    assert len(R14_DRAIN) + len(R13_ROUND_CODE_TOUCHED) <= WINDOW, (
        "r14 window overflow: committed drain + r13 code-touches exceed 50"
    )
    # Groups pairwise disjoint — a silent overlap would make the
    # size check pass while the window holds fewer obligations.
    groups = [
        R13_DRAIN,
        set(R12_NEW_QUERIES),
        set(R12_ROUND_CODE_TOUCHED),
        set(R13_FILLS),
        R14_DRAIN,
        set(R13_ROUND_CODE_TOUCHED),
    ]
    for i, g1 in enumerate(groups):
        for g2 in groups[i + 1 :]:
            assert not (g1 & g2), sorted(g1 & g2)


def test_r14_drain_fits_after_r13_lands():
    """Forward simulation (VERDICT r12 #3, the r14 aging cliff as a
    failing test): pretend CORRECTNESS_r13 lands all-green over this
    window. The resulting AGE-obligatory r14 set must be exactly
    R14_DRAIN — 27 obligatory + 23 free slots. The simulation base is
    FROZEN at the r12 verdict state (later CORRECTNESS files are
    ignored) so the assertion stays meaningful — and green — after
    the real r13 verdict lands mid-/post-round."""
    verdicts = {
        name: v for name, v in ledger.load_verdicts().items() if v[0] <= 12
    }
    assert verdicts, "no verdicts at or before r12 — baseline moved?"
    order = list(all_queries())
    simulated = dict(verdicts)
    for name in order[:WINDOW]:
        simulated[name] = (13, True, "")
    due = {name for name, _rnd in ledger.plan_next(max_age=2, verdicts=simulated, order=order)}
    assert due == R14_DRAIN, (
        f"unexpected r14 obligatory set: extra={sorted(due - R14_DRAIN)} "
        f"missing={sorted(R14_DRAIN - due)}"
    )
    assert len(R14_DRAIN) <= WINDOW


def test_r13_window_has_no_never_certified_stragglers():
    """Every never-certified registry name must sit INSIDE the r13
    window — the pending-next-window grace covers exactly one round
    and expires with this verdict (CHANGELOG_r12 §6)."""
    verdicts = ledger.load_verdicts()
    order = list(all_queries())
    never = [n for n in order if n not in verdicts]
    outside = [n for n in never if n not in set(order[:WINDOW])]
    assert not outside, f"never-certified outside the r13 window: {outside}"


def test_every_query_is_callable_and_oracle_typed():
    for name, q in all_queries().items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
