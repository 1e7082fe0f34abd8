"""The driver certifies only the first 50 registered queries, so the
registry order IS part of the correctness contract. Round 16 executes
the rotation CHANGELOG_r15.md committed (and the r15 revision of this
module pinned) — the 27-name r13-verdict drain at positions 1-27, the
15 R15_ROUND_CODE_TOUCHED names at 28-42, and 8 free slots at 43-50
(the 2 names this round's PLANNED code-touches hit — ADVICE r15's
cycle-flock OSError fd-leak fix in plans/materialize.py and the
renameat2 ctypes resolve-once refactor in overlay.py — lead the fills
so post-touch code is certified THIS round, then 6 oldest-r14 fills
pre-drain the r17 cliff from 35 to 29). This module pins the r16
window AND the committed r17 drain (the 29 remaining r14-verdict
names at positions 51-79) with a forward simulation, so the next
session cannot repeat the r8 rotation miss (VERDICT r8 "What's wrong"
#1). tools/ledger.py cross-references every CORRECTNESS_r*.json
against this order (tests/test_ledger.py)."""

from __future__ import annotations

import os
import sys

from streaming_data_lake_spark.queries import all_queries

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import ledger  # noqa: E402

WINDOW = 50

# (a) The 27 queries whose latest driver verdict is round 13 — the
# committed r16 drain (CHANGELOG_r15.md; age 3 the moment
# CORRECTNESS_r15 landed). They take the first 27 slots
# unconditionally.
R16_DRAIN = {
    "funnel_leakage_daily",
    "cms_heavy_hitter_tokens",
    "token_budget_packing",
    "bloom_semi_join_prune",
    "materialize_funnel_exists_repair",
    "maintenance_compaction",
    "hll_distinct_users_daily",
    "winnowing_fingerprints",
    "exact_substring_dups",
    "dedup_keep_best_quality",
    "event_quality_spine_hourly",
    "multimodal_resize",
    "multimodal_frame_sample",
    "batch_sessionize_windows",
    "streaming_sessionize",
    "streaming_upsert_hourly",
    "user_rolling_7day_value",
    "rollup_revenue_levels",
    "price_quantiles_by_flag",
    "user_event_gaps",
    "running_revenue_by_nation",
    "order_value_deciles",
    "props_json_stats",
    "keyset_intersect_except",
    "orders_above_global_avg",
    "supplier_name_near_matches",
    "domain_mixture_resample",
}

# (b) Names code-touched DURING round 15 while carrying r14 verdicts
# (the Java-\s vs RE2-\s \x0B whitespace-class spell-out across every
# tokenization/ingest consumer, the per-table MERGE flock behind the
# streaming sketches, the all-NULL concat_ws oracle coalesce).
# Committed to the r16 head by the r15 revision of this module.
R15_ROUND_CODE_TOUCHED = [
    "events_clean",
    "streaming_clean_events",
    "materialize_incremental_clean_events",
    "streaming_fanout_ingest",
    "streaming_cms_token_counts",
    "streaming_hll_daily_users",
    "tfidf_top_terms",
    "token_counts",
    "top_tokens",
    "doc_fingerprints",
    "quality_scores",
    "lang_id_heuristic",
    "repetition_signals",
    "benchmark_decontamination",
    "user_event_type_paths",
]

# (c) The 8 free slots. The first 2 are the r15-verdict names this
# round's PLANNED code-touches hit, placed in the window with
# foresight so their post-touch code earns a fresh verdict THIS round
# instead of burdening r17 (the r15 precedent): ADVICE r15's
# cycle-flock OSError handler fix lands in plans/materialize.py
# (serving materialize_dim_change_repair) and the renameat2 ctypes
# resolve-once refactor lands in overlay.py (serving
# two_level_overlay_maintenance). Then 6 oldest-r14 fills (ties by
# prior registry position — `tools/ledger.py --emit-order`),
# pre-draining the r17 cliff from 35 r14 tail names to 29.
R16_FILLS = [
    "materialize_dim_change_repair",
    "two_level_overlay_maintenance",
    "price_outliers_zscore",
    "lineitem_flag_pivot",
    "corr_quantity_price",
    "priority_window_profile",
    "stratified_sample_by_lang",
    "top_busiest_hours",
]

MUST_BE_IN_WINDOW = R16_DRAIN | set(R15_ROUND_CODE_TOUCHED) | set(R16_FILLS)

# The committed r17 drain: the 29 r14-verdict names the 8 r16 fills
# could NOT pre-drain. They go stale (age 3) the moment
# CORRECTNESS_r16 lands and MUST lead the r17 window — positions
# 51-79 here so the r17 rotation is a pure prefix rotation. r17 then
# has 21 free slots for the r15 block (48 tail names, stale at r18).
# The cliff arithmetic stays a test.
R17_DRAIN = {
    "duplicate_rates_hourly",
    "consistent_hash_sample",
    "events_rejected",
    "dedup_exact_text",
    "time_travel_read_v1",
    "snapshot_metadata",
    "streaming_interval_join_daily",
    "streaming_funnel_daily",
    "streaming_dedup_keys",
    "streaming_dedup_within_watermark",
    "multimodal_media_features",
    "sql_over_views_adhoc",
    "scd2_point_in_time_enrichment",
    "daily_distinct_users",
    "event_counters_unpivot",
    "sliding_window_metrics",
    "streaming_hourly_metrics",
    "monthly_nation_revenue",
    "revenue_by_region",
    "top_nations_by_customers",
    "customers_with_orders",
    "customers_without_orders",
    "order_priority_rollup",
    "priority_decode_rollup",
    "scd2_current_enrichment",
    "like_pattern_source_classes",
    "nested_double_unnest_roundtrip",
    "currency_normalized_revenue",
    "range_band_pricing",
}

# Names code-touched DURING round 16 while carrying sub-window
# verdicts. Every r16 session code-touch of a tail name MUST be
# appended here (they take r17 free slots directly after the drain).
# The planned touches (materialize cycle-flock fix, renameat2
# refactor) were pre-placed inside the window via R16_FILLS; this
# list holds unplanned mid-round finds only.
R16_ROUND_CODE_TOUCHED: list[str] = []


def test_order_in_sync_and_window_covers_obligatory_drain():
    qs = all_queries()
    names = list(qs)
    assert len(names) == len(set(names))
    window = set(names[:WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_drain_plan():
    """The r16 window is exactly the committed composition — 27 drain
    + 15 code-touched + 8 fills, in that block order — and the
    committed r17 drain sits contiguously after it (positions 51-79)
    so the next rotation is mechanical."""
    assert len(MUST_BE_IN_WINDOW) == WINDOW
    names = list(all_queries())
    assert set(names[:WINDOW]) == MUST_BE_IN_WINDOW
    n_drain = len(R16_DRAIN)
    assert set(names[:n_drain]) == R16_DRAIN
    head = R15_ROUND_CODE_TOUCHED + R16_FILLS
    assert names[n_drain:WINDOW] == head
    assert set(names[WINDOW : WINDOW + len(R17_DRAIN)]) == R17_DRAIN
    # r16-session code-touches sit contiguously after the r17 drain
    # so the r17 window (29 drain + these + fills) stays a prefix
    # rotation.
    ct = slice(WINDOW + len(R17_DRAIN), WINDOW + len(R17_DRAIN) + len(R16_ROUND_CODE_TOUCHED))
    assert names[ct] == R16_ROUND_CODE_TOUCHED
    assert len(R17_DRAIN) + len(R16_ROUND_CODE_TOUCHED) <= WINDOW, (
        "r17 window overflow: committed drain + r16 code-touches exceed 50"
    )
    # Groups pairwise disjoint — a silent overlap would make the
    # size check pass while the window holds fewer obligations.
    groups = [
        R16_DRAIN,
        set(R15_ROUND_CODE_TOUCHED),
        set(R16_FILLS),
        R17_DRAIN,
        set(R16_ROUND_CODE_TOUCHED),
    ]
    for i, g1 in enumerate(groups):
        for g2 in groups[i + 1 :]:
            assert not (g1 & g2), sorted(g1 & g2)


def test_r17_drain_fits_after_r16_lands():
    """Forward simulation (the r17 aging cliff as a failing test):
    pretend CORRECTNESS_r16 lands all-green over this window. The
    resulting AGE-obligatory r17 set must be exactly R17_DRAIN — 29
    obligatory + 21 free slots. The simulation base is FROZEN at the
    r15 verdict state (later CORRECTNESS files are ignored) so the
    assertion stays meaningful — and green — after the real r16
    verdict lands mid-/post-round."""
    verdicts = {
        name: v for name, v in ledger.load_verdicts().items() if v[0] <= 15
    }
    assert verdicts, "no verdicts at or before r15 — baseline moved?"
    order = list(all_queries())
    simulated = dict(verdicts)
    for name in order[:WINDOW]:
        simulated[name] = (16, True, "")
    due = {name for name, _rnd in ledger.plan_next(max_age=2, verdicts=simulated, order=order)}
    assert due == R17_DRAIN, (
        f"unexpected r17 obligatory set: extra={sorted(due - R17_DRAIN)} "
        f"missing={sorted(R17_DRAIN - due)}"
    )
    assert len(R17_DRAIN) <= WINDOW


def test_r16_window_has_no_never_certified_stragglers():
    """Every never-certified registry name must sit INSIDE the r16
    window — the pending-next-window grace covers exactly one round.
    (As of the r16 rotation there are none: all 127 names carry
    verdicts; this guards new registrations made this round.)"""
    verdicts = ledger.load_verdicts()
    order = list(all_queries())
    never = [n for n in order if n not in verdicts]
    outside = [n for n in never if n not in set(order[:WINDOW])]
    assert not outside, f"never-certified outside the r16 window: {outside}"


def test_every_query_is_callable_and_oracle_typed():
    for name, q in all_queries().items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
