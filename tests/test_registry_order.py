"""The driver certifies only the first 50 registered queries, so the
registry order IS part of the correctness contract. Round 18 executes
the rotation CHANGELOG_r17.md committed (and the r17 revision of this
module pinned): the 35-name r15-verdict drain at positions 1-35, then
the two r17 LATE code-touches FIRST among the free slots (VERDICT r17
#1 — ``streaming_sessionize`` / ``funnel_leakage_daily``, the only
names whose current code lacked a driver verdict entering r18), then
the 8 names round 18's OWN code touches hit while carrying r17
verdicts (retire_old_siblings loud persistent-failure + the
legacy-ctime monotonic clamp in overlay.py — every atomic_swap
publisher; sweep/compaction lock-file GC in plans/maintenance.py —
the r15/r16/r17 foresight precedent), then batch_sessionize_windows
(r16 verdict AND a sessionize.py ADVICE-fix consumer) + 4 oldest-r16
fills. This module pins the r18 window AND the committed r19 drain
(positions 51-85) with a forward simulation, so the next session
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

# (a) The 35 queries whose latest driver verdict is round 15 — the
# committed r18 drain (CHANGELOG_r17.md; age 3 the moment
# CORRECTNESS_r17 landed). They take the first 35 slots
# unconditionally.
R18_DRAIN = {
    "minhash_lsh_near_dups",
    "dup_clusters_connected",
    "bucketed_colocated_join",
    "partition_pruned_scan",
    "schema_drift_check",
    "knn_ivf_cosine",
    "knn_ivf_multiprobe_cosine",
    "knn_bruteforce_cosine",
    "knn_pq_adc_l2",
    "knn_ivf_pq_adc",
    "kmeans_train_centroids",
    "knn_ivf_trained_cosine",
    "asof_latest_view_before_purchase",
    "asof_view_within_6h",
    "doc_chunks_overlap",
    "bigram_lm_quality",
    "pii_redaction",
    "ngram_jaccard_near_dups",
    "semantic_dedup_centroid",
    "embedding_cosine_near_dups",
    "knn_ivf_materialized_cosine",
    "embedding_label_stats",
    "embedding_int8_quantization",
    "knn_ivf_recall_at_k",
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
}

# (b) The r17 LATE code-touches, FIRST among the 15 free slots
# (VERDICT r17 #1): §15's sealed-emission sessionize protocol and the
# funnel-admission extension landed AFTER the r17 rotation was
# pinned, so their green r16 driver verdicts certified the PREVIOUS
# code. These two are the only names that entered r18 in that state.
R17_LATE_CODE_TOUCHED = [
    "streaming_sessionize",
    "funnel_leakage_daily",
]

# (c) Names code-touched DURING round 18 while carrying r17 verdicts
# (the foresight precedent — certify post-touch code THIS round):
# retire_old_siblings' loud persistent-failure branch and the
# legacy-ctime monotonic stamp clamp in overlay.py (every atomic_swap
# publisher executes both), and the sweep/compaction lock-file GC in
# plans/maintenance.py (ADVICE r17 items #3 and #4).
R18_ROUND_CODE_TOUCHED = [
    "materialize_incremental_clean_events",
    "materialize_dim_change_repair",
    "materialize_funnel_exists_repair",
    "maintenance_compaction",
    "two_level_overlay_maintenance",
    "streaming_upsert_hourly",
    "streaming_hll_daily_users",
    "streaming_cms_token_counts",
]

# (d) batch_sessionize_windows (r16 verdict AND a consumer of this
# round's sessionize.py ADVICE fixes — stale-timer deletion on the
# clear path, the loud out-of-decimal-domain fold contract) + the 4
# oldest-r16 fills (ties by prior registry position —
# `tools/ledger.py --emit-order`).
R18_FILLS = [
    "batch_sessionize_windows",
    "cms_heavy_hitter_tokens",
    "token_budget_packing",
    "bloom_semi_join_prune",
    "hll_distinct_users_daily",
]

MUST_BE_IN_WINDOW = (
    R18_DRAIN
    | set(R17_LATE_CODE_TOUCHED)
    | set(R18_ROUND_CODE_TOUCHED)
    | set(R18_FILLS)
)

# The committed r19 drain: the 35 r16-verdict names the r18 free
# slots could NOT hold (8 of those slots went to this round's
# code-touched consumers under the foresight rule — those 8 displaced
# r16 fills land here and go obligatory at r19, which still fits: 35
# obligatory + 15 free). They go stale (age 3) the moment
# CORRECTNESS_r18 lands and MUST lead the r19 window — positions
# 51-85 here so the r19 rotation is a pure prefix rotation. The 42
# remaining r17-verdict names then go obligatory at r20 (27 after
# r19's 15 fills — the cliff arithmetic stays a test).
R19_DRAIN = {
    "winnowing_fingerprints",
    "exact_substring_dups",
    "dedup_keep_best_quality",
    "event_quality_spine_hourly",
    "multimodal_resize",
    "multimodal_frame_sample",
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
    "events_clean",
    "streaming_clean_events",
    "streaming_fanout_ingest",
    "tfidf_top_terms",
    "token_counts",
    "top_tokens",
    "doc_fingerprints",
    "quality_scores",
    "lang_id_heuristic",
    "repetition_signals",
    "benchmark_decontamination",
    "user_event_type_paths",
    "price_outliers_zscore",
    "lineitem_flag_pivot",
    "corr_quantity_price",
    "priority_window_profile",
    "stratified_sample_by_lang",
    "top_busiest_hours",
}

# Names code-touched LATER during round 18 (after the rotation was
# pinned) while carrying sub-window verdicts. Every such touch MUST
# be appended here (they take r19 free slots directly after the
# drain). The planned touches were pre-placed inside the window via
# R18_ROUND_CODE_TOUCHED; this list holds unplanned mid-round finds.
R18_LATE_CODE_TOUCHED: list[str] = [
    # locks.py inode revalidation (the lock-GC prerequisite) is
    # transitively exercised by VersionedTable.commit/expire's
    # per-table flock; these two r17-verdict consumers certify
    # pre-touch lock code until r19 lands them.
    "time_travel_read_v1",
    "snapshot_metadata",
]


def test_order_in_sync_and_window_covers_obligatory_drain():
    qs = all_queries()
    names = list(qs)
    assert len(names) == len(set(names))
    window = set(names[:WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_drain_plan():
    """The r18 window is exactly the committed composition — 35 drain
    + 2 late + 8 code-touched + 5 fills, in that block order — and
    the committed r19 drain sits contiguously after it (positions
    51-85) so the next rotation is mechanical."""
    assert len(MUST_BE_IN_WINDOW) == WINDOW
    names = list(all_queries())
    assert set(names[:WINDOW]) == MUST_BE_IN_WINDOW
    n_drain = len(R18_DRAIN)
    assert set(names[:n_drain]) == R18_DRAIN
    head = R17_LATE_CODE_TOUCHED + R18_ROUND_CODE_TOUCHED + R18_FILLS
    assert names[n_drain:WINDOW] == head
    assert set(names[WINDOW : WINDOW + len(R19_DRAIN)]) == R19_DRAIN
    # r18-session late code-touches sit contiguously after the r19
    # drain so the r19 window (35 drain + these + fills) stays a
    # prefix rotation.
    ct = slice(WINDOW + len(R19_DRAIN), WINDOW + len(R19_DRAIN) + len(R18_LATE_CODE_TOUCHED))
    assert names[ct] == R18_LATE_CODE_TOUCHED
    assert len(R19_DRAIN) + len(R18_LATE_CODE_TOUCHED) <= WINDOW, (
        "r19 window overflow: committed drain + r18 late code-touches exceed 50"
    )
    # Groups pairwise disjoint — a silent overlap would make the
    # size check pass while the window holds fewer obligations.
    groups = [
        R18_DRAIN,
        set(R17_LATE_CODE_TOUCHED),
        set(R18_ROUND_CODE_TOUCHED),
        set(R18_FILLS),
        R19_DRAIN,
        set(R18_LATE_CODE_TOUCHED),
    ]
    for i, g1 in enumerate(groups):
        for g2 in groups[i + 1 :]:
            assert not (g1 & g2), sorted(g1 & g2)


def test_r19_drain_fits_after_r18_lands():
    """Forward simulation (the r19 aging cliff as a failing test):
    pretend CORRECTNESS_r18 lands all-green over this window. The
    resulting AGE-obligatory r19 set must be exactly R19_DRAIN — 35
    obligatory + 15 free slots. The simulation base is FROZEN at the
    r17 verdict state (later CORRECTNESS files are ignored) so the
    assertion stays meaningful — and green — after the real r18
    verdict lands mid-/post-round."""
    verdicts = {
        name: v for name, v in ledger.load_verdicts().items() if v[0] <= 17
    }
    assert verdicts, "no verdicts at or before r17 — baseline moved?"
    order = list(all_queries())
    simulated = dict(verdicts)
    for name in order[:WINDOW]:
        simulated[name] = (18, True, "")
    due = {name for name, _rnd in ledger.plan_next(max_age=2, verdicts=simulated, order=order)}
    assert due == R19_DRAIN, (
        f"unexpected r19 obligatory set: extra={sorted(due - R19_DRAIN)} "
        f"missing={sorted(R19_DRAIN - due)}"
    )
    assert len(R19_DRAIN) <= WINDOW


def test_r20_cliff_fits_after_r19_drain():
    """One round further out (r20 is the final round): simulate r18
    green over this window AND r19 green over R19_DRAIN + 15
    oldest-verdict fills. The r20 obligatory set must fit in 50 —
    i.e. the two committed rotations leave no name stranded outside
    a certifiable window at the horizon."""
    verdicts = {
        name: v for name, v in ledger.load_verdicts().items() if v[0] <= 17
    }
    order = list(all_queries())
    simulated = dict(verdicts)
    for name in order[:WINDOW]:
        simulated[name] = (18, True, "")
    # r19 window: the committed drain + oldest-verdict fills.
    r19_due = [n for n, _ in ledger.plan_next(max_age=2, verdicts=simulated, order=order)]
    fills = [
        n
        for n, _ in sorted(
            ((n, v) for n, v in simulated.items() if n not in set(r19_due)),
            key=lambda kv: (kv[1][0], order.index(kv[0])),
        )
    ][: WINDOW - len(r19_due)]
    for name in r19_due + fills:
        simulated[name] = (19, True, "")
    r20_due = {n for n, _ in ledger.plan_next(max_age=2, verdicts=simulated, order=order)}
    assert len(r20_due) <= WINDOW, (
        f"r20 obligatory set overflows the window: {len(r20_due)}"
    )


def test_r18_window_has_no_never_certified_stragglers():
    """Every never-certified registry name must sit INSIDE the r18
    window — the pending-next-window grace covers exactly one round.
    (As of the r18 rotation there are none: all 127 names carry
    verdicts; this guards new registrations made this round.)"""
    verdicts = ledger.load_verdicts()
    order = list(all_queries())
    never = [n for n in order if n not in verdicts]
    outside = [n for n in never if n not in set(order[:WINDOW])]
    assert not outside, f"never-certified outside the r18 window: {outside}"


def test_every_query_is_callable_and_oracle_typed():
    for name, q in all_queries().items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
