"""The driver certifies only the first 50 registered queries, so the
registry order IS part of the correctness contract. Round 19 executes
the rotation CHANGELOG_r18.md committed (and the r18 revision of this
module pinned): the 35-name r16-verdict drain at positions 1-35, then
the two r18 LATE code-touches FIRST among the free slots (VERDICT r18
#1 — ``time_travel_read_v1`` / ``snapshot_metadata``, the only names
whose current code — locks.py inode revalidation under
VersionedTable.commit/expire — lacked a driver verdict entering r19),
then 13 oldest-r17 fills. This module pins the r19 window AND the
committed r20 drain (positions 51-77) with a forward simulation; r20
is the FINAL round, so the simulation also checks the horizon: after
r20 lands, no name's verdict may be older than the 3-round freshness
window. tools/ledger.py cross-references every CORRECTNESS_r*.json
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

# (a) The 35 queries whose latest driver verdict is round 16 — the
# committed r19 drain (CHANGELOG_r18.md; age 3 the moment
# CORRECTNESS_r18 landed). They take the first 35 slots
# unconditionally.
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

# (b) The r18 LATE code-touches, FIRST among the 15 free slots
# (VERDICT r18 #1): locks.py grew inode revalidation (the lock-GC
# prerequisite) AFTER the r18 rotation was pinned, and
# VersionedTable.commit/expire flock through it — so these two
# r17-verdict names entered r19 certifying pre-touch lock code. They
# are the only names in that state.
R18_LATE_CODE_TOUCHED = [
    "time_travel_read_v1",
    "snapshot_metadata",
]

# (c) The 13 oldest-r17 fills (ascending verdict round, ties by prior
# registry position — `tools/ledger.py --emit-order`).
R19_FILLS = [
    "duplicate_rates_hourly",
    "consistent_hash_sample",
    "events_rejected",
    "dedup_exact_text",
    "streaming_interval_join_daily",
    "streaming_funnel_daily",
    "streaming_dedup_keys",
    "streaming_dedup_within_watermark",
    "multimodal_media_features",
    "sql_over_views_adhoc",
    "scd2_point_in_time_enrichment",
    "daily_distinct_users",
    "event_counters_unpivot",
]

MUST_BE_IN_WINDOW = R19_DRAIN | set(R18_LATE_CODE_TOUCHED) | set(R19_FILLS)

# The committed r20 drain: the 27 r17-verdict names the r19 free
# slots could not hold. They go stale (age 3) the moment
# CORRECTNESS_r19 lands and MUST lead the r20 window — positions
# 51-77 here so the r20 rotation is a pure prefix rotation. r20 is
# the FINAL round: its 23 free slots take the oldest-position r18
# names, leaving every remaining name at age <= 2 at the horizon.
R20_DRAIN = {
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
    "seeded_dim_hierarchy_enrichment",
    "events_dedup_canonical",
    "pricing_summary",
}

# Names code-touched DURING round 19 (after this rotation was pinned)
# while carrying sub-window verdicts. Every such touch MUST be
# appended here (they take r20 free slots directly after the drain).
R19_LATE_CODE_TOUCHED: list[str] = [
    # sessionize_native grew the ANSI-pin guard (ADVICE r18 #1) after
    # this round's rotation was pinned; streaming_sessionize executes
    # it while carrying an r18 verdict. Session 2 additionally
    # re-batched its bounded replay and sized the native path's state
    # partitions.
    "streaming_sessionize",
    # Session-2 optimization touches (expression memo across the
    # similarity/sketch/shingle operators, shingle call-site change):
    # every name below executes changed code while carrying an r18
    # verdict outside the r19 window. Oracle-green at sf0.01 when
    # landed; they must be re-certified by the r20 driver run.
    "minhash_lsh_near_dups",
    "dup_clusters_connected",
    "knn_ivf_cosine",
    "knn_ivf_multiprobe_cosine",
    "knn_bruteforce_cosine",
    "knn_pq_adc_l2",
    "knn_ivf_pq_adc",
    "kmeans_train_centroids",
    "knn_ivf_trained_cosine",
    "bigram_lm_quality",
    "ngram_jaccard_near_dups",
    "semantic_dedup_centroid",
    "embedding_cosine_near_dups",
    "knn_ivf_materialized_cosine",
    "embedding_label_stats",
    "embedding_int8_quantization",
    "knn_ivf_recall_at_k",
    "streaming_hll_daily_users",
    "streaming_cms_token_counts",
    "cms_heavy_hitter_tokens",
    "hll_distinct_users_daily",
]


def test_order_in_sync_and_window_covers_obligatory_drain():
    qs = all_queries()
    names = list(qs)
    assert len(names) == len(set(names))
    window = set(names[:WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_drain_plan():
    """The r19 window is exactly the committed composition — 35 drain
    + 2 late + 13 fills, in that block order — and the committed r20
    drain sits contiguously after it (positions 51-77) so the final
    rotation is mechanical."""
    assert len(MUST_BE_IN_WINDOW) == WINDOW
    names = list(all_queries())
    assert set(names[:WINDOW]) == MUST_BE_IN_WINDOW
    n_drain = len(R19_DRAIN)
    assert set(names[:n_drain]) == R19_DRAIN
    head = R18_LATE_CODE_TOUCHED + R19_FILLS
    assert names[n_drain:WINDOW] == head
    assert set(names[WINDOW : WINDOW + len(R20_DRAIN)]) == R20_DRAIN
    # r19-session late code-touches sit contiguously after the r20
    # drain so the r20 window (27 drain + these + fills) stays a
    # prefix rotation.
    ct = slice(WINDOW + len(R20_DRAIN), WINDOW + len(R20_DRAIN) + len(R19_LATE_CODE_TOUCHED))
    assert names[ct] == R19_LATE_CODE_TOUCHED
    assert len(R20_DRAIN) + len(R19_LATE_CODE_TOUCHED) <= WINDOW, (
        "r20 window overflow: committed drain + r19 late code-touches exceed 50"
    )
    # Groups pairwise disjoint — a silent overlap would make the
    # size check pass while the window holds fewer obligations.
    groups = [
        R19_DRAIN,
        set(R18_LATE_CODE_TOUCHED),
        set(R19_FILLS),
        R20_DRAIN,
        set(R19_LATE_CODE_TOUCHED),
    ]
    for i, g1 in enumerate(groups):
        for g2 in groups[i + 1 :]:
            assert not (g1 & g2), sorted(g1 & g2)


def test_r20_drain_fits_after_r19_lands():
    """Forward simulation (the r20 aging cliff as a failing test):
    pretend CORRECTNESS_r19 lands all-green over this window. The
    resulting AGE-obligatory r20 set must be exactly R20_DRAIN — 27
    obligatory + 23 free slots. The simulation base is FROZEN at the
    r18 verdict state (later CORRECTNESS files are ignored) so the
    assertion stays meaningful — and green — after the real r19
    verdict lands mid-/post-round."""
    verdicts = {
        name: v for name, v in ledger.load_verdicts().items() if v[0] <= 18
    }
    assert verdicts, "no verdicts at or before r18 — baseline moved?"
    order = list(all_queries())
    simulated = dict(verdicts)
    for name in order[:WINDOW]:
        simulated[name] = (19, True, "")
    due = {name for name, _rnd in ledger.plan_next(max_age=2, verdicts=simulated, order=order)}
    assert due == R20_DRAIN, (
        f"unexpected r20 obligatory set: extra={sorted(due - R20_DRAIN)} "
        f"missing={sorted(R20_DRAIN - due)}"
    )
    assert len(R20_DRAIN) + len(R19_LATE_CODE_TOUCHED) <= WINDOW


def test_final_horizon_no_stale_name_after_r20():
    """r20 is the final round: simulate r19 green over this window
    AND r20 green over R20_DRAIN + 23 oldest-verdict fills. At the
    horizon every registry name must carry a verdict no older than
    r18 (age <= 2 when r20 is the latest round) — the judge's
    3-round freshness window with zero stragglers."""
    verdicts = {
        name: v for name, v in ledger.load_verdicts().items() if v[0] <= 18
    }
    order = list(all_queries())
    simulated = dict(verdicts)
    for name in order[:WINDOW]:
        simulated[name] = (19, True, "")
    r20_due = [n for n, _ in ledger.plan_next(max_age=2, verdicts=simulated, order=order)]
    fills = [
        n
        for n, _ in sorted(
            ((n, v) for n, v in simulated.items() if n not in set(r20_due)),
            key=lambda kv: (kv[1][0], order.index(kv[0])),
        )
    ][: WINDOW - len(r20_due)]
    for name in r20_due + fills:
        simulated[name] = (20, True, "")
    stale = sorted(n for n in order if simulated.get(n, (0,))[0] < 18)
    assert not stale, f"names stale beyond the freshness window at the horizon: {stale}"


def test_r19_window_has_no_never_certified_stragglers():
    """Every never-certified registry name must sit INSIDE the r19
    window — the pending-next-window grace covers exactly one round.
    (As of the r19 rotation there are none: all 127 names carry
    verdicts; this guards new registrations made this round.)"""
    verdicts = ledger.load_verdicts()
    order = list(all_queries())
    never = [n for n in order if n not in verdicts]
    outside = [n for n in never if n not in set(order[:WINDOW])]
    assert not outside, f"never-certified outside the r19 window: {outside}"


def test_every_query_is_callable_and_oracle_typed():
    for name, q in all_queries().items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
