"""The driver certifies only the first 50 registered queries, so the
registry order IS part of the correctness contract. Round 17 executes
the rotation CHANGELOG_r16.md committed (and the r16 revision of this
module pinned): the 29-name r14-verdict drain at positions 1-29 —
including ``time_travel_read_v1``/``snapshot_metadata``, whose r17
verdicts certify this round's torn-tail-repair + commit-flock changes
to sources/versioned.py — then the 8 names round 17's OWN code
touches hit while carrying r16 verdicts (self-heal at flock entry in
plans/materialize.py and sources/upsert.py; monotonic ``__old_``
stamps + publish-time retirement in overlay.py; the stamp-width cap
in plans/maintenance.py), then 13 oldest-r15 fills pre-draining the
r18 cliff from 48 to 35. This module pins the r17 window AND the
committed r18 drain (positions 51-85) with a forward simulation, so
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

# (a) The 29 queries whose latest driver verdict is round 14 — the
# committed r17 drain (CHANGELOG_r16.md; age 3 the moment
# CORRECTNESS_r16 landed). They take the first 29 slots
# unconditionally.
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

# (b) Names code-touched DURING round 17 while carrying r16 verdicts
# (the r15/r16 foresight precedent — certify post-touch code THIS
# round): the materializer-cycle and upsert-MERGE self-heal at flock
# entry (plans/materialize.py run(), sources/upsert.py merge_upsert),
# the monotonic __old_ stamp + publish-time retirement in overlay.py
# (every atomic_swap publisher), and the stamp-width cap in
# plans/maintenance.py.
R17_ROUND_CODE_TOUCHED = [
    "materialize_incremental_clean_events",
    "materialize_dim_change_repair",
    "materialize_funnel_exists_repair",
    "maintenance_compaction",
    "two_level_overlay_maintenance",
    "streaming_upsert_hourly",
    "streaming_hll_daily_users",
    "streaming_cms_token_counts",
]

# (c) The 13 free-slot fills: oldest-r15 verdicts (ties by prior
# registry position — `tools/ledger.py --emit-order`), pre-draining
# the r18 cliff from 48 r15 tail names to 35.
R17_FILLS = [
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
]

MUST_BE_IN_WINDOW = R17_DRAIN | set(R17_ROUND_CODE_TOUCHED) | set(R17_FILLS)

# The committed r18 drain: the 35 r15-verdict names the 13 r17 fills
# could NOT pre-drain. They go stale (age 3) the moment
# CORRECTNESS_r17 lands and MUST lead the r18 window — positions
# 51-85 here so the r18 rotation is a pure prefix rotation. r18 then
# has 15 free slots for oldest-r16 fills (42 r16 tail names, stale at
# r19). The cliff arithmetic stays a test.
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

# Names code-touched LATER during round 17 (after the rotation was
# pinned) while carrying sub-window verdicts. Every such touch MUST
# be appended here (they take r18 free slots directly after the
# drain). The planned touches were pre-placed inside the window via
# R17_ROUND_CODE_TOUCHED; this list holds unplanned mid-round finds
# only.
R17_LATE_CODE_TOUCHED: list[str] = [
    # sealed-emission sessionize protocol (streaming/sessionize.py);
    # funnel admission extension (queries/core.py chain + oracle)
    "streaming_sessionize",
    "funnel_leakage_daily",
]


def test_order_in_sync_and_window_covers_obligatory_drain():
    qs = all_queries()
    names = list(qs)
    assert len(names) == len(set(names))
    window = set(names[:WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_drain_plan():
    """The r17 window is exactly the committed composition — 29 drain
    + 8 code-touched + 13 fills, in that block order — and the
    committed r18 drain sits contiguously after it (positions 51-85)
    so the next rotation is mechanical."""
    assert len(MUST_BE_IN_WINDOW) == WINDOW
    names = list(all_queries())
    assert set(names[:WINDOW]) == MUST_BE_IN_WINDOW
    n_drain = len(R17_DRAIN)
    assert set(names[:n_drain]) == R17_DRAIN
    head = R17_ROUND_CODE_TOUCHED + R17_FILLS
    assert names[n_drain:WINDOW] == head
    assert set(names[WINDOW : WINDOW + len(R18_DRAIN)]) == R18_DRAIN
    # r17-session late code-touches sit contiguously after the r18
    # drain so the r18 window (35 drain + these + fills) stays a
    # prefix rotation.
    ct = slice(WINDOW + len(R18_DRAIN), WINDOW + len(R18_DRAIN) + len(R17_LATE_CODE_TOUCHED))
    assert names[ct] == R17_LATE_CODE_TOUCHED
    assert len(R18_DRAIN) + len(R17_LATE_CODE_TOUCHED) <= WINDOW, (
        "r18 window overflow: committed drain + r17 late code-touches exceed 50"
    )
    # Groups pairwise disjoint — a silent overlap would make the
    # size check pass while the window holds fewer obligations.
    groups = [
        R17_DRAIN,
        set(R17_ROUND_CODE_TOUCHED),
        set(R17_FILLS),
        R18_DRAIN,
        set(R17_LATE_CODE_TOUCHED),
    ]
    for i, g1 in enumerate(groups):
        for g2 in groups[i + 1 :]:
            assert not (g1 & g2), sorted(g1 & g2)


def test_r18_drain_fits_after_r17_lands():
    """Forward simulation (the r18 aging cliff as a failing test):
    pretend CORRECTNESS_r17 lands all-green over this window. The
    resulting AGE-obligatory r18 set must be exactly R18_DRAIN — 35
    obligatory + 15 free slots. The simulation base is FROZEN at the
    r16 verdict state (later CORRECTNESS files are ignored) so the
    assertion stays meaningful — and green — after the real r17
    verdict lands mid-/post-round."""
    verdicts = {
        name: v for name, v in ledger.load_verdicts().items() if v[0] <= 16
    }
    assert verdicts, "no verdicts at or before r16 — baseline moved?"
    order = list(all_queries())
    simulated = dict(verdicts)
    for name in order[:WINDOW]:
        simulated[name] = (17, True, "")
    due = {name for name, _rnd in ledger.plan_next(max_age=2, verdicts=simulated, order=order)}
    assert due == R18_DRAIN, (
        f"unexpected r18 obligatory set: extra={sorted(due - R18_DRAIN)} "
        f"missing={sorted(R18_DRAIN - due)}"
    )
    assert len(R18_DRAIN) <= WINDOW


def test_r17_window_has_no_never_certified_stragglers():
    """Every never-certified registry name must sit INSIDE the r17
    window — the pending-next-window grace covers exactly one round.
    (As of the r17 rotation there are none: all 127 names carry
    verdicts; this guards new registrations made this round.)"""
    verdicts = ledger.load_verdicts()
    order = list(all_queries())
    never = [n for n in order if n not in verdicts]
    outside = [n for n in never if n not in set(order[:WINDOW])]
    assert not outside, f"never-certified outside the r17 window: {outside}"


def test_every_query_is_callable_and_oracle_typed():
    for name, q in all_queries().items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
