"""The driver certifies only the first 50 registered queries, so the
registry order IS part of the correctness contract. Round 15 executes
the rotation CHANGELOG_r14.md committed (and the r14 revision of this
module pinned) — the first steady-state rotation: the 27-name
r12-verdict drain at positions 1-27, the 5 R14_ROUND_CODE_TOUCHED
names at 28-32, and 18 free slots at 33-50 (the 7 names this round's
PLANNED code-touches hit — the GEN-4 vector-dim admission and the
identity-partition cardinality guard, VERDICT r14 "Next round" #2/#5
— lead the fills so post-touch code is certified THIS round, then 11
oldest-r13 fills pre-drain the r16 cliff). This module pins the r15
window AND the committed r16 drain (the 27 remaining r13-verdict
names at positions 51-77) with a forward simulation, so the next
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

# (a) The 27 queries whose latest driver verdict is round 12 — the
# committed r15 drain (CHANGELOG_r14.md; age 3 the moment
# CORRECTNESS_r14 landed). They take the first 27 slots
# unconditionally.
R15_DRAIN = {
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
}

# (b) Names code-touched DURING round 14 while carrying r13 verdicts
# (the huge-doc gate's O(tokens^2) rewrites, the M3 dim-side
# time-edge admission, the RFC-bounded PII regex, the prefix-filter
# jaccard rewrite). Committed to the r15 head by the r14 revision of
# this module.
R14_ROUND_CODE_TOUCHED = [
    "doc_chunks_overlap",
    "bigram_lm_quality",
    "materialize_dim_change_repair",
    "pii_redaction",
    "ngram_jaccard_near_dups",
]

# (c) The 18 free slots. The first 7 are the r13-verdict names this
# round's PLANNED code-touches hit, placed in the window with
# foresight so their post-touch code earns a fresh verdict THIS
# round instead of burdening r16: the GEN-4 corpus-wide vector-dim
# admission (VERDICT r14 "Next round" #2) code-touches every
# similarity-family engine path (operators/similarity.valid_vectors)
# and oracle text (duckql.DUCK_VALID_VEC / DUCK_EMB) — 7 KNN names
# are already drain members, these 6 are the rest (recall_at_k
# composes the touched KNN oracle texts) — and the
# identity-partition cardinality guard (#5) touches the two-level
# overlay scenario. Then 11 oldest-r13 fills (ties by prior registry
# position — `tools/ledger.py --emit-order`), pre-draining the r16
# cliff from 45 r13 tail names to 27.
R15_FILLS = [
    "semantic_dedup_centroid",
    "embedding_cosine_near_dups",
    "knn_ivf_materialized_cosine",
    "embedding_label_stats",
    "embedding_int8_quantization",
    "knn_ivf_recall_at_k",
    "two_level_overlay_maintenance",
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
]

MUST_BE_IN_WINDOW = R15_DRAIN | set(R14_ROUND_CODE_TOUCHED) | set(R15_FILLS)

# The committed r16 drain: the 27 r13-verdict names the 18 r15 fills
# could NOT pre-drain. They go stale (age 3) the moment
# CORRECTNESS_r15 lands and MUST lead the r16 window — positions
# 51-77 here so the r16 rotation is a pure prefix rotation. r16 then
# has 23 free slots for the r14 block (50 names, stale at r17). The
# cliff arithmetic stays a test.
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

# Names code-touched DURING round 15 while carrying sub-window
# verdicts. Every r15 session code-touch of a tail name MUST be
# appended here (they take r16 free slots directly after the drain).
# The planned touches (GEN-4 dim admission, layout cardinality
# guard) were pre-placed inside the window via R15_FILLS; this list
# holds the UNPLANNED mid-round find: the control-char probe showed
# Java's \s includes \x0B (vertical tab) while RE2's does not, so
# every compared whitespace regex — tokens()/DUCK_TOKS, BPE_ISH, the
# prop_k '"k":\s*' extractor — silently diverged on VT-carrying text.
# Both engines now spell the Java set [ \t\n\r\f\x0B] explicitly;
# oracle text and/or engine plan literals changed for all
# tokenization/ingest consumers (certified-data results verified
# unchanged: no VT/FF in any testdata table). 10 touched names were
# already r15-window members and 5 more sit in the committed r16
# drain — zero cost; these 15 carry fresh r14 verdicts on PRE-touch
# code and take r16 free slots (r16: 42 obligatory + 8 free; the 8
# fills keep the r17 drain at exactly 27). user_event_type_paths is
# the all-NULL probe's second find: its oracle returned NULL where
# the engine's concat_ws returns '' on an all-NULL step list —
# oracle coalesced to the '' contract. streaming_hll_daily_users:
# the r15 per-table merge flock code-touches merge_upsert, which
# serves the MERGE-folded streaming sketches (cms already listed).
R15_ROUND_CODE_TOUCHED: list[str] = [
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


def test_order_in_sync_and_window_covers_obligatory_drain():
    qs = all_queries()
    names = list(qs)
    assert len(names) == len(set(names))
    window = set(names[:WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_drain_plan():
    """The r15 window is exactly the committed composition — 27 drain
    + 5 code-touched + 18 fills, in that block order — and the
    committed r16 drain sits contiguously after it (positions 51-77)
    so the next rotation is mechanical."""
    assert len(MUST_BE_IN_WINDOW) == WINDOW
    names = list(all_queries())
    assert set(names[:WINDOW]) == MUST_BE_IN_WINDOW
    n_drain = len(R15_DRAIN)
    assert set(names[:n_drain]) == R15_DRAIN
    head = R14_ROUND_CODE_TOUCHED + R15_FILLS
    assert names[n_drain:WINDOW] == head
    assert set(names[WINDOW : WINDOW + len(R16_DRAIN)]) == R16_DRAIN
    # r15-session code-touches sit contiguously after the r16 drain
    # so the r16 window (27 drain + these + fills) stays a prefix
    # rotation.
    ct = slice(WINDOW + len(R16_DRAIN), WINDOW + len(R16_DRAIN) + len(R15_ROUND_CODE_TOUCHED))
    assert names[ct] == R15_ROUND_CODE_TOUCHED
    assert len(R16_DRAIN) + len(R15_ROUND_CODE_TOUCHED) <= WINDOW, (
        "r16 window overflow: committed drain + r15 code-touches exceed 50"
    )
    # Groups pairwise disjoint — a silent overlap would make the
    # size check pass while the window holds fewer obligations.
    groups = [
        R15_DRAIN,
        set(R14_ROUND_CODE_TOUCHED),
        set(R15_FILLS),
        R16_DRAIN,
        set(R15_ROUND_CODE_TOUCHED),
    ]
    for i, g1 in enumerate(groups):
        for g2 in groups[i + 1 :]:
            assert not (g1 & g2), sorted(g1 & g2)


def test_r16_drain_fits_after_r15_lands():
    """Forward simulation (the r16 aging cliff as a failing test):
    pretend CORRECTNESS_r15 lands all-green over this window. The
    resulting AGE-obligatory r16 set must be exactly R16_DRAIN — 27
    obligatory + 23 free slots. The simulation base is FROZEN at the
    r14 verdict state (later CORRECTNESS files are ignored) so the
    assertion stays meaningful — and green — after the real r15
    verdict lands mid-/post-round."""
    verdicts = {
        name: v for name, v in ledger.load_verdicts().items() if v[0] <= 14
    }
    assert verdicts, "no verdicts at or before r14 — baseline moved?"
    order = list(all_queries())
    simulated = dict(verdicts)
    for name in order[:WINDOW]:
        simulated[name] = (15, True, "")
    due = {name for name, _rnd in ledger.plan_next(max_age=2, verdicts=simulated, order=order)}
    assert due == R16_DRAIN, (
        f"unexpected r16 obligatory set: extra={sorted(due - R16_DRAIN)} "
        f"missing={sorted(R16_DRAIN - due)}"
    )
    assert len(R16_DRAIN) <= WINDOW


def test_r15_window_has_no_never_certified_stragglers():
    """Every never-certified registry name must sit INSIDE the r15
    window — the pending-next-window grace covers exactly one round.
    (As of the r15 rotation there are none: all 127 names carry
    verdicts; this guards new registrations made this round.)"""
    verdicts = ledger.load_verdicts()
    order = list(all_queries())
    never = [n for n in order if n not in verdicts]
    outside = [n for n in never if n not in set(order[:WINDOW])]
    assert not outside, f"never-certified outside the r15 window: {outside}"


def test_every_query_is_callable_and_oracle_typed():
    for name, q in all_queries().items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
