"""The driver certifies only the first 50 registered queries, so the
registry order IS part of the correctness contract. Round 14 executes
the rotation CHANGELOG_r13.md committed (and the r13 revision of this
module pinned) — the LAST drain round: the 27-name r11-verdict drain
at positions 1-27, the 7 R13_ROUND_CODE_TOUCHED time-edge names at
28-34, and 16 oldest-r12 fills at 35-50 pre-draining the r15 cliff.
This module pins the r14 window AND the committed r15 drain (the 27
remaining r12-verdict names at positions 51-77) with a forward
simulation, so the next session cannot repeat the r8 rotation miss
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

# (a) The 27 queries whose latest driver verdict is round 11 — the
# committed r14 drain (CHANGELOG_r13.md; age 3 the moment
# CORRECTNESS_r13 landed). They take the first 27 slots
# unconditionally.
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

# (b) Names code-touched DURING round 13 while carrying r12 verdicts
# (the time-edge admission contract, CHANGELOG_r13 §11, plus the
# warehouse-date bucket-safe month extension). Committed to the r14
# head by the r13 revision of this module.
R13_ROUND_CODE_TOUCHED = [
    "sql_over_views_adhoc",
    "scd2_point_in_time_enrichment",
    "daily_distinct_users",
    "event_counters_unpivot",
    "sliding_window_metrics",
    "streaming_hourly_metrics",
    "monthly_nation_revenue",
]

# (c) The 16 free slots: oldest-verdict fills (all r12, ties broken
# by prior registry position — `tools/ledger.py --emit-order`),
# pre-draining the r15 cliff from 43 r12 tail names to 27.
R14_FILLS = [
    "revenue_by_region",
    "top_nations_by_customers",
    "customers_with_orders",
    "customers_without_orders",
    "order_priority_rollup",
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
]

MUST_BE_IN_WINDOW = R14_DRAIN | set(R13_ROUND_CODE_TOUCHED) | set(R14_FILLS)

# The committed r15 drain: the 27 r12-verdict names the 16 r14 fills
# could NOT pre-drain. They go stale (age 3) the moment
# CORRECTNESS_r14 lands and MUST lead the r15 window — positions
# 51-77 here so the r15 rotation is a pure prefix rotation. r15 then
# has 23 free slots, which should pre-drain the 50-name r13 block
# (stale at r16 → r16 drain = 27). The cliff arithmetic stays a test.
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

# Names code-touched DURING round 14 while carrying sub-window
# verdicts. Every r14 session code-touch of a tail name MUST be
# appended here (they take r15 free slots directly after the drain).
# The huge-doc gate's first run (VERDICT r13 "Next round" #2) found
# O(tokens^2) shapes in both: bigram_lm_quality's LATERAL-unnest
# oracle carried the full toks list per bigram row (>10 min on one
# 220k-token doc), and doc_chunks_overlap was quadratic on BOTH
# sides (Spark explode-then-slice copied the array per chunk row,
# 182 s; the packed oracle's in-lambda list_slice copied the source
# list per chunk, 80 s — now element access, 0.2 s).
R14_ROUND_CODE_TOUCHED: list[str] = [
    "doc_chunks_overlap",
    "bigram_lm_quality",
    # r14 dim-side time-edge admission: the M3 changed-key filter now
    # ignores inadmissible valid_from versions (a year-9999 dim row
    # phantom-flagged its key every cycle).
    "materialize_dim_change_repair",
    # r14 megatoken probe: the unbounded email regex was O(chars²)
    # under Java's backtracking engine (a 300 KB whitespace-free run
    # hung redaction; DuckDB's RE2 stayed linear) — RFC-bounded
    # quantifiers in BOTH the engine constant and the oracle text.
    "pii_redaction",
    # r14 row-scale sweep: ngram_jaccard_pairs rewritten with
    # lossless prefix-filter candidates + hashed-set intersect
    # verification (naive shared-shingle self-join aggregated 105M
    # candidate groups at ~sf0.6 — superlinear in rows in BOTH
    # engines; dup_clusters_connected shares the fix but is already
    # an obligatory r15-drain member, so it costs no extra slot).
    "ngram_jaccard_near_dups",
]


def test_order_in_sync_and_window_covers_obligatory_drain():
    qs = all_queries()
    names = list(qs)
    assert len(names) == len(set(names))
    window = set(names[:WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_drain_plan():
    """The r14 window is exactly the committed composition — 27 drain
    + 7 code-touched + 16 fills, in that block order — and the
    committed r15 drain sits contiguously after it (positions 51-77)
    so the next rotation is mechanical."""
    assert len(MUST_BE_IN_WINDOW) == WINDOW
    names = list(all_queries())
    assert set(names[:WINDOW]) == MUST_BE_IN_WINDOW
    n_drain = len(R14_DRAIN)
    assert set(names[:n_drain]) == R14_DRAIN
    head = R13_ROUND_CODE_TOUCHED + R14_FILLS
    assert names[n_drain:WINDOW] == head
    assert set(names[WINDOW : WINDOW + len(R15_DRAIN)]) == R15_DRAIN
    # r14-session code-touches sit contiguously after the r15 drain
    # so the r15 window (27 drain + these + fills) stays a prefix
    # rotation.
    ct = slice(WINDOW + len(R15_DRAIN), WINDOW + len(R15_DRAIN) + len(R14_ROUND_CODE_TOUCHED))
    assert names[ct] == R14_ROUND_CODE_TOUCHED
    assert len(R15_DRAIN) + len(R14_ROUND_CODE_TOUCHED) <= WINDOW, (
        "r15 window overflow: committed drain + r14 code-touches exceed 50"
    )
    # Groups pairwise disjoint — a silent overlap would make the
    # size check pass while the window holds fewer obligations.
    groups = [
        R14_DRAIN,
        set(R13_ROUND_CODE_TOUCHED),
        set(R14_FILLS),
        R15_DRAIN,
        set(R14_ROUND_CODE_TOUCHED),
    ]
    for i, g1 in enumerate(groups):
        for g2 in groups[i + 1 :]:
            assert not (g1 & g2), sorted(g1 & g2)


def test_r15_drain_fits_after_r14_lands():
    """Forward simulation (the r15 aging cliff as a failing test):
    pretend CORRECTNESS_r14 lands all-green over this window. The
    resulting AGE-obligatory r15 set must be exactly R15_DRAIN — 27
    obligatory + 23 free slots. The simulation base is FROZEN at the
    r13 verdict state (later CORRECTNESS files are ignored) so the
    assertion stays meaningful — and green — after the real r14
    verdict lands mid-/post-round."""
    verdicts = {
        name: v for name, v in ledger.load_verdicts().items() if v[0] <= 13
    }
    assert verdicts, "no verdicts at or before r13 — baseline moved?"
    order = list(all_queries())
    simulated = dict(verdicts)
    for name in order[:WINDOW]:
        simulated[name] = (14, True, "")
    due = {name for name, _rnd in ledger.plan_next(max_age=2, verdicts=simulated, order=order)}
    assert due == R15_DRAIN, (
        f"unexpected r15 obligatory set: extra={sorted(due - R15_DRAIN)} "
        f"missing={sorted(R15_DRAIN - due)}"
    )
    assert len(R15_DRAIN) <= WINDOW


def test_r14_window_has_no_never_certified_stragglers():
    """Every never-certified registry name must sit INSIDE the r14
    window — the pending-next-window grace covers exactly one round.
    (As of the r14 rotation there are none: all 127 names carry
    verdicts; this guards new registrations made this round.)"""
    verdicts = ledger.load_verdicts()
    order = list(all_queries())
    never = [n for n in order if n not in verdicts]
    outside = [n for n in never if n not in set(order[:WINDOW])]
    assert not outside, f"never-certified outside the r14 window: {outside}"


def test_every_query_is_callable_and_oracle_typed():
    for name, q in all_queries().items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
