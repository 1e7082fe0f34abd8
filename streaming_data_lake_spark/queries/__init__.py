"""Query registry: the engine's certified query inventory.

Every entry pairs a Spark implementation (``fn(spark, sf_dir) ->
DataFrame``) with, where SQL-expressible, an ANSI-SQL oracle that
DuckDB runs on the same parquet tables. The driver hash-compares the
two — this registry IS the correctness contract (SURVEY.md §2.11
re-expressed on the engine's tables).

Column-name parity rule: every computed/aggregate column is aliased
identically in the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# The driver hash-checks the FIRST 50 registered queries per round.
# Round 15 executes the rotation CHANGELOG_r14.md committed and
# tests/test_registry_order.py (r14 revision) pinned -- the first
# steady-state rotation: the 27-name r12-verdict drain (age 3 the
# moment CORRECTNESS_r14 landed) at positions 1-27, the 5
# R14_ROUND_CODE_TOUCHED names at 28-32, and 18 free slots at 33-50.
# The free slots are spent with foresight: the 7 names this round's
# PLANNED code-touches hit (the GEN-4 corpus-wide vector-dim
# admission touches every similarity-family engine path and oracle
# -- VERDICT r14 "Next round" #2 -- and the identity-partition
# cardinality guard touches the two-level overlay scenario -- #5)
# lead the fills so their post-touch code is certified THIS round,
# then oldest-r13-verdict fills (`tools/ledger.py --emit-order`,
# ties by prior position) pre-drain the r13 block. The committed r16
# drain follows contiguously at 51-77 (the 27 remaining r13-verdict
# names -> r16 window = 27 obligatory + 23 free, pinned by forward
# simulation in tests/test_registry_order.py). Rotated at round-15
# start, before any driver run. tools/ledger.py cross-references the
# verdict files.
_CERTIFICATION_ORDER = [
    # ---- (a) the 27-name r15 drain: r12 verdicts, stale the moment
    # CORRECTNESS_r14 landed (committed by the r14 revision of this
    # module; pinned by test_r15_drain_fits_after_r14_lands). The 7
    # KNN-ladder members double as post-touch certification for the
    # GEN-4 dim admission (VERDICT r14 "mostly pre-paid") ----
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
    # ---- (b) the 5 R14_ROUND_CODE_TOUCHED commitments (r13 verdicts
    # certify pre-touch code): the huge-doc gate's O(tokens^2)
    # rewrites, the M3 dim-side time-edge admission, the RFC-bounded
    # PII regex, and the prefix-filter jaccard rewrite ----
    "doc_chunks_overlap",
    "bigram_lm_quality",
    "materialize_dim_change_repair",
    "pii_redaction",
    "ngram_jaccard_near_dups",
    # ---- (c) 18 free slots. First the 7 r13-verdict names this
    # round's planned code-touches hit: the 6 similarity-family
    # names outside the drain that the GEN-4 vector-dim admission
    # code-touches (engine valid_vectors + DUCK_VALID_VEC oracle
    # text; knn_ivf_recall_at_k composes the touched KNN oracles),
    # and the two-level overlay scenario the identity-partition
    # cardinality guard touches ----
    "semantic_dedup_centroid",
    "embedding_cosine_near_dups",
    "knn_ivf_materialized_cosine",
    "embedding_label_stats",
    "embedding_int8_quantization",
    "knn_ivf_recall_at_k",
    "two_level_overlay_maintenance",
    # ---- then 11 oldest-r13-verdict fills (ties by prior position
    # -- `tools/ledger.py --emit-order`), pre-draining the r16 cliff
    # from 45 r13 tail names to 27 ----
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
    # ---- position 51+ : NOT certified this round. First the
    # committed r16 drain: the 27 remaining r13-verdict names (age 3
    # at r16 -> r16 window = 27 obligatory + 23 free; forward-
    # simulated in tests/test_registry_order.py). Any name below that
    # r15 code-touches must move directly after this drain ----
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
    # ---- r15 code-touched while carrying r14 verdicts: the r15
    # control-char probe found Java-\s vs RE2-\s diverging on \x0B
    # (vertical tab) — every compared whitespace regex (tokens/
    # DUCK_TOKS, BPE_ISH, the prop_k extractor) now spells the Java
    # set explicitly, changing oracle text and/or engine plan
    # literals for all tokenization/ingest consumers; certified-data
    # results verified unchanged (no VT/FF in any testdata table).
    # The 10 touched r15-window members and 5 touched r16-drain
    # members cost nothing; these 15 take r16 free slots directly
    # after the drain (r16: 42 obligatory + 8 free; the 8 fills keep
    # the r17 drain at exactly 27). user_event_type_paths: the r15
    # all-NULL probe found its oracle returning NULL where concat_ws
    # returns '' on an all-NULL step list — oracle coalesced ----
    "events_clean",
    "streaming_clean_events",
    "materialize_incremental_clean_events",
    "streaming_fanout_ingest",
    "streaming_cms_token_counts",
    # (r15 per-table merge flock: merge_upsert serves the MERGE-folded
    # streaming sketches; cms is already listed above)
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
    # ---- r14-certified (fresh through r16; the whole r14 window in
    # its certified order) ----
    "price_outliers_zscore",
    "lineitem_flag_pivot",
    "corr_quantity_price",
    "priority_window_profile",
    "stratified_sample_by_lang",
    "top_busiest_hours",
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
]


def all_queries() -> dict[str, Query]:
    # Import side-effect modules that populate REGISTRY.
    from streaming_data_lake_spark.queries import (  # noqa: F401
        analytics,
        core,
        matq,
        pipeline,
        platform,
        streamq,
    )

    missing = set(REGISTRY) - set(_CERTIFICATION_ORDER)
    extra = set(_CERTIFICATION_ORDER) - set(REGISTRY)
    if missing or extra:
        raise AssertionError(
            f"certification order out of sync: missing={sorted(missing)} extra={sorted(extra)}"
        )
    return {name: REGISTRY[name] for name in _CERTIFICATION_ORDER}
