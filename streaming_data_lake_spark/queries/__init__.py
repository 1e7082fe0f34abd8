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
# Round 10 completes the two-round certification DRAIN the r8
# verdict mandated and r9 half-executed: the 26 r6-verdict names
# deferred by CHANGELOG_r9.md §"r10 drain" go stale the moment
# CORRECTNESS_r09 lands and take the first 26 slots here. Next come
# the 10 queries whose observable behavior or oracle changed in the
# r9 code reviews (upsert/materializer/maintenance family, plus the
# sessionize/fanout/HLL names ADVICE r9 flagged as carrying verdicts
# issued against a different implementation). The 14 remaining slots
# pre-drain r11: of the 50 r8-certified names (stale at r11), 14
# certify now and the other 26 sit contiguously at positions 51-76
# as the committed r11 window — same mechanical-rotation shape as
# the r9→r10 handoff. tests/test_registry_order.py asserts the
# arithmetic; tools/ledger.py cross-references the verdict files.
_CERTIFICATION_ORDER = [
    # ---- (a) latest verdict r6: the 26 obligatory drain slots
    # committed in CHANGELOG_r9.md — re-certify ALL in round 10 ----
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
    # ---- (b) r9 code-touched: r8 verdicts certify code/oracles that
    # changed in the r9 review passes (sidecar watermark store,
    # compaction oracle rewrite, sessionize start min-merge, fanout
    # bid= layout, HLL null-key + linear-counting path) ----
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
    # ---- (c) r11 pre-drain: 14 of the 40 remaining r8-certified
    # names (stale at r11), streaming family first since r9 touched
    # streaming harness code ----
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
    "pii_redaction",  # r10 oracle text changed (phone count on email-redacted text)
    "event_quality_spine_hourly",
    # ---- position 51+ : NOT certified this round. First the 26
    # r8-verdict names that MUST lead the r11 window (committed in
    # CHANGELOG_r10.md "r11 drain"), then the r9-certified rest ----
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
    # ---- r9-certified (fresh through r11) ----
    "pricing_summary",
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
    "dedup_exact_text",
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
    "semantic_dedup_centroid",
    "minhash_lsh_near_dups",
    "embedding_cosine_near_dups",
    "dup_clusters_connected",
    "knn_ivf_materialized_cosine",
    "bucketed_colocated_join",
    "partition_pruned_scan",
    "time_travel_read_v1",
    "snapshot_metadata",
    "events_clean",
    "events_rejected",
    "streaming_hourly_metrics",
    "streaming_dedup_keys",
    "streaming_dedup_within_watermark",
    "sql_over_views_adhoc",
    "schema_drift_check",
    "seeded_dim_hierarchy_enrichment",
    "daily_distinct_users",
    "events_dedup_canonical",
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
