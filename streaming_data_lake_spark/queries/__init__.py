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
# Certification rotates; round 7's window (tools/ledger.py enforces
# the arithmetic) holds EXACTLY 50 names — section letters below
# match the list markers: (a) the 34 queries whose latest driver
# verdict is round 4 — they exceed the ledger's max-age-2 rule the
# moment CORRECTNESS_r07 lands (VERDICT r6 "Next round" #1);
# (b) queries whose engine code changed in round 7: the sessionize
# port to the built-in session_window, the upsert-sink family over
# the round-7 overlay/merge changes (empty-batch no-op, recursive
# linking, layout-scoped kb drop), the materializer passes over the
# same overlay code, and compaction (two-level layout support);
# (c) round-7 NEW query: the two-level day+identity overlay/
# compaction cycle; (d) the rest of the streaming family — the
# stream-source schema-cache keying changed under all of them. The
# window is exactly full — no filler slots. Three streaming queries
# (hourly_metrics, dedup_keys, dedup_within_watermark) hold fresh r6
# verdicts and were displaced by the (c) additions; they ride only
# the stream-source cache-keying change and lead the r8 rotation as
# post-cert-change debt. Everything else at 51+ was driver-certified
# green in round 5 or 6 and its implementation is unchanged since.
# tests/test_registry_order asserts the window arithmetic.
_CERTIFICATION_ORDER = [
    # ---- (a) latest verdict r4: stale at r7, re-certify all 34 ----
    "rollup_revenue_levels",
    "price_quantiles_by_flag",
    "user_event_gaps",
    "running_revenue_by_nation",
    "order_value_deciles",
    "doc_chunks_overlap",
    "hll_distinct_users_daily",
    "kmeans_train_centroids",
    "knn_ivf_trained_cosine",
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
    "pii_redaction",
    "repetition_signals",
    "benchmark_decontamination",
    "embedding_int8_quantization",
    "multimodal_resize",
    "dedup_keep_best_quality",
    "exact_substring_dups",
    "winnowing_fingerprints",
    "top_busiest_hours",
    "duplicate_rates_hourly",
    "event_quality_spine_hourly",
    "ngram_jaccard_near_dups",
    # ---- (b) engine code changed in round 7 ----
    "streaming_sessionize",
    "streaming_upsert_hourly",
    "streaming_hll_daily_users",
    "streaming_cms_token_counts",
    "materialize_incremental_clean_events",
    "materialize_dim_change_repair",
    "materialize_funnel_exists_repair",
    "maintenance_compaction",
    # ---- (c) new in round 7: first driver verdict needed ----
    "two_level_overlay_maintenance",
    "user_rolling_7day_value",
    "consistent_hash_sample",
    "user_event_type_paths",
    # ---- (d) streaming family: stream-source cache keying changed ----
    "streaming_clean_events",
    "streaming_fanout_ingest",
    "streaming_interval_join_daily",
    "streaming_funnel_daily",
    # ---- position 51+ : driver-certified green in round 5 or 6,
    # implementation unchanged since (except the three displaced
    # streaming queries noted above, which lead the r8 window) ----
    "streaming_hourly_metrics",
    "streaming_dedup_keys",
    "streaming_dedup_within_watermark",
    "time_travel_read_v1",
    "snapshot_metadata",
    "sql_over_views_adhoc",
    "seeded_dim_hierarchy_enrichment",
    "salted_skew_aggregation",
    "replicated_skew_join_rollup",
    "knn_ivf_cosine",
    "knn_ivf_multiprobe_cosine",
    "knn_bruteforce_cosine",
    "multimodal_media_features",
    "multimodal_frame_sample",
    "embedding_label_stats",
    "events_clean",
    "events_rejected",
    "daily_distinct_users",
    "conditional_distinct_users",
    "events_dedup_canonical",
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
    "schema_drift_check",
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
