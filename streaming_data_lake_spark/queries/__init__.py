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
# Certification rotates; round 5's window (tools/ledger.py enforces
# the arithmetic) holds EXACTLY 50 names — section letters below
# match the list markers: (a) the 19 queries whose ONLY driver
# verdict is round 1 — three refactor waves ago (the sketch refactor,
# the durable artifact cache, the float-parity waves) — the r4
# verdict's top lead; (b) the six light streaming queries whose
# scratch-dir lifetime changed in round 4 after their round-3
# certification; (c) the round-5 NEW queries (both waves) — never
# seen by any driver run; (d) the queries whose physical path changed
# this round: the sessionize dispatch (transformWithState preferred),
# the SemDeDup occupancy guard, and the durable-artifact readers
# whose cache keys changed (per-user cache root + PAIRS_GEN in the
# signature-table params); (e) the standing high-risk block
# (flagship, heavy streaming, incremental materializer). The window
# is exactly full — no filler slots remain. Everything at 51+ was
# driver-certified green in round 3 or 4; the round-5 crash-safety /
# plan fixes that touched some of their modules (maintenance swap
# recovery, versioned-commit crash tolerance, CMS left-join lookup,
# top-k without a global window) were verified result-identical
# against the oracles post-change (CHANGELOG_r5 review pass 4), and
# those queries lead the round-6 rotation. tests/test_registry_order
# asserts the window arithmetic.
_CERTIFICATION_ORDER = [
    # flagship
    "pricing_summary",
    # ---- (a) only driver verdict is round 1: re-certify ----
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
    # ---- (b) r4 scratch-dir lifetime change after r3 verdict ----
    "streaming_clean_events",
    "streaming_fanout_ingest",
    "streaming_interval_join_daily",
    "streaming_hourly_metrics",
    "streaming_dedup_keys",
    "streaming_dedup_within_watermark",
    # ---- (c) new in round 5: first driver verdict needed ----
    "schema_evolution_read",
    "blocklist_filter_retention",
    "quality_percentile_filter",
    "crossdoc_boilerplate_ngrams",
    "bloom_semi_join_prune",
    "large_orders_having",
    "cube_device_day_metrics",
    "value_histogram_quantiles",
    "zorder_layout_keys",
    "topn_customers_per_nation",
    "knn_pq_adc_l2",
    "event_counters_unpivot",
    "scd2_point_in_time_enrichment",
    # (the new slots displaced r3-certified fillers to 51+,
    # which stay fresh-enough through this round per the ledger's
    # max-age-2 rule)
    # ---- (d) physical path changed in round 5: re-certify ----
    "streaming_sessionize",
    "semantic_dedup_centroid",
    "minhash_lsh_near_dups",
    "embedding_cosine_near_dups",
    "dup_clusters_connected",
    "knn_ivf_materialized_cosine",
    "bucketed_colocated_join",
    "partition_pruned_scan",
    # ---- (e) standing high-risk block ----
    "streaming_funnel_daily",
    "streaming_upsert_hourly",
    "materialize_incremental_clean_events",
    # (no filler section this round — the second wave's new queries
    # consumed every remaining slot)
    # ---- position 51+ : certified green by a previous driver run
    # (round 3 or 4), implementation unchanged since ----
    "time_travel_read_v1",
    "snapshot_metadata",
    "maintenance_compaction",
    "materialize_dim_change_repair",
    "materialize_funnel_exists_repair",
    "sql_over_views_adhoc",
    "seeded_dim_hierarchy_enrichment",
    "salted_skew_aggregation",
    "replicated_skew_join_rollup",
    "knn_ivf_cosine",
    "knn_ivf_multiprobe_cosine",
    "knn_bruteforce_cosine",
    "multimodal_media_features",
    "rollup_revenue_levels",
    "price_quantiles_by_flag",
    "user_event_gaps",
    "running_revenue_by_nation",
    "order_value_deciles",
    "doc_chunks_overlap",
    "hll_distinct_users_daily",
    "cms_heavy_hitter_tokens",
    "kmeans_train_centroids",
    "knn_ivf_trained_cosine",
    "props_json_stats",
    "keyset_intersect_except",
    "orders_above_global_avg",
    "supplier_name_near_matches",
    "streaming_hll_daily_users",
    "streaming_cms_token_counts",
    "bigram_lm_quality",
    "domain_mixture_resample",
    "batch_sessionize_windows",
    "price_outliers_zscore",
    "lineitem_flag_pivot",
    "corr_quantity_price",
    "priority_window_profile",
    "tfidf_top_terms",
    "stratified_sample_by_lang",
    "token_budget_packing",
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
