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
# Round 19 executes the rotation CHANGELOG_r18.md committed and
# tests/test_registry_order.py (r18 revision) pinned: the 35-name
# r16-verdict drain (age 3 the moment CORRECTNESS_r18 landed) at
# positions 1-35, then the two r18 LATE code-touches FIRST among the
# 15 free slots (VERDICT r18 #1: time_travel_read_v1 /
# snapshot_metadata are the only names whose current code — locks.py
# inode revalidation under VersionedTable.commit/expire — lacks a
# driver verdict) at 36-37, then 13 oldest-r17 fills (ties by prior
# registry position, tools/ledger.py --emit-order) at 38-50. The
# committed r20 drain follows contiguously at 51-77 (the 27 remaining
# r17-verdict names -> r20 window = 27 obligatory + 23 free, pinned
# by forward simulation in tests/test_registry_order.py; r20 is the
# FINAL round, so the tail after it must be all-r18 — no name can
# strand). Rotated at round-19 start, before any driver run.
# tools/ledger.py cross-references the verdict files.
_CERTIFICATION_ORDER = [
    # ---- (a) the 35-name r19 drain: r16 verdicts, stale the moment
    # ---- CORRECTNESS_r18 landed (committed by the r18 revision of this
    # ---- module; pinned by test_r19_drain_fits_after_r18_lands) ----
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
    # ---- (b) r18 LATE code-touches, FIRST among the 15 free slots
    # ---- (VERDICT r18 #1): locks.py grew inode revalidation after the
    # ---- r18 rotation was pinned and VersionedTable.commit/expire
    # ---- flock through it — the only names whose current code lacks a
    # ---- driver verdict entering r19 ----
    "time_travel_read_v1",
    "snapshot_metadata",
    # ---- (c) 13 oldest-r17 fills (ascending verdict round, ties by
    # ---- prior registry position — tools/ledger.py --emit-order) ----
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
    # ---- position 51+ : NOT certified this round. The committed r20
    # ---- drain sits first (27 remaining r17-verdict names, stale the
    # ---- moment CORRECTNESS_r19 lands -> r20 window = 27 obligatory +
    # ---- 23 free; r20 is the FINAL round — pinned by forward
    # ---- simulation in tests/test_registry_order.py) ----
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
    # ---- r19 LATE code-touch (after this round's rotation was
    # pinned): sessionize_native grew the ANSI-pin guard (ADVICE r18
    # #1) and streaming_sessionize executes it while carrying an r18
    # verdict — it takes an r20 free slot directly after the drain,
    # the same mechanism as r17/r18 late-touch handling ----
    "streaming_sessionize",
    # ---- r19 session-2 LATE code-touches (optimization work landed
    # after the rotation was pinned; every name here EXECUTES changed
    # code while carrying a pre-r19 verdict): the expression-memo
    # rewrite (similarity/sketches/shingles — valid_vectors, ivf
    # argmax, ADC distance, CMS seed buckets, HLL linear-counting
    # literals), the native-sessionize replay batching, and the
    # shingle call-site change. All oracle-green at sf0.01 this
    # session; they take r20 free slots directly after the drain
    # (27 + 22 = 49 <= 50, one slack slot), same mechanism as the
    # r17/r18 late-touch handling. Pinned by
    # tests/test_registry_order.R19_LATE_CODE_TOUCHED. ----
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
    # ---- r18-certified tail (fills r20's remaining free slot as
    # ---- the oldest-position r18 name; the rest end the final round
    # ---- at age 2 — inside the 3-round freshness window) ----
    "bucketed_colocated_join",
    "partition_pruned_scan",
    "schema_drift_check",
    "asof_latest_view_before_purchase",
    "asof_view_within_6h",
    "doc_chunks_overlap",
    "pii_redaction",
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
    "funnel_leakage_daily",
    "materialize_incremental_clean_events",
    "materialize_dim_change_repair",
    "materialize_funnel_exists_repair",
    "maintenance_compaction",
    "two_level_overlay_maintenance",
    "streaming_upsert_hourly",
    "batch_sessionize_windows",
    "token_budget_packing",
    "bloom_semi_join_prune",
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
