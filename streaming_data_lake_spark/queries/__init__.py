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
# Round 14 executes the rotation CHANGELOG_r13.md committed and
# tests/test_registry_order.py (r13 revision) pinned -- the LAST
# drain round (after it, no verdict predates r12): the 27-name
# r11-verdict drain (age 3 the moment CORRECTNESS_r13 landed) at
# positions 1-27, the 7 R13_ROUND_CODE_TOUCHED time-edge names at
# 28-34, and the 16 free slots filled oldest-r12-verdict-first
# (`tools/ledger.py --emit-order`, ties by prior position) at 35-50.
# The committed r15 drain follows contiguously: the 27 remaining
# r12-verdict names at 51-77 (age 3 at r15 -> r15 window = 27
# obligatory + 23 free, pinned by forward simulation in
# tests/test_registry_order.py). Rotated at round-14 start, before
# any driver run. tools/ledger.py cross-references the verdict files.
_CERTIFICATION_ORDER = [
    # ---- (a) the 27-name r14 drain: r11 verdicts, stale the moment
    # CORRECTNESS_r13 landed (committed by the r13 revision of this
    # module; pinned by test_r14_drain_fits_after_r13_lands) ----
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
    # ---- (b) the 7 R13_ROUND_CODE_TOUCHED commitments (r12 verdicts
    # certify pre-touch code): the time-edge admission contract
    # changed their engine filters and/or oracle text (CHANGELOG_r13
    # S11), incl. the warehouse-date bucket-safe month extension ----
    "sql_over_views_adhoc",
    "scd2_point_in_time_enrichment",
    "daily_distinct_users",
    "event_counters_unpivot",
    "sliding_window_metrics",
    "streaming_hourly_metrics",
    "monthly_nation_revenue",
    # ---- (c) the 16 free slots: oldest-verdict fills (all r12, ties
    # by prior position -- `tools/ledger.py --emit-order`), pre-
    # draining the r15 cliff from 43 r12 names to 27 ----
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
    # ---- position 51+ : NOT certified this round. First the
    # committed r15 drain: the 27 remaining r12-verdict names (age 3
    # at r15 -> r15 window = 27 obligatory + 23 free; forward-
    # simulated in tests/test_registry_order.py). Any name below that
    # r14 code-touches must move directly after this drain ----
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
    # ---- r14 code-touched while carrying r13 verdicts (the huge-doc
    # gate's first run found the LATERAL/list_slice O(tokens^2)
    # oracle shapes and the explode-then-slice Spark shape; engine
    # code and/or oracle text changed; certified-data results
    # verified unchanged). They take r15 free slots directly after
    # the drain ----
    "doc_chunks_overlap",
    "bigram_lm_quality",
    # (r14 dim-side time-edge admission in the M3 changed-key filter)
    "materialize_dim_change_repair",
    # (r14 megatoken probe: RFC-bounded email regex, engine + oracle)
    "pii_redaction",
    # (r14 row-scale sweep: exact-Jaccard pair generation rewritten
    # with lossless prefix-filter candidates + hashed-set intersect
    # verification — the naive shared-shingle self-join aggregated
    # 105M candidate groups at ~sf0.6, 23x the sf0.1 wall for 6x the
    # rows, in BOTH engines; dup_clusters_connected shares the fix
    # but is already an obligatory r15-drain member)
    "ngram_jaccard_near_dups",
    # ---- r13-certified (fresh through r15; the whole r13 window in
    # its certified order) ----
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
    "cms_heavy_hitter_tokens",
    "token_budget_packing",
    "bloom_semi_join_prune",
    "materialize_funnel_exists_repair",
    "maintenance_compaction",
    "two_level_overlay_maintenance",
    "hll_distinct_users_daily",
    "winnowing_fingerprints",
    "exact_substring_dups",
    "dedup_keep_best_quality",
    "event_quality_spine_hourly",
    "knn_ivf_recall_at_k",
    "multimodal_resize",
    "multimodal_frame_sample",
    "batch_sessionize_windows",
    "streaming_sessionize",
    "streaming_upsert_hourly",
    "user_rolling_7day_value",
    "semantic_dedup_centroid",
    "embedding_cosine_near_dups",
    "knn_ivf_materialized_cosine",
    "embedding_label_stats",
    "embedding_int8_quantization",
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
