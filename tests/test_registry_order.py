"""The driver certifies only the first 50 registered queries, so the
registry order IS part of the correctness contract: every family the
round-1 run could not score must sit inside the window, and the order
list must stay in exact sync with the registry."""

from __future__ import annotations

from streaming_data_lake_spark.queries import all_queries

WINDOW = 50

# Judge-named round-2 certification targets (VERDICT.md "Next round"
# item 2) plus one representative per previously-unscored family.
MUST_BE_IN_WINDOW = {
    "knn_ivf_cosine",
    "knn_ivf_multiprobe_cosine",
    "embedding_cosine_near_dups",
    "multimodal_frame_sample",
    "multimodal_media_features",
    "salted_skew_aggregation",
    "replicated_skew_join_rollup",
    "streaming_funnel_daily",
    "streaming_upsert_hourly",
    "streaming_sessionize",
    # round-1 nanos-blocked representatives
    "events_clean",
    "asof_view_within_6h",
    "partition_pruned_scan",
    "materialize_incremental_clean_events",
}


def test_order_in_sync_and_window_covers_uncertified_families():
    qs = all_queries()
    names = list(qs)
    assert len(names) == len(set(names))
    window = set(names[:WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_every_query_is_callable_and_oracle_typed():
    for name, q in all_queries().items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
