"""The driver records CORRECTNESS rows for the first 50 registry entries
only, so the window ordering IS part of the driver contract: every SURVEY
§2.2 operator row must be represented inside it, and the order must be
exactly DRIVER_WINDOW (a silent reordering would evict families from the
driver's view without failing anything else)."""

from __future__ import annotations

from distributed_graph_database_system_spark.queries.registry import (
    DRIVER_WINDOW,
    all_queries,
)

# SURVEY §2.2 row → window queries that evidence it. Maintained by hand;
# the test only checks that every mapped query is really inside the window
# (rows 20/24 — streaming watermarks and the graph write path — are
# pytest-covered because driver queries must be read-only batch).
ROW_EVIDENCE: dict[str, tuple[str, ...]] = {
    "scans_sources": ("replica_consistency_check",),  # parquet write+read-back
    "sinks": ("replica_consistency_check",),
    "projection": ("case_when_buckets",),  # projection_compute driver-seen r5
    "filter": ("q6_forecast_revenue",),  # filter_predicates driver-seen r5
    "join_equi": ("q12_shipmode_priority",),  # q3 driver-seen r5
    "join_broadcast": ("q10_returned_items",),  # q5 driver-seen r5
    "join_outer": ("join_left_outer",),
    "join_theta": ("join_theta",),  # cross_join_dims driver-seen r5
    "join_range_asof": ("scd2_apply_segment_change",),  # interval seen r5
    "join_semi_anti": ("join_bloom_reduced", "join_anti"),  # bloom IS a semi join
    "join_skew": ("join_salted_skew",),
    "aggregation": (
        "agg_stats",
        "agg_listagg_ordered",
        "agg_bitwise_bool",
        "agg_group_quantiles_scalable",  # new this round: scalable exact
    ),
    "subquery_decorrelation": (
        "q11_important_parts",  # scalar subquery in HAVING; q4/q15 seen r5
    ),
    "multi_join_breadth": ("q8_market_share",),
    "disjunctive_predicates": ("q19_disjunctive_revenue",),
    "grouping_sets": ("agg_rollup", "agg_cube"),  # grouping_sets seen r5
    "window_functions": ("window_rank", "window_lag_lead", "window_running"),
    "sort_limit_topk": ("text_ngram_topk",),  # sort_limit driver-seen r5
    "set_operations": ("set_ops",),
    "scalar_string": ("text_clean_normalize",),  # string_funcs seen r5
    "scalar_datetime": ("resample_hourly_ohlc", "sessionize"),  # date seen r5
    "scalar_math": ("math_funcs",),
    "scalar_array_hof": ("embed_norm_stats", "embed_standardize"),
    "scalar_json": ("variant_semi_structured",),
    "data_layout": ("layout_dpp_join",),  # zorder/bucketed/pruned driver-seen
    "streaming_windows": ("sessionize", "stream_session_window"),
    "streaming_stateful_join": ("stream_dedup_keys",),  # join twin seen r5
    "udf_pandas": ("multimodal_resize_plan",),  # decode/frame seen r5
    "graph_bfs": ("graph_landmark_bfs_g2",),  # goldens driver-seen r5
    "graph_dfs": ("graph_dfs_goldens",),
    "graph_analytics": (
        "graph_two_hop_counts",
        "graph_motif_feedforward",
        "graph_link_prediction",
    ),
    "python_datasource": ("source_refgraph_roundtrip",),
    "llm_dedup": ("dedup_substring_grams",),  # minhash/ngram driver-seen
    "llm_similarity": ("sim_mmr_rerank",),  # radius/knn/persisted seen
    "llm_pipeline": (
        "split_train_holdout",
        "pack_sequences",
        "sample_stratified",
        "events_rfm_segments_scalable",  # new this round: cut-table RFM
    ),
    "llm_text_multimodal": (
        "text_bm25_rank",
        "token_length_histogram",
        "multimodal_resize_plan",
    ),
}


def test_window_is_first_50_entries():
    names = list(all_queries())
    assert len(DRIVER_WINDOW) == 50
    assert names[:50] == list(DRIVER_WINDOW)


def test_window_covers_every_survey_row():
    window = set(DRIVER_WINDOW)
    missing = {
        row: qs
        for row, qs in ROW_EVIDENCE.items()
        if not set(qs) <= window
    }
    assert not missing, f"rows whose evidence fell out of the window: {missing}"


def test_window_queries_all_registered_and_runnable_signatures():
    qs = all_queries()
    for name in DRIVER_WINDOW:
        assert name in qs
        assert callable(qs[name].fn)
