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
    "scans_sources": ("source_roundtrips",),
    "sinks": ("source_roundtrips",),
    "projection": ("projection_compute",),
    "filter": ("filter_predicates",),
    "join_equi": ("q3_shipping_priority",),
    "join_broadcast": ("q5_local_supplier_volume",),
    "join_theta": ("join_theta", "cross_join_dims"),
    "join_range_asof": ("join_interval_overlap",),  # asof driver-seen r4
    "join_semi_anti": ("join_semi", "join_anti"),
    "join_skew": ("join_salted_skew",),
    "aggregation": (
        "q1_pricing_summary",
        "agg_percentile_bands",
        "agg_hll_rollup",
        "agg_regression_stats",
    ),
    "subquery_decorrelation": (
        "q4_priority_exists",  # correlated EXISTS
        "q15_top_supplier",  # scalar subquery over a revenue view
    ),
    "multi_join_breadth": ("q8_market_share",),
    "disjunctive_predicates": ("q19_disjunctive_revenue",),
    "grouping_sets": ("agg_grouping_sets",),
    "window_functions": ("window_value_funcs",),
    "sort_limit_topk": ("sort_limit",),
    "set_operations": ("set_ops",),
    "scalar_string": ("string_funcs",),
    "scalar_datetime": ("date_funcs",),
    "scalar_math": ("math_funcs",),
    "scalar_array_hof": ("array_funcs",),
    "scalar_json": ("json_funcs",),
    "data_layout": ("layout_zorder_scan",),  # bucketed/pruned driver-seen r4
    "streaming_windows": ("stream_session_window",),  # tumbling seen r4
    "streaming_stateful_join": ("stream_dedup_keys", "join_view_purchase_window"),
    "udf_pandas": ("multimodal_decode_real", "multimodal_frame_sample"),
    "graph_bfs": ("graph_bfs_goldens", "graph_temporal_reachability"),
    "graph_dfs": ("graph_dfs_goldens",),
    "graph_analytics": (
        "graph_critical_path_g7",
        "graph_shortest_path_g2",
        "graph_topo_g7",
    ),
    "python_datasource": ("source_refgraph_roundtrip",),
    "llm_dedup": ("dedup_minhash_lsh",),  # ngram/clusters driver-seen r4
    "llm_similarity": ("sim_radius_search",),  # knn/persisted seen r4
    "llm_pipeline": (
        "pii_redact",
        "orders_abc_pareto",
        "events_markov_transitions",
        "sketch_cm_heavy_hitters",
        "join_cardinality_estimate",
    ),
    "llm_text_multimodal": (
        "text_tfidf_rank",
        "token_pmi_bigrams",
        "multimodal_decode_real",
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
