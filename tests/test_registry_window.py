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
    "projection": ("orders_price_components",),  # expression arithmetic
    "filter": ("lineitem_multi_predicate_screen",),  # conjunctive pushdown
    "join_equi": (
        "region_brand_trade_matrix",  # 5-table star equi chain
    ),
    "join_broadcast": ("join_broadcast_expensive_parts",),  # F.broadcast
    "join_outer": ("customers_without_1995_orders_outer",),
    "join_theta": ("supplier_acctbal_band_pairs",),  # band predicate
    "join_range_asof": ("join_asof_backward_click",),  # backward + exact
    "join_semi_anti": ("division_all_priority_customers",),  # division/anti
    "join_skew": ("join_salted_skew",),
    "aggregation": (
        "agg_value_histogram",  # width-bucket histogram
        "orders_bootstrap_ci_mean",  # Poisson bootstrap CI
        "events_user_entropy",  # Shannon entropy
    ),
    "subquery_decorrelation": (
        "customer_order_counts_correlated",  # COUNT-bug decorrelation
    ),
    "multi_join_breadth": ("region_brand_trade_matrix",),
    "disjunctive_predicates": ("lineitem_disjunctive_quality_flags",),
    "grouping_sets": ("agg_cube3_flag_status_year",),  # 3-dim CUBE
    "window_functions": (
        "orders_interpurchase_gaps",  # LAG gaps
        "events_attribution_last_touch",
        "events_sliding7_quantiles_hist",
    ),
    "sort_limit_topk": ("orders_latest3_per_customer",),  # top-k per group
    "set_operations": ("users_views_except_purchases_all",),  # EXCEPT ALL
    "scalar_string": (
        "linkage_blocked_best_match",  # blocked edit distance
        "events_pattern_match",  # listagg + regex funnel
    ),
    "scalar_datetime": ("conversion_time_stats", "sessionize"),
    "scalar_math": ("corpus_zipf_slope", "events_periodogram"),
    "scalar_array_hof": ("embed_similarity_histogram",),  # posexplode dims
    "scalar_json": ("json_props_bucketized",),  # JSON value grouping key
    "data_layout": ("layout_dpp_join",),  # zorder/bucketed/pruned driver-seen
    "streaming_windows": ("sessionize", "stream_session_window"),
    "streaming_stateful_join": ("stream_dedup_keys",),  # join twin seen r5
    "udf_pandas": (
        "multimodal_deep_jpeg",  # real Huffman+IDCT decode pandas UDF
        "multimodal_deep_gif",
        "multimodal_deep_avi",
    ),
    "graph_bfs": ("graph_bfs_g6",),  # BFS golden on bridged fixture
    "graph_dfs": ("graph_dfs_g4",),
    "graph_analytics": (
        "graph_degree_assortativity",
        "graph_rich_club",
        "graph_local_clustering",
        "graph_random_walks",
    ),
    "python_datasource": ("source_refgraph_roundtrip",),
    "llm_dedup": (
        "text_winnowing_pairs",  # MOSS winnowing fingerprint pairs
        "linkage_blocked_best_match",
    ),
    "llm_similarity": (
        "embed_geometric_median",
        "embed_similarity_histogram",
        "embed_centroid_classifier_eval",
    ),
    "llm_pipeline": (
        "sample_weighted_priority",
        "corpus_kl_divergence",
        "chunk_documents_overlap",
    ),
    "llm_text_multimodal": (
        "text_langid_confusion",
        "text_lexical_diversity",
        "multimodal_deep_jpeg",
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
