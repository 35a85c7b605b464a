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
    "join_equi": (
        "q14_promo_revenue_pct",  # lineitem⋈part conditional-agg ratio
    ),
    "join_broadcast": ("events_audience_overlap",),  # broadcast dim counts
    "join_outer": ("join_full_outer", "q13_order_count_distribution"),
    "join_theta": ("join_theta",),  # cross_join_dims driver-seen r5
    "join_range_asof": ("join_asof_nearest",),  # backward/forward seen r6
    "join_semi_anti": ("join_anti",),  # semi/bloom-semi driver-seen r5/r6
    "join_skew": ("join_salted_skew",),
    "aggregation": (
        "agg_mode_exact",
        "agg_hll_sliding7",  # sketch-merge sliding window
        "events_overlap_kmv",  # KMV bottom-k sketch estimates
        "events_sliding7_bitmap_exact",  # bitmap_construct/or_agg exact
        "lineitem_ols_normal_eq",  # exact-decimal moment aggregation
    ),
    "subquery_decorrelation": (
        "q11_important_parts",  # scalar subquery in HAVING; q4/q15 seen r5
    ),
    "multi_join_breadth": ("q8_market_share",),
    "disjunctive_predicates": ("q19_disjunctive_revenue",),
    "grouping_sets": ("agg_rollup",),  # cube/grouping_sets driver-seen r5/r6
    "window_functions": ("events_cumulative_distinct",),
    "sort_limit_topk": ("events_topk_trending",),  # per-window rank top-3
    "set_operations": ("set_ops",),
    "scalar_string": ("text_readability_flesch",),  # string_funcs seen r5
    "scalar_datetime": ("sessionize",),
    "scalar_math": ("supplier_return_rate_wilson",),
    "scalar_array_hof": ("pii_luhn_validation",),  # Luhn as JVM HOF expr
    "scalar_json": ("variant_semi_structured",),
    "data_layout": ("layout_dpp_join",),  # zorder/bucketed/pruned driver-seen
    "streaming_windows": ("sessionize", "stream_session_window"),
    "streaming_stateful_join": ("stream_dedup_keys",),  # join twin seen r5
    "udf_pandas": (
        "text_compression_ratio",  # zlib pandas UDF
        "multimodal_image_phash",  # real-PNG dHash pandas UDF
        "sql_udf_revenue",  # catalog SQL UDF (codegen-inlined)
    ),
    "graph_bfs": ("graph_harmonic_centrality",),  # landmark BFS distances
    "graph_dfs": ("graph_dfs_goldens",),
    "graph_analytics": (
        "graph_ktruss_g6",
        "graph_msf_g6w",
        "graph_coreness_g6",
        "graph_betweenness_g2",
        "graph_modularity_g6",
    ),
    "python_datasource": ("source_refgraph_roundtrip",),
    "llm_dedup": ("dedup_funnel_report",),
    "llm_similarity": ("coreset_kcenter",),
    "llm_pipeline": (
        "bpe_encode_tokens",
        "dedup_funnel_report",  # split/pack/sample driver-seen r6
    ),
    "llm_text_multimodal": (
        "text_perplexity_unigram",
        "text_keywords_textrank",
        "multimodal_image_phash",
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
