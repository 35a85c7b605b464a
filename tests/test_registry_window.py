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
    "join_theta": ("join_theta",),
    "join_range_asof": ("join_range_bucketed", "join_asof"),
    "join_semi_anti": ("join_semi_anti",),
    "join_skew": ("join_salted_skew",),
    "aggregation": ("q1_pricing_summary", "agg_salted_skew"),
    "subquery_decorrelation": (
        "q2_min_cost_supplier",  # correlated scalar MIN → agg + equi-join
        "q20_dominant_suppliers",  # nested IN + correlated half-sum agg
        "q21_waiting_suppliers",  # EXISTS + NOT EXISTS self-joins
    ),
    "multi_join_breadth": ("q9_profit_by_nation_year",),
    "disjunctive_predicates": ("q19_disjunctive_revenue",),
    "grouping_sets": ("agg_grouping_flags",),
    "window_functions": ("window_distribution_funcs",),
    "sort_limit_topk": ("topk_per_group",),
    "set_operations": ("set_ops",),
    "scalar_string": ("scalar_funcs",),
    "scalar_datetime": ("scalar_funcs",),
    "scalar_math": ("scalar_funcs",),
    "scalar_array_hof": ("higher_order_funcs",),
    "scalar_json": ("json_struct_funcs",),
    "data_layout": ("layout_bucketed_join", "layout_partition_pruned"),
    "streaming_windows": (
        "stream_tumbling_counts",  # sliding rotated out r6; sweep-verified
        "stream_session_window",
    ),
    "streaming_stateful_join": ("stream_dedup_keys", "join_view_purchase_window"),
    "udf_pandas": ("udtf_sentence_stats", "multimodal_decode_real"),
    "graph_bfs": ("graph_bfs_goldens",),
    "graph_dfs": ("graph_dfs_goldens",),
    "graph_analytics": (
        "graph_kcore_g6",
        "graph_lpa_g6",
        "graph_ppr_g2",
        "graph_scc_g2",
    ),
    "python_datasource": ("source_refgraph_roundtrip",),
    "llm_dedup": (
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "dedup_clusters",
    ),
    "llm_similarity": (
        "sim_topk_ann_persisted",
        "sim_knn_join",
    ),
    "llm_pipeline": (
        "funnel_view_click_purchase",
        "cohort_weekly_retention",
        "snapshot_diff_corpus",
        "sample_weighted_reservoir",
        "dq_constraint_checks",
    ),
    "llm_text_multimodal": ("text_analysis", "multimodal_decode_real"),
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
