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
    "projection": ("pivot_status_by_priority",),  # pivoted conditional cols
    "filter": ("outlier_zscore_events",),  # z-score predicate over events
    "join_equi": (
        "join_hash_hinted",  # SHUFFLE_HASH-hinted equi join
        "orders_duplicate_payment_screen",  # equi self-join prefix
    ),
    "join_broadcast": ("events_retention_curve",),  # explicit F.broadcast
    "join_outer": ("full_outer_hourly_signup_error",),
    "join_theta": ("orders_duplicate_payment_screen",),  # date-band residual
    "join_range_asof": ("join_asof_forward_error",),  # forward + exact-match
    "join_semi_anti": ("parts_quarter_no_shipment",),  # NOT EXISTS → anti
    "join_skew": ("join_salted_skew",),
    "aggregation": (
        "agg_weighted_median",
        "agg_approx_distinct",  # HLL sketch aggregate (pinned golden)
        "supplier_revenue_gini",  # prefix-sum rank + exact decimal sums
    ),
    "subquery_decorrelation": (
        "orders_customer_max_correlated",  # correlated scalar MAX
    ),
    "multi_join_breadth": ("nation_trade_balance",),
    "disjunctive_predicates": ("orders_disjunctive_screen",),
    "grouping_sets": ("agg_sets_returnflag_year",),
    "window_functions": ("intervals_merge", "events_twap_daily"),
    "sort_limit_topk": ("orders_hill_tail_index", "skyline_by_brand"),
    "set_operations": ("distinct_pairs",),
    "scalar_string": ("linkage_name_editdist",),  # editdist + q-grams
    "scalar_datetime": ("orders_seasonality_index", "sessionize"),
    "scalar_math": ("orders_benford_screen",),  # log10 leading digits
    "scalar_array_hof": ("featurize_hashing_trick",),
    "scalar_json": ("json_props_extract",),  # get_json_object path extract
    "data_layout": ("layout_dpp_join",),  # zorder/bucketed/pruned driver-seen
    "streaming_windows": ("sessionize", "stream_session_window"),
    "streaming_stateful_join": ("stream_dedup_keys",),  # join twin seen r5
    "udf_pandas": (
        "multimodal_deep_audio",  # WAV PCM16 decode pandas UDF
        "multimodal_audio_segments",
    ),
    "graph_bfs": ("graph_diameter_g6",),  # double-sweep BFS
    "graph_dfs": ("graph_dfs_g6",),
    "graph_analytics": (
        "graph_mis_g6",
        "graph_coloring_g6",
        "graph_hits_g2",
        "graph_bipartite_projection",
    ),
    "python_datasource": ("source_refgraph_roundtrip",),
    "llm_dedup": (
        "dedup_simhash",
        "dedup_containment",
        "dedup_substring_docfrac",
        "dedup_survivor_quality",
    ),
    "llm_similarity": (
        "sim_topk_ann_ivf",
        "embed_knn_classifier_eval",
        "embed_pca_project",
    ),
    "llm_pipeline": (
        "corpus_mix_plan",
        "bpe_train_merges",
    ),
    "llm_text_multimodal": (
        "text_code_detection",
        "multimodal_deep_audio",
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
