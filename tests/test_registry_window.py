"""The driver records CORRECTNESS rows for the first 50 registry entries
only, so the window ordering IS part of the driver contract: every SURVEY
§2.2 operator row must be represented either inside the window or by a
query already recorded green in an on-disk CORRECTNESS_r*.json ledger
(a silent reordering would evict families from the driver's view without
failing anything else).

Round-14 window: all 50 entries are first-time (never graded through
r13) — the R14_POOL registered in round 13 (seeds_r14b/c/d/e). The
round-13 window rotated out whole (every entry fully green in
CORRECTNESS_r13), so the rows it evidenced (as-of/anti/EXCEPT joins,
GROUP/ORDER BY ALL, TRY-division projection, keyset pagination, the
r13 trend/forensic stats family, INTERVAL range frames, RFC-4180 CSV
source, partitioned ORC sink, the refgraph outdegree DataSource,
sliding/tumbling streaming twins, G8 SCC + radius/center, the
embeddings/shingle/dominant-lang LLM family) move to the HISTORICAL
contract below, asserted directly against the ledger files."""

from __future__ import annotations

import glob
import json
import os

from distributed_graph_database_system_spark.queries.registry import (
    DRIVER_WINDOW,
    all_queries,
)

# SURVEY §2.2 row → round-14 window queries that evidence it. Maintained
# by hand; the test checks that every mapped query is really inside the
# window.
ROW_EVIDENCE: dict[str, tuple[str, ...]] = {
    "filter": ("orders_open_aging_bands",),  # open-status + aging predicate
    "join_equi": (
        "events_type_cooccurrence_users",
        "nation_balance_gap_census",
    ),
    "join_outer": ("nation_balance_gap_census",),  # FULL OUTER reconcile
    "join_theta": (
        "events_dau_wau_ratio",  # day-range inequality join
        "orders_repeat_within7d_census",  # 7-day band pair join
    ),
    "join_range_asof": ("events_dau_wau_ratio",),
    "aggregation": (
        "customer_acctbal_decile_bounds",
        "part_type_modal_size",
        "lineitem_linecount_histogram",
        "orders_price_skew_kurtosis",
        "customer_balance_boxplot_stats",
        "lineitem_quantity_ecdf_points",
        "events_user_type_gap_median",
        "customer_dominant_segment_by_nation",
        "customer_rfm_segment_census",
        "lineitem_qty_price_decile_grid",
    ),
    "window_functions": (
        "orders_monthly_mom_delta",
        "orders_daily_rev_drawdown",
        "events_user_record_breaks",
    ),
    "scalar_string": (
        "part_name_anagram_census",
        "customer_name_format_audit",
        "documents_first_word_census",
    ),
    "scalar_datetime": (
        "orders_leap_week53_census",
        "lineitem_shipdow_volume_index",
        "customer_order_span_histogram",
        "orders_open_aging_bands",
    ),
    "scalar_math": (
        "orders_custkey_birthday_collisions",
        "orders_priority_mix_tvd_monthly",
        "events_value_magnitude_bands",
        "orders_priority_rank_kendall_yoy",
        "lineitem_discount_tax_chi2",
        "orders_priority_hhi_quarterly",
        "events_user_activity_zipf_slope",
        "documents_source_lang_jsd",
        "graph_degree_assortativity_g6",
    ),
    "scans_sources": (
        "sink_csv_quote_roundtrip",  # write+readback covers the scan leg
        "sink_json_struct_roundtrip",
    ),
    "sinks": (
        "sink_csv_quote_roundtrip",
        "sink_json_struct_roundtrip",
    ),
    "scalar_json": ("sink_json_struct_roundtrip",),
    "dq_audits": (
        "orders_key_density_audit",
        "customer_name_format_audit",
    ),
    "streaming_windows": (
        "stream_tumbling1d_type_value",
        "stream_hopping12h_value_median",
        "stream_tumbling15m_error_rate",
    ),
    "graph_analytics": (
        "graph_clustering_coeff_g6",
        "graph_wcc_arith_islands",
        "graph_common_neighbors_g6",
        "graph_degree_assortativity_g6",
    ),
    "llm_pipeline": ("sample_md5_bernoulli_audit",),
    "llm_dedup": ("corpus_dedup_rate_by_source",),
    "llm_text_multimodal": (
        "documents_char_bigram_entropy",
        "documents_ttr_band_census",
        "documents_lang_source_mutual_info",
    ),
    "udf_pandas": (
        "multimodal_wav_duration_histogram",
        "multimodal_bmp_pixel_stats",
    ),
}

# §2.2 rows whose driver evidence is historical: query name → the row(s)
# it evidences. Every name must appear fully green (rows+schema+hash,
# no err) in at least one CORRECTNESS_r*.json on disk. These are the
# rotated-out anchors (r2–r10) for rows whose pool members were exhausted
# by earlier windows.
HISTORICAL_EVIDENCE: dict[str, tuple[str, ...]] = {
    "replica_consistency_check": ("scans_sources", "sinks"),  # r5–r9
    "source_refgraph_roundtrip": ("python_datasource",),  # r5–r9
    "layout_dpp_join": ("data_layout",),  # r5–r9
    "join_salted_skew": ("join_skew",),  # r2–r9
    "sessionize": ("streaming_windows",),  # r2–r9
    "stream_session_window": ("streaming_windows",),  # r5–r9
    "stream_dedup_keys": ("streaming_stateful_join",),  # r5–r9
    "supplier_acctbal_band_pairs": ("join_theta",),  # r9
    "join_asof_backward_click": ("join_range_asof",),  # r9
    "division_all_priority_customers": ("join_semi_anti",),  # r9
    "graph_dfs_g4": ("graph_dfs",),  # r9
    "graph_bfs_g6": ("graph_bfs",),  # r9 (single-source golden)
    # round-10 window anchors, all green in CORRECTNESS_r10.json:
    "basket_association_rules": ("multi_join_breadth",),
    "orders_unpivot_price_components": ("projection",),  # UNPIVOT Expand
    "customer_recent_orders_lateral": ("subquery_decorrelation",),
    "lineitem_price_qty_regression": ("aggregation",),  # regr_* family
    "orders_key_bitops_by_status": ("aggregation",),  # bit aggregates
    "supplier_best_part_maxby": ("aggregation",),  # max_by struct key
    "events_xml_roundtrip": ("scalar_xml",),
    "events_props_try_arithmetic": ("scalar_json",),
    "fd_violation_audit": ("dq_audits",),
    "privacy_kanonymity_audit": ("dq_audits",),
    "multimodal_corpus_report": ("udf_pandas", "llm_text_multimodal"),
    "boilerplate_line_census": ("llm_dedup",),
    "embed_covariance": ("scalar_array_hof", "llm_similarity"),
    "embed_centroids": ("llm_similarity",),
    "corpus_source_entropy": ("llm_pipeline",),
    "graph_multi_source_bfs_g6": ("graph_bfs",),  # r10
    "graph_eccentricity_g6": ("graph_analytics",),  # r10
    # round-11 window anchors, all green in CORRECTNESS_r11.json:
    "orders_merge_upsert_sim": ("join_outer", "join_equi"),
    "orders_not_in_null_trap": ("join_semi_anti", "subquery_decorrelation"),
    "dim_values_broadcast_decode": ("join_broadcast",),
    "parts_price_band_within_brand": ("join_theta",),
    "join_asof_tolerance_click": ("join_range_asof",),
    "agg_distinct_salted_exact": ("join_skew", "aggregation"),
    "lineitem_disjunctive_margin_screen": ("disjunctive_predicates",),
    "agg_rollup_priority_year_revenue": ("grouping_sets",),
    "customers_repeat_9495_intersect_all": ("set_operations",),
    "lineitem_pivot_two_measures": ("projection",),
    "orders_percentile_cont_exact": ("aggregation",),
    "sample_stratified_topk_events": ("sort_limit_topk",),
    "sample_class_balanced_docs": ("llm_pipeline",),
    "sink_partitioned_pruned_roundtrip": ("sinks", "data_layout"),
    "source_parquet_schema_evolution": ("scans_sources",),
    "source_csv_corrupt_permissive": ("scans_sources",),
    "source_json_nested_roundtrip": ("scalar_json",),
    "source_refgraph_degree_census": ("python_datasource",),
    "stream_hopping_type_counts": ("streaming_windows",),
    "graph_bfs_g7": ("graph_bfs",),
    "graph_dfs_g7": ("graph_dfs",),
    "graph_articulation_points_g6": ("graph_analytics",),
    "graph_bridges_g6": ("graph_analytics",),
    "embed_kmeans_two_rounds": ("llm_similarity",),
    "embed_silhouette_simplified": ("llm_similarity",),
    "embed_quantize_int8_error": ("llm_similarity",),
    "text_hapax_ratio_by_source": ("scalar_string", "llm_text_multimodal"),
    "multimodal_phash_layout_census": ("udf_pandas", "llm_text_multimodal"),
    "customer_order_streaks": ("scalar_datetime", "window_functions"),
    "events_hour_dow_heatmap": ("scalar_datetime",),
    "events_mannwhitney_purchase_view": ("scalar_math",),
    "part_size_price_spearman": ("scalar_math",),
    # KS was rewritten onto the distributed prefix sum this round (no
    # window remains in its plan), so it evidences only the math row;
    # window_functions keeps customer_order_streaks as its anchor.
    "events_ks_two_sample": ("scalar_math",),
    # round-12 window anchors, all green in CORRECTNESS_r12.json:
    "agg_groupingsets_flag_priority": ("grouping_sets", "aggregation"),
    "events_nullif_distinct_screen": ("disjunctive_predicates", "filter"),
    "orders_status_share_pivot": ("projection",),
    "events_props_k_decile_census": ("scalar_json",),
    "multimodal_wav_energy_census": ("udf_pandas", "llm_text_multimodal"),
    "graph_bfs_g8": ("graph_bfs",),
    "graph_dfs_g8": ("graph_dfs",),
    "graph_closeness_centrality_g6": ("graph_analytics",),
    "graph_whatif_cut_cosupply": ("graph_analytics",),
    "sample_temperature_mix_plan": ("llm_pipeline",),
    "corpus_jaccard_band_sweep": ("llm_dedup",),
    "documents_dupgraph_degree_census": ("llm_dedup",),
    "embed_centroid_distance_matrix": ("llm_similarity",),
    "customers_without_orders_outer": ("join_outer", "join_equi"),
    "supplier_local_demand_semi": ("join_semi_anti",),
    "orders_price_band_dim_range": ("join_theta", "join_broadcast"),
    "suppliers_above_nation_avg": ("subquery_decorrelation",),
    "customers_9496_symmetric_diff": ("set_operations",),
    "stream_session_user_gap30m": ("streaming_windows",),
    "source_parquet_pruned_projection_roundtrip": ("scans_sources",),
    "sink_overwrite_dynamic_partitions": ("sinks", "data_layout"),
    "source_refgraph_edge_reciprocity": ("python_datasource",),
    # round-13 window anchors, all green in CORRECTNESS_r13.json:
    "lineitem_try_divide_margin": ("projection",),
    "events_nearest_hub_assignment": ("join_broadcast", "join_equi"),
    "events_last_order_asof_lag": ("join_range_asof", "join_outer"),
    "parts_unshipped_1998h2_anti": ("join_semi_anti",),
    "customers_highbal_inactive_except": ("set_operations",),
    "supplier_nation_balance_share": ("subquery_decorrelation",),
    "orders_keyset_pagination_page3": ("sort_limit_topk", "filter"),
    "nation_region_order_by_all": ("sort_limit_topk",),
    "orders_group_by_all_revenue": ("aggregation",),
    "orders_mann_kendall_trend": ("join_theta",),
    "orders_rising_runs_match3": ("window_functions",),
    "orders_range_interval_3day_sum": ("window_functions",),
    "part_adjective_levenshtein_pairs": ("scalar_string",),
    "orders_quarter_trunc_census": ("scalar_datetime",),
    "orders_key_popcount_census": ("scalar_math",),
    "source_csv_quoted_multiline_roundtrip": ("scans_sources",),
    "sink_orc_partitioned_roundtrip": ("sinks", "data_layout"),
    "source_refgraph_outdeg_histogram": ("python_datasource",),
    "stream_sliding6h_user_reach": ("streaming_windows",),
    "graph_scc_g8": ("graph_analytics",),
    "graph_radius_center_g6": ("graph_bfs", "graph_analytics"),
    "embed_dim_variance_topk": ("llm_similarity",),
    "embed_norm_band_census": ("llm_similarity", "scalar_array_hof"),
    "documents_shingle3_distinct_rate": ("llm_dedup",),
    "documents_dominant_lang_by_source": ("llm_text_multimodal",),
}

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _graded_green() -> set[str]:
    green: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            for name, row in json.load(f).items():
                if (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                    and not row.get("err")
                ):
                    green.add(name)
    return green


def test_window_is_first_50_entries():
    names = list(all_queries())
    assert len(DRIVER_WINDOW) == 50
    assert names[:50] == list(DRIVER_WINDOW)


def test_window_covers_every_mapped_survey_row():
    window = set(DRIVER_WINDOW)
    missing = {
        row: qs for row, qs in ROW_EVIDENCE.items() if not set(qs) <= window
    }
    assert not missing, f"rows whose evidence fell out of the window: {missing}"


def test_historical_rows_are_green_in_the_ledger():
    green = _graded_green()
    missing = {
        name: rows
        for name, rows in HISTORICAL_EVIDENCE.items()
        if name not in green
    }
    assert not missing, (
        "historical-evidence queries with no fully-green CORRECTNESS row: "
        f"{missing}"
    )


def test_round14_window_is_all_first_time():
    """The round-14 rotation claim: no window entry was graded before the
    round-14 run. (Ledgers from r14 on are this window's own grading
    rounds, so they are excluded — once CORRECTNESS_r14 lands, the window
    entries become graded and this documents the ledger is complete.)"""
    graded: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        num = path.rsplit("_r", 1)[1].split(".")[0]
        if num.isdigit() and int(num) >= 14:
            continue  # this window's own grading round and later
        with open(path) as f:
            graded |= set(json.load(f).keys())
    overlap = set(DRIVER_WINDOW) & graded
    assert not overlap, f"window entries already graded before r14: {overlap}"


def test_window_queries_all_registered_and_runnable_signatures():
    qs = all_queries()
    for name in DRIVER_WINDOW:
        assert name in qs
        assert callable(qs[name].fn)
