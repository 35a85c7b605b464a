"""The driver records CORRECTNESS rows for the first 50 registry entries
only, so the window ordering IS part of the driver contract: every SURVEY
§2.2 operator row must be represented either inside the window or by a
query already recorded green in an on-disk CORRECTNESS_r*.json ledger
(a silent reordering would evict families from the driver's view without
failing anything else).

Round-11 window: all 50 entries are first-time (never graded through
r10) — the 25-name R11_POOL plus 25 round-11 registrations. The round-10
window rotated out whole (every entry fully green in CORRECTNESS_r10),
so the rows it evidenced (projection/unpivot, LATERAL, regr_*/bit/max_by
aggregates, XML, TRY_* JSON, DQ audits, multimodal deep decodes, the
dedup front end, covariance/centroids) are covered by the HISTORICAL
contract below, asserted directly against the ledger files."""

from __future__ import annotations

import glob
import json
import os

from distributed_graph_database_system_spark.queries.registry import (
    DRIVER_WINDOW,
    all_queries,
)

# SURVEY §2.2 row → round-11 window queries that evidence it. Maintained
# by hand; the test checks that every mapped query is really inside the
# window.
ROW_EVIDENCE: dict[str, tuple[str, ...]] = {
    "projection": ("lineitem_pivot_two_measures",),  # conditional Expand
    "filter": (
        "lineitem_disjunctive_margin_screen",
        "events_iqr_tukey_fences",
    ),
    "join_equi": ("orders_merge_upsert_sim", "dim_values_broadcast_decode"),
    "join_broadcast": (
        "region_segment_revenue_broadcast",
        "dim_values_broadcast_decode",
    ),
    "join_outer": ("orders_merge_upsert_sim",),  # keyed full outer MERGE
    "join_semi_anti": (
        "suppliers_without_returns_anti",
        "orders_not_in_null_trap",  # null-aware anti
    ),
    "join_theta": ("parts_price_band_within_brand", "orders_theil_sen_daily"),
    "join_range_asof": ("join_asof_tolerance_click",),
    "join_skew": ("agg_distinct_salted_exact",),  # salted-key rewrite
    "aggregation": (
        "agg_distinct_salted_exact",
        "orders_kruskal_wallis_priority",
        "orders_percentile_cont_exact",
    ),
    "grouping_sets": ("agg_rollup_priority_year_revenue",),
    "set_operations": ("customers_repeat_9495_intersect_all",),
    "disjunctive_predicates": ("lineitem_disjunctive_margin_screen",),
    "subquery_decorrelation": ("orders_not_in_null_trap",),
    "window_functions": (
        "events_ks_two_sample",
        "customer_order_streaks",
        "events_concurrency_peak",
        "customer_revenue_lorenz_curve",
    ),
    "sort_limit_topk": (
        "sample_stratified_topk_events",
        "events_trigram_sequences",
    ),
    "scalar_string": ("text_hapax_ratio_by_source",),
    "scalar_datetime": (
        "events_hour_dow_heatmap",
        "events_log_rank_cohorts",
        "customer_order_streaks",
    ),
    "scalar_math": (
        "events_mannwhitney_purchase_view",
        "events_kendall_tau_daily",
        "orders_wilcoxon_signed_rank",
        "supplier_market_hhi",
        "supplier_nation_theil_index",
        "events_brown_double_smoothing",
        "orders_runs_test_daily_revenue",
        "part_size_price_spearman",
    ),
    "scalar_json": ("source_json_nested_roundtrip",),
    "scans_sources": (
        "source_csv_corrupt_permissive",
        "source_parquet_schema_evolution",
    ),
    "sinks": ("sink_partitioned_pruned_roundtrip",),
    "data_layout": ("sink_partitioned_pruned_roundtrip",),
    "python_datasource": ("source_refgraph_degree_census",),
    "streaming_windows": ("stream_hopping_type_counts",),
    "udf_pandas": ("multimodal_phash_layout_census",),
    "graph_bfs": ("graph_bfs_g7",),
    "graph_dfs": ("graph_dfs_g7",),
    "graph_analytics": (
        "graph_articulation_points_g6",
        "graph_bridges_g6",
    ),
    "llm_similarity": (
        "embed_kmeans_two_rounds",
        "embed_silhouette_simplified",
        "embed_quantize_int8_error",
    ),
    "llm_pipeline": (
        "sample_class_balanced_docs",
        "orders_price_decile_buckets_scalable",
    ),
    "llm_text_multimodal": (
        "text_hapax_ratio_by_source",
        "multimodal_phash_layout_census",
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


def test_round11_window_is_all_first_time():
    """The round-11 rotation claim: no window entry was graded before the
    round-11 run. (Ledgers from r11 on are this window's own grading
    rounds, so they are excluded — once CORRECTNESS_r11 lands, the window
    entries become graded and this documents the ledger is complete.)"""
    graded: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        num = path.rsplit("_r", 1)[1].split(".")[0]
        if num.isdigit() and int(num) >= 11:
            continue  # this window's own grading round and later
        with open(path) as f:
            graded |= set(json.load(f).keys())
    overlap = set(DRIVER_WINDOW) & graded
    assert not overlap, f"window entries already graded before r11: {overlap}"


def test_window_queries_all_registered_and_runnable_signatures():
    qs = all_queries()
    for name in DRIVER_WINDOW:
        assert name in qs
        assert callable(qs[name].fn)
