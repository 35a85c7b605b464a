"""The driver records CORRECTNESS rows for the first 50 registry entries
only, so the window ordering IS part of the driver contract: every SURVEY
§2.2 operator row must be represented either inside the window or by a
query already recorded green in an on-disk CORRECTNESS_r*.json ledger
(a silent reordering would evict families from the driver's view without
failing anything else).

Round-10 window: all 50 entries are first-time (never graded), emptying
the never-graded pool. Rows whose only strong probes were the long-graded
anchors (streaming twins, refgraph datasource, replica check, DPP layout,
skew join, DFS, grouping sets, set ops, semi/anti, as-of, disjunctive
screens) are covered by the HISTORICAL contract below, asserted directly
against the ledger files."""

from __future__ import annotations

import glob
import json
import os

from distributed_graph_database_system_spark.queries.registry import (
    DRIVER_WINDOW,
    all_queries,
)

# SURVEY §2.2 row → round-10 window queries that evidence it. Maintained
# by hand; the test checks that every mapped query is really inside the
# window.
ROW_EVIDENCE: dict[str, tuple[str, ...]] = {
    "projection": ("orders_unpivot_price_components",),  # Expand projection
    "filter": ("events_mad_outliers",),  # MAD threshold screen
    "join_equi": ("basket_part_pairs", "join_null_safe"),
    "join_broadcast": ("basket_association_rules",),  # explicit F.broadcast
    "join_outer": ("join_null_safe", "events_gap_fill_forward"),
    "aggregation": (
        "lineitem_price_qty_regression",  # regr_* family
        "orders_key_bitops_by_status",  # bit aggregates
        "orders_price_percentile_disc",  # order statistics
        "supplier_best_part_maxby",  # max_by struct key
    ),
    "subquery_decorrelation": ("customer_recent_orders_lateral",),  # LATERAL
    "multi_join_breadth": ("basket_association_rules",),
    "window_functions": (
        "events_autocorr_lag1",
        "orders_price_ntile_deciles",
        "events_gap_fill_forward",
    ),
    "sort_limit_topk": ("customer_recent_orders_lateral",),  # top-k per group
    "scalar_string": (
        "pii_redaction_census",
        "text_repetition_score",
        "boilerplate_line_census",
    ),
    "scalar_datetime": (
        "events_survival_km",
        "orders_cohort_ltv_curve",
        "events_dod_retention_kmv",
    ),
    "scalar_math": (
        "events_chisq_type_dow",
        "events_ab_lift_ztest",
        "events_trend_mannkendall",
    ),
    "scalar_array_hof": (
        "embed_covariance",
        "inverted_index_postings",
        "embed_centroids",
    ),
    "scalar_json": ("events_props_try_arithmetic",),  # TRY_* over props JSON
    "scalar_xml": ("events_xml_roundtrip",),
    "udf_pandas": (
        "multimodal_deep_jpeg_progressive",
        "multimodal_deep_png_rgb",
        "multimodal_deep_gif_animated",
        "multimodal_deep_avi_mjpeg",
        "multimodal_deep_audio_24bit",
        "multimodal_corpus_report",
    ),
    "graph_bfs": ("graph_multi_source_bfs_g6",),
    "graph_analytics": ("graph_eccentricity_g6", "graph_reciprocity"),
    "llm_dedup": ("boilerplate_line_census",),
    "llm_similarity": (
        "embed_centroids",
        "embed_covariance",
        "embed_outlier_robust",
    ),
    "llm_pipeline": (
        "corpus_source_entropy",
        "pii_redaction_census",
        "analyze_column_stats",
    ),
    "llm_text_multimodal": (
        "text_repetition_score",
        "multimodal_corpus_report",
    ),
    "dq_audits": ("fd_violation_audit", "privacy_kanonymity_audit"),
}

# §2.2 rows whose driver evidence is historical: query name → the row(s)
# it evidences. Every name must appear fully green (rows+schema+hash,
# no err) in at least one CORRECTNESS_r*.json on disk. These are the
# rotated-out anchors plus rows whose pool members were exhausted by
# earlier windows.
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
    "lineitem_disjunctive_quality_flags": ("disjunctive_predicates",),  # r9
    "agg_cube3_flag_status_year": ("grouping_sets",),  # r9
    "users_views_except_purchases_all": ("set_operations",),  # r9
    "graph_dfs_g4": ("graph_dfs",),  # r9
    "graph_bfs_g6": ("graph_bfs",),  # r9 (single-source golden)
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


def test_round10_window_is_all_first_time():
    """The round-10 rotation claim: no window entry has ever been graded.
    (This test is round-10-specific by construction; once CORRECTNESS_r10
    records, the window entries become graded and the assertion flips to
    documenting that the ledger is complete — so it checks against the
    ledger files present at commit time only.)"""
    graded: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        num = path.rsplit("_r", 1)[1].split(".")[0]
        if num.isdigit() and int(num) >= 10:
            continue  # this window's own grading round and later
        with open(path) as f:
            graded |= set(json.load(f).keys())
    overlap = set(DRIVER_WINDOW) & graded
    assert not overlap, f"window entries already graded before r10: {overlap}"


def test_window_queries_all_registered_and_runnable_signatures():
    qs = all_queries()
    for name in DRIVER_WINDOW:
        assert name in qs
        assert callable(qs[name].fn)
