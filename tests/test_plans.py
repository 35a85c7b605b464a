"""Physical-plan regression tests: the scale story (broadcasts, pushdown,
top-k, no-cartesian, bucketing) is asserted, not just documented in
PLANS.md — a refactor that silently degrades a plan shape fails here.
"""

from __future__ import annotations

import pytest

from distributed_graph_database_system_spark.queries.registry import all_queries
from distributed_graph_database_system_spark.sources.layout import physical_plan


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    """Formatted plans for the audited queries, computed once."""
    registry = all_queries()

    def plan_of(name: str) -> str:
        return physical_plan(registry[name].fn(spark, sf_dir))

    return plan_of


def test_q1_pushes_filter_and_prunes_columns(plans):
    p = plans("q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p
    # column pruning: the scan must not read the join keys it doesn't need
    assert "l_comment" not in p


def test_q3_uses_topk_not_global_sort(plans):
    assert "TakeOrderedAndProject" in plans("q3_shipping_priority")


def test_q5_broadcasts_bounded_dims(plans):
    p = plans("q5_local_supplier_volume")
    assert p.count("BroadcastHashJoin") >= 2  # region + nation at least


def test_theta_join_is_not_cartesian(plans):
    p = plans("join_theta")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_range_join_rides_equi_bucket(plans):
    p = plans("join_range_bucketed")
    assert "CartesianProduct" not in p
    assert "Join" in p


def test_minhash_python_boundaries_are_arrow_only(plans):
    p = plans("dedup_minhash_lsh")
    # Arrow-vectorized nodes are the ONLY sanctioned Python boundary
    assert "ArrowEvalPython" in p
    assert "BatchEvalPython" not in p  # row-at-a-time Python UDF


def test_sort_topk_is_take_ordered(plans):
    assert "TakeOrderedAndProject" in plans("sort_topk")


def test_bucketed_join_scans_report_buckets(plans):
    p = plans("layout_bucketed_join")
    assert "SelectedBucketsCount" in p
    assert "SortMergeJoin" in p


def test_partition_pruned_scan_has_partition_filters(plans):
    assert "PartitionFilters" in plans("layout_partition_pruned")
