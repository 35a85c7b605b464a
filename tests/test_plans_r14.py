"""Physical-plan pins for the round-14 R16/R17 registrations — the
scale-critical shapes asserted, not just pre-graded: the quantile
machinery's range partition, the prefix-rank path's absence of global
windows, integer-banded joins staying off the cartesian path, and the
per-group top-k riding WindowGroupLimit.
"""

from __future__ import annotations

import pytest

from distributed_graph_database_system_spark.queries.registry import all_queries
from distributed_graph_database_system_spark.sources.layout import physical_plan


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    registry = all_queries()
    cache: dict[str, str] = {}

    def plan_of(name: str) -> str:
        if name not in cache:
            cache[name] = physical_plan(registry[name].fn(spark, sf_dir))
        return cache[name]

    return plan_of


def test_tail_p99_uses_span_buckets_not_builtin_percentile(plans):
    """The SLA tail report must ride group_quantiles_disc's span-bucketed
    ranks — a builtin percentile node here is the one-task-buffers-the-
    flag-group OOM shape the discipline bans. Since r15 the spans are
    deterministic cut-literal buckets (hash exchange on (_pid, group)),
    which replaced the r14 rangepartitioning + localCheckpoint pin; the
    probe's percentile_approx runs as a separate bounded job at build
    time, so the final plan still carries no percentile node and every
    window is _pid-partitioned."""
    p = plans("lineitem_price_tail_p99_by_flag")
    assert "percentile" not in p.lower()
    assert "_pid" in p
    assert _windows_all_partitioned(p)
    # the span exchange: hash on the bucket id + group, never a global sort
    assert "hashpartitioning(_pid" in p
    # and the pin is gone — the full lineage is visible, no RDD scan stub
    assert "ExistingRDD" not in p


def _windows_all_partitioned(p: str) -> bool:
    """Every windowspecdefinition in the plan names a partition key
    (the prefix machinery's _pid spans); an empty-keyed spec starts
    directly with the frame and is the single-task shape."""
    for line in p.splitlines():
        low = line.lower()
        if "windowspecdefinition(" in low:
            if "windowspecdefinition(specifiedwindowframe" in low.replace(
                " ", ""
            ):
                return False
    return True


def test_top1pct_share_has_no_global_window(plans):
    """Rank AND cumulative events come from the partitioned prefix-sum
    (its range repartition sits behind the machinery's checkpoint; the
    visible windows are all _pid-partitioned) — a Window over the full
    user order would be the single-task sort the global-window guard
    bans."""
    p = plans("events_top1pct_user_share")
    assert "_pid" in p
    assert _windows_all_partitioned(p)


def test_spearman_ranks_are_partitioned_prefix_counts(plans):
    p = plans("documents_length_vocab_spearman")
    assert "_pid" in p
    assert _windows_all_partitioned(p)
    assert "percentile" not in p.lower()


def test_gk_gamma_grid_joins_are_tiny_not_cartesian_on_fact(plans):
    """The O(n²) pair count must collapse onto the bounded band grid
    BEFORE the pair join — the single conditional join keeps the fact
    scan count at 2 (one per grid branch), not 8 as the two-join draft
    did."""
    import re

    p = plans("lineitem_qty_price_gk_gamma")
    # formatted plans list each operator twice (tree + details); count
    # the numbered detail entries for the true operator count
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) <= 2


def test_top2_lines_window_is_group_limited(plans):
    """rn <= 2 must push into the window (WindowGroupLimit) so each
    order's frame stops after 2 rows instead of ranking every line."""
    p = plans("orders_top2_lines_price_ratio")
    assert "WindowGroupLimit" in p


def test_intra_trade_broadcasts_at_fixture_scale_without_hints(plans):
    """No hard hints on the SF-growing dims — AQE/size stats must still
    pick broadcast joins at fixture scale (the r13 hint discipline)."""
    p = plans("nation_intra_trade_share")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_rolling30d_range_frame_is_bounded_spec(plans):
    """The 30-day window must be a RANGE frame over the integer day
    offset (29 PRECEDING), not an unbounded running frame."""
    p = plans("orders_rolling30d_revenue_peak")
    assert "specifiedwindowframe(RangeFrame, -29, currentrow$())" in p


def test_centroid_cosine_stays_jvm_side(plans):
    """The decimal-exact dot product must compile to JVM expressions —
    no Python evaluation node anywhere in the cosine path."""
    p = plans("embed_centroid_cosine_bands")
    assert "EvalPython" not in p
