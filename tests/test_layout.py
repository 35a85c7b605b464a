"""Plan-shape guarantees for the data-layout operators (sources/layout.py).

The oracle parity sweep proves the VALUES survive the layout round-trip;
these tests prove the PLANS are the ones the layout exists to buy:
no Exchange feeding a bucketed join, PartitionFilters on a pruned scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.layout import (
    layout_bucketed_join,
    layout_partition_pruned,
)
from distributed_graph_database_system_spark.sources import layout


def test_bucketed_join_has_no_input_shuffle(spark, sf_dir):
    df = layout_bucketed_join(spark, sf_dir)
    plan = layout.physical_plan(df)
    assert "SortMergeJoin" in plan, plan
    # The one shuffle allowed is the final groupBy re-key; the join inputs
    # must come straight from the bucketed files.
    assert layout.shuffle_count(df) == 1, plan


def test_bucketed_join_matches_direct_join(spark, sf_dir):
    from distributed_graph_database_system_spark.sources.catalog import load_table

    got = {r["o_orderpriority"]: r["n_items"] for r in layout_bucketed_join(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    want = {
        r["o_orderpriority"]: r["n"]
        for r in li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_partition_pruned_scan_prunes_directories(spark, sf_dir):
    df = layout_partition_pruned(spark, sf_dir)
    plan = layout.physical_plan(df)
    assert "PartitionFilters" in plan, plan
    # the date bounds must appear as partition (not data) filters
    assert "2024-01-08" in plan and "2024-01-15" in plan, plan


def test_partition_pruned_matches_unpartitioned_filter(spark, sf_dir):
    from distributed_graph_database_system_spark.sources.catalog import load_table

    got = layout_partition_pruned(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    want = (
        e.filter(
            (F.col("ts").cast("date") >= F.lit("2024-01-08").cast("date"))
            & (F.col("ts").cast("date") < F.lit("2024-01-15").cast("date"))
        )
        .groupBy(F.col("ts").cast("date").cast("timestamp").alias("event_day"), "event_type")
        .count()
    )
    got_n = {(r["event_day"], r["event_type"]): r["n"] for r in got.collect()}
    want_n = {(r["event_day"], r["event_type"]): r["count"] for r in want.collect()}
    assert got_n == want_n and sum(got_n.values()) > 0


def test_sorted_within_partitions_keeps_rows(spark, sf_dir):
    from distributed_graph_database_system_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    s = layout.sorted_within_partitions(e, ["ts"])
    assert s.count() == e.count()
    # no shuffle added: sortWithinPartitions is a local sort
    assert layout.shuffle_count(s) == 0
