"""The pin() escape hatch must never change default behavior.

pin(df) IS localCheckpoint by default — the prefix/quantile machinery's
correctness pin (range-partitioner boundaries are sample-based; the pinned
frame feeds two consumers that must see one placement). The
SPARK_GRAFT_PLAN_NOPIN=1 switch exists ONLY so scripts/dump_plans.py can
show the lineage behind the pin; these tests freeze both sides.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_graph_database_system_spark.operators.pin import pin


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pin_checkpoints_by_default(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_PLAN_NOPIN", raising=False)
    df = pin(spark.range(10).withColumn("v", F.col("id") * 2))
    # localCheckpoint replaces the lineage with an RDD scan
    assert "ExistingRDD" in _plan(df)
    assert df.count() == 10


def test_nopin_preserves_lineage(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PLAN_NOPIN", "1")
    df = pin(spark.range(10).withColumn("v", F.col("id") * 2))
    assert "ExistingRDD" not in _plan(df)
    assert "Range" in _plan(df)
    assert df.count() == 10
