"""Lineage pinning with an explain-dump escape hatch.

``pin(df)`` is ``df.localCheckpoint()`` — the correctness pin the prefix /
quantile machinery needs because a range partitioner's sample-based
boundaries are not stable across independent recomputations of the same
subtree (see operators/prefix.py / operators/quantile.py docstrings).

``SPARK_GRAFT_PLAN_NOPIN=1`` skips the pin so ``.explain()`` shows the full
lineage BEHIND the pinned frame (otherwise every plan dump truncates at
``Scan ExistingRDD`` and the interesting part of the plan is invisible).
This is an observability switch for scripts/dump_plans.py ONLY: executing a
query with it set re-derives the pinned subtree per consumer, which is both
slower and — for the range-partitioned two-pass machinery — a correctness
hazard. Never set it outside plan dumps; tests assert the default pins.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def pin(df: DataFrame) -> DataFrame:
    if os.environ.get("SPARK_GRAFT_PLAN_NOPIN") == "1":
        return df
    return df.localCheckpoint()
