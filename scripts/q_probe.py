#!/usr/bin/env python
"""Time named registry queries at an arbitrary SF dir (noop sink, warm
min-of-N) — the per-query scale probe used for the r14/r15 sf10 and sf100
measurements.

Usage: [SPARK_GRAFT_DRIVER_MEM=24g] python scripts/q_probe.py SF_DIR RUNS name [name...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_graph_database_system_spark.queries.registry import all_queries  # noqa: E402
from distributed_graph_database_system_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir, runs = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    spark = get_spark(app_name="q_probe")
    registry = all_queries()
    for name in names:
        spec = registry[name]
        best, all_runs = None, []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            all_runs.append(round(dt, 2))
            best = dt if best is None else min(best, dt)
        print(f"{name}: min {best:.2f}s  runs {all_runs}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
