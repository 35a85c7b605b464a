#!/usr/bin/env python
"""A/B a SparkSession config against the default on named queries.

Usage:
    python scripts/conf_probe.py <sf_dir> <runs> '<k=v>[,<k=v>...]' name [name...]

Times each query (noop sink, min of <runs>) in ONE JVM built with the given
conf overrides ('' = baseline defaults) and prints one JSON line. Run once
per config — Spark confs like the shuffle codec cannot change inside a JVM.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from distributed_graph_database_system_spark.queries.registry import all_queries  # noqa: E402
from distributed_graph_database_system_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir, runs, conf_s = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    names = sys.argv[4:]
    conf = dict(kv.split("=", 1) for kv in conf_s.split(",") if kv)
    spark = get_spark(app_name=f"conf_probe {conf_s or 'baseline'}", extra_conf=conf)
    registry = all_queries()

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    # warm: JVM + parquet footers + python workers (same as bench.py)
    materialize(registry["q1_pricing_summary"].fn(spark, sf_dir).limit(1))
    out: dict[str, float] = {}
    for name in names:
        spec = registry[name]
        spark.sparkContext.setJobDescription(name)
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            materialize(spec.fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 2)
    print(json.dumps({"conf": conf, "sf_dir": sf_dir, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
