#!/usr/bin/env python
"""Interleaved A/B of a RUNTIME SQL conf on named queries, one JVM.

Usage:
    python scripts/ab_sqlconf_probe.py <sf_dir> <runs> '<k=v>[,...]' name [name...]

For each query, alternates baseline / conf-on runs (A,B,A,B,...), <runs>
each, reporting min per side — same JVM, same page cache, so the delta
isolates the conf. Only valid for confs settable via spark.conf.set()
(e.g. spark.sql.join.preferSortMergeJoin, AQE thresholds); static confs
(shuffle codec) need scripts/conf_probe.py's one-JVM-per-config form.
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
    spark = get_spark(app_name=f"ab {conf_s}")
    registry = all_queries()
    baseline = {k: spark.conf.get(k) for k in conf}

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    materialize(registry["q1_pricing_summary"].fn(spark, sf_dir).limit(1))
    out: dict[str, dict[str, float]] = {}
    for name in names:
        spec = registry[name]
        best = {"A": None, "B": None}
        for i in range(2 * runs):
            side = "A" if i % 2 == 0 else "B"
            vals = baseline if side == "A" else conf
            for k, v in vals.items():
                spark.conf.set(k, v)
            spark.sparkContext.setJobDescription(f"{name} [{side}]")
            t0 = time.perf_counter()
            materialize(spec.fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            if best[side] is None or dt < best[side]:
                best[side] = dt
        for k, v in baseline.items():
            spark.conf.set(k, v)
        out[name] = {
            "base": round(best["A"], 2),
            "conf": round(best["B"], 2),
            "delta_pct": round(100 * (best["B"] - best["A"]) / best["A"], 1),
        }
    print(json.dumps({"conf": conf, "sf_dir": sf_dir, "runs": runs, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
