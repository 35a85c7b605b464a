#!/usr/bin/env python
"""Interleaved single-JVM A/B of the fixture row-group layout (r15).

Side A: baseline fixtures (single parquet row group per table) with the
        default ``spark.sql.files.openCostInBytes`` (4 MB).
Side B: multi-row-group rewrite of the SAME rows (scripts/
        rewrite_rowgroups.py) with openCostInBytes lowered so a
        ~10-MB fact file actually splits into ~defaultParallelism scan
        tasks (the 4-MB open cost floors maxSplitBytes at 4 MB, i.e.
        3 splits — and with one row group even those carry no rows).

Both sides run inside ONE JVM, alternating run-by-run (A,B,A,B,...),
min per side — the only protocol with signal on this container
(BASELINE.md: cross-JVM noise is 2-4x).

Usage: python scripts/ab_fixture_probe.py A_DIR B_DIR [runs_per_side] [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_graph_database_system_spark.queries.registry import all_queries  # noqa: E402
from distributed_graph_database_system_spark.session import get_spark  # noqa: E402

DEFAULT_NAMES = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q10_returned_items", "agg_cube", "window_rank",
    "topk_per_group", "join_asof", "sessionize", "join_range_bucketed",
    "q7_nation_volume", "window_range_frame", "dedup_exact",
    "dedup_minhash_lsh", "sim_topk_bruteforce", "text_quality",
    "text_fingerprint", "stream_tumbling_counts", "graph_degrees_custsupp",
]

OPEN_COST_B = str(128 * 1024)


def main() -> int:
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    names = sys.argv[4:] or DEFAULT_NAMES
    spark = get_spark(app_name="ab_fixture_probe")
    registry = all_queries()
    open_cost_a = spark.conf.get("spark.sql.files.openCostInBytes")

    def run_once(name: str, sf_dir: str, open_cost: str) -> float:
        spark.conf.set("spark.sql.files.openCostInBytes", open_cost)
        spark.sparkContext.setJobDescription(f"{name} @ {sf_dir}")
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    # warm both sides once (codegen, footers, python workers)
    for d, oc in ((a_dir, open_cost_a), (b_dir, OPEN_COST_B)):
        run_once("q1_pricing_summary", d, oc)

    tot_a = tot_b = 0.0
    print(f"{'query':34s} {'A(base)':>8s} {'B(rg)':>8s} {'delta':>8s}")
    for name in names:
        if name not in registry:
            continue
        best_a = best_b = None
        for _ in range(runs):
            ta = run_once(name, a_dir, open_cost_a)
            tb = run_once(name, b_dir, OPEN_COST_B)
            best_a = ta if best_a is None else min(best_a, ta)
            best_b = tb if best_b is None else min(best_b, tb)
        tot_a += best_a
        tot_b += best_b
        print(
            f"{name:34s} {best_a:8.3f} {best_b:8.3f} "
            f"{(best_b - best_a) / best_a * 100:+7.1f}%"
        )
    print(
        f"{'TOTAL':34s} {tot_a:8.3f} {tot_b:8.3f} "
        f"{(tot_b - tot_a) / tot_a * 100:+7.1f}%"
    )
    spark.conf.set("spark.sql.files.openCostInBytes", open_cost_a)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
