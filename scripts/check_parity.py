#!/usr/bin/env python
"""Standalone oracle-parity sweep (same comparison as tests/parity.py).

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from distributed_graph_database_system_spark.session import get_spark  # noqa: E402
from tests.parity import run_parity  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    spark = get_spark(cpus=8)
    results = run_parity(spark, sf_dir, names)
    bad = 0
    for name, problems in sorted(results.items()):
        if problems:
            bad += 1
            print(f"FAIL {name}")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}")
    print(f"\n{len(results) - bad}/{len(results)} oracle-backed queries match")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
