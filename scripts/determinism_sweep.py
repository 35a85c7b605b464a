#!/usr/bin/env python
"""Partition-invariance sweep: run EVERY registered query twice — once at
the session default spark.sql.shuffle.partitions, once at a co-prime
low setting — and compare canonicalized row multisets exactly.

This is the global check behind the float-determinism discipline
(queries/helpers.py): pinned goldens and driver value-hashes are only
sound if a query's output is a pure function of the DATA, not of the
shuffle layout. Any query whose result moves under repartitioning would
show up here long before it flaked in a driver run.

Usage: python scripts/determinism_sweep.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from tests.parity import canon_rows  # noqa: E402


def main() -> int:
    from distributed_graph_database_system_spark.queries.registry import (
        all_queries,
    )
    from distributed_graph_database_system_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or None
    spark = get_spark(app_name="determinism-sweep")
    qs = all_queries()
    todo = names or list(qs)
    unknown = [n for n in todo if n not in qs]
    if unknown:
        raise SystemExit(f"unknown query name(s): {unknown}")
    base = spark.conf.get("spark.sql.shuffle.partitions")
    alt = "7"
    failed = []
    t0 = time.perf_counter()
    for name in todo:
        spec = qs[name]
        try:
            spark.conf.set("spark.sql.shuffle.partitions", base)
            a = canon_rows(spec.fn(spark, sf_dir).toPandas())
            spark.conf.set("spark.sql.shuffle.partitions", alt)
            b = canon_rows(spec.fn(spark, sf_dir).toPandas())
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            print(f"ERR  {name}: {str(ex)[:160]}")
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", base)
        if a == b:
            print(f"ok   {name}")
        else:
            failed.append(name)
            sa, sb = set(a), set(b)
            print(
                f"DRIFT {name}: {len(a)}/{len(b)} rows; "
                f"only-base sample={list(sa - sb)[:2]}; "
                f"only-alt sample={list(sb - sa)[:2]}"
            )
    dt = round(time.perf_counter() - t0, 1)
    print(
        f"\n{len(todo) - len(failed)}/{len(todo)} queries partition-invariant "
        f"({dt}s); failures: {failed or 'none'}"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
