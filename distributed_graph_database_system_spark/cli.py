"""Command-line client mirroring the reference's REPL menu (client.c:26-31),
plus access to the engine's full registered-query surface.

    python -m distributed_graph_database_system_spark.cli --root /tmp/graphs add    g1 graph.txt
    python -m distributed_graph_database_system_spark.cli --root /tmp/graphs modify g1 graph.txt
    python -m distributed_graph_database_system_spark.cli --root /tmp/graphs dfs    g1 1
    python -m distributed_graph_database_system_spark.cli --root /tmp/graphs bfs    g1 1
    python -m distributed_graph_database_system_spark.cli list-queries
    python -m distributed_graph_database_system_spark.cli query q1_pricing_summary --sf-dir /root/testdata/sf0.001

``graph.txt`` uses the reference's own at-rest format (vertex count line +
n×n 0/1 matrix, ``primaryServer.c:43-49``), so files written by the reference
load unchanged. Traversal output is the reference's wire format: a
space-joined 1-indexed vertex list — without the 256-byte cap.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="distributed_graph_database_system_spark")
    ap.add_argument("--root", help="graph store directory (graph ops only)")
    ap.add_argument("--cpus", type=int, default=8)
    sub = ap.add_subparsers(dest="op", required=True)
    for op in ("add", "modify"):
        p = sub.add_parser(op)
        p.add_argument("name")
        p.add_argument("file", help="reference-format graph file")
    for op in ("dfs", "bfs"):
        p = sub.add_parser(op)
        p.add_argument("name")
        p.add_argument("start", type=int)
    sub.add_parser("list-queries", help="list registered query names")
    q = sub.add_parser("query", help="run a registered query against a fixture dir")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--limit", type=int, default=20)
    x = sub.add_parser(
        "explain",
        help="show a registered query's physical plan without running the "
        "final job (iterative operators still execute their intermediate "
        "steps while building the plan)",
    )
    x.add_argument("name")
    x.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args(argv)

    from distributed_graph_database_system_spark.session import get_spark

    if args.op == "list-queries":
        from distributed_graph_database_system_spark.queries.registry import all_queries

        for name, spec in all_queries().items():
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{name}\t{oracle}\t{','.join(spec.tags)}")
        return 0
    if args.op in ("query", "explain"):
        from distributed_graph_database_system_spark.queries.registry import all_queries

        registry = all_queries()
        if args.name not in registry:
            print(f"unknown query {args.name!r}; see list-queries", file=sys.stderr)
            return 2
        spark = get_spark(app_name="distributed_graph_database_system_spark-cli", cpus=args.cpus)
        df = registry[args.name].fn(spark, args.sf_dir)
        if args.op == "explain":
            # plan of the RESULT DataFrame — the final job is not run.
            # Caveat: iterative/driver-composed queries (graph loops,
            # prefix sums, sketches) execute their intermediate jobs while
            # the result is being constructed; only declarative queries
            # are fully free.
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0

    if not args.root:
        ap.error(f"--root is required for {args.op}")

    from distributed_graph_database_system_spark.api import Engine

    eng = Engine(get_spark(app_name="distributed_graph_database_system_spark-cli", cpus=args.cpus), args.root)
    if args.op in ("add", "modify"):
        store_fn = (
            eng.store.add_reference_file
            if args.op == "add"
            else eng.store.modify_reference_file
        )
        store_fn(args.name, args.file)
        print(
            "File successfully added" if args.op == "add" else "File successfully modified"
        )
    elif args.op == "dfs":
        print(eng.dfs_text(args.name, args.start))
    else:
        print(eng.bfs_text(args.name, args.start))
    return 0


if __name__ == "__main__":
    sys.exit(main())
