"""Subprocess body for the cross-session bucketed-GraphStore test.

Runs TWO sequential SparkSessions in one fresh JVM-per-phase process,
both backed by the same embedded Derby Hive metastore under the tmp dir
passed as argv[1]. Phase 1 writes a bucketed graph and stops; phase 2 is
a brand-new session whose only link to phase 1 is the metastore — it
must still see the catalog entry, read identical rows, and plan a
src-keyed self-join with ZERO Exchange nodes (the bucket spec lives in
the metastore, not the files — this is the persistence story the
GraphStore docstring promises for cluster deployments).

Invoked by tests/test_graph.py::test_bucketed_graphstore_survives_sessions;
prints XSESSION_OK on success.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from distributed_graph_database_system_spark.operators.graph import (  # noqa: E402
    GraphStore,
)

TMP = sys.argv[1]
EDGES = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 1), (2, 5)]


def build() -> SparkSession:
    return (
        SparkSession.builder.master("local[2]")
        .appName("xsession-graph")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", f"{TMP}/wh")
        .config(
            "spark.hadoop.javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={TMP}/metastore_db;create=true",
        )
        .config(
            "spark.driver.extraJavaOptions",
            f"-Dderby.system.home={TMP}/derby",
        )
        .enableHiveSupport()
        .getOrCreate()
    )


# --- phase 1: write through a metastore-backed session and STOP it
spark = build()
store = GraphStore(spark, f"{TMP}/graphs", buckets=4)
store.add("xg", spark.createDataFrame(EDGES, "src BIGINT, dst BIGINT"))
assert spark.catalog.tableExists(store.table_name("xg"))
spark.stop()

# --- phase 2: a NEW session; only the metastore connects it to phase 1
spark2 = build()
store2 = GraphStore(spark2, f"{TMP}/graphs", buckets=4)
assert spark2.catalog.tableExists(store2.table_name("xg")), (
    "bucketed table did not survive the session boundary"
)
e = store2.load("xg")
assert {(r.src, r.dst) for r in e.collect()} == set(EDGES)

spark2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
joined = e.alias("a").join(e.alias("b"), F.col("a.src") == F.col("b.src"))
plan = joined._jdf.queryExecution().executedPlan().toString()
assert "Exchange" not in plan, f"edge-side shuffle came back:\n{plan}"
assert joined.count() == sum(
    sum(1 for s2, _ in EDGES if s2 == s) for s, _ in EDGES
)

# add() must still refuse an existing name across the boundary too
try:
    store2.add("xg", spark2.createDataFrame([(9, 9)], "src BIGINT, dst BIGINT"))
    raise AssertionError("re-add of an existing bucketed graph must fail")
except Exception as exc:  # AnalysisException or FileExistsError
    assert "exist" in str(exc).lower(), exc

print("XSESSION_OK")
spark2.stop()
