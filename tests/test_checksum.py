"""Order-independent table fingerprints (operators/checksum.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_graph_database_system_spark.operators.checksum import (
    fingerprint_sql,
    table_fingerprint,
)
from distributed_graph_database_system_spark.sources.catalog import load_table


def _fp(df, cols):
    return table_fingerprint(df, cols, "t").first()["fingerprint"]


def test_partition_and_order_invariant(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey"]
    a = _fp(c, cols)
    b = _fp(c.repartition(17, F.rand(seed=5)), cols)
    d = _fp(c.orderBy(F.desc("c_name")), cols)
    assert a == b == d


def test_sensitive_to_any_row_change(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey"]
    base = _fp(c, cols)
    # drop one row
    assert _fp(c.where(F.col("c_custkey") != 1), cols) != base
    # mutate one value
    mutated = c.withColumn(
        "c_nationkey",
        F.when(F.col("c_custkey") == 1, F.col("c_nationkey") + 1).otherwise(
            F.col("c_nationkey")
        ),
    )
    assert _fp(mutated, cols) != base


def test_null_position_disambiguation(spark):
    # ('a', NULL, 'b') vs ('a', 'b', NULL) must NOT collide: concat_ws
    # alone would skip nulls; the coalesce-to-'' keeps positions.
    df1 = spark.createDataFrame([("a", None, "b")], "x: string, y: string, z: string")
    df2 = spark.createDataFrame([("a", "b", None)], "x: string, y: string, z: string")
    assert _fp(df1, ["x", "y", "z"]) != _fp(df2, ["x", "y", "z"])


def test_matches_duckdb_rendering(spark, sf_dir):
    import duckdb
    import os

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW supplier AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'supplier.parquet')}')"
    )
    cols = ["s_suppkey", "s_name", "s_nationkey"]
    duck = con.sql(fingerprint_sql("supplier", cols)).fetchone()
    sp = table_fingerprint(
        load_table(spark, sf_dir, "supplier"), cols, "supplier"
    ).first()
    assert (sp["table"], sp["n_rows"], sp["fingerprint"]) == duck
