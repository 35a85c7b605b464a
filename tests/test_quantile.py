"""Quantile-cut bucketing vs exact ntile: structural guarantees and
bounded disagreement on the fixture."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.operators.quantile import (
    bucket_by_cuts,
    quantile_cuts,
)


def _monetary(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("m"))
    )


def test_cuts_are_monotone_and_buckets_structural(spark, sf_dir):
    df = _monetary(spark, sf_dir)
    cuts = quantile_cuts(df, "m", 4)
    assert len(cuts) == 3 and cuts == sorted(cuts)
    b = bucket_by_cuts(df, "m", cuts)
    rows = b.select("m", "bucket").collect()
    assert {r.bucket for r in rows} == {1, 2, 3, 4}  # every bucket used
    # bucket must be monotone in the value
    by_val = sorted(rows, key=lambda r: r.m)
    assert all(
        a.bucket <= b_.bucket for a, b_ in zip(by_val, by_val[1:])
    )


def test_cut_buckets_mostly_agree_with_exact_ntile(spark, sf_dir):
    """The scalable cut-table path must reproduce ntile quartiles except
    near cut boundaries: ≥90% agreement on the fixture, and where they
    differ, by at most one bucket."""
    df = _monetary(spark, sf_dir)
    cuts = quantile_cuts(df, "m", 4)
    via_cuts = bucket_by_cuts(df, "m", cuts)
    via_ntile = df.withColumn(
        "nt", F.ntile(4).over(W.orderBy("m", "user_id"))
    )
    j = via_cuts.join(via_ntile.select("user_id", "nt"), "user_id")
    rows = j.select("bucket", "nt").collect()
    agree = sum(1 for r in rows if r.bucket == r.nt) / len(rows)
    assert agree >= 0.9, agree
    assert all(abs(r.bucket - r.nt) <= 1 for r in rows)


def test_descending_orientation_flips_buckets(spark, sf_dir):
    df = _monetary(spark, sf_dir)
    cuts = quantile_cuts(df, "m", 4)
    asc = bucket_by_cuts(df, "m", cuts, out_col="a", ascending=True)
    desc = bucket_by_cuts(asc, "m", cuts, out_col="d", ascending=False)
    assert desc.where(F.col("a") + F.col("d") != 5).isEmpty()


def test_null_values_get_null_bucket_not_the_best_score(spark):
    """NULLs must map to NULL buckets in BOTH orientations — the
    descending orientation used to hand missing data bucket 1, the best
    RFM-style score."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)], "id INT, m DOUBLE"
    )
    cuts = [15.0, 35.0]
    asc = bucket_by_cuts(df, "m", cuts, out_col="a", ascending=True)
    both = bucket_by_cuts(asc, "m", cuts, out_col="d", ascending=False)
    rows = {r.id: (r.a, r.d) for r in both.collect()}
    assert rows[3] == (None, None)
    assert rows[1] == (1, 3) and rows[2] == (2, 2) and rows[4] == (3, 1)
