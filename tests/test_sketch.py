"""Count-min sketch: error-bound, merge-exactness, and determinism tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from distributed_graph_database_system_spark.operators.sketch import (
    cm_estimate,
    cm_merge,
    cm_sketch,
)


def _tokens(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("tok"))
    )


def test_cm_never_undercounts_and_respects_error_bound(spark, sf_dir):
    toks = _tokens(spark, sf_dir).cache()
    n = toks.count()
    width, depth = 256, 5
    sk = cm_sketch(toks, "tok", depth=depth, width=width)
    truth = toks.groupBy("tok").agg(F.count("*").alias("true_cnt"))
    est = cm_estimate(sk, truth, "tok", width=width)
    rows = est.collect()
    bound = math.e * n / width  # classic CM additive error at 1-(1/2)^d conf
    assert rows, "empty vocabulary"
    for r in rows:
        assert r.est >= r.true_cnt, f"undercount on {r.tok}"
        assert r.est <= r.true_cnt + bound, f"overshot bound on {r.tok}"
    toks.unpersist()


def test_cm_merge_equals_sketch_of_union_exactly(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    a = toks.limit(5000)
    b = toks.subtract(a)  # not a clean split, but any two multisets work
    merged = cm_merge(
        cm_sketch(a, "tok", width=128), cm_sketch(b, "tok", width=128)
    )
    direct = cm_sketch(a.unionByName(b), "tok", width=128)
    assert merged.subtract(direct).isEmpty()
    assert direct.subtract(merged).isEmpty()


def test_cm_estimates_are_deterministic_across_builds(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    items = toks.distinct().limit(10)
    e1 = {
        r.tok: r.est
        for r in cm_estimate(cm_sketch(toks, "tok"), items, "tok").collect()
    }
    e2 = {
        r.tok: r.est
        for r in cm_estimate(
            cm_sketch(toks.repartition(17), "tok"), items, "tok"
        ).collect()
    }
    assert e1 == e2  # partitioning must not change a deterministic sketch


def test_cm_estimate_width_is_derived_and_mismatch_rejected(spark, sf_dir):
    """The exact misuse the stamped ``w`` column exists to prevent: a
    sketch built at width 256 probed assuming the 1024 default used to
    pass the one-sided max-bucket guard (255 < 1024), miss the bucket
    join, and report 0 for real heavy hitters. Now the build width rides
    with the sketch: an omitted width derives 256 and estimates stay
    one-sided-correct; a conflicting explicit width raises."""
    import pytest

    toks = _tokens(spark, sf_dir)
    sk = cm_sketch(toks, "tok", depth=5, width=256)
    truth = (
        toks.groupBy("tok").agg(F.count("*").alias("true_cnt")).limit(20)
    )
    # derived width (no argument): never undercounts
    for r in cm_estimate(sk, truth, "tok").collect():
        assert r.est >= r.true_cnt
    # explicit-but-wrong width: rejected, not silently zero
    with pytest.raises(ValueError, match="build width"):
        cm_estimate(sk, truth, "tok", width=1024)
    # mixed-width merge survives the (lazy) merge but is rejected at probe
    mixed = cm_merge(sk, cm_sketch(toks, "tok", depth=5, width=128))
    with pytest.raises(ValueError, match="mixes build widths"):
        cm_estimate(mixed, truth, "tok")


def test_cm_unknown_item_estimates_bounded_by_collisions(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    sk = cm_sketch(toks, "tok", depth=5, width=1024)
    ghost = spark.createDataFrame(
        [("never-in-corpus-xyzzy",)], "tok STRING"
    )
    est = cm_estimate(sk, ghost, "tok").first().est
    n = toks.count()
    assert 0 <= est <= math.e * n / 1024


def test_cm_estimate_null_w_rows(spark, sf_dir):
    """Partially-migrated ledgers: rows with NULL `w` (pre-stamp files
    read through a stamped schema) must be REJECTED when mixed with
    stamped rows — min/max ignore NULLs, so without the explicit guard a
    (d, bucket) cell split across w=NULL/w=256 rows feeds groupBy-min a
    partial counter: a silent undercount. A fully-legacy sketch (ALL-NULL
    w) is the no-column case and works with an explicit width=."""
    import pytest

    toks = _tokens(spark, sf_dir)
    sk = cm_sketch(toks, "tok", depth=5, width=256)
    truth = toks.groupBy("tok").agg(F.count("*").alias("true_cnt")).limit(10)

    legacy = sk.withColumn("w", F.lit(None).cast("int"))
    # half the rows legacy, half stamped — the same cells split in two
    mixed = sk.where(F.col("d") < 2).unionByName(
        legacy.where(F.col("d") >= 2)
    )
    with pytest.raises(ValueError, match="pre-stamp"):
        cm_estimate(mixed, truth, "tok")

    # all-NULL w ≡ legacy: width argument required and honored
    with pytest.raises(ValueError, match="width"):
        cm_estimate(legacy, truth, "tok")
    for r in cm_estimate(legacy, truth, "tok", width=256).collect():
        assert r.est >= r.true_cnt
