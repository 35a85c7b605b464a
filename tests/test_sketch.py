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


# --- KMV (bottom-k distinct) sketch -----------------------------------------


def test_kmv_distinct_estimate_accuracy_and_exact_small_groups(spark, sf_dir):
    """Unbiased-estimator sanity: per event type the KMV estimate lands
    within 5/sqrt(k-1) relative error of the exact distinct count (wide
    confidence: md5 is fixed, so this is a deterministic regression, not
    a flaky statistical assertion), and a group with < k distinct values
    is returned EXACTLY (the sketch is the whole set)."""
    from distributed_graph_database_system_spark.operators.sketch import (
        kmv_distinct_estimate,
        kmv_sketch,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = 256
    sk = kmv_sketch(e, "user_id", k=k, group_cols=("event_type",))
    est = {
        r.event_type: r.est_distinct
        for r in kmv_distinct_estimate(sk, k=k, group_cols=("event_type",)).collect()
    }
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    tol = 5.0 / (k - 1) ** 0.5
    for t, n in exact.items():
        if n < k:
            assert est[t] == float(n), f"{t}: small group must be exact"
        else:
            rel = abs(est[t] - n) / n
            assert rel < tol, f"{t}: rel err {rel:.3f} exceeds {tol:.3f}"


def test_kmv_merge_equals_sketch_of_union_exactly(spark, sf_dir):
    """Bottom-k is a semilattice: merging the sketches of two disjoint
    slices is row-identical to sketching the union."""
    from distributed_graph_database_system_spark.operators.sketch import (
        kmv_merge,
        kmv_sketch,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = e.where(F.col("event_id") % 2 == 0)
    b = e.where(F.col("event_id") % 2 == 1)
    k = 64
    merged = kmv_merge(
        kmv_sketch(a, "user_id", k=k, group_cols=("event_type",)),
        kmv_sketch(b, "user_id", k=k, group_cols=("event_type",)),
        k=k,
        group_cols=("event_type",),
    )
    whole = kmv_sketch(e, "user_id", k=k, group_cols=("event_type",))
    got = {(r.event_type, r.h) for r in merged.collect()}
    want = {(r.event_type, r.h) for r in whole.collect()}
    assert got == want


def test_kmv_presieve_matches_unsieved_and_guards_small_groups(spark, sf_dir):
    """A generously-sized presieve returns the IDENTICAL sketch (the
    bottom-k never reaches the cut), and a sieve too tight for a group's
    cardinality raises instead of returning a silently biased sketch."""
    import pytest

    from distributed_graph_database_system_spark.operators.sketch import (
        KMV_SPACE,
        kmv_sketch,
    )

    k = 64
    big = spark.range(20000).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v")
    )  # two 10k-distinct groups
    sieve = 8.0 * k / 10000
    plain = kmv_sketch(big, "v", k=k, group_cols=("g",))
    sieved = kmv_sketch(big, "v", k=k, group_cols=("g",), presieve=sieve)
    assert {(r.g, r.h) for r in plain.collect()} == {
        (r.g, r.h) for r in sieved.collect()
    }
    # presieve == 1.0 filters nothing: small groups stay legal (the
    # fixture's 15-distinct event types would otherwise trip the guard)
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    kmv_sketch(e, "user_id", k=k, group_cols=("event_type",), presieve=1.0)
    # a sieve too tight for the group's cardinality → raise, not bias
    with pytest.raises(ValueError, match="presieve kept fewer"):
        kmv_sketch(big, "v", k=k, group_cols=("g",), presieve=1e-12)
    with pytest.raises(ValueError, match="not in"):
        kmv_sketch(big, "v", k=k, presieve=0.0)
    assert KMV_SPACE == 1 << 60


def test_kmv_pair_overlap_tracks_exact_jaccard(spark, sf_dir):
    """The pairwise θ-sample overlap estimates track the exact
    intersection and Jaccard within the k=256 error regime (deterministic
    given md5 — a regression pin, not a statistical test)."""
    from distributed_graph_database_system_spark.operators.sketch import (
        kmv_pair_overlap,
        kmv_sketch,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = 256
    sk = kmv_sketch(e, "user_id", k=k, group_cols=("event_type",))
    got = {
        (r.type_a, r.type_b): (r.est_inter, r.est_jaccard)
        for r in kmv_pair_overlap(sk, "event_type", k=k).collect()
    }
    s = e.select("event_type", "user_id").distinct()
    a = s.toDF("type_a", "user_id")
    b = s.toDF("type_b", "user_id")
    ix = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    sz = {r.event_type: r.n for r in s.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    for r in ix.collect():
        est_i, est_j = got[(r.type_a, r.type_b)]
        union = sz[r.type_a] + sz[r.type_b] - r.n_both
        exact_j = r.n_both / union
        assert abs(est_i - r.n_both) / r.n_both < 0.35
        assert abs(est_j - exact_j) < 0.1
