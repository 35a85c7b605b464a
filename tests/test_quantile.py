"""Quantile-cut bucketing vs exact ntile: structural guarantees and
bounded disagreement on the fixture."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

import pytest

from distributed_graph_database_system_spark.operators.quantile import (
    bucket_by_cuts,
    group_quantiles_exact,
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


# --- group_quantiles_exact: parity with percentile() ------------------------


QS = [0.0, 0.25, 0.5, 0.75, 0.9, 1.0]
QCOLS = ["q_0", "q_0_25", "q_0_5", "q_0_75", "q_0_9", "q_1"]


def _via_percentile(df, group_cols, value_col="v"):
    pcts = F.percentile(value_col, F.array(*[F.lit(q) for q in QS]))
    return df.groupBy(*group_cols).agg(pcts.alias("p")).select(
        *group_cols, *[F.col("p")[i].alias(c) for i, c in enumerate(QCOLS)]
    )


def _assert_identical(exact_df, ref_df, group_cols):
    got = {
        tuple(r[g] for g in group_cols): [r[c] for c in QCOLS]
        for r in exact_df.collect()
    }
    want = {
        tuple(r[g] for g in group_cols): [r[c] for c in QCOLS]
        for r in ref_df.collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        # bit-identical, not approx — the IEEE-expression claim
        assert got[k] == want[k], (k, got[k], want[k])


def test_group_quantiles_exact_matches_percentile_on_fixture(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.col("value").alias("v")
    )
    exact = group_quantiles_exact(e, "v", QS, ["event_type"])
    _assert_identical(exact, _via_percentile(e, ["event_type"]), ["event_type"])


def test_group_quantiles_exact_edge_cases(spark):
    """Ties, single-row groups, all-NULL groups (must drop out), NULLs
    mixed into a live group, q=0 and q=1 endpoints."""
    rows = (
        [("ties", float(v)) for v in [5, 5, 5, 5, 1, 1, 9]]
        + [("single", 42.0)]
        + [("allnull", None), ("allnull", None)]
        + [("mixed", None), ("mixed", 1.0), ("mixed", 2.0), ("mixed", None), ("mixed", 4.0)]
        + [("two", 10.0), ("two", 20.0)]
    )
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    exact = group_quantiles_exact(df, "v", QS, ["g"], num_partitions=5)
    ref = _via_percentile(df.where(F.col("v").isNotNull()), ["g"])
    got_groups = {r.g for r in exact.select("g").collect()}
    assert "allnull" not in got_groups
    _assert_identical(exact, ref, ["g"])


def test_group_quantiles_exact_giant_group_probe(spark):
    """One group far larger than any single range partition: 120k rows
    forced across 16 range partitions — the case percentile()'s single
    aggregation buffer (and a per-group window sort) cannot scale to.
    Values are generated deterministically and include heavy ties."""
    df = (
        spark.range(120_000)
        .select(
            (F.col("id") % 3).cast("string").alias("g"),
            # xxhash64 is deterministic; % 1000 forces ~40 copies per value
            (F.abs(F.xxhash64("id")) % 1000).cast("double").alias("v"),
        )
    )
    exact = group_quantiles_exact(df, "v", QS, ["g"], num_partitions=16)
    _assert_identical(exact, _via_percentile(df, ["g"]), ["g"])


def test_group_quantiles_colname_rules():
    assert group_quantiles_exact is not None
    from distributed_graph_database_system_spark.operators.quantile import _qcolname

    assert _qcolname(0.25) == "q_0_25"
    assert _qcolname(1.0) == "q_1"
    assert _qcolname(0.0) == "q_0"
    assert _qcolname(1e-05) == "q_0_00001"
    assert "-" not in _qcolname(1e-05)


def test_group_quantiles_rejects_bad_quantiles(spark):
    df = spark.createDataFrame([("a", 1.0)], "g STRING, v DOUBLE")
    with pytest.raises(ValueError):
        group_quantiles_exact(df, "v", [1.5], ["g"])
    with pytest.raises(ValueError):
        group_quantiles_exact(df, "v", [], ["g"])
    with pytest.raises(ValueError):  # duplicate → colliding column names
        group_quantiles_exact(df, "v", [0.5, 0.5], ["g"])
    with pytest.raises(ValueError):  # collides at 6 decimals
        group_quantiles_exact(df, "v", [1e-8, 0.0], ["g"])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_group_quantiles_exact_random_sweep(spark, seed):
    """Seeded random multisets (heavy ties, tiny and large groups,
    negative values) must stay bit-identical to percentile() at awkward
    quantiles (0.01, 1/3, 0.999) across partition counts."""
    import random

    rng = random.Random(seed)
    rows = []
    for g in range(6):
        n = rng.choice([1, 2, 3, 17, 400])
        vals = [
            float(rng.choice([-5, -1, 0, 1, 2, 2, 2, 7, 100]))
            for _ in range(n)
        ]
        rows += [(f"g{g}", v) for v in vals]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    qs = [0.01, 1 / 3, 0.999]
    cols = ["q_0_01", "q_0_333333", "q_0_999"]
    pcts = F.percentile("v", F.array(*[F.lit(q) for q in qs]))
    want = {
        r.g: [r.p[i] for i in range(3)]
        for r in df.groupBy("g").agg(pcts.alias("p")).collect()
    }
    for nparts in (2, 9):
        got = {
            r.g: [r[c] for c in cols]
            for r in group_quantiles_exact(
                df, "v", qs, ["g"], num_partitions=nparts
            ).collect()
        }
        assert got == want, (seed, nparts)


def _via_percentile_disc(df, group_cols, qs):
    """Reference: the builtin SQL-standard PERCENTILE_DISC aggregate."""
    df.createOrReplaceTempView("_pdisc_ref")
    g = ", ".join(group_cols)
    sel = ", ".join(
        f"PERCENTILE_DISC({q}) WITHIN GROUP (ORDER BY v) AS p{i}"
        for i, q in enumerate(qs)
    )
    return df.sparkSession.sql(
        f"SELECT {g}, {sel} FROM _pdisc_ref WHERE v IS NOT NULL GROUP BY {g}"
    )


def _assert_disc_identical(got_df, ref_df, group_cols, qs):
    from distributed_graph_database_system_spark.operators.quantile import (
        _qcolname,
    )

    cols = [_qcolname(q) for q in qs]
    got = {
        tuple(r[g] for g in group_cols): [r[c] for c in cols]
        for r in got_df.collect()
    }
    want = {
        tuple(r[g] for g in group_cols): [float(r[f"p{i}"]) for i in range(len(qs))]
        for r in ref_df.collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])


def test_group_quantiles_disc_matches_builtin_on_fixture(spark, sf_dir):
    from distributed_graph_database_system_spark.operators.quantile import (
        group_quantiles_disc,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.col("value").alias("v")
    )
    qs = [0.1, 0.25, 0.5, 0.9, 0.999]
    got = group_quantiles_disc(e, "v", qs, ["event_type"])
    _assert_disc_identical(
        got, _via_percentile_disc(e, ["event_type"], qs), ["event_type"], qs
    )


def test_group_quantiles_disc_edge_cases(spark):
    """Ties, single-row groups, all-NULL groups (drop out), q=0 and q=1
    endpoints (first and last order statistic), and awkward group sizes
    where ceil(q*n) vs other definitions diverge (n=7, q=0.9 → rank 7)."""
    from distributed_graph_database_system_spark.operators.quantile import (
        group_quantiles_disc,
    )

    rows = (
        [("ties", float(v)) for v in [5, 5, 5, 5, 1, 1, 9]]
        + [("single", 42.0)]
        + [("allnull", None), ("allnull", None)]
        + [("mixed", None), ("mixed", 1.0), ("mixed", 2.0), ("mixed", 4.0)]
        + [("seven", float(v)) for v in [1, 2, 3, 4, 5, 6, 7]]
    )
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    qs = [0.0, 0.1, 0.5, 0.9, 1.0]
    got = group_quantiles_disc(df, "v", qs, ["g"], num_partitions=5)
    groups = {r.g for r in got.select("g").collect()}
    assert "allnull" not in groups
    _assert_disc_identical(
        got,
        _via_percentile_disc(df.where(F.col("v").isNotNull()), ["g"], qs),
        ["g"],
        qs,
    )
    # the ceil(q*n) pin: n=7, q=0.9 → 1-based rank ceil(6.3)=7 → value 7
    seven = {r.g: r for r in got.collect()}["seven"]
    assert seven["q_0_9"] == 7.0 and seven["q_0_1"] == 1.0
    assert seven["q_0"] == 1.0 and seven["q_1"] == 7.0


@pytest.mark.parametrize("seed", [0, 1])
def test_group_quantiles_disc_random_sweep(spark, seed):
    """Seeded random multisets across partition counts must stay
    identical to the builtin PERCENTILE_DISC."""
    import random

    from distributed_graph_database_system_spark.operators.quantile import (
        group_quantiles_disc,
    )

    rng = random.Random(seed)
    rows = []
    for g in range(5):
        n = rng.choice([1, 3, 10, 11, 257])
        rows += [
            (f"g{g}", float(rng.choice([-5, -1, 0, 2, 2, 2, 7, 100])))
            for _ in range(n)
        ]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    qs = [0.01, 1 / 3, 0.9, 0.999]
    ref = _via_percentile_disc(df, ["g"], qs)
    for nparts in (2, 9):
        got = group_quantiles_disc(df, "v", qs, ["g"], num_partitions=nparts)
        _assert_disc_identical(got, ref, ["g"], qs)
