"""asof_join vs pandas.merge_asof: the full direction × allow_exact ×
tolerance grid on seeded data, plus partition invariance. pandas IS the
semantics contract (the operator docstring claims merge_asof parity), so
the reference implementation is pandas itself. Right (by, ts) pairs are
generated unique — pandas breaks exact-duplicate ties positionally,
asof_join by value order; on duplicate-free data the semantics coincide."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.operators.asof import asof_join


def _mk(seed: int):
    rng = np.random.RandomState(seed)
    groups = ["a", "b", "c"]
    left = pd.DataFrame(
        {
            "g": rng.choice(groups, 80),
            "t": rng.choice(np.arange(0, 500, 1), 80, replace=False).astype(
                "float64"
            ),
            "lv": np.arange(80),
        }
    )
    rt = rng.choice(np.arange(0, 500, 1), 60, replace=False).astype("float64")
    right = pd.DataFrame(
        {
            "g": rng.choice(groups, 60),
            "t": rt,
            "price": np.round(rng.uniform(1, 9, 60), 2),
        }
    )
    # force some exact-timestamp collisions ACROSS frames (the
    # allow_exact_matches distinction needs them)
    right.loc[:9, "t"] = left["t"][:10].values
    right.loc[:9, "g"] = left["g"][:10].values
    right = right.drop_duplicates(subset=["g", "t"])
    return left, right


@pytest.mark.parametrize("seed", [3, 11])
@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("allow_exact", [True, False])
@pytest.mark.parametrize("tolerance", [None, 25.0])
def test_asof_join_matches_pandas(spark, seed, direction, allow_exact, tolerance):
    left, right = _mk(seed=seed)
    want = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t").rename(columns={"t": "t_r", "price": "price_r"}),
        left_on="t",
        right_on="t_r",
        by="g",
        direction=direction,
        allow_exact_matches=allow_exact,
        tolerance=tolerance,
    )
    ldf = spark.createDataFrame(left, "g STRING, t DOUBLE, lv BIGINT")
    rdf = spark.createDataFrame(right, "g STRING, t DOUBLE, price DOUBLE")
    got_df = asof_join(
        ldf,
        rdf,
        on="t",
        by=["g"],
        right_cols=["price"],
        direction=direction,
        tolerance=tolerance,
        allow_exact_matches=allow_exact,
    )
    got = {r.lv: (r.t_r, r.price_r) for r in got_df.collect()}
    assert len(got) == len(left)
    for _, row in want.iterrows():
        g_tr, g_pr = got[row.lv]
        if pd.isna(row.t_r):
            assert g_tr is None and g_pr is None, (row.lv, g_tr, g_pr)
        else:
            assert g_tr == row.t_r and g_pr == row.price_r, (row.lv,)


def test_asof_join_timestamp_tolerance_and_partition_invariance(spark):
    rows_l = [("u1", f"2024-01-01 0{h}:00:00", h) for h in range(1, 8)]
    rows_r = [
        ("u1", "2024-01-01 00:30:00", 100.0),
        ("u1", "2024-01-01 03:10:00", 200.0),
        ("u1", "2024-01-01 06:59:00", 300.0),
    ]
    ldf = spark.createDataFrame(rows_l, "u STRING, ts STRING, k INT").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    rdf = spark.createDataFrame(rows_r, "u STRING, ts STRING, v DOUBLE").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = asof_join(
        ldf, rdf, on="ts", by=["u"], right_cols=["v"],
        direction="nearest", tolerance=3600.0,
    )
    got = {r.k: r.v_r for r in out.collect()}
    # 01:00 → 00:30 (30m back). 02:00 → nothing within 1h? 00:30 is 90m
    # back, 03:10 is 70m fwd → both out → NULL. 03:00 → 03:10 (10m fwd).
    # 04:00 → 03:10 (50m back). 06:00 → 06:59 (59m fwd). 07:00 → 06:59.
    assert got == {1: 100.0, 2: None, 3: 200.0, 4: 200.0, 5: None, 6: 300.0, 7: 300.0}

    out2 = asof_join(
        ldf.repartition(7), rdf.repartition(5), on="ts", by=["u"],
        right_cols=["v"], direction="nearest", tolerance=3600.0,
    )
    assert {r.k: r.v_r for r in out2.collect()} == got


def test_asof_join_rejects_bad_args(spark):
    df = spark.createDataFrame([("a", 1.0)], "g STRING, t DOUBLE")
    with pytest.raises(ValueError, match="direction"):
        asof_join(df, df, on="t", direction="sideways")
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            df.withColumn("t_r", F.lit(0.0)), df, on="t", suffix="_r"
        )
