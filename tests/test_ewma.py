"""operators/ewma.py: the closed-form expansion must equal the sequential
recurrence it replaces (zero-initialized: s_i = alpha*x_i + beta*s_{i-1},
s_0 = 0 — expanding to sum_j alpha*beta^(i-j)*x_j), and the second-order
kernel alpha^2*(k+1)*beta^k must equal the EWMA-of-EWMA recurrence."""

from __future__ import annotations

import pytest

from distributed_graph_database_system_spark.operators.ewma import (
    ewma_closed_form,
)


def _py_brown(xs: list[float], alpha: float) -> tuple[list[float], list[float]]:
    beta = 1.0 - alpha
    s1s, s2s = [], []
    s1 = s2 = 0.0
    for x in xs:
        s1 = alpha * x + beta * s1
        s2 = alpha * s1 + beta * s2
        s1s.append(s1)
        s2s.append(s2)
    return s1s, s2s


def test_closed_form_matches_recurrence(spark):
    xs = [10.0, 12.5, 9.0, 14.0, 11.0, 13.25, 8.5, 15.0]
    df = spark.createDataFrame(
        [(i + 1, x) for i, x in enumerate(xs)], "day INT, x DOUBLE"
    )
    got = {
        r["day"]: (r["s1"], r["s2"])
        for r in ewma_closed_form(df, alpha=0.2, second_order=True).collect()
    }
    s1s, s2s = _py_brown(xs, 0.2)
    for i in range(len(xs)):
        assert got[i + 1][0] == pytest.approx(s1s[i], abs=1e-6)
        assert got[i + 1][1] == pytest.approx(s2s[i], abs=1e-6)


def test_partitioned_series_are_independent(spark):
    rows = [("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 100.0), ("b", 2, 0.0)]
    df = spark.createDataFrame(rows, "grp STRING, day INT, x DOUBLE")
    got = {
        (r["grp"], r["day"]): r["s1"]
        for r in ewma_closed_form(df, partition_cols=["grp"]).collect()
    }
    assert got[("a", 1)] == pytest.approx(2.0, abs=1e-6)
    assert got[("a", 2)] == pytest.approx(0.2 * 20 + 0.8 * 2.0, abs=1e-6)
    assert got[("b", 1)] == pytest.approx(20.0, abs=1e-6)
    assert got[("b", 2)] == pytest.approx(16.0, abs=1e-6)


def test_lag_cap_drops_only_far_terms(spark):
    xs = [float(i) for i in range(1, 31)]
    df = spark.createDataFrame(
        [(i + 1, x) for i, x in enumerate(xs)], "day INT, x DOUBLE"
    )
    full = {
        r["day"]: r["s1"] for r in ewma_closed_form(df, alpha=0.2).collect()
    }
    capped = {
        r["day"]: r["s1"]
        for r in ewma_closed_form(df, alpha=0.2, lag_cap=100).collect()
    }
    # cap >= horizon: identical
    assert capped == full
    tight = {
        r["day"]: r["s1"]
        for r in ewma_closed_form(df, alpha=0.2, lag_cap=2).collect()
    }
    # a 2-lag cap keeps the three newest kernels only
    assert tight[30] == pytest.approx(
        0.2 * 30 + 0.2 * 0.8 * 29 + 0.2 * 0.64 * 28, abs=1e-6
    )
