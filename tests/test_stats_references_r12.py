"""Independent pure-Python references for the round-12 statistics seeds
(the R13 pool's hypothesis-test / association / autocorrelation family).

Parity proves Spark and DuckDB agree; both share the formula AS WRITTEN,
so these recompute each statistic from the raw sf0.001 fixture with
textbook Python (exact ints / Decimal where the queries claim exactness)
— a third implementation sharing no SQL with either engine."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import Decimal

import pytest

from distributed_graph_database_system_spark.queries.registry import all_queries
from distributed_graph_database_system_spark.sources.catalog import load_table

import os

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def q():
    return all_queries()


def test_segment_priority_chi2_reference(spark, q):
    orders = load_table(spark, SF, "orders").collect()
    cust = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in load_table(spark, SF, "customer").collect()
    }
    cells: Counter = Counter()
    for r in orders:
        cells[(cust[r["o_custkey"]], r["o_orderpriority"])] += 1
    n = sum(cells.values())
    rowt: Counter = Counter()
    colt: Counter = Counter()
    for (s, p), o in cells.items():
        rowt[s] += o
        colt[p] += o
    # mirror the query's round-8 decimal-term fold exactly
    terms = []
    for (s, p), o in cells.items():
        e = (rowt[s] * colt[p]) / n
        terms.append(Decimal(str(round((o - e) ** 2 / e, 8))))
    expect = round(float(sum(terms)), 4)
    got = q["customer_segment_priority_chi2"].fn(spark, SF).first()
    assert got["n"] == n and got["n_cells"] == len(cells)
    assert got["chi2"] == pytest.approx(expect, abs=2e-4)


def test_autocorr_lag7_reference(spark, q):
    import numpy as np

    daily: defaultdict = defaultdict(Decimal)
    for r in load_table(spark, SF, "orders").collect():
        daily[r["o_orderdate"].date()] += Decimal(str(r["o_totalprice"]))
    from datetime import timedelta

    pairs = [
        (float(v), float(daily[d + timedelta(days=7)]))
        for d, v in daily.items()
        if d + timedelta(days=7) in daily
    ]
    xs, ys = zip(*pairs)
    expect = float(np.corrcoef(xs, ys)[0, 1])
    got = q["orders_revenue_autocorr_lag7"].fn(spark, SF).first()
    assert got["n_pairs"] == len(pairs)
    assert got["acf_lag7"] == pytest.approx(expect, abs=1e-5)


def test_zscore_outliers_reference(spark, q):
    sups = load_table(spark, SF, "supplier").collect()
    by_nation: defaultdict = defaultdict(list)
    for r in sups:
        by_nation[r["s_nationkey"]].append(Decimal(str(r["s_acctbal"])))
    expect = {}
    for nk, vals in by_nation.items():
        # mirror the query's exactness: decimal sums folded exactly, ONE
        # double division each (a naive float accumulation of the sums
        # lands a different mean in the last ulp and can flip a
        # borderline |z| = 2 supplier — observed on nation 8 at sf0.001)
        n = len(vals)
        mu = float(sum(vals)) / n
        m2 = float(sum(v * v for v in vals)) / n
        var = m2 - mu * mu
        expect[nk] = sum(
            1 for v in vals if (float(v) - mu) ** 2 > 4 * var
        )
    got = {
        r["nationkey"]: r["n_outliers"]
        for r in q["supplier_nation_zscore_outliers"].fn(spark, SF).collect()
    }
    assert got == expect


def test_levenshtein_pairs_reference(spark, q):
    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    parts = load_table(spark, SF, "part").collect()
    blocks: defaultdict = defaultdict(set)
    for r in parts:
        words = r["p_name"].split(" ")  # tolerant like split_part: [0]/[1]
        blocks[words[1]].add(words[0])
    expect = {}
    for noun, adjs in blocks.items():
        ds = [
            lev(a, b)
            for a in adjs
            for b in adjs
            if a < b
        ]
        if ds:
            expect[noun] = (len(ds), min(ds), max(ds), round(sum(ds) / len(ds), 4))
    got = {
        r["noun"]: (r["n_pairs"], r["min_dist"], r["max_dist"], r["avg_dist"])
        for r in q["part_adjective_levenshtein_pairs"].fn(spark, SF).collect()
    }
    assert got == expect


def test_benford_second_digit_reference(spark, q):
    cells: Counter = Counter()
    for r in load_table(spark, SF, "orders").collect():
        cents = int(Decimal(str(r["o_totalprice"])) * 100)
        if cents >= 10:
            cells[int(str(cents)[1])] += 1
    n = sum(cells.values())
    law = {
        d: round(
            sum(math.log10(1 + 1 / (10 * k + d)) for k in range(1, 10)), 6
        )
        for d in range(10)
    }
    got = {
        r["digit"]: (r["n_orders"], r["observed"], r["expected"])
        for r in q["orders_benford_second_digit"].fn(spark, SF).collect()
    }
    assert set(got) == set(cells)
    for d, (o, obs, exp) in got.items():
        assert o == cells[d]
        assert obs == pytest.approx(cells[d] / n, abs=1e-6)
        assert exp == pytest.approx(law[d], abs=1e-6)


def test_funnel_72h_reference(spark, q):
    from datetime import timedelta

    ev = load_table(spark, SF, "events").collect()
    by_user: defaultdict = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_type"]))
    n_view = n_click = n_buy = 0
    for rows in by_user.values():
        views = [t for t, ty in rows if ty == "view"]
        if not views:
            continue
        n_view += 1
        t1 = min(views)
        dl = t1 + timedelta(hours=72)
        clicks = [t for t, ty in rows if ty == "click" and t1 < t <= dl]
        if not clicks:
            continue
        n_click += 1
        t2 = min(clicks)
        buys = [t for t, ty in rows if ty == "purchase" and t2 < t <= dl]
        if buys:
            n_buy += 1
    got = q["events_funnel_72h_window"].fn(spark, SF).first()
    assert (got["n_view"], got["n_click_72h"], got["n_purchase_72h"]) == (
        n_view,
        n_click,
        n_buy,
    )
