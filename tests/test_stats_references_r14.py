"""Independent pure-Python references for the round-14 statistics seeds
(the R16 pool's rank-test / agreement / ordinal-association /
fractal-range family).

Parity proves Spark and DuckDB agree; both share the formula AS WRITTEN,
so these recompute each statistic from the raw sf0.001 fixture with
textbook Python (exact ints / Decimal where the queries claim exactness)
— a third implementation sharing no SQL with either engine."""

from __future__ import annotations

import math
import os
from collections import Counter, defaultdict
from decimal import Decimal

import pytest

from distributed_graph_database_system_spark.queries.registry import all_queries
from distributed_graph_database_system_spark.sources.catalog import load_table

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def q():
    return all_queries()


def _cents(x) -> int:
    return int(Decimal(str(x)) * 100)


def test_friedman_monthly_reference(spark, q):
    cells: defaultdict = defaultdict(int)
    for r in load_table(spark, SF, "orders").collect():
        m = (r["o_orderdate"].year, r["o_orderdate"].month)
        cells[(m, r["o_orderpriority"])] += _cents(r["o_totalprice"])
    prios = {p for _, p in cells}
    months = sorted(
        m
        for m in {m for m, _ in cells}
        if all((m, p) in cells for p in prios)
    )
    rank_sum: Counter = Counter()
    for m in months:
        row = sorted((cells[(m, p)], p) for p in prios)
        for rk, (_, p) in enumerate(row, start=1):
            rank_sum[p] += rk
    n, k = len(months), 5
    chi2 = 12 * sum(v * v for v in rank_sum.values()) / (n * k * (k + 1)) - 3 * n * (
        k + 1
    )
    rows = {r["priority"]: r for r in q["orders_priority_friedman_monthly"].fn(spark, SF).collect()}
    assert len(rows) == k
    for p, r in rows.items():
        assert r["n_months"] == n
        assert r["rank_sum"] == rank_sum[p]
        assert r["friedman_chi2"] == pytest.approx(round(chi2, 6), abs=1e-6)


def test_first_last_priority_kappa_reference(spark, q):
    first: dict = {}
    last: dict = {}
    for r in load_table(spark, SF, "orders").collect():
        key = (r["o_orderdate"], r["o_orderkey"], r["o_orderpriority"])
        c = r["o_custkey"]
        if c not in first or key < first[c]:
            first[c] = key
        if c not in last or key > last[c]:
            last[c] = key
    pairs = [(first[c][2], last[c][2]) for c in first]
    n = len(pairs)
    agree = sum(1 for f, l in pairs if f == l)
    fm: Counter = Counter(f for f, _ in pairs)
    lm: Counter = Counter(l for _, l in pairs)
    pe = sum(fm[p] * lm.get(p, 0) for p in fm) / n / n
    po = agree / n
    kappa = (po - pe) / (1 - pe)
    got = q["customers_first_last_priority_kappa"].fn(spark, SF).first()
    assert got["n_customers"] == n and got["n_agree"] == agree
    assert got["kappa"] == pytest.approx(round(kappa, 6), abs=2e-6)


def test_gk_gamma_reference(spark, q):
    grid: Counter = Counter()
    for r in load_table(spark, SF, "lineitem").collect():
        qb = (int(r["l_quantity"]) - 1) // 10
        pb = min(_cents(r["l_extendedprice"]) // 1_000_000, 4)
        grid[(qb, pb)] += 1
    C = sum(
        grid[a] * grid[b]
        for a in grid
        for b in grid
        if b[0] > a[0] and b[1] > a[1]
    )
    D = sum(
        grid[a] * grid[b]
        for a in grid
        for b in grid
        if b[0] > a[0] and b[1] < a[1]
    )
    got = q["lineitem_qty_price_gk_gamma"].fn(spark, SF).first()
    assert got["concordant"] == C and got["discordant"] == D
    assert got["gk_gamma"] == pytest.approx(round((C - D) / (C + D), 6), abs=1e-6)


def _disc(sorted_vals: list[int], p: float) -> int:
    n = len(sorted_vals)
    rank = max(1, math.ceil(p * n))
    return sorted_vals[rank - 1]


def test_bowley_skewness_reference(spark, q):
    per_nk: defaultdict = defaultdict(list)
    for r in load_table(spark, SF, "customer").collect():
        per_nk[r["c_nationkey"]].append(_cents(r["c_acctbal"]))
    got = {r["nationkey"]: r for r in q["customer_balance_bowley_skewness"].fn(spark, SF).collect()}
    assert set(got) == set(per_nk)
    for nk, vals in per_nk.items():
        vals.sort()
        q1, q2, q3 = (_disc(vals, p) for p in (0.25, 0.5, 0.75))
        b = (q1 + q3 - 2 * q2) / (q3 - q1)
        assert got[nk]["n_customers"] == len(vals)
        assert got[nk]["median_balance"] == q2 / 100
        assert got[nk]["bowley_skewness"] == pytest.approx(round(b, 6), abs=1e-6)


def test_hurst_rs_reference(spark, q):
    daily: defaultdict = defaultdict(int)
    for r in load_table(spark, SF, "orders").collect():
        daily[r["o_orderdate"].date()] += _cents(r["o_totalprice"])
    series = [daily[d] for d in sorted(daily)]

    def mean_rs(size: int):
        vals = []
        for b in range(len(series) // size):
            blk = series[b * size : (b + 1) * size]
            tot = sum(blk)
            sq = sum(x * x for x in blk)
            cum = 0
            devs = []
            for k, x in enumerate(blk, start=1):
                cum += x
                devs.append(size * cum - k * tot)
            r_scaled = max(devs) - min(devs)
            s2_scaled = size * sq - tot * tot
            vals.append(Decimal(str(round(r_scaled / math.sqrt(s2_scaled), 6))))
        return len(vals), float(sum(vals)) / len(vals)

    n32, rs32 = mean_rs(32)
    n64, rs64 = mean_rs(64)
    hurst = math.log(rs64 / rs32) / math.log(2)
    got = q["orders_daily_hurst_rs"].fn(spark, SF).first()
    assert got["n_blocks_32"] == n32 and got["n_blocks_64"] == n64
    assert got["mean_rs_32"] == pytest.approx(round(rs32, 6), abs=1e-6)
    assert got["mean_rs_64"] == pytest.approx(round(rs64, 6), abs=1e-6)
    assert got["hurst_estimate"] == pytest.approx(round(hurst, 4), abs=2e-4)


def test_length_vocab_spearman_reference(spark, q):
    docs = load_table(spark, SF, "documents").collect()
    xs = {r["doc_id"]: r["n_chars"] for r in docs}
    ys = {r["doc_id"]: len(set(r["text"].split(" "))) for r in docs}
    ids = sorted(xs)
    rx = {
        d: i + 1
        for i, d in enumerate(sorted(ids, key=lambda d: (xs[d], d)))
    }
    ry = {
        d: i + 1
        for i, d in enumerate(sorted(ids, key=lambda d: (ys[d], d)))
    }
    n = len(ids)
    d2 = sum((rx[d] - ry[d]) ** 2 for d in ids)
    rho = 1 - 6 * d2 / (n * (n * n - 1))
    got = q["documents_length_vocab_spearman"].fn(spark, SF).first()
    assert got["n_docs"] == n and got["sum_d2"] == d2
    assert got["spearman_rho"] == pytest.approx(round(rho, 6), abs=1e-6)


def test_top1pct_user_share_reference(spark, q):
    counts: Counter = Counter()
    for r in load_table(spark, SF, "events").collect():
        counts[r["user_id"]] += 1
    users = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    k = math.ceil(len(users) / 100.0)
    top = sum(n for _, n in users[:k])
    total = sum(counts.values())
    got = q["events_top1pct_user_share"].fn(spark, SF).first()
    assert got["n_users"] == len(users) and got["k_top"] == k
    assert got["top_events"] == top and got["total_events"] == total
    assert got["top1pct_share"] == pytest.approx(round(top / total, 6), abs=1e-6)


def test_loo_zscore_reference(spark, q):
    daily: defaultdict = defaultdict(int)
    for r in load_table(spark, SF, "orders").collect():
        daily[r["o_orderdate"].date()] += _cents(r["o_totalprice"])
    n = len(daily)
    s = sum(daily.values())
    qq = sum(x * x for x in daily.values())
    expect = {}
    for d, x in daily.items():
        loo_mean = (s - x) / (n - 1)
        loo_var = ((qq - x * x) - (n - 1) * loo_mean * loo_mean) / (n - 2)
        z = (x - loo_mean) / math.sqrt(loo_var)
        if abs(z) > 2.5:
            expect[d] = round(z, 4)
    got = {
        r["day"].date(): r["loo_z"]
        for r in q["orders_daily_loo_zscore_extremes"].fn(spark, SF).collect()
    }
    assert set(got) == set(expect)
    for d in expect:
        assert got[d] == pytest.approx(expect[d], abs=1e-4)


def test_zero_inflation_reference(spark, q):
    custs = {r["c_custkey"] for r in load_table(spark, SF, "customer").collect()}
    counts: Counter = Counter()
    for r in load_table(spark, SF, "orders").collect():
        counts[r["o_custkey"]] += 1
    n_orders = sum(counts.values())
    n_zero = sum(1 for c in custs if c not in counts)
    lam = n_orders / len(custs)
    got = q["customers_zero_order_poisson_check"].fn(spark, SF).first()
    assert got["n_customers"] == len(custs)
    assert got["n_orders"] == n_orders and got["n_zero"] == n_zero
    assert got["poisson_zero_share"] == pytest.approx(
        round(math.exp(-lam), 6), abs=1e-6
    )
    assert got["observed_zero_share"] == pytest.approx(
        round(n_zero / len(custs), 6), abs=1e-6
    )
