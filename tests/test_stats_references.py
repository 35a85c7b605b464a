"""Independent pure-Python references for the round-11 statistics layer.

The oracle-parity sweep proves Spark and DuckDB agree — but both sides
share the SAME formula as written, so a wrong formula would pass parity.
These tests recompute each statistic from the raw sf0.001 fixture with
textbook Python (Fraction/exact ints where the queries claim exactness)
and assert the Spark result matches: a THIRD implementation that shares
no SQL with either engine.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import Decimal
from fractions import Fraction

import pytest

from distributed_graph_database_system_spark.queries.registry import all_queries
from distributed_graph_database_system_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q():
    return all_queries()


@pytest.fixture(scope="module")
def orders_rows(spark):
    return [
        (r["o_orderkey"], r["o_custkey"], Decimal(str(r["o_totalprice"])),
         r["o_orderdate"], r["o_orderpriority"])
        for r in load_table(spark, SF, "orders").collect()
    ]


@pytest.fixture(scope="module")
def events_rows(spark):
    return [
        (r["event_id"], r["ts"], r["user_id"], r["event_type"],
         Decimal(str(r["value"])))
        for r in load_table(spark, SF, "events").collect()
    ]


def test_wilcoxon_signed_rank_reference(spark, q, orders_rows):
    rev = defaultdict(lambda: [Decimal(0), Decimal(0), False, False])
    for _, ck, price, od, _ in orders_rows:
        if od.year == 1995:
            rev[ck][0] += price
            rev[ck][2] = True
        elif od.year == 1996:
            rev[ck][1] += price
            rev[ck][3] = True
    diffs = [
        r95 - r96
        for r95, r96, h95, h96 in rev.values()
        if h95 and h96 and r95 != r96
    ]
    absd = sorted((abs(d), d > 0) for d in diffs)
    n = len(absd)
    # average ranks with ties
    ranks: list[tuple[Fraction, bool]] = []
    i = 0
    while i < len(absd):
        j = i
        while j < len(absd) and absd[j][0] == absd[i][0]:
            j += 1
        avg = Fraction(i + 1 + j, 2)  # (first + last)/2 ranks, 1-indexed
        for k in range(i, j):
            ranks.append((avg, absd[k][1]))
        i = j
    w_plus = sum(r for r, pos in ranks if pos)
    ties = Counter(a for a, _ in absd)
    tiesum = sum(t**3 - t for t in ties.values() if t > 1)
    mu = Fraction(n * (n + 1), 4)
    var = Fraction(n * (n + 1) * (2 * n + 1), 24) - Fraction(tiesum, 48)
    z_ref = float(w_plus - mu) / math.sqrt(float(var))
    row = q["orders_wilcoxon_signed_rank"].fn(spark, SF).collect()[0]
    assert row["n_pairs"] == n
    assert row["w_plus"] == float(w_plus)
    assert abs(row["z"] - z_ref) < 2e-6


def test_kendall_tau_reference(spark, q, events_rows):
    daily = defaultdict(lambda: [0, 0])
    for _, ts, _, et, _ in events_rows:
        d = ts.date()
        if et == "purchase":
            daily[d][0] += 1
        elif et == "error":
            daily[d][1] += 1
    series = [tuple(v) for _, v in sorted(daily.items())]
    c = d = tx = ty = 0
    for i in range(len(series)):
        for j in range(i + 1, len(series)):
            dx = series[j][0] - series[i][0]
            dy = series[j][1] - series[i][1]
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
    n0 = len(series) * (len(series) - 1) // 2
    tau = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
    row = q["events_kendall_tau_daily"].fn(spark, SF).collect()[0]
    assert (row["concordant"], row["discordant"]) == (c, d)
    assert abs(row["tau_b"] - tau) < 2e-6


def test_ks_two_sample_reference(spark, q, events_rows):
    a = sorted(v for _, _, _, et, v in events_rows if et == "purchase")
    b = sorted(v for _, _, _, et, v in events_rows if et == "view")
    values = sorted(set(a) | set(b))
    n1, n2 = len(a), len(b)
    best = -1
    import bisect

    for v in values:
        ca = bisect.bisect_right(a, v)
        cb = bisect.bisect_right(b, v)
        best = max(best, abs(ca * n2 - cb * n1))
    d_ref = best / (n1 * n2)
    row = q["events_ks_two_sample"].fn(spark, SF).collect()[0]
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert abs(row["d_stat"] - d_ref) < 2e-6


def test_kruskal_wallis_reference(spark, q, orders_rows):
    vals = sorted((price, prio) for _, _, price, _, prio in orders_rows)
    n = len(vals)
    # average ranks over ties
    r2sum: dict[str, Fraction] = defaultdict(Fraction)
    counts: Counter = Counter()
    i = 0
    tiesum = 0
    while i < n:
        j = i
        while j < n and vals[j][0] == vals[i][0]:
            j += 1
        t = j - i
        if t > 1:
            tiesum += t**3 - t
        avg = Fraction(i + 1 + j, 2)
        for k in range(i, j):
            r2sum[vals[k][1]] += avg
            counts[vals[k][1]] += 1
        i = j
    kk = len(counts)
    h = float(
        Fraction(12) / (n * (n + 1))
        * sum(r2sum[g] ** 2 / counts[g] for g in counts)
        - 3 * (n + 1)
    )
    hc = h / (1 - tiesum / (n**3 - n))
    row = q["orders_kruskal_wallis_priority"].fn(spark, SF).collect()[0]
    assert (row["n_total"], row["df"]) == (n, kk - 1)
    # the query folds round-6 decimal terms; allow that quantization
    assert abs(row["h_corrected"] - hc) < 1e-3


def test_theil_sen_reference(spark, q, orders_rows):
    import datetime

    daily: dict[int, Decimal] = defaultdict(Decimal)
    epoch = datetime.date(1995, 1, 1)
    for _, _, price, od, _ in orders_rows:
        daily[(od.date() - epoch).days] += price
    pts = sorted(daily.items())
    slopes = sorted(
        float(pts[j][1] - pts[i][1]) / (pts[j][0] - pts[i][0])
        for i in range(len(pts))
        for j in range(i + 1, len(pts))
    )
    m = len(slopes)
    # PERCENTILE_DISC(0.5): smallest value with cdf >= 0.5
    sen = slopes[(m + 1) // 2 - 1]
    row = q["orders_theil_sen_daily"].fn(spark, SF).collect()[0]
    assert row["n_pairs"] == m
    assert abs(row["sen_slope"] - sen) < 2e-6


def test_sign_test_and_gini_references(spark, q, orders_rows, events_rows):
    # sign test on daily revenue direction
    daily: dict = defaultdict(Decimal)
    for _, _, price, od, _ in orders_rows:
        daily[od.date()] += price
    series = [v for _, v in sorted(daily.items())]
    ups = downs = 0
    for prev, cur in zip(series, series[1:]):
        if cur > prev:
            ups += 1
        elif cur < prev:
            downs += 1
    m = ups + downs
    z = (ups - m / 2) / math.sqrt(m / 4)
    row = q["orders_sign_test_daily"].fn(spark, SF).collect()[0]
    assert (row["n_up"], row["n_down"]) == (ups, downs)
    assert abs(row["z"] - z) < 2e-6

    # exact-integer Gini of per-user event counts
    cnt = Counter(u for _, _, u, _, _ in events_rows)
    xs = [c for _, c in sorted(cnt.items(), key=lambda kv: (kv[1], kv[0]))]
    n = len(xs)
    s0 = sum(xs)
    s1 = sum((i + 1) * x for i, x in enumerate(xs))
    gini = 2 * s1 / (n * s0) - (n + 1) / n
    row = q["events_activity_gini"].fn(spark, SF).collect()[0]
    assert (row["n_users"], row["n_events"]) == (n, s0)
    assert abs(row["gini"] - gini) < 2e-6


def test_simpson_diversity_reference(spark, q):
    li = load_table(spark, SF, "lineitem")
    rows = [(r["l_suppkey"], r["l_partkey"]) for r in li.collect()]
    per_supp: dict[int, Counter] = defaultdict(Counter)
    for sk, pk in rows:
        per_supp[sk][pk] += 1
    ref = {}
    for sk, ctr in per_supp.items():
        n = sum(ctr.values())
        if n > 1:
            coll = sum(v * (v - 1) for v in ctr.values())
            ref[sk] = (n, len(ctr), 1.0 - coll / (n * (n - 1)))
    got = {
        r["suppkey"]: (r["n_lineitems"], r["richness"], r["simpson_d"])
        for r in q["supplier_part_simpson_diversity"].fn(
            li.sparkSession, SF
        ).collect()
    }
    assert set(got) == set(ref)
    for sk, (n, rich, d) in ref.items():
        gn, gr, gd = got[sk]
        assert (gn, gr) == (n, rich)
        assert abs(gd - d) < 2e-6


def test_hodges_lehmann_reference(spark, q, events_rows):
    daily: dict = defaultdict(Decimal)
    for _, ts, _, _, v in events_rows:
        daily[ts.date()] += v
    vals = [v for _, v in sorted(daily.items())]
    walsh = sorted(
        (vals[i] + vals[j]) / 2
        for i in range(len(vals))
        for j in range(i, len(vals))
    )
    m = len(walsh)
    hl = float(walsh[(m + 1) // 2 - 1])
    row = q["events_hodges_lehmann_daily"].fn(spark, SF).collect()[0]
    assert row["n_walsh"] == m
    assert abs(row["hl_estimate"] - hl) < 2e-6
