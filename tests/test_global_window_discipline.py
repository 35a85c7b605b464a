"""Registry-wide GLOBAL-WINDOW discipline guard (round-14 follow-up to
the r13 ADVICE finding on ``events_user_activity_zipf_slope``).

A Spark window with ``orderBy`` but NO ``partitionBy`` moves the entire
frame into ONE task ("No Partition Defined for Window operation") — fine
when the frame is domain-bounded (the ~2.4k-row daily series, the 64
embedding dimensions, the 25-nation table), but a silent
single-task-sort/память cliff when the frame grows with the fact table
(the zipf-slope rank over the SF-scaled user domain, rewired onto
``operators/prefix.py`` in round 14). The bug class is invisible at
fixture scale and only bites at sf10+, so — like the percentile guard —
it needs a tripwire, not vigilance.

This test scans every registered query's source for global-window
construction (``W.orderBy(`` / ``Window.orderBy(``) and compares the
per-query occurrence counts against the frozen snapshot below. Every
snapshot entry was reviewed at addition time: the windows ride
calendar-domain aggregates (daily/weekly/monthly series — bounded
regardless of SF), fixed dimension domains (64 dims, 25 nations, 5×
priorities), or are documented naive exhibits kept beside a scalable
twin (``events_rfm_segments`` vs ``events_rfm_segments_scalable``).

If this test fails on YOUR new query: either the frame is SF-growing —
use ``operators/prefix.py``'s partitioned prefix sums (global ranks /
cumulative sums with partition-bounded state) or
``operators/quantile.py`` for order statistics — or the frame is
genuinely domain-bounded: add the entry here WITH the bounding domain
in a comment.
"""

from __future__ import annotations

import inspect
import re

from distributed_graph_database_system_spark.queries.registry import (
    all_queries,
)

_GLOBAL_WINDOW = re.compile(r"\bW(?:indow)?\s*\.\s*orderBy\s*\(")

# name -> expected count of global-window construction sites.
SNAPSHOT: dict[str, int] = {
    # --- calendar-domain frames (daily/weekly/monthly aggregate series,
    #     bounded by the fixture calendar regardless of SF) ---
    "events_bollinger_breakout": 1,
    "events_cumulative_distinct": 1,
    "events_durbin_watson_daily": 1,
    "events_gap_fill_forward": 1,
    "events_log_rank_cohorts": 1,
    "events_rolling_median7": 1,
    "events_rsi14_daily": 3,
    "events_survival_km": 2,
    "lineitem_active_shipments_daily": 1,
    "orders_bootstrap_ci_mean": 1,
    "orders_daily_cusum_extreme": 2,
    "orders_daily_hurst_rs": 1,
    "orders_daily_leader_streaks": 1,
    "orders_daily_rev_drawdown": 1,
    "orders_daily_sma_crossover_census": 2,
    "orders_daily_turning_points": 1,
    "orders_daily_updown_runs_test": 2,
    "orders_ljung_box_daily": 1,
    "orders_monthly_mom_delta": 1,
    "orders_monthly_yoy_delta": 1,
    "orders_pacf_lag2_daily": 1,
    "orders_rising_runs_match3": 1,
    "orders_rolling30d_revenue_peak": 1,
    "orders_runs_test_daily_revenue": 2,
    "orders_sign_test_daily": 1,
    "orders_top10_days_with_ties": 1,
    "orders_wow_growth_volatility": 1,
    # --- fixed dimension domains ---
    "embed_dim_class_separation_topk": 1,  # 64 embedding dims
    "embed_dim_sign_balance_topk": 1,  # 64 embedding dims
    "embed_dim_variance_topk": 1,  # 64 embedding dims
    "nation_rank_footrule_yoy": 2,  # 25 nations x 2 years
    # --- reviewed tail-domain / exhibit cases ---
    # vocabulary rank-frequency: the windowed frame is the distinct-word
    # table (Heaps-sublinear in corpus size; docstring records the trade)
    "corpus_zipf_slope": 1,
    # decile curve over a per-customer aggregate: the frame is the
    # 10-row decile table after the bounded cut, not raw customers
    "customer_revenue_lorenz_curve": 1,
    # documented naive exhibit; the scale path is the _scalable twin
    "events_rfm_segments": 3,
    # event-time KM/textrank exhibits over bounded survival/keyword sets
    "orders_hill_tail_index": 1,  # top-k tail order statistics (k fixed)
    "text_keywords_textrank": 1,  # per-doc keyword graph, bounded
}


def test_global_windows_match_reviewed_snapshot():
    found: dict[str, int] = {}
    for name, spec in all_queries().items():
        try:
            src = inspect.getsource(spec.fn)
        except (OSError, TypeError):
            continue
        n = len(_GLOBAL_WINDOW.findall(src))
        if n:
            found[name] = n

    new = {k: v for k, v in found.items() if k not in SNAPSHOT}
    assert not new, (
        f"NEW global (un-partitioned) window construction in {sorted(new)}: "
        "a W.orderBy(...) window with no partitionBy sorts its whole frame "
        "in ONE task. If the frame grows with the fact table, use "
        "operators/prefix.py (partitioned prefix sums / global ranks) or "
        "operators/quantile.py (order statistics) instead; if it is "
        "domain-bounded (daily series, fixed dims), add the entry to "
        "SNAPSHOT in this test with the bounding domain in a comment."
    )
    changed = {
        k: (SNAPSHOT[k], v)
        for k, v in found.items()
        if k in SNAPSHOT and SNAPSHOT[k] != v
    }
    assert not changed, (
        f"global-window count changed for {changed} "
        "(snapshot, found) — re-review the query and update SNAPSHOT."
    )
    stale = sorted(set(SNAPSHOT) - set(found))
    assert not stale, (
        f"stale SNAPSHOT entries {stale} no longer contain a global "
        "window — remove them so the allowlist cannot rot."
    )
