"""Registry-wide percentile-discipline guard (r13 verdict item 2).

Spark's builtin exact percentile family (``percentile``, ``median``,
``percentile_disc``/``percentile_cont`` via SQL) buffers EVERY value of a
group inside one aggregation state — per-group memory grows with the
group, and a group keyed by a low-cardinality column over an SF-growing
fact table is a guaranteed OOM at scale (one registration OOMed a 24 GB
heap at sf10 in round 13; the class recurred twice across rounds before
this tripwire). The sanctioned alternatives are
``operators/quantile.py``'s ``group_quantiles_exact`` /
``group_quantiles_disc`` (two-pass global rank, per-task state bounded by
the physical PARTITION size) and the mergeable ``percentile_approx``
sketch where approximation is acceptable.

This test AST-scans every registered query's FUNCTION BODY (decorators —
which hold the DuckDB oracle SQL, where ``PERCENTILE_DISC`` is fine —
and docstrings are excluded) for:

- direct calls to ``percentile`` / ``median`` / ``percentile_approx`` /
  ``approx_percentile``;
- string literals invoking the same through ``F.expr`` / ``spark.sql``
  (``percentile_disc(...) WITHIN GROUP`` etc.).

Any hit outside ALLOWLIST fails with a pointer to the sanctioned
machinery. Allowlist entries must keep triggering the detector — a
rewired query must also be removed here, so the list can't go stale.
"""

from __future__ import annotations

import ast
import glob
import os
import re

ALLOWLIST: dict[str, str] = {
    # Documented exhibit of the builtin's semantics (docstring records the
    # bounded-|event_type|-groups trade and points to percentile_approx /
    # the cut-table path as the unbounded-group alternatives).
    "agg_percentile_bands": "documented builtin-exact exhibit",
    # percentile_approx is the MERGEABLE t-digest-style sketch — bounded
    # state by construction; this registration exists to exhibit it
    # (rows-only check by design: approximate answers have no SQL oracle).
    "agg_median_approx": "mergeable percentile_approx sketch",
    # SQL-standard PERCENTILE_DISC WITHIN GROUP syntax-surface exhibit;
    # the at-scale order-statistic path for the same statistic is
    # customer_acctbal_decile_bounds (group_quantiles_disc).
    "orders_price_percentile_disc": "WITHIN GROUP SQL-surface exhibit",
    # Both operate on DAY-DOMAIN-bounded frames (pairs / Walsh averages of
    # ~2.4k daily aggregate rows — O(days²) rows regardless of SF), the
    # 'daily/dimension-sized groups' case the discipline explicitly
    # permits: the buffered frame cannot grow with the fact table.
    "orders_theil_sen_daily": "day-domain-bounded global aggregate",
    "events_hodges_lehmann_daily": "day-domain-bounded global aggregate",
}

_CALL_NAMES = {"percentile", "percentile_approx", "approx_percentile", "median"}
# word-boundary + '(' so alias strings like "percentile" don't hit; covers
# percentile_disc/_cont/_approx and median through expr()/sql() strings.
_STR_PAT = re.compile(
    r"(?i)\b(percentile(_disc|_cont|_approx)?|approx_percentile|median)\s*\(",
)

_PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "distributed_graph_database_system_spark",
)


def _registered_query_functions():
    """Yield (query_name, module_path, FunctionDef, source) for every
    @query-decorated function in the queries/streaming packages."""
    paths = sorted(
        glob.glob(os.path.join(_PKG, "queries", "*.py"))
        + glob.glob(os.path.join(_PKG, "streaming", "*.py"))
    )
    for path in paths:
        with open(path) as f:
            src = f.read()
        for node in ast.walk(ast.parse(src)):
            if not isinstance(node, ast.FunctionDef):
                continue
            for dec in node.decorator_list:
                if (
                    isinstance(dec, ast.Call)
                    and getattr(dec.func, "id", getattr(dec.func, "attr", ""))
                    == "query"
                    and dec.args
                    and isinstance(dec.args[0], ast.Constant)
                ):
                    yield dec.args[0].value, path, node, src


def _body_percentile_hits(node: ast.FunctionDef) -> list[str]:
    """Builtin-percentile uses in the function BODY (docstring skipped;
    decorators are not part of node.body, so oracle SQL never hits)."""
    hits: list[str] = []
    body = list(node.body)
    if (
        body
        and isinstance(body[0], ast.Expr)
        and isinstance(body[0].value, ast.Constant)
        and isinstance(body[0].value.value, str)
    ):
        body = body[1:]  # docstring
    for stmt in body:
        for sub in ast.walk(stmt):
            if isinstance(sub, ast.Call):
                fn = sub.func
                name = (
                    fn.attr
                    if isinstance(fn, ast.Attribute)
                    else getattr(fn, "id", None)
                )
                if name in _CALL_NAMES:
                    hits.append(f"call {name}() at line {sub.lineno}")
            elif isinstance(sub, ast.Constant) and isinstance(sub.value, str):
                m = _STR_PAT.search(sub.value)
                if m:
                    hits.append(
                        f"string {m.group(0)!r}... at line {sub.lineno}"
                    )
    return hits


def test_no_builtin_percentile_outside_allowlist():
    violations: dict[str, list[str]] = {}
    triggered: set[str] = set()
    for qname, path, node, _src in _registered_query_functions():
        hits = _body_percentile_hits(node)
        if not hits:
            continue
        if qname in ALLOWLIST:
            triggered.add(qname)
            continue
        violations[qname] = [f"{os.path.relpath(path, _PKG)}: {h}" for h in hits]
    assert not violations, (
        "builtin percentile/median over a potentially SF-growing frame — "
        "buffers the whole group in ONE aggregation state (the r10/r13 OOM "
        "class). Route order statistics through operators/quantile.py "
        "group_quantiles_exact/group_quantiles_disc (partition-bounded "
        "state, bit-identical results) or percentile_approx if a sketch is "
        "acceptable; if the frame is genuinely domain-bounded, add the "
        f"query to ALLOWLIST with the reason. Violations: {violations}"
    )
    stale = set(ALLOWLIST) - triggered
    assert not stale, (
        f"ALLOWLIST entries that no longer use a builtin percentile: {stale} "
        "— remove them so the allowlist stays tight"
    )
