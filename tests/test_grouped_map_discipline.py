"""Registry-wide grouped-map (applyInPandas) discipline guard.

``groupBy(...).applyInPandas`` materializes EACH GROUP as one in-memory
pandas DataFrame inside one Python worker — per-task memory grows with the
group, so a group keyed by a low-cardinality column over an SF-growing
fact table is the same cliff class the percentile guard
(tests/test_percentile_discipline.py) and the global-window guard
(tests/test_global_window_discipline.py) mechanize: fine at fixture
scale, OOM at warehouse scale. Unlike window functions (which stream
frames) or ``mapInPandas`` (which iterates Arrow batches without ever
materializing a whole partition), grouped-map has no streaming escape —
the pattern's documented contract is "each group must fit one executor's
memory".

This test AST-scans every registered query's FUNCTION BODY for
``.applyInPandas(`` calls. Any hit outside ALLOWLIST fails with a pointer
to the alternatives (partitioned windows, the prefix/quantile machinery,
``mapInPandas`` after an explicit repartition for per-row work). The
allowlist is the category's documented exhibit; entries must keep
triggering the detector so the list cannot go stale.

``applyInPandasWithState`` (streaming per-key state, bounded by the state
the caller keeps, not by group row count) and ``mapInPandas`` are
deliberately NOT flagged.
"""

from __future__ import annotations

import ast

from tests.test_percentile_discipline import _registered_query_functions

ALLOWLIST: dict[str, str] = {
    # THE grouped-map category exhibit (SURVEY §2.2 "UDF / pandas UDF"):
    # its docstring states the pattern's scale contract explicitly ("each
    # group must fit one executor's memory"). The same rank is available
    # at scale through the partitioned prefix machinery — the exhibit
    # exists to exercise and driver-grade applyInPandas itself.
    "pandas_grouped_rank": "documented grouped-map exhibit",
}


def _body_grouped_map_hits(node: ast.FunctionDef) -> list[str]:
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
            if (
                isinstance(sub, ast.Call)
                and isinstance(sub.func, ast.Attribute)
                and sub.func.attr == "applyInPandas"
            ):
                hits.append(f"call .applyInPandas() at line {sub.lineno}")
    return hits


def test_no_grouped_map_outside_allowlist():
    violations: dict[str, list[str]] = {}
    triggered: set[str] = set()
    for qname, path, node, _src in _registered_query_functions():
        hits = _body_grouped_map_hits(node)
        if not hits:
            continue
        if qname in ALLOWLIST:
            triggered.add(qname)
            continue
        violations[qname] = hits
    assert not violations, (
        "groupBy().applyInPandas materializes each whole group in one "
        "Python worker — unbounded per-task memory when the group grows "
        "with SF (the percentile-cliff class, Python edition). Use a "
        "partitioned window / the prefix or quantile machinery for ranks "
        "and order statistics, or mapInPandas for per-row Python work; if "
        "the groups are genuinely domain-bounded, add the query to "
        f"ALLOWLIST with the reason. Violations: {violations}"
    )
    stale = set(ALLOWLIST) - triggered
    assert not stale, (
        f"ALLOWLIST entries that no longer call applyInPandas: {stale} — "
        "remove them so the allowlist stays tight"
    )
