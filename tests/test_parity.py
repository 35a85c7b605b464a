"""Oracle-parity regression: every registered oracle-backed query must match
DuckDB exactly at sf0.001 (same comparison the driver runs at sf0.01)."""

from __future__ import annotations

from tests.parity import run_parity


def test_all_oracle_backed_queries_match(spark, sf_dir):
    results = run_parity(spark, sf_dir)
    assert results, "no oracle-backed queries registered"
    failures = {n: p for n, p in results.items() if p}
    assert not failures, f"parity failures: {failures}"


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    q, o = E.queries(), E.oracle_sql()
    assert len(q) > 0
    # every oracle key must have a matching query
    assert set(o) <= set(q)
