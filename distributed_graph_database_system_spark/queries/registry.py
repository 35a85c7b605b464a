"""Query registry: one place where every operator's (Spark impl, DuckDB oracle)
pair is declared.

The driver harness (``__spark_entry__.py``) exposes ``queries()`` and
``oracle_sql()`` from this registry. Registration is declarative::

    @query("q1_pricing_summary", oracle=\"\"\"SELECT ...\"\"\")
    def q1(spark, sf_dir):
        ...return a DataFrame

Invariants enforced by tests (tests/test_oracle_parity.py):
- every aggregate / computed column is aliased IDENTICALLY in both sides;
- float results are either decimal-exact (money summed as DECIMAL(18,2),
  cast to DOUBLE at the end in both engines) or rounded to a fixed number of
  decimals on both sides, so the driver's value hash is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules lazily to avoid cycles.
    from distributed_graph_database_system_spark.queries import (  # noqa: F401
        breadth,
        graph,
        llm,
        relational,
        streaming_batch,
    )

    return dict(_REGISTRY)


def spark_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_map() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle
    }
