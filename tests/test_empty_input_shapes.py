"""Global-aggregate queries must keep their ONE-ROW shape on empty input
(r13 ADVICE): `conversion_time_stats` and `orders_interpurchase_gaps`
join the always-one-row global aggregate with a quantile frame that is
EMPTY when no user converts / no customer reorders. A cross join would
collapse the result to zero rows while the DuckDB oracle's global
aggregate still returns one row of (0, NULL, ...); the queries use a
broadcast LEFT join so the shapes agree. This test feeds both queries an
empty fixture directory (schema-identical limit(0) copies of the real
tables) and asserts the one-row NULL-stats shape."""

from __future__ import annotations

import os

import pytest

from distributed_graph_database_system_spark.sources.catalog import table_path


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("sf_empty"))
    for name in ("events", "orders"):
        df = spark.read.parquet(table_path(sf_dir, name)).limit(0)
        df.write.parquet(os.path.join(out, f"{name}.parquet"))
    return out


def test_conversion_time_stats_one_row_on_empty_input(spark, empty_sf_dir):
    from distributed_graph_database_system_spark.queries.analysis import (
        conversion_time_stats,
    )

    rows = conversion_time_stats(spark, empty_sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_converted"] == 0
    assert r["min_delay_s"] is None
    assert r["median_delay_s"] is None
    assert r["max_delay_s"] is None


def test_interpurchase_gaps_one_row_on_empty_input(spark, empty_sf_dir):
    from distributed_graph_database_system_spark.queries.analysis import (
        orders_interpurchase_gaps,
    )

    rows = orders_interpurchase_gaps(spark, empty_sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_gaps"] == 0
    for c in ("p25_days", "p50_days", "p75_days", "p90_days", "max_days"):
        assert r[c] is None
