"""Replica of the driver's DuckDB-oracle comparison, used by our own tests.

For each registered query: run the Spark impl and the oracle SQL on the same
sf dir, sort columns by name, canonicalize values, and compare row multisets
EXACTLY. If this passes, any order-insensitive value hash the driver computes
matches too.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from distributed_graph_database_system_spark.sources.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return f"f:{v!r}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return "t:" + v.isoformat()
    if hasattr(v, "isoformat"):
        return "t:" + v.isoformat()
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int) or type(v).__name__.startswith(("int", "uint")):
        return f"i:{int(v)}"
    if type(v).__name__.startswith("float"):
        return _canon_cell(float(v))
    if isinstance(v, bytes):
        return "x:" + v.hex()
    if isinstance(v, str):
        return "s:" + v
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    return f"o:{v!r}"


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns differ: spark={sc} oracle={oc}")
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    srows, orows = canon_rows(spark_pdf), canon_rows(oracle_pdf)
    if srows != orows:
        sset, oset = set(srows), set(orows)
        only_s = list(sset - oset)[:3]
        only_o = list(oset - sset)[:3]
        problems.append(
            f"values differ (cols={sc}); spark-only sample={only_s}; "
            f"oracle-only sample={only_o}"
        )
    return problems


def run_parity(
    spark,
    sf_dir: str,
    names: list[str] | None = None,
    workers: int | None = None,
) -> dict[str, list[str]]:
    """Run every oracle-backed query both ways; return {name: problems}.

    Queries are independent, so a small driver thread pool overlaps their
    jobs (guide §2.6: actions are only sequential because the driver calls
    them sequentially) — at fixture scale each query is dominated by fixed
    per-job overhead (planning, task scheduling, the toPandas round-trip),
    and overlapping 6 of them cuts the full-registry sweep several-fold.
    That is what keeps the in-suite full sweep inside the driver's pytest
    budget (r14 VERDICT item 1). Safety: every temp-view name is unique to
    its query (or re-registers the identical table view), runtime-conf
    sets are idempotent same-value writes, sink paths are per-query; each
    worker thread gets its own DuckDB cursor (connections are not
    thread-safe, cursors over one connection are). ``workers=1`` (or env
    SPARK_GRAFT_PARITY_WORKERS=1) restores the serial sweep."""
    from concurrent.futures import ThreadPoolExecutor

    from distributed_graph_database_system_spark.queries.registry import all_queries

    if workers is None:
        workers = int(os.environ.get("SPARK_GRAFT_PARITY_WORKERS", "6"))
    con = duckdb_conn(sf_dir)
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    selected = [
        (name, spec)
        for name, spec in sorted(all_queries().items())
        if not (names and name not in names)
        and spec.oracle is not None
        # golden VALUES oracles are pinned to one SF (the driver's sf0.01);
        # at other SFs there is nothing valid to compare against
        and not (spec.oracle_sf and sf_tag != f"sf{spec.oracle_sf}")
    ]

    def one(item) -> tuple[str, list[str]]:
        name, spec = item
        spark.sparkContext.setJobDescription(f"parity: {name}")
        try:
            spark_pdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            return name, [f"spark error: {e}"]
        cur = con.cursor()
        try:
            oracle_pdf = cur.execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            return name, [f"oracle error: {e}"]
        finally:
            cur.close()
        return name, compare(spark_pdf, oracle_pdf)

    if workers <= 1:
        return dict(one(item) for item in selected)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        return dict(pool.map(one, selected))
