"""Shared helpers for oracle-parity query authoring.

The driver hash-compares Spark results against DuckDB values, so floating
point must be deterministic across engines:

- **Money / fixed-point columns** (prices, discounts, quantities with 2dp):
  cast to DECIMAL before SUM so the aggregate is exact integer arithmetic,
  then cast the final value to DOUBLE in BOTH engines. Bit-identical.
- **Averages**: exact decimal SUM cast to double, divided by COUNT (double /
  bigint is one deterministic IEEE op in both engines).
- **True floats** (cosine similarity, log/exp): round to a fixed number of
  decimals on both sides.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import Column
from pyspark.sql import functions as F


def scratch_dir(family: str, sf_dir: str, name: str) -> str:
    """A per-process scratch path for query-side sink/layout round-trips:
    ``/tmp/spark_graft_<family>/<md5(sf_dir)>-<pid>/<name>``.

    md5(sf_dir) disambiguates same-basename fixture roots; the pid isolates
    concurrent runs (driver harness vs pytest) from overwrite/read races on
    a shared /tmp. The pid-scoped directory is removed at interpreter exit —
    without that, every harness/pytest process leaks full fixture-table
    copies until /tmp fills.
    """
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_{family}")
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    piddir = os.path.join(root, f"{key}-{os.getpid()}")
    if piddir not in _CLEANUP_DIRS:
        _CLEANUP_DIRS.add(piddir)
        atexit.register(shutil.rmtree, piddir, ignore_errors=True)
    return os.path.join(piddir, name)


_CLEANUP_DIRS: set[str] = set()


def md5_uniform(id_col: str | Column = "doc_id", offset: int = 1) -> Column:
    """Deterministic uniform in [0, 1): 8 md5-hex digits of the
    decimal-string id starting at 1-based position ``offset``, over 2^32
    — byte-identical in Spark and DuckDB (`CAST(('0x' ||
    substr(md5(CAST(x AS VARCHAR)),<offset>,8)) AS BIGINT) /
    4294967296.0`). The randomness source for every sampling decision, so
    membership is a pure function of the id; a second ``offset`` (e.g. 9)
    yields an INDEPENDENT uniform from the same digest, so one id can
    carry a deterministic point pair (the geo-binning queries)."""
    if not 1 <= offset <= 25:  # 32 hex digits; need offset+8 <= 33
        raise ValueError(f"offset must be in [1, 25], got {offset}")
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), offset, 8), 16, 10)
        .cast("bigint")
        / F.lit(4294967296.0)
    )


def sf_view(spark, df, prefix: str, sf_dir: str) -> str:
    """Register ``df`` as a temp view named ``<prefix>_<md5(sf_dir)[:8]>``
    and return the name. The hash key prevents concurrent queries over
    different fixture dirs from clobbering each other's views (builtin
    hash() is seed-random, hence md5)."""
    name = f"{prefix}_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    df.createOrReplaceTempView(name)
    return name


def dec(col: str | Column, prec: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def dsum(col: str | Column, prec: int = 18, scale: int = 2) -> Column:
    """Exact decimal sum surfaced as double (match: CAST(SUM(CAST(x AS
    DECIMAL(p,s))) AS DOUBLE) in DuckDB)."""
    return F.sum(dec(col, prec, scale)).cast("double")


def davg(col: str | Column, prec: int = 18, scale: int = 2) -> Column:
    """Exact-sum average as double (match: CAST(SUM(CAST(x AS DEC)) AS
    DOUBLE) / COUNT(x) in DuckDB)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, prec, scale)).cast("double") / F.count(c)
