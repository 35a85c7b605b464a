"""Data layout for scale: partitioned writes (→ partition pruning) and
bucketed tables (→ co-located, shuffle-free joins).

At 100 TB the two dominant avoidable costs are (a) scanning data the query
does not need and (b) re-shuffling fact tables for every join/agg on the same
key. Both are LAYOUT problems, paid once at write time:

- :func:`write_partitioned` — hive-style directory partitioning on a
  low-cardinality derived column (e.g. the event date). Catalyst prunes whole
  directories at planning time (``PartitionFilters`` in the scan node), so a
  one-day query over a year of data opens ~1/365th of the files. Combined
  with :func:`sorted_within_partitions` the parquet row-group min/max stats
  prune further inside each file.
- :func:`write_bucketed` — pre-hash-partition and sort each side by the
  join/agg key into a fixed bucket count. A sort-merge join of two tables
  bucketed on the same key with the same count plans with NO Exchange on
  either side (asserted in ``tests/test_layout.py``); repeated fact-to-fact
  joins amortize one write-time shuffle across every subsequent query.

Local-mode note: buckets are regular files under the session warehouse; on a
real cluster the same API yields HDFS/S3 directories and the identical
no-Exchange plans — bucketing metadata lives in the catalog, not the path.

Reference parity: the reference has no storage-layout controls at all — its
single at-rest format is a dense text matrix re-read from disk on every query
(``primaryServer.c:43-49``, ``secondaryServer.c:208-228``).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet hive-partitioned by ``partition_cols``.

    Partition columns should be LOW cardinality (dates, regions, sources —
    not ids): each distinct tuple becomes a directory, and a million tiny
    directories is its own scale failure.
    """
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset; filters on partition columns prune
    directories (check ``PartitionFilters`` via :func:`physical_plan`)."""
    return spark.read.parquet(path)


def sorted_within_partitions(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Cluster rows inside each output file by ``cols`` so parquet row-group
    min/max statistics become selective for range predicates on those columns
    — the poor man's z-order, no shuffle added."""
    return df.sortWithinPartitions(*cols)


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    buckets: int,
    sort: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) catalog table.

    Both sides of a co-located join must use the SAME bucket count and key;
    ``sort`` (defaults to ``keys``) lets the sort-merge join skip its sort.
    ``path`` makes the table external (data outside the warehouse dir).
    """
    w = df.write.bucketBy(buckets, *keys).sortBy(*(sort or keys)).mode(mode)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata (must go through
    the catalog — ``spark.read.parquet`` on the files forgets the layout)."""
    return spark.table(table)


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (``explain`` only prints)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle-exchange operators in the physical plan — the
    metric bucketing exists to drive to zero. Counts formatted-mode
    ``(n) Exchange`` nodes; broadcast exchanges (``BroadcastExchange``)
    are not shuffles and don't match."""
    return len(re.findall(r"\(\d+\)\s+Exchange\b", physical_plan(df)))
