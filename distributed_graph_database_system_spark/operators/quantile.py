"""Quantile-cut bucketing: the cluster-scale alternative to ntile.

``NTILE(n) OVER (ORDER BY x)`` is exact but global — one window
partition, the same bottleneck partitioned_prefix_sum (operators/
prefix.py) removes for running sums. The scalable formulation is:

1. one aggregation pass computes n-1 approximate quantile cut points
   (``percentile_approx`` — Greenwald-Khanna style mergeable summaries,
   bounded error, no global sort);
2. a broadcast of the (n-1)-value cut table assigns every row its bucket
   with pure comparisons — embarrassingly parallel, no shuffle at all on
   the assignment pass.

Trade vs ntile: ntile guarantees equal bucket SIZES (to ±1 row) but
needs the global order; quantile cuts guarantee bucket BOUNDARIES (to
the approx error) and scale. Near the cut points, rows with equal or
near-equal values may land one bucket away from their ntile position —
tests/test_quantile.py bounds that disagreement on the fixture and
asserts the structural properties (monotone cuts, all buckets used,
bucket monotone in the value).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantile_cuts(
    df: DataFrame, col: str | Column, n_buckets: int, accuracy: int = 10_000
) -> list[float]:
    """The n_buckets-1 interior cut points of ``col`` via one
    percentile_approx aggregation pass (driver receives n-1 floats)."""
    c = F.col(col) if isinstance(col, str) else col
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(
        F.percentile_approx(c.cast("double"), qs, accuracy).alias("cuts")
    ).first()
    return [float(x) for x in row["cuts"]]


def bucket_by_cuts(
    df: DataFrame,
    col: str | Column,
    cuts: list[float],
    out_col: str = "bucket",
    ascending: bool = True,
) -> DataFrame:
    """Assign 1-based buckets from a cut table: bucket k means the value
    falls between cut k-1 and cut k (right-closed). ``ascending=False``
    gives bucket 1 to the LARGEST values (the rank-like orientation RFM
    scoring uses). Pure comparisons against broadcast literals — the
    assignment pass adds no shuffle.

    NULL values get a NULL bucket — without the explicit isNotNull guard
    every WHEN comparison is NULL and the otherwise fires, assigning NULLs
    to bucket n (and, with ``ascending=False``, to bucket 1: missing data
    silently awarded the best RFM-style score)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    n = len(cuts) + 1
    expr = F.lit(n)
    # build right-to-left: value <= cuts[0] → 1, <= cuts[1] → 2, ...
    for i in range(len(cuts) - 1, -1, -1):
        expr = F.when(c <= F.lit(cuts[i]), F.lit(i + 1)).otherwise(expr)
    if not ascending:
        expr = F.lit(n + 1) - expr
    expr = F.when(c.isNotNull(), expr)
    return df.withColumn(out_col, expr.cast("int"))
