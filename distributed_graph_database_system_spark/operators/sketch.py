"""Count-min sketch as a DataFrame: a mergeable frequency sketch for
heavy-hitter queries over unbounded key domains.

The sketch IS a (small) DataFrame of ``(d, bucket, cnt, w)`` rows —
depth × width counters plus the self-describing build-width stamp —
built with one scan + one aggregation, mergeable by union + sum (counts
are additive, so merging is exact: sketch(A ∪ B) ==
merge(sketch(A), sketch(B)) row-for-row, asserted in tests). This is the
same "sketch as first-class relational state" design as the HLL rollup
(queries/breadth.py agg_hll_rollup): partial sketches per shard/day union
into corpus sketches without touching raw data again.

Estimate guarantees (Cormode & Muthukrishnan, J.Alg 2005): with width w
and depth d, est(x) ≥ true(x) always (counters only over-count), and
est(x) ≤ true(x) + e·N/w with probability ≥ 1 − (1/2)^d per the standard
analysis (e = Euler's number; N = stream length). Both sides are asserted
over the full fixture vocabulary in tests/test_sketch.py.

Determinism: bucket assignment is ``xxhash64(value, row_index)`` — fixed
seed inside Spark's xxhash64, no RNG state — so estimates are pure
functions of the input multiset; the driver query pins its golden at
sf0.01 exactly like the MinHash/SimHash families.

Scale shape: ONE scan of the keyed column exploded ×d (d is 3–7), one
groupBy (d, bucket) with map-side partial aggregation — per-executor
state is at most d·w counters regardless of input size or key skew (a
hot key folds into one counter per row; no hot-reducer problem by
construction). Point queries broadcast-join the d·w-row sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucketed(df: DataFrame, col: str, depth: int, width: int) -> DataFrame:
    """THE canonical bucket assignment — explode ×depth, bucket =
    pmod(xxhash64(value, d), width). Single definition shared by build,
    estimate, and the streaming rollup so the hashing scheme cannot
    silently diverge between a persisted ledger and later probes."""
    return df.where(F.col(col).isNotNull()).select(
        *[c for c in df.columns if c != col],
        F.col(col).alias("_v"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d"),
    ).select(
        *[c for c in df.columns if c != col],
        "_v",
        "d",
        F.pmod(F.xxhash64("_v", "d"), F.lit(width)).cast("int").alias("bucket"),
    )


def cm_sketch(
    df: DataFrame,
    col: str,
    depth: int = 5,
    width: int = 1024,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Build a count-min sketch of ``df[col]`` (nulls excluded):
    ``(*group_cols, d INT, bucket INT, cnt BIGINT, w INT)`` with at most
    depth×width rows per group — ``group_cols`` gives one independent
    sketch per group (e.g. per day for the streaming rollup).

    The build width travels WITH the sketch as the stamped ``w`` column
    (same self-describing-state pattern as invindex.py's ``n_shards``
    sidecar): ``cm_estimate`` derives the probe width from it instead of
    trusting a caller parameter, because probing with the wrong width
    mostly misses the bucket join and silently reports 0 for real heavy
    hitters — the exact inverse of the sketch's one-sided guarantee."""
    keep = df.select(*group_cols, col) if group_cols else df.select(col)
    return (
        _bucketed(keep, col, depth, width)
        .groupBy(*group_cols, "d", "bucket")
        .agg(F.count("*").alias("cnt"))
        .withColumn("w", F.lit(width).cast("int"))
    )


def cm_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Exact merge of two same-shape UNGROUPED sketches (counters are
    additive). ``w`` is a merge key: sketches built with different widths
    do NOT fold into one (their counters are not comparable) — the mixed
    rows survive to ``cm_estimate``, which rejects a multi-width sketch
    outright. Grouped sketches (cm_sketch with ``group_cols``) are out of
    scope here — this merge sums over (d, bucket, w) only, which would
    collapse groups; merge those per group the way the streaming rollup
    does (groupBy(*group_cols, d, bucket, w).sum)."""
    return (
        a.unionByName(b)
        .groupBy("d", "bucket", "w")
        .agg(F.sum("cnt").alias("cnt"))
        .select("d", "bucket", "cnt", "w")  # cm_sketch's column order
    )


def cm_estimate(
    sketch: DataFrame, items: DataFrame, col: str, width: int | None = None
) -> DataFrame:
    """Point-query estimates for every row of ``items[col]``: joins each
    item's d buckets against the sketch and takes the MIN counter.
    Returns ``items`` columns plus ``est BIGINT``. The sketch side is
    d·w rows — always broadcast; absent (d, bucket) rows mean zero
    collisions there, i.e. estimate 0.

    The probe width is DERIVED from the sketch's stamped ``w`` column, so
    a width-256 streaming rollup probed by a caller assuming the 1024
    default still probes at 256 — correct by construction. An explicit
    ``width`` argument is a cross-check only: it raises on mismatch
    rather than overriding. Legacy sketches without ``w`` (pre-stamp
    persisted ledgers) fall back to the argument with the one-sided
    max-bucket guard, which catches build-width > probe-width misuse."""
    extremes = sketch.agg(
        F.max("d").alias("max_d"),
        F.max("bucket").alias("max_b"),
        *(
            [
                F.min("w").alias("min_w"),
                F.max("w").alias("max_w"),
                F.sum(F.col("w").isNull().cast("int")).alias("null_w"),
            ]
            if "w" in sketch.columns
            else []
        ),
    ).first()
    if extremes["max_d"] is None:
        # empty sketch = empty stream: every estimate is exactly 0
        return items.withColumn("est", F.lit(0).cast("bigint"))
    if "w" in sketch.columns and extremes["null_w"]:
        if extremes["max_w"] is not None:
            # Mixed stamped/NULL rows: a pre-stamp file merged with stamped
            # ones. min/max ignore NULLs, so WITHOUT this guard the
            # mixed-width check below never fires and the same (d, bucket)
            # cell split across w=NULL/w=<width> rows makes the groupBy-min
            # pick a PARTIAL counter — a silent undercount violating the
            # one-sided guarantee. Refuse with the migration path.
            raise ValueError(
                "cm_estimate: sketch mixes stamped (w="
                f"{extremes['max_w']}) and pre-stamp (w NULL) rows — a "
                "partially-migrated ledger. Rebuild the rollup (replay one "
                "batch through run_incremental_cms_rollup folds legacy "
                "contrib rows into the stamped cells) before probing"
            )
        # ALL-NULL w ≡ the legacy no-column case: fall back to the
        # explicit width argument + max-bucket guard below.
        sketch = sketch.drop("w")
    if "w" in sketch.columns:
        if extremes["min_w"] != extremes["max_w"]:
            raise ValueError(
                "cm_estimate: sketch mixes build widths "
                f"{extremes['min_w']} and {extremes['max_w']} — merge only "
                "same-width sketches"
            )
        if width is not None and width != extremes["max_w"]:
            raise ValueError(
                f"cm_estimate: caller width {width} != sketch build width "
                f"{extremes['max_w']}"
            )
        width = extremes["max_w"]
        sketch = sketch.drop("w")
    elif width is None:
        raise ValueError(
            "cm_estimate: sketch has no stamped 'w' column; pass width="
        )
    if extremes["max_b"] >= width:
        raise ValueError(
            f"cm_estimate: sketch has bucket {extremes['max_b']} >= width "
            f"{width} — the sketch was built with a different width"
        )
    depth = extremes["max_d"] + 1
    probes = _bucketed(items.select(col), col, depth, width)
    joined = probes.join(F.broadcast(sketch), ["d", "bucket"], "left").select(
        "_v", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    est = joined.groupBy("_v").agg(F.min("cnt").alias("est"))
    return items.join(
        est.withColumnRenamed("_v", col), col, "left"
    ).withColumn("est", F.coalesce("est", F.lit(0)))
