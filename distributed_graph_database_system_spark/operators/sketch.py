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


# --- KMV (k-minimum-values / theta) distinct sketch -------------------------
#
# The CM sketch above answers FREQUENCY questions; KMV answers CARDINALITY
# and SET-OVERLAP questions the HLL rollup can't: HLL registers union
# cleanly but cannot intersect, while two KMV sketches intersect/union by
# plain set algebra on their hash samples (Beyer et al., SIGMOD 2007 "On
# synopses for distinct-value estimation under multiset operations";
# the theta-sketch generalization is Dasgupta et al., 2016). The sketch IS
# a DataFrame of ``(*group_cols, h)`` rows — the k smallest DISTINCT
# 60-bit hashes per group — so it persists, unions, and joins like any
# other relational state (the invindex/CM "sketch as first-class state"
# design).
#
# Determinism and cross-engine parity: ``h = int(md5(value)[:15 hex])``,
# the same portable md5 idiom as helpers.md5_uniform, so a DuckDB oracle
# reproduces estimates BIT-FOR-BIT (queries/analysis.py
# events_overlap_kmv) — no RNG, no seed, no engine-specific hash.
#
# Estimators (n̂ unbiased for uniform order statistics on [0, 2^60)):
#   distinct:   n̂ = (k-1) · 2^60 / h_k         (exact count when < k seen)
#   pair A,B:   θ = min(θ_A, θ_B); restrict both samples below θ — each
#               is then a uniform θ-sample of its set, so
#               |A∩B|̂ = |S_A ∩ S_B| · 2^60/θ and Jaccard̂ = |∩|/|∪| on
#               the restricted samples (θ cancels).
#
# Scale shape: one DISTINCT shuffle on (group, h), then a per-group sort
# of the DISTINCT hashes only. At 100 TB-scale group cardinalities, put
# ``presieve=`` to the expected k/n quantile: hashes are uniform, so
# filtering h < c·(k/n)·2^60 keeps ~c·k rows per group before the sort
# (c=8 default, underflow probability e^{-Θ(k)}); the build then verifies
# the sieve kept ≥ k rows per surviving group and raises rather than
# returning a silently biased sketch.

KMV_SPACE = 1 << 60  # 15 md5 hex digits


def _kmv_hash(col: str):
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")


def kmv_sketch(
    df: DataFrame,
    col: str,
    k: int = 256,
    group_cols: tuple[str, ...] = (),
    presieve: float | None = None,
) -> DataFrame:
    """Bottom-k distinct-hash sketch of ``df[col]`` per group:
    ``(*group_cols, h BIGINT)``, ≤ k rows per group, nulls excluded.

    ``presieve``: optional hash-space fraction in (0, 1] — filter
    ``h < presieve·2^60`` BEFORE the distinct+sort so per-group sort input
    is ~presieve·n_distinct rows instead of all of them. The caller sizes
    it from the expected group cardinality (e.g. ``8·k/n`` keeps ~8k rows;
    keeping < k then has probability e^-Θ(k) by Chernoff). The contract is
    strict: presieve is for uniformly LARGE groups — any group the sieve
    leaves with fewer than k hashes raises (its h_k would be the sieve's
    artifact if true cardinality exceeds the cut, and that is undecidable
    from sieved data alone), rather than returning a silently biased
    sketch. Sketch mixed-size keys without presieve."""
    from pyspark.sql import Window

    gc = list(group_cols)
    s = (
        df.where(F.col(col).isNotNull())
        .select(*gc, _kmv_hash(col).alias("h"))
        .distinct()
    )
    cut = None
    if presieve is not None:
        if not (0.0 < presieve <= 1.0):
            raise ValueError(f"kmv_sketch: presieve {presieve} not in (0, 1]")
        cut = int(presieve * KMV_SPACE)
        s = s.where(F.col("h") < F.lit(cut))
    w = Window.partitionBy(*gc) if gc else Window.partitionBy(F.lit(1))
    ranked = s.withColumn(
        "_rn", F.row_number().over(w.orderBy("h"))
    )
    sk = ranked.where(F.col("_rn") <= k).drop("_rn")
    if cut is not None and cut < KMV_SPACE:
        # Guard against ALL groups the data has, not just groups the sieve
        # left alive — a cut so tight a group loses every hash is the worst
        # bias (the group silently vanishes from the sketch). The group
        # list is a distinct on the group KEYS only (cheap — group-key
        # cardinality is small by the grouped-sketch design), never on the
        # (group, hash) pairs the sieve exists to avoid shuffling.
        if gc:
            groups = df.where(F.col(col).isNotNull()).select(*gc).distinct()
            kept = sk.groupBy(*gc).agg(F.count("*").alias("_kept"))
            bad = (
                groups.join(kept, gc, "left")
                .where(F.coalesce(F.col("_kept"), F.lit(0)) < k)
                .limit(1)
                .collect()
            )
        else:
            n_kept = sk.count()
            bad = [{"_kept": n_kept}] if n_kept < k else []
        if bad:
            row = bad[0] if isinstance(bad[0], dict) else bad[0].asDict()
            raise ValueError(
                "kmv_sketch: presieve kept fewer than k hashes for at "
                f"least one group (e.g. {row}) — the sieve cut is too "
                "tight for that group's cardinality; raise presieve or "
                "sketch without it"
            )
    return sk


def kmv_merge(
    a: DataFrame, b: DataFrame, k: int = 256, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Exact lossless merge: bottom-k of the union of two sketches equals
    the sketch of the unioned data (bottom-k is a semilattice — asserted
    row-for-row in tests/test_sketch.py)."""
    from pyspark.sql import Window

    gc = list(group_cols)
    w = Window.partitionBy(*gc) if gc else Window.partitionBy(F.lit(1))
    return (
        a.unionByName(b)
        .select(*gc, "h")
        .distinct()
        .withColumn("_rn", F.row_number().over(w.orderBy("h")))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_distinct_estimate(
    sketch: DataFrame, k: int = 256, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """``(*group_cols, est_distinct DOUBLE)``: exact count when the group
    produced fewer than k hashes (the sketch IS the set), else the
    unbiased (k-1)·2^60/h_k."""
    gc = list(group_cols)
    st = sketch.groupBy(*gc).agg(
        F.max("h").alias("_hk"), F.count("*").alias("_cnt")
    )
    est = F.when(
        F.col("_cnt") < k, F.col("_cnt").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(KMV_SPACE)) / F.col("_hk").cast("double")
    )
    return st.select(*gc, est.alias("est_distinct"))


def kmv_pair_overlap(
    sketch: DataFrame, key_col: str, k: int = 256
) -> DataFrame:
    """Pairwise set-overlap estimates between every two groups of a
    single-key sketch (``key_col``, h): for each pair a < b,
    ``(type_a, type_b, n_sample_inter BIGINT, est_inter DOUBLE,
    est_jaccard DOUBLE)``.

    θ-restriction: θ = min over the pair of (h_k if the group is
    truncated at k else 2^60). Below θ each sketch is a uniform θ-sample
    of its full set, so intersection scales by 2^60/θ and Jaccard is the
    plain sample ratio. Everything after the sketch build is arithmetic
    over ≤ k-row-per-group state — broadcast-sized for any number of
    source rows."""
    st = sketch.groupBy(key_col).agg(
        F.max("h").alias("hk"), F.count("*").alias("cnt")
    )
    theta = F.when(F.col("cnt") < k, F.lit(KMV_SPACE)).otherwise(F.col("hk"))
    st = st.select(key_col, theta.alias("theta"))
    pa = st.select(
        F.col(key_col).alias("type_a"), F.col("theta").alias("ta")
    )
    pb = st.select(
        F.col(key_col).alias("type_b"), F.col("theta").alias("tb")
    )
    pairs = pa.join(pb, F.col("type_a") < F.col("type_b")).select(
        "type_a", "type_b", F.least("ta", "tb").alias("theta")
    )
    sa = sketch.select(F.col(key_col).alias("type_a"), "h")
    sb = sketch.select(F.col(key_col).alias("type_b"), "h")
    # θ-restricted samples of each side, tagged per pair
    ra = pairs.join(sa, "type_a").where(F.col("h") < F.col("theta"))
    rb = pairs.join(sb, "type_b").where(F.col("h") < F.col("theta"))
    inter = (
        ra.join(rb, ["type_a", "type_b", "theta", "h"])
        .groupBy("type_a", "type_b", "theta")
        .agg(F.count("*").alias("n_inter"))
    )
    union = (
        ra.select("type_a", "type_b", "theta", "h")
        .unionByName(rb.select("type_a", "type_b", "theta", "h"))
        .distinct()
        .groupBy("type_a", "type_b", "theta")
        .agg(F.count("*").alias("n_union"))
    )
    j = (
        pairs.join(inter, ["type_a", "type_b", "theta"], "left")
        .join(union, ["type_a", "type_b", "theta"], "left")
        .select(
            "type_a",
            "type_b",
            F.coalesce("n_inter", F.lit(0)).cast("bigint").alias(
                "n_sample_inter"
            ),
            (
                F.coalesce("n_inter", F.lit(0)).cast("double")
                * F.lit(float(KMV_SPACE))
                / F.col("theta").cast("double")
            ).alias("est_inter"),
            (
                F.coalesce("n_inter", F.lit(0)).cast("double")
                / F.coalesce("n_union", F.lit(1)).cast("double")
            ).alias("est_jaccard"),
        )
    )
    return j


def kmv_union_expr(col: str, k_col: str = "kk"):
    """The bottom-k-of-union AGGREGATE expression over array-form sketches:
    ``slice(array_sort(array_distinct(flatten(collect_list(col)))), 1, k)``
    with the truncation bound read from the stamped ``k_col`` (which must
    be a grouping column). ONE definition shared by the incremental KMV
    rollup rebuild and compact_contrib_ledger's ``kmv_union`` fold — the
    fold==rebuild bit-identity contract depends on the two sites never
    drifting, so they both call this."""
    return F.expr(
        f"slice(array_sort(array_distinct(flatten(collect_list({col})))), "
        f"1, {k_col})"
    )
