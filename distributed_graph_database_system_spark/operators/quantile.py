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

import math

from pyspark.sql import Column, DataFrame, Window as W
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


def group_quantiles_exact(
    df: DataFrame,
    value_col: str | Column,
    quantiles: list[float],
    group_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT interpolated quantiles per group with bounded per-task state —
    the order-statistic path for groups too large for ``percentile()``'s
    in-buffer sort OR a per-group window sort.

    ``percentile()`` buffers every group's values in one aggregation
    buffer; the agg_median window rewrite (queries/relational.py) bounds
    memory but still sorts each group inside ONE task. This generalizes
    both with the two-pass global-rank discipline of
    operators/prefix.py's partitioned_prefix_sum:

    1. ONE bounded probe pass collects approximate value-span cut
       points as driver literals (an order statistic only needs
       cumulative counts — see _weighted_ranks), and value rows are
       hash-exchanged on their deterministic (span, group) bucket — a
       giant group spans many cut buckets, each holding a contiguous
       value range of it;
    2. pass 1 (parallel): cumulative weight within ``(span, group)`` —
       window state is bounded by the SPAN size, never the group size —
       plus per-(span, group) row counts;
    3. the count table (≤ groups × spans rows) yields each span's
       global-rank OFFSET via a tiny window, broadcast back;
    4. global rank = local rank + offset; the two order statistics
       bracketing each quantile are picked out by a broadcast equi-join on
       (group, rank) and interpolated with the SAME IEEE expression
       Spark's percentile() uses (``(ceil(pos)−pos)·lo +
       (pos−floor(pos))·hi``, ``pos = (n−1)·q`` double, lo returned
       directly when pos is integral), so results are BIT-identical to
       percentile() — asserted in tests/test_quantile.py. DuckDB's
       quantile_cont interpolates as ``lo + frac·(hi−lo)``, which can
       differ by 1 ULP; the registered queries round(4) on both sides,
       which absorbs it (same discipline as agg_percentile_bands).

    Intended regime: FEW-but-HUGE groups (the offsets and bracketing
    tables broadcast at O(groups + partitions) and O(groups × quantiles)
    rows — tiny for dashboard-style groupings, wrong for millions of
    tiny groups, where percentile()'s per-group buffers are small and
    map-side-combinable anyway). NULL values are excluded
    (percentile()/quantile_cont semantics); a group that is all-NULL
    drops out. Returns one row per group:
    ``(*group_cols, q0 DOUBLE, q1 DOUBLE, ...)`` with one column per
    requested quantile, named ``q_<quantile with '.' → '_'>`` (e.g. 0.25 →
    ``q_0_25``); callers alias as needed. Ties are safe: equal values may
    get arbitrary relative ranks, but every rank in a tie run holds the
    same value, so the bracketed statistics are deterministic.
    """
    _validate_quantiles(quantiles)
    ranked, counts = _weighted_ranks(df, value_col, group_cols, num_partitions)

    # per-group totals → the two bracketing indices per quantile, exploded
    # to (group, qi, part, idx) — |groups| × |quantiles| × 2 rows, broadcast
    totals = counts.groupBy(*group_cols).agg(F.sum("_c").alias("_n"))
    targets = totals.select(
        *group_cols,
        "_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("qi"),
                        ((F.col("_n") - 1) * F.lit(q)).alias("pos"),
                        part_idx.alias("idx"),
                        F.lit(part).alias("part"),
                    )
                    for i, q in enumerate(quantiles)
                    for part, part_idx in (
                        ("lo", F.floor((F.col("_n") - 1) * F.lit(q))),
                        ("hi", F.ceil((F.col("_n") - 1) * F.lit(q))),
                    )
                ]
            )
        ).alias("t"),
    ).select(*group_cols, "t.qi", "t.pos", "t.part", "t.idx")

    # the value at 0-based index k is the one whose cumulative-count
    # span covers it: _cumw − _w ≤ k < _cumw (weighted frame; ties are
    # a single row, so the pick is deterministic by construction)
    picked = ranked.join(F.broadcast(targets), group_cols).where(
        (F.col("_cumw") > F.col("idx"))
        & (F.col("_cumw") - F.col("_w") <= F.col("idx"))
    )
    per_q = picked.groupBy(*group_cols, "qi").agg(
        F.max("pos").alias("pos"),
        F.max(F.when(F.col("part") == "lo", F.col("_v"))).alias("_lo"),
        F.max(F.when(F.col("part") == "hi", F.col("_v"))).alias("_hi"),
    )
    # Spark Percentile.getPercentile: lowerValue when the position is
    # integral, else (higher−pos)·lo + (pos−lower)·hi — reproduced exactly
    # so the result is bit-identical to percentile().
    pos = F.col("pos")
    interp = F.when(F.floor(pos) == F.ceil(pos), F.col("_lo")).otherwise(
        (F.ceil(pos) - pos) * F.col("_lo")
        + (pos - F.floor(pos)) * F.col("_hi")
    )

    return per_q.groupBy(*group_cols).agg(
        *[
            F.max(F.when(F.col("qi") == i, interp)).alias(_qcolname(q))
            for i, q in enumerate(quantiles)
        ]
    )


def group_quantiles_disc(
    df: DataFrame,
    value_col: str | Column,
    quantiles: list[float],
    group_cols: list[str],
    num_partitions: int | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """EXACT DISCRETE quantiles (SQL-standard ``PERCENTILE_DISC WITHIN
    GROUP``) per group with bounded per-task state: the smallest actual
    value whose cumulative fraction reaches q — the value at 1-based rank
    ``ceil(q·n)`` (rank 1 for q=0), which is how both Spark and DuckDB
    define it. An order statistic, never an interpolation, so the result
    is an exact column value with ZERO cross-engine float risk — the
    right cut-table source when the cuts feed comparisons (bucketing),
    where a 1-ULP interpolated difference could flip a row's bucket.

    Float-boundary note: the rank is computed as ``ceil(q·n)`` in IEEE
    doubles — at exact-rational boundaries where the double PRODUCT
    rounds above the true integer (e.g. q = 9/11, n = 77: exact 63,
    double 63.000000000000014 → rank 64), BOTH engines' builtins sit on
    the same product side, so the three implementations agree even at
    the adversarial cases (pinned on real data in
    tests/test_property.py::test_percentile_disc_rank_rule_at_adversarial_float_boundaries;
    the textbook cume_dist rule "smallest r with r/n ≥ q" is the one
    that diverges there).

    Runs the span-bucketed rank machinery (the same discipline as
    group_quantiles_exact — see _weighted_ranks for the probe, the
    deterministic cut-literal exchange, and the duplicate-heavy vs
    near-all-distinct dispatch). The rank rule is unchanged: the value
    whose cumulative-count span covers the 1-based rank
    ``max(ceil(q·n), 1)``, bit-identical to the previous range+pin form
    (re-verified by the full-registry parity sweep and the
    weighted-vs-raw equivalence pytest). Per-task state stays bounded by
    the span size, never the group size. Returns one row per group with
    one ``q_<q>`` DOUBLE column per quantile (same naming as
    group_quantiles_exact); all-NULL groups drop out.

    ``count_col``: when set, the result also carries each group's
    NON-NULL value count under that name (BIGINT) — the machinery's
    per-group totals, exact by construction. Callers that need both the
    quantiles and the group sizes would otherwise aggregate the input a
    second time, recomputing the (possibly expensive) upstream subtree
    once more per call (guide §1.2: part_brand_margin_quartiles paid a
    full extra lineitem⋈part pass at sf100 just for n_lines)."""
    _validate_quantiles(quantiles)
    if count_col is not None and count_col in {
        _qcolname(q) for q in quantiles
    }:
        raise ValueError(f"count_col {count_col!r} collides with a quantile")
    ranked, counts = _weighted_ranks(df, value_col, group_cols, num_partitions)
    totals = counts.groupBy(*group_cols).agg(F.sum("_c").alias("_n"))
    # 1-based pick rank: ceil(q*n), clamped to 1 for q=0 (same IEEE
    # ceil-of-product arithmetic as before and as both engines'
    # builtins — see the float-boundary note above).
    targets = totals.select(
        *group_cols,
        "_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("qi"),
                        F.greatest(
                            F.ceil(F.col("_n") * F.lit(q)), F.lit(1)
                        ).alias("_r"),
                    )
                    for i, q in enumerate(quantiles)
                ]
            )
        ).alias("t"),
    ).select(*group_cols, "t.qi", "t._r", "_n")
    picked = ranked.join(F.broadcast(targets), group_cols).where(
        (F.col("_cumw") >= F.col("_r"))
        & (F.col("_cumw") - F.col("_w") < F.col("_r"))
    )
    extra = (
        [F.max("_n").cast("bigint").alias(count_col)]
        if count_col is not None
        else []
    )
    return picked.groupBy(*group_cols).agg(
        *[
            F.max(F.when(F.col("qi") == i, F.col("_v"))).alias(_qcolname(q))
            for i, q in enumerate(quantiles)
        ],
        *extra,
    )


def _validate_quantiles(quantiles: list[float]) -> None:
    if not quantiles or not all(0.0 <= q <= 1.0 for q in quantiles):
        raise ValueError(f"quantiles must be in [0, 1], got {quantiles!r}")
    names = [_qcolname(q) for q in quantiles]
    if len(set(names)) != len(names):
        raise ValueError(
            "quantiles must be unique and distinguishable at 6 decimal "
            f"places (column names {names!r} collide)"
        )


def _weighted_ranks(
    df: DataFrame,
    value_col: str | Column,
    group_cols: list[str],
    num_partitions: int | None,
) -> tuple[DataFrame, DataFrame]:
    """The shared WEIGHTED global-rank pass: returns ``(ranked, counts)``
    where ranked is ``(*group_cols, _v DOUBLE, _w BIGINT, _cumw BIGINT)``
    — each value with its occurrence weight and cumulative count within
    its group (so _v covers 1-based ranks (_cumw − _w, _cumw]) — and
    counts is the per-(value-span, group) row-count table (``SUM(_c)``
    per group = the group's raw row count, NULLs excluded).

    Value spans come from ONE bounded probe pass (``percentile_approx``
    cut points + count + approx distinct count, collected to the driver
    as literals — the same bounded-cut-table discipline as
    quantile_cuts). Because the span of a row is a PURE FUNCTION of its
    value (a balanced comparison tree over the cut literals), every
    consumer of the frame sees the identical placement on independent
    recomputation — which is what lets this path drop BOTH the
    ``repartitionByRange`` (whose sample pass recomputed the whole
    upstream subtree once more) and the ``localCheckpoint`` pin (whose
    materialization went disk-bound at 600M pinned rows — BASELINE.md
    round-14) that the r14 form needed. The cuts only steer BALANCE,
    never results: ranks are exact cumulative counts regardless of where
    the cut boundaries fall.

    The probe's distinct-ratio dispatches two bit-equivalent layouts:

    - duplicate-heavy (ratio < 0.5): pre-aggregate to the DISTINCT
      (group, value) frame with occurrence weights BEFORE the span
      exchange — duplicates collapse in the map-side partial aggregate,
      so a hot value never ships its raw rows to one reducer (the r14
      weighted-frame discipline, ~400× for cents-quantized money).
    - near-all-distinct (ratio ≥ 0.5): the pre-aggregation cannot even
      halve the frame, so skip it — ONE exchange of the raw rows on
      (span, group), ``row_number`` ranks with weight 1 (ties are then
      separate rows, but every rank inside a tie run holds the same
      value, so picked order statistics are unchanged). This is the
      degenerate regime that previously paid the full frame through the
      range exchange AND the checkpoint (part_brand_margin_quartiles,
      222.7 s at sf100).

    Per-task window state stays bounded by the SPAN size (~rows/buckets),
    never the group size — a giant group spans many cut buckets."""
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    d = df.select(*group_cols, v.alias("_v")).where(F.col("_v").isNotNull())
    n_buckets = (
        max(64, min(512, 4 * num_partitions))
        if num_partitions
        else _default_buckets(df.sparkSession)
    )
    cuts, n_rows, n_distinct = _span_probe(d, n_buckets)
    span = _bucket_expr(F.col("_v"), cuts).alias("_pid")
    if n_rows == 0 or n_distinct / n_rows >= 0.5:
        # raw layout: one exchange, rank = row_number (weight 1)
        base = d.select(*group_cols, "_v", span, F.lit(1).alias("_w"))
        local_w = W.partitionBy("_pid", *group_cols).orderBy("_v")
        local = base.withColumn(
            "_lcw", F.row_number().over(local_w).cast("long")
        )
    else:
        # weighted layout: map-side collapse, then the span exchange
        base = (
            d.groupBy(*group_cols, "_v")
            .agg(F.count("*").alias("_w"))
            .select(*group_cols, "_v", span, "_w")
        )
        local_w = W.partitionBy("_pid", *group_cols).orderBy("_v")
        local = base.withColumn("_lcw", F.sum("_w").over(local_w))
    # counts: per-(span, group) RAW row counts (Σ_w). Derived from the
    # SAME window frame the ranked side uses so that every branch of the
    # final plan sits above ONE canonical exchange — ReuseExchange then
    # computes the upstream subtree once and reads the shuffle three
    # times (counts→offsets, totals→targets, ranked→picked). Unlike the
    # r14 localCheckpoint pin this sharing is a pure performance
    # courtesy, not a correctness requirement: if a branch ever
    # recomputed instead, the span of a row is a deterministic literal
    # expression and the per-(span, group) sums are exact aggregates, so
    # all branches agree by construction.
    counts = local.groupBy("_pid", *group_cols).agg(
        F.sum("_w").alias("_c")
    )
    span_w = (
        W.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = counts.select(
        "_pid",
        *group_cols,
        (F.sum("_c").over(span_w) - F.col("_c")).alias("_off"),
    )
    ranked = local.join(F.broadcast(offsets), ["_pid", *group_cols]).select(
        *group_cols,
        "_v",
        "_w",
        (F.col("_lcw") + F.col("_off")).alias("_cumw"),
    )
    return ranked, counts


def _default_buckets(spark) -> int:
    """Span-bucket count. More buckets = finer balance of the span
    exchange and a smaller worst single-task sort (~rows/buckets), but
    the comparison tree is INLINED into whole-stage-codegen consume
    methods: at 1023 nodes janino dies with "Code grows beyond 64 KB"
    and the whole stage (joins included) silently falls back to
    interpreted evaluation — measured 2× per-row cost. 255 nodes
    (depth 8) compiles inside every caller stage shape tested; 256
    spans keeps the worst span of a 600M-row degenerate frame at ~2.3M
    rows — a few seconds of one-task sort — which is the accepted tail
    at that scale. Callers needing more spread pass num_partitions
    (clamped ×4 to ≤512)."""
    return 256


def _span_probe(
    d: DataFrame, n_buckets: int
) -> tuple[list[float], int, int]:
    """ONE bounded aggregation pass over ``(group, _v)``: n_buckets−1
    approximate quantile cut points (GK sketches — bounded state), the
    exact row count, and the approximate distinct-value count. The
    driver receives ≤ n_buckets+1 scalars (the bounded-cut-table
    discipline); once collected they are LITERALS, so the bucket
    assignment built from them is deterministic across recomputations —
    no matter how approximate or unstable the sketch itself is, it can
    only affect load balance.

    The GK sketch only sees the ~2% of rows whose value hash lands in
    one of 50 residue classes: a per-row GK insert over the full frame
    costs more than the scan itself and tripled the duplicate-heavy
    callers at sf10 (measured 2.1 s → 6.3 s on
    lineitem_quantity_trimean), while cuts from a 2% sample balance the
    spans just as well — cuts steer placement, never results. The
    subset is picked by hashing the VALUE (``rand()`` is rejected inside
    aggregate arguments as nondeterministic), which also keeps the probe
    deterministic. The COUNT and the HLL distinct count stay
    exact-over-all-rows (both are cheap per row): the dispatch ratio
    must not inherit the sample's duplicate-factor bias, which would
    steer mid-duplication frames onto the raw path and ship their
    duplicates through the exchange."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    sampled = F.when(
        F.pmod(F.xxhash64(F.col("_v")), F.lit(50)) == 0, F.col("_v")
    )
    row = d.agg(
        F.percentile_approx(sampled, qs).alias("_cuts"),
        F.count("*").alias("_n"),
        F.approx_count_distinct("_v").alias("_nd"),
    ).first()
    raw = row["_cuts"] or []
    cuts = sorted(
        {float(c) for c in raw if c is not None and not math.isnan(c)}
    )
    return cuts, int(row["_n"]), int(row["_nd"])


def _bucket_expr(v: Column, cuts: list[float]) -> Column:
    """Balanced binary-search comparison tree assigning value ``v`` its
    span id = #{cut < v} (right-closed buckets: ties on a cut share a
    bucket; NaN fails every ``<=`` and lands in the last bucket, matching
    its sort-last window order). O(log n_buckets) comparisons per row,
    pure codegen-able expressions, no Python boundary."""
    def tree(lo: int, hi: int) -> Column:
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(v <= F.lit(cuts[mid]), tree(lo, mid)).otherwise(
            tree(mid + 1, hi)
        )

    return tree(0, len(cuts)).cast("int")


def _qcolname(q: float) -> str:
    """Deterministic, backtick-free column name for quantile ``q``:
    fixed 6-decimal formatting (never scientific notation, never a
    hyphen), trailing zeros stripped — 0.25 → ``q_0_25``, 1.0 → ``q_1``.
    Quantiles that collide at 6 decimals are rejected up front."""
    s = format(q, ".6f").rstrip("0").rstrip(".")
    return "q_" + s.replace(".", "_")
