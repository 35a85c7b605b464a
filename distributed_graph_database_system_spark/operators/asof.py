"""Distributed as-of join with pandas ``merge_asof`` semantics.

The relational surface's ``join_asof`` query hard-codes one shape (strict
backward lookup via the union + last(ignorenulls) window). This operator
generalizes it to the full merge_asof parameter space — ``direction``
backward / forward / nearest, ``allow_exact_matches``, ``tolerance`` —
while keeping the same scale story: NO per-row range lookup, no
broadcast-and-scan; both inputs union into one frame, ONE shuffle on the
``by`` keys, and the match is a window aggregation (pandas parity is
asserted against ``pandas.merge_asof`` itself in tests/test_asof.py).

Mechanics: right rows carry their payload in a ``_rv`` struct whose
first field is the right timestamp; left rows carry NULL. A per-side
tie-order column decides whether a right row at the SAME timestamp is
visible to a left row (allow_exact) or not (strict), so the frame bounds
never special-case equality:

- backward: sort (t, ord, rv) with right BEFORE left iff exact matches
  allowed; match = last(_rv ignorenulls) over (unbounded, current);
- forward: right AFTER left iff exact allowed; match = first(_rv
  ignorenulls) over (current, unbounded);
- nearest: both windows in one pass (one Exchange, two Sort+Window
  nodes), pick the smaller absolute gap, ties to backward — pandas'
  rule.

Deltas compare as exact integers (``unix_micros``) for timestamp keys,
so the nearest tie-break is engine-exact, never a float race.

An empty ``by`` is allowed but degenerates to a single global window
partition — correct, but the same scale hazard the repo removes
everywhere else; pass keys at cluster scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    right_cols: Sequence[str] = (),
    direction: str = "backward",
    tolerance: float | None = None,
    allow_exact_matches: bool = True,
    suffix: str = "_r",
) -> DataFrame:
    """All rows of ``left`` plus, per row, the matching ``right`` row's
    ``on`` value (as ``{on}{suffix}``) and each of ``right_cols`` (as
    ``{col}{suffix}``), NULL where no match exists within ``direction`` /
    ``tolerance``. ``tolerance`` is in SECONDS for timestamp keys, same
    units as the column for numeric keys.

    Duplicate right keys: when ``right`` holds SEVERAL rows with the same
    ``(by, on)`` pair, pandas ``merge_asof`` picks the positionally last
    of them (input file order) — an order a shuffled DataFrame does not
    have. This operator instead breaks such ties DETERMINISTICALLY by the
    right payload struct's value order (max under backward, min under
    forward), so results are stable across partitionings but may differ
    from pandas row-for-row on duplicate-key inputs. Pre-aggregate the
    right side to one row per ``(by, on)`` if the pandas row is required;
    the merge_asof parity suite (tests/test_asof.py) generates unique
    pairs for exactly this reason."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    by = list(by)
    rcols = [c for c in right_cols if c != on]
    overlap = set(left.columns) & {f"{c}{suffix}" for c in rcols + [on]}
    if overlap:
        raise ValueError(f"asof_join: output columns {overlap} collide; change suffix")
    internal = {"_t", "_is_left", "_rv", "_back", "_fwd", "_m"}
    clash = (set(left.columns) | set(right.columns)) & internal
    if clash:
        # a left column named _back would be silently REPLACED by the
        # internal match struct (withColumn overwrites); _t/_is_left would
        # duplicate and fail ambiguously later — refuse up front
        raise ValueError(
            f"asof_join: column(s) {sorted(clash)} collide with internal "
            "working names — rename them before the join"
        )

    is_ts = isinstance(
        left.schema[on].dataType, (TimestampType, TimestampNTZType)
    )

    def tnum(c: Column) -> Column:
        return F.unix_micros(c) if is_ts else c.cast("double")

    rv = F.struct(F.col(on).alias("_rt"), *[F.col(c) for c in rcols])
    l2 = left.select(
        *left.columns, F.col(on).alias("_t"), F.lit(True).alias("_is_left")
    )
    r2 = right.select(
        *by, F.col(on).alias("_t"), rv.alias("_rv"), F.lit(False).alias("_is_left")
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    # tie order at equal _t: 1 = left; right sorts at 0 (visible) or 2
    # (hidden) relative to the direction's frame — see module docstring
    def ord_col(right_first: bool) -> Column:
        right_rank = 0 if right_first else 2
        return F.when(F.col("_is_left"), F.lit(1)).otherwise(F.lit(right_rank))

    back_w = (
        W.partitionBy(*by)
        .orderBy("_t", ord_col(allow_exact_matches), "_rv")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd_w = (
        W.partitionBy(*by)
        .orderBy("_t", ord_col(not allow_exact_matches), "_rv")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    if direction in ("backward", "nearest"):
        u = u.withColumn("_back", F.last("_rv", ignorenulls=True).over(back_w))
    if direction in ("forward", "nearest"):
        u = u.withColumn("_fwd", F.first("_rv", ignorenulls=True).over(fwd_w))

    out = u.where("_is_left")
    tol = None
    if tolerance is not None:
        tol = F.lit(tolerance * 1_000_000 if is_ts else float(tolerance))

    def within(delta: Column, side: Column) -> Column:
        return side if tol is None else F.when(delta <= tol, side)

    if direction == "backward":
        chosen = within(tnum(F.col("_t")) - tnum(F.col("_back._rt")), F.col("_back"))
    elif direction == "forward":
        chosen = within(tnum(F.col("_fwd._rt")) - tnum(F.col("_t")), F.col("_fwd"))
    else:
        db = tnum(F.col("_t")) - tnum(F.col("_back._rt"))
        df_ = tnum(F.col("_fwd._rt")) - tnum(F.col("_t"))
        back_ok = within(db, F.col("_back"))
        fwd_ok = within(df_, F.col("_fwd"))
        # smaller gap wins; ties (and equal-gap exact matches) to backward
        chosen = (
            F.when(back_ok.isNull(), fwd_ok)
            .when(fwd_ok.isNull(), back_ok)
            .when(db <= df_, back_ok)
            .otherwise(fwd_ok)
        )
    out = out.withColumn("_m", chosen)
    return out.select(
        *left.columns,
        F.col("_m._rt").alias(f"{on}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in rcols],
    )
