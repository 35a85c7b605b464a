"""Snapshot diff: row-level change detection between two dataset versions.

The corpus-versioning primitive a training-data pipeline runs between
crawls / shard releases: given two snapshots keyed by ``key_cols``, emit one
row per changed key tagged ``added`` / ``removed`` / ``changed`` (values
differ on any of ``compare_cols``). One full-outer join on the key — the
minimal shuffle for the problem; at 100 TB both sides bucket by the key
(sources/layout.py) and the join is co-located.

Reference parity: no analogue — the reference's "modify" is a blind full
overwrite with no change tracking (``primaryServer.c:40``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``(key_cols..., change_type)`` for every key that differs between the
    snapshots. ``compare_cols`` defaults to all shared non-key columns.
    NULL-safe comparison (``<=>``): a value changing to/from NULL counts as
    a change, NULL == NULL does not."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    # presence flags as literal markers: "any value column non-null"
    # misreads legitimately-NULL values.
    o = old.select(
        *[F.col(c).alias(f"_ko_{c}") for c in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    ).withColumn("_in_old", F.lit(True))
    n = new.select(
        *[F.col(c).alias(f"_kn_{c}") for c in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    ).withColumn("_in_new", F.lit(True))
    # NULL-safe key equality too (not just values): a plain name-list equi
    # join never matches NULL keys, which would double-report an unchanged
    # NULL-keyed row as removed+added.
    cond = F.lit(True)
    for c in key_cols:
        cond = cond & F.col(f"_ko_{c}").eqNullSafe(F.col(f"_kn_{c}"))
    joined = o.join(n, cond, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        joined.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_ko_{c}"), F.col(f"_kn_{c}")).alias(c)
                for c in key_cols
            ],
            "change_type",
        )
    )
