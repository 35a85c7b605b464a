"""Order-independent table fingerprints for replica consistency checks.

The reference system keeps a primary and a secondary replica of every graph
and answers reads from either (reference: primaryServer.c / secondaryServer.c
fork-per-request over shared files); the distributed analogue of "are the
replicas the same?" is an anti-entropy checksum: a content fingerprint that
is invariant to row order and partitioning, cheap enough to run over 100 TB
(one scan + one scalar), and comparable across engines and storage copies.

Construction: each row renders to a canonical '|'-joined string, hashes to a
60-bit integer (15 hex digits of md5 — engine-portable, unlike xxhash64),
and the table fingerprint is the exact SUM of row hashes as DECIMAL(38,0) —
addition is commutative, so ANY partitioning/order yields the same value —
reduced mod 2^61-1 to a bigint at the end. Collision odds for "replicas
differ but fingerprints agree" are ~2^-61 per compared pair; a paranoid
deployment runs it twice with a different column salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MOD = (1 << 61) - 1


def row_hash60(cols: list[str]) -> Column:
    """60-bit md5-derived hash of the canonical rendering of ``cols``
    (NULL renders as the empty string — '|' placement still disambiguates
    positions). Identical in DuckDB as
    CAST(('0x' || substr(md5(concat_ws('|', ...)), 1, 15)) AS BIGINT)."""
    # Explicit coalesce to '' on every component: concat_ws SKIPS null
    # arguments (in both engines), which would make ('a', NULL, 'b') and
    # ('a', 'b', NULL) collide — the empty-string render keeps one '|' per
    # position.
    canon = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    )
    return F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("bigint")


def table_fingerprint(df: DataFrame, cols: list[str], label: str) -> DataFrame:
    """One row: (table, n_rows, fingerprint). The sum is exact decimal —
    no int64 overflow at any row count that fits DECIMAL(38,0) (~10^20
    rows) — and the mod folds it to a comparable bigint."""
    return df.select(row_hash60(cols).alias("h")).agg(
        F.lit(label).alias("table"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(F.col("h").cast("decimal(38,0)")) % F.lit(_MOD))
        .cast("bigint")
        .alias("fingerprint"),
    )


def fingerprint_sql(table: str, cols: list[str], label: str | None = None) -> str:
    """The DuckDB rendering of the same fingerprint — used by oracles and
    by cross-engine consistency audits."""
    canon = "concat_ws('|', " + ", ".join(
        f"coalesce(CAST({c} AS VARCHAR), '')" for c in cols
    ) + ")"
    h = f"CAST(('0x' || substr(md5({canon}), 1, 15)) AS BIGINT)"
    return (
        f"SELECT '{label or table}' AS \"table\", "
        f"CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"CAST(SUM(CAST({h} AS DECIMAL(38,0))) % {_MOD} AS BIGINT) AS fingerprint "
        f"FROM {table}"
    )
