#!/usr/bin/env python
"""Rewrite the sf0.1 fixture parquet files with MULTIPLE ROW GROUPS.

Why (r14 VERDICT item 2): every driver fixture table was written as ONE
parquet row group, and row-group assignment to scan splits is atomic —
so every scan stage was a single task regardless of core count, the
driver's 8-core-vs-32-core scaling leg read ~1.0 everywhere, and a
serialization regression could never be detected at fixture scale. The
fix is layout-only: identical rows, identical order, identical schema
(including the ARROW:schema / pandas key-value metadata and the
TIMESTAMP(NANOS) events column), identical snappy compression — just
split into bounded row groups so a scan can be split into real tasks.

Content identity is proven, not assumed: for every table the rewrite
asserts `pyarrow.Table.equals` between source and destination (schema +
all values + row order), and prints per-table row/row-group counts.

Usage: python scripts/rewrite_rowgroups.py SRC_DIR DST_DIR
(SRC_DIR may equal DST_DIR only via an intermediate temp file.)
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

# Target row-group ROW counts per table: sized so the big fact tables get
# ~64 groups (32-core splits pick up ~2 each) and medium tables ~8-32;
# tiny dimension tables stay single-group (splitting 25 rows is noise).
ROWS_PER_GROUP = {
    "lineitem": 9_400,     # 600k rows  -> 64 groups
    "orders": 4_700,       # 150k rows  -> 32 groups
    "events": 3_200,       # 100k rows  -> 32 groups
    "customer": 1_900,     # 15k rows   -> 8 groups
    "part": 2_500,         # 20k rows   -> 8 groups
    "documents": 320,      # 5k rows    -> 16 groups (text CPU-heavy rows)
    "embeddings": 125,     # 2k rows    -> 16 groups (vector CPU-heavy)
    "supplier": 250,       # 1k rows    -> 4 groups
    "nation": 1_000_000,   # 25 rows    -> 1 group
    "region": 1_000_000,   # 5 rows     -> 1 group
}


def rewrite(src_dir: str, dst_dir: str) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    for name, rows in sorted(ROWS_PER_GROUP.items()):
        src = os.path.join(src_dir, f"{name}.parquet")
        dst = os.path.join(dst_dir, f"{name}.parquet")
        if not os.path.exists(src):
            print(f"{name}: MISSING in {src_dir}, skipped")
            continue
        table = pq.read_table(src)
        tmp = dst + ".tmp"
        pq.write_table(
            table,
            tmp,
            row_group_size=rows,
            compression="snappy",
            # Preserve the source files' parquet physical conventions
            # (they were written by pyarrow 16.1 defaults too).
            version="2.6",
        )
        back = pq.read_table(tmp)
        if not back.equals(table):  # schema + values + order
            os.remove(tmp)
            raise SystemExit(f"{name}: REWRITE NOT CONTENT-IDENTICAL, aborted")
        os.replace(tmp, dst)
        meta = pq.ParquetFile(dst).metadata
        print(
            f"{name}: {meta.num_rows} rows, {meta.num_row_groups} row groups, "
            f"{os.path.getsize(dst)} bytes (src {os.path.getsize(src)})"
        )


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    rewrite(sys.argv[1], sys.argv[2])
