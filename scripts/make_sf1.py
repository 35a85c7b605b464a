#!/usr/bin/env python
"""Materialize a 10x scale point ("sf1") from the sf0.1 fixture.

The driver-generated testdata stops at sf0.1; the 100-TB design claims in
PLANS.md/BASELINE.md deserve at least one harder measured point. This
script clones sf0.1 ten times with DISJOINT key ranges (one shared stride
for every key domain, so all FK relationships hold within each copy and
never across copies — join selectivities and group cardinalities scale
linearly, the same way TPC-H itself scales). Non-key columns pass through
untouched except documents.text, which gets a per-copy suffix so the 10x
corpus is a NEAR-duplicate family (minhash still clusters it) instead of
10x byte-identical rows that exact dedup would trivialize.

Usage: python scripts/make_sf1.py [out_dir] [copies] [doc_mode]
  out_dir  default: /root/repo/.bench_sf1/sf1  (gitignored)
  copies   default: 10
  doc_mode default: neardup — per-copy " v{i}" suffix, so every document
           gains copies-1 cross-copy near-duplicates (the duplicate RATE
           grows with the clone count; minhash candidates grow ~copies×).
           "disjoint": EVERY whitespace token of copy i (including copy
           0) gains the fixed-width tag "q{i:03d}". Appending one
           constant suffix is an INJECTIVE map on the token vocabulary,
           so every within-copy word-shingle set maps bijectively
           (within-copy Jaccard EXACTLY preserved — the dedup shingles
           are word 3-grams, operators/dedup.py — so near-dup families
           stay intact) while cross-copy token sets are structurally
           DISJOINT (equal-length distinct suffixes cannot alias, and
           tagging copy 0 too removes even the original-corpus-collision
           edge). The duplicate rate is then CONSTANT as the corpus
           grows — the honest scale curve for the banding cost itself
           (BASELINE.md round-9/round-10 minhash scale tables) — and,
           unlike the round-9 rotation cipher this replaces, there is no
           26-class cap, so the clone extends to 100 copies (sf10); the
           cipher also silently aliased non-letter tokens across copies,
           which the suffix does not. (A separator-token variant was
           tried first and rejected: injecting the same token between
           every word makes all docs of a copy share high-frequency
           shingles, inflating candidates ~3.5x with no real pairs
           behind them.)

Then: SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from distributed_graph_database_system_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
# One stride for every key domain: far above any sf0.1 key, so copy i's
# keys live in [i*STRIDE, i*STRIDE + max_key] and relationships stay
# internally consistent per copy.
STRIDE = 1_000_000_000

# table -> bigint key columns shifted per copy
KEYS = {
    "region": (),
    "nation": (),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_sf1/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    doc_mode = sys.argv[3] if len(sys.argv) > 3 else "neardup"
    if doc_mode not in ("neardup", "disjoint"):
        raise SystemExit(f"doc_mode must be neardup|disjoint, got {doc_mode!r}")
    if doc_mode == "disjoint" and copies > 1000:
        # the "q{i:03d}" tag is fixed-width for i < 1000; wider clones
        # need a wider tag or suffixes start aliasing across copies
        raise SystemExit("disjoint mode supports at most 1000 copies")
    spark = get_spark(app_name="make_sf1")
    for table, keys in KEYS.items():
        src = spark.read.parquet(f"{SRC}/{table}.parquet")
        if not keys:  # bounded dims: single copy, same as TPC-H scaling
            out_df = src
        else:
            parts = []
            for i in range(copies):
                df = src
                for k in keys:
                    df = df.withColumn(k, F.col(k) + F.lit(i * STRIDE))
                if table == "documents" and (
                    doc_mode == "disjoint" or i > 0
                ):
                    if doc_mode == "neardup":
                        df = df.withColumn(
                            "text", F.concat(F.col("text"), F.lit(f" v{i}"))
                        )
                    else:  # disjoint: fixed-width per-copy token tag
                        df = df.withColumn(
                            "text",
                            F.regexp_replace(
                                "text", r"(\S+)", f"$1q{i:03d}"
                            ),
                        )
                    df = df.withColumn(
                        "n_chars", F.length("text").cast("bigint")
                    )
                parts.append(df)
            out_df = parts[0]
            for p in parts[1:]:
                out_df = out_df.unionAll(p)
        # one flat parquet per table, mirroring the fixture layout; 32
        # output files so downstream scans parallelize like the original
        out_df.repartition(32 if keys else 1).write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )
        print(f"wrote {table}", flush=True)
    print(f"done -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
