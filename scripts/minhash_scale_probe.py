#!/usr/bin/env python
"""Minhash-LSH scale probe: separate CANDIDATE growth (a property of the
corpus's duplicate rate) from BANDING cost growth (a property of the
operator) — the round-8 verdict's open question on the 4.7× sf1 ratio.

For a given fixture dir it measures, with the exact dedup_minhash_lsh
parameters (n=3, k=32, bands=8, threshold=0.7):
  - n_docs
  - candidate pairs out of the (band, bucket) self-join, pre-verify
  - verified near-dup pairs and the end-to-end wall time

Run it on sf0.1, on the near-dup 10× clone (make_sf1.py ... neardup) and
on the constant-duplicate-rate 10× clone (make_sf1.py ... disjoint); the
three rows land in BASELINE.md's round-9 table.

Usage: python scripts/minhash_scale_probe.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from distributed_graph_database_system_spark.operators.dedup import (  # noqa: E402
    _band_bucket_structs,
    minhash_lsh_pairs,
    minhash_signature_udf,
    shingle_hash_udf,
)
from distributed_graph_database_system_spark.session import get_spark  # noqa: E402
from distributed_graph_database_system_spark.sources.catalog import load_table  # noqa: E402


def candidate_count(docs, n=3, k=32, bands=8, seed=42) -> int:
    """The pre-verify candidate-pair count of minhash_lsh_pairs' bucket
    self-join (mirrors the operator's cand frame)."""
    r = k // bands
    target = docs.sparkSession.sparkContext.defaultParallelism
    hashed = docs.repartition(target, "doc_id").select(
        F.col("doc_id").alias("_id"),
        shingle_hash_udf(n)(F.col("text")).alias("_h"),
    )
    base = hashed.select(
        "_id", minhash_signature_udf(k=k, seed=seed)(F.col("_h")).alias("_sig")
    )
    buckets = base.select(
        "_id", F.explode(_band_bucket_structs("_sig", bands, r)).alias("bb")
    ).select(
        "_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    left = buckets.select("band", "bucket", F.col("_id").alias("id_a"))
    right = buckets.select("band", "bucket", F.col("_id").alias("id_b"))
    return (
        left.join(right, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark(app_name="minhash_scale_probe")
    for sf_dir in dirs:
        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()
        cands = candidate_count(docs)
        t0 = time.monotonic()
        pairs = minhash_lsh_pairs(docs, threshold=0.7).count()
        wall = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_docs": n_docs,
                    "candidate_pairs": cands,
                    "verified_pairs": pairs,
                    "lsh_wall_s": round(wall, 2),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
