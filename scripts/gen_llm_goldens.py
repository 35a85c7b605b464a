#!/usr/bin/env python
"""Regenerate queries/llm_goldens.py: VALUES-literal oracle SQL for the
deterministic-but-not-SQL-expressible LLM operators, pinned to sf0.01 (the
SF the driver's CORRECTNESS check runs at — QuerySpec.oracle_sf).

The pinned queries are pure functions of (fixture data, fixed seeds):
hash-based MinHash/SimHash banding and SRP probing are per-row expressions;
IVF pins KMeans input order (repartition + sortWithinPartitions on the id);
HLL registers are xxhash-derived and merge by register-max.
Partition-invariance is asserted by
tests/test_llm.py::test_pinned_operators_partition_invariant, and golden
staleness by test_pinned_golden_queries_match_at_sf001; run this script
only when the operator parameters or fixtures intentionally change.

Usage: python scripts/gen_llm_goldens.py   (writes the module in place)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "distributed_graph_database_system_spark",
    "queries",
    "llm_goldens.py",
)

# name -> (column spec as [(colname, duckdb_type)], short provenance note)
SPECS = {
    "dedup_minhash_lsh": (
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("jaccard", "DOUBLE")],
        "banded MinHash-LSH pairs, k=32 b=8 seed=42, threshold 0.7",
    ),
    "dedup_simhash": (
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("hamming", "INTEGER")],
        "SimHash chunk-banded pairs, max_hamming=3",
    ),
    "sim_topk_ann_lsh": (
        [("rank", "BIGINT"), ("vec_id", "BIGINT")],
        "SRP-LSH ANN top-10 for vec_id=0, nbits=5 probes=1 seed=42",
    ),
    "sim_topk_ann_ivf": (
        [("rank", "BIGINT"), ("vec_id", "BIGINT")],
        "IVF-Flat ANN top-10 for vec_id=0, n_lists=8 nprobe=3 seed=42",
    ),
    "agg_hll_rollup": (
        [("event_type", "VARCHAR"), ("n_days", "BIGINT"), ("est_users", "BIGINT")],
        "HLL sketch rollup: per-day user sketches union-merged per event_type "
        "(lgConfigK=12; deterministic xxhash registers, merge is register-max)",
    ),
    "embed_pca_project": (
        [("vec_id", "BIGINT"), ("pc1", "DOUBLE"), ("pc2", "DOUBLE")],
        "top-2 PCA projection: micro-quantized exact-int covariance, driver "
        "eigh, sign-pinned components, vec_id % 10 = 0 sample",
    ),
    "bpe_train_merges": (
        [("rank", "BIGINT"), ("left", "VARCHAR"), ("right", "VARCHAR"), ("pair_count", "BIGINT")],
        "first 8 BPE merges over the document corpus: exact integer pair "
        "counts, lexicographic tie-break",
    ),
    "text_compression_ratio": (
        [("doc_id", "BIGINT"), ("raw_bytes", "BIGINT"), ("comp_bytes", "BIGINT"), ("ratio", "DOUBLE")],
        "DEFLATE(6)-vs-UTF-8 compression-ratio quality signal, doc_id % 10 = 0 sample",
    ),
    "coreset_kcenter": (
        [("rank", "BIGINT"), ("vec_id", "BIGINT"), ("dist", "DOUBLE")],
        "greedy k-center coreset, 8 farthest-point picks from min vec_id, "
        "quantized fixed-order distances",
    ),
    "bpe_encode_tokens": (
        [("doc_id", "BIGINT"), ("n_tokens", "BIGINT"), ("n_symbols", "BIGINT"), ("symbols_per_token", "DOUBLE")],
        "corpus-trained 8-merge BPE encode of every 25th doc: token count, "
        "post-merge symbol count, symbols/token",
    ),
    "multimodal_image_phash": (
        [("dhash", "BIGINT"), ("n_images", "BIGINT"), ("keep_id", "BIGINT")],
        "dHash perceptual dedup of patterned grayscale PNGs (real scanline "
        "decode, pattern key = doc_id mod 30)",
    ),
    "events_markov_stationary": (
        [("event_type", "VARCHAR"), ("stationary_prob", "DOUBLE")],
        "stationary distribution of the event-type Markov chain: exact "
        "transition counts, driver-side linear solve",
    ),
    "sim_mmr_rerank": (
        [("rank", "BIGINT"), ("vec_id", "BIGINT"), ("mmr_score", "DOUBLE")],
        "MMR diversity re-ranking vs vec_id 0, lambda=0.7 k=10, quantized "
        "fixed-order cosines",
    ),
    "embed_geometric_median": (
        [("coord", "INTEGER"), ("value", "DOUBLE")],
        "Weiszfeld geometric median (3 iters, quantized-decimal sums): "
        "first 8 coords + distance-to-mean gap at coord -1",
    ),
    "embed_outlier_robust": (
        [("vec_id", "BIGINT"), ("value", "DOUBLE")],
        "median+3*1.4826*MAD outlier screen on distances to the geometric "
        "median; vec_id -1 row carries the threshold",
    ),
    "agg_hll_sliding7": (
        [("day", "VARCHAR"), ("n_days", "BIGINT"), ("est_users_7d", "BIGINT")],
        "7-day sliding distinct users: register-max union of each day's and "
        "the six prior days' HLL sketches (lgConfigK=12)",
    ),
    "text_keywords_textrank": (
        [("tok", "VARCHAR"), ("textrank", "DOUBLE")],
        "weighted TextRank top-15 keywords: 12 damped rounds over the "
        "co-occurrence graph in order-free fixed-point decimal",
    ),
}


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def main() -> int:
    from distributed_graph_database_system_spark.queries.registry import all_queries
    from distributed_graph_database_system_spark.session import get_spark

    spark = get_spark(app_name="gen_llm_goldens", cpus=8)
    qs = all_queries()
    blocks = []
    for name, (cols, note) in SPECS.items():
        rows = qs[name].fn(spark, SF_DIR).collect()
        key = [c for c, _ in cols]
        rows = sorted(rows, key=lambda r: tuple(r[c] for c in key))
        values = ", ".join(
            "(" + ", ".join(_sql_lit(r[c]) for c, _ in cols) + ")" for r in rows
        )
        select = ", ".join(f"CAST(c{i} AS {t}) AS {c}" for i, (c, t) in enumerate(cols))
        tcols = ", ".join(f"c{i}" for i in range(len(cols)))
        sql = f"SELECT {select} FROM (VALUES {values}) AS t({tcols})"
        blocks.append(
            f"# {note}; {len(rows)} rows at sf0.01\n{name.upper()}_GOLDEN = (\n"
            + "".join(
                f"    {chunk!r}\n" for chunk in _wrap(sql)
            )
            + ")\n"
        )
    header = (
        '"""GENERATED by scripts/gen_llm_goldens.py — VALUES-literal oracles for\n'
        "the deterministic probabilistic LLM operators, computed ONCE from the\n"
        "sf0.01 fixture (the driver's correctness SF; QuerySpec.oracle_sf pins\n"
        "them there). Do not edit by hand; rerun the generator after intentional\n"
        'parameter/fixture changes."""\n\n'
    )
    with open(OUT, "w") as fh:
        fh.write(header + "\n".join(blocks))
    print(f"wrote {OUT}")
    return 0


def _wrap(s: str, width: int = 88) -> list[str]:
    return [s[i : i + width] for i in range(0, len(s), width)]


if __name__ == "__main__":
    raise SystemExit(main())
