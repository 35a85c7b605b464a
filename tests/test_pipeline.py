"""Tests for the round-4 training-data pipeline operators (queries/pipeline.py,
operators/dedup.ngram_jaccard_pairs): exact-recall similarity join vs a
brute-force Python reference, split determinism, packing invariants, and
centroid accuracy."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from pyspark.sql import functions as F

from distributed_graph_database_system_spark.operators.dedup import (
    ngram_jaccard_pairs,
    ws_tokens_py,
)
from distributed_graph_database_system_spark.queries.pipeline import (
    embed_centroids,
    pack_sequences,
    split_train_holdout,
)
from distributed_graph_database_system_spark.sources.catalog import load_table


def _py_shingles(text: str, n: int = 3) -> frozenset[str]:
    toks = ws_tokens_py(text)
    if len(toks) < n:
        return frozenset([" ".join(toks)])
    return frozenset(
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    )


def _py_jaccard(a: frozenset, b: frozenset) -> float:
    u = len(a | b)
    return 1.0 if u == 0 else len(a & b) / u


# Hostile corpus: exact dups, word-dropped/swapped near-dups, disjoint docs,
# short docs (< n tokens), empty text — all shapes the prefix filter must
# handle without losing a pair.
_CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river"),
    (3, "a quick brown fox jumps over the lazy dog near the river bank"),
    (4, "completely different text about distributed query engines and spark"),
    (5, "another unrelated document mentioning parquet shuffles and joins"),
    (6, "short doc"),
    (7, "short doc"),
    (8, ""),
    (9, "the quick brown fox jumps over a lazy dog near a river bank today"),
    (10, "query engines and spark completely different text about distributed"),
]


@pytest.mark.parametrize("n", [2, 3, 5])
def test_shingles_long_agrees_with_array_form(spark, n):
    """The codegen'd long form must produce exactly the distinct shingle
    sets of the interpreted array form on every edge shape (short docs,
    empty text, repeated grams)."""
    from pyspark.sql.functions import col, explode
    from distributed_graph_database_system_spark.operators.dedup import (
        shingles,
        shingles_long,
    )

    docs = spark.createDataFrame(_CORPUS, "doc_id BIGINT, text STRING")
    want = {
        (r["doc_id"], r["shingle"])
        for r in docs.select(
            "doc_id", explode(shingles(col("text"), n)).alias("shingle")
        ).collect()
    }
    got = {
        (r["_id"], r["shingle"])
        for r in shingles_long(docs, n=n).collect()
    }
    assert got == want


@pytest.mark.parametrize("num,den", [(3, 5), (4, 5), (9, 10)])
def test_ngram_jaccard_pairs_exact_recall_and_precision(spark, num, den):
    docs = spark.createDataFrame(_CORPUS, "doc_id BIGINT, text STRING")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, threshold_num=num, threshold_den=den
        ).collect()
    }
    t = num / den
    sh = {i: _py_shingles(txt) for i, txt in _CORPUS}
    want = {
        (a, b): round(_py_jaccard(sh[a], sh[b]), 4)
        for a, b in itertools.combinations(sorted(sh), 2)
        if _py_jaccard(sh[a], sh[b]) >= t
    }
    assert set(got) == set(want), (
        f"prefix filter lost or invented pairs at t={t}: "
        f"missing={set(want) - set(got)} extra={set(got) - set(want)}"
    )
    for pair, j in want.items():
        assert got[pair] == pytest.approx(j, abs=1e-4)


def test_ngram_jaccard_pairs_partition_invariant(spark):
    docs = spark.createDataFrame(_CORPUS, "doc_id BIGINT, text STRING")
    one = sorted(
        map(tuple, ngram_jaccard_pairs(docs.coalesce(1)).collect())
    )
    many = sorted(
        map(tuple, ngram_jaccard_pairs(docs.repartition(7)).collect())
    )
    assert one == many


def test_split_assignment_is_pure_function_of_id(spark, sf_dir):
    base = split_train_holdout(spark, sf_dir).collect()
    again = split_train_holdout(spark, sf_dir).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, again))
    splits = {r["split"]: 0 for r in base}
    for r in base:
        splits[r["split"]] += r["n_docs"]
    total = sum(splits.values())
    # md5 buckets are uniform; with 500 docs the 80/10/10 split should be
    # within a generous tolerance
    assert 0.7 <= splits.get("train", 0) / total <= 0.9
    assert splits.get("val", 0) > 0 and splits.get("test", 0) > 0


def test_pack_sequences_bins_are_contiguous_and_bounded(spark, sf_dir):
    rows = pack_sequences(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    from distributed_graph_database_system_spark.operators.textstats import (
        ws_token_count,
    )

    max_doc = docs.agg(
        F.max(ws_token_count(F.col("text"))).alias("m")
    ).first()["m"]
    per_source: dict[str, list] = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r)
    for source, bins in per_source.items():
        bins.sort(key=lambda r: r["bin"])
        # bins are contiguous from 0
        assert [r["bin"] for r in bins] == list(range(len(bins)))
        # every bin except the last STARTS below the next boundary, so a
        # bin's token mass is < 2048 + max straddling doc
        for r in bins:
            assert r["bin_tokens"] < 2048 + max_doc, (source, r)
        # total token conservation
    total_binned = sum(r["bin_tokens"] for r in rows)
    total_docs = docs.agg(
        F.sum(ws_token_count(F.col("text"))).alias("s")
    ).first()["s"]
    assert total_binned == total_docs


def test_embed_centroids_match_numpy(spark, sf_dir):
    got = {
        (r["label"], r["dim"]): r["centroid"]
        for r in embed_centroids(spark, sf_dir).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings").select("label", "embedding")
    by_label: dict[int, list] = {}
    for r in emb.collect():
        by_label.setdefault(r["label"], []).append(np.array(r["embedding"], dtype=np.float64))
    for label, vecs in by_label.items():
        mean = np.stack(vecs).mean(axis=0)
        for d in range(len(mean)):
            # quantization to 1e-6 before the mean bounds the error by 1e-6
            assert abs(got[(label, d + 1)] - mean[d]) <= 1e-6 + 1e-12, (
                label,
                d,
            )


def test_dedup_clusters_transitive_closure(spark):
    """Near-dup clusters must be the transitive closure of the pair graph:
    A~B and B~C put {A,B,C} in ONE cluster even when J(A,C) < threshold —
    the defining difference between pairwise evidence and canonicalization.
    Corpus built so J(A,B)=9/11, J(B,C)=8/12 (both >= 3/5) but
    J(A,C)=7/13 < 3/5; plus an exact-dup pair and an unrelated singleton."""
    from distributed_graph_database_system_spark.operators.graph import (
        connected_components,
    )

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    docs = spark.createDataFrame(
        [
            (0, base + " w12"),
            (1, base + " x12"),  # ~ doc 0 (last word changed)
            (2, "y1 y2 " + "w3 w4 w5 w6 w7 w8 w9 w10 w11 x12"),  # ~ doc 1 only
            (3, "identical twin document body"),
            (4, "identical twin document body"),
            (5, "nothing in common with anything else here at all"),
        ],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(docs, threshold_num=3, threshold_den=5)
    got_pairs = {
        (r.id_a, r.id_b) for r in pairs.collect()
    }
    assert (0, 1) in got_pairs and (1, 2) in got_pairs
    assert (0, 2) not in got_pairs  # below threshold — closure must bridge it
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comp = connected_components(edges)
    clusters = {
        r.cluster_id: (r.n_docs, r.max_doc_id)
        for r in comp.groupBy(F.col("comp").alias("cluster_id"))
        .agg(F.count("*").alias("n_docs"), F.max("vid").alias("max_doc_id"))
        .collect()
    }
    assert clusters == {0: (3, 2), 3: (2, 4)}


def test_snapshot_diff_tags_each_change_class(spark):
    from distributed_graph_database_system_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "id BIGINT, s STRING, v BIGINT",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "CHANGED", 30), (4, None, 40), (5, "e", 50)],
        "id BIGINT, s STRING, v BIGINT",
    )
    got = {r["id"]: r["change_type"] for r in snapshot_diff(old, new, ["id"]).collect()}
    # 1 removed, 3 changed, 5 added; 2 identical and 4 (NULL == NULL) absent
    assert got == {1: "removed", 3: "changed", 5: "added"}

    # null-safe: a value changing to/from NULL IS a change
    new2 = spark.createDataFrame([(4, "now-set", 40)], "id BIGINT, s STRING, v BIGINT")
    got2 = {
        r["id"]: r["change_type"]
        for r in snapshot_diff(old.where("id = 4"), new2, ["id"]).collect()
    }
    assert got2 == {4: "changed"}

    # compare_cols narrows the comparison
    got3 = {
        r["id"]: r["change_type"]
        for r in snapshot_diff(old, new, ["id"], compare_cols=["v"]).collect()
    }
    assert got3 == {1: "removed", 5: "added"}  # 3's text change invisible on v


def test_snapshot_diff_null_keys_match_null_safe(spark):
    from distributed_graph_database_system_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame([(None, "same"), (1, "x")], "id BIGINT, s STRING")
    new = spark.createDataFrame([(None, "same"), (1, "y")], "id BIGINT, s STRING")
    got = {r["id"]: r["change_type"] for r in snapshot_diff(old, new, ["id"]).collect()}
    # the NULL-keyed row is unchanged and must NOT appear as removed+added
    assert got == {1: "changed"}
