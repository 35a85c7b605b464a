"""BPE vocabulary training (operators/bpe.py): distributed merge sequence
vs the single-process reference, tie-break totality, edge cases, and
partition invariance."""

from __future__ import annotations

from distributed_graph_database_system_spark.operators.bpe import (
    bpe_train,
    bpe_train_py,
)
from distributed_graph_database_system_spark.sources.catalog import load_table


def test_matches_reference_on_fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    assert bpe_train(docs, n_merges=6) == bpe_train_py(texts, n_merges=6)


def test_partition_invariant(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    a = bpe_train(docs.repartition(3, "doc_id"), n_merges=4)
    b = bpe_train(docs.repartition(17, F.rand(seed=7)), n_merges=4)
    assert a == b


def test_overlap_counting_and_merge_semantics(spark):
    # 'aaaa' x3: pair (a,a) counts 3 overlapping occurrences per word = 9.
    # After merging (a,a) -> 'aa' left-to-right non-overlapping, each word
    # is ['aa','aa'], so merge 2 is ('aa','aa') with count 3.
    docs = spark.createDataFrame([(i, "aaaa") for i in range(3)], "doc_id: long, text: string")
    merges = bpe_train(docs, n_merges=2)
    assert merges == [(1, "a", "a", 9), (2, "aa", "aa", 3)]
    assert bpe_train_py(["aaaa"] * 3, n_merges=2) == merges


def test_exhausts_gracefully(spark):
    # Single one-char word: no pairs at all -> zero merges.
    docs = spark.createDataFrame([(0, "x x x")], "doc_id: long, text: string")
    assert bpe_train(docs, n_merges=3) == []


def test_tiebreak_lexicographic(spark):
    # 'ab' and 'ba' both appear twice; (a,b) < (b,a) lexicographically.
    docs = spark.createDataFrame(
        [(0, "ab ba"), (1, "ab ba")], "doc_id: long, text: string"
    )
    merges = bpe_train(docs, n_merges=1)
    assert merges == [(1, "a", "b", 2)]


def test_encode_applies_merges_in_rank_order(spark):
    # train on 'abab' docs: merge1 = (a,b)->'ab' (count 2/doc), then
    # (ab,ab). Encoding 'abab' with both merges yields ONE symbol.
    docs = spark.createDataFrame(
        [(i, "abab") for i in range(2)], "doc_id: long, text: string"
    )
    from distributed_graph_database_system_spark.operators.bpe import bpe_encode

    merges = bpe_train(docs, n_merges=2)
    assert [(l, r) for _, l, r, _ in merges] == [("a", "b"), ("ab", "ab")]
    enc = {r["doc_id"]: r["n_symbols"] for r in bpe_encode(docs, merges).collect()}
    assert enc == {0: 1, 1: 1}
    # with only the first merge, 'abab' -> ['ab','ab'] = 2 symbols
    enc1 = {r["doc_id"]: r["n_symbols"] for r in bpe_encode(docs, merges[:1]).collect()}
    assert enc1 == {0: 2, 1: 2}
