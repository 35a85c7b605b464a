"""Incremental near-dedup over a document stream (streaming/documents.py).

The decision rule ("duplicate iff it matches ANY earlier doc") is
associative, so the binding invariant is: replaying the corpus in N slices
produces BYTE-IDENTICAL decisions to ingesting it as one batch. Plus planted
near-duplicates must be caught with the right attribution, and the store
must grow by survivors only.
"""

from __future__ import annotations

import random

import pytest

from distributed_graph_database_system_spark.streaming.documents import (
    documents_stream,
    read_decisions,
    read_index,
    replay_documents,
    run_incremental_near_dedup,
)

VOCAB = [f"w{i}" for i in range(500)]


def make_corpus(n_base: int, seed: int):
    """Base docs + planted near-dups (2-token perturbation of an earlier
    doc) + one exact dup. doc_ids are arrival order."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_base):
        rows.append((i, " ".join(rng.choices(VOCAB, k=60))))
    planted = {}
    next_id = n_base
    for orig in rng.sample(range(n_base), 5):
        toks = rows[orig][1].split()
        for pos in rng.sample(range(len(toks)), 2):
            toks[pos] = rng.choice(VOCAB)
        rows.append((next_id, " ".join(toks)))
        planted[next_id] = orig
        next_id += 1
    exact_orig = rng.randrange(n_base)
    rows.append((next_id, rows[exact_orig][1]))
    planted[next_id] = exact_orig
    return rows, planted


@pytest.fixture(scope="module")
def corpus(spark):
    rows, planted = make_corpus(40, seed=7)
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    return df, planted


def _run(spark, df, tmp, slices):
    src = replay_documents(spark, df, str(tmp / f"replay{slices}"), slices=slices)
    store = str(tmp / f"store{slices}")
    run_incremental_near_dedup(
        spark, documents_stream(spark, src), store, threshold=0.6
    )
    return store


def decisions_map(spark, store):
    return {
        r["doc_id"]: r["dup_of"]
        for r in read_decisions(spark, store).collect()
    }


def test_planted_dups_attributed_to_originals(spark, corpus, tmp_path):
    df, planted = corpus
    store = _run(spark, df, tmp_path, slices=4)
    got = decisions_map(spark, store)
    assert len(got) == df.count()  # one decision per doc
    for dup_id, orig in planted.items():
        assert got[dup_id] is not None, f"planted dup {dup_id} not flagged"
        # exact attribution: the base docs are mutually non-matching (see
        # test_base_corpus_mostly_survives), so the planted original is the
        # ONLY earlier match
        assert got[dup_id] == orig, (dup_id, got[dup_id], orig)


def test_incremental_equals_one_shot(spark, corpus, tmp_path):
    df, _ = corpus
    sliced = decisions_map(spark, _run(spark, df, tmp_path, slices=5))
    oneshot = decisions_map(spark, _run(spark, df, tmp_path, slices=1))
    assert sliced == oneshot


def test_store_indexes_every_ingested_doc(spark, corpus, tmp_path):
    """The index is the SEEN-set (survivors AND dropped docs): indexing only
    survivors breaks associativity on chains spanning a batch boundary."""
    df, _ = corpus
    store = _run(spark, df, tmp_path, slices=3)
    indexed = {
        r["doc_id"]
        for r in read_index(spark, store).select("doc_id").distinct().collect()
    }
    assert indexed == {r["doc_id"] for r in df.select("doc_id").collect()}


def test_retried_batch_is_idempotent(spark, corpus, tmp_path):
    """foreachBatch is at-least-once: replaying a (batch_df, batch_id) that
    already committed must leave the store byte-identical — the batch_id-
    keyed overwrite, not a blind append. Decisions stay one-per-doc and the
    index must not bloat."""
    from distributed_graph_database_system_spark.streaming.documents import (
        near_dedup_batch_fn,
    )

    df, _ = corpus
    store = str(tmp_path / "retry_store")
    upsert = near_dedup_batch_fn(spark, store, threshold=0.6)
    half = df.count() // 2
    b0 = df.where(df.doc_id < half)
    b1 = df.where(df.doc_id >= half)
    upsert(b0, 0)
    upsert(b1, 1)
    before = sorted(
        tuple(r) for r in read_decisions(spark, store).collect()
    )
    index_before = read_index(spark, store).count()
    upsert(b1, 1)  # the retry
    after = sorted(tuple(r) for r in read_decisions(spark, store).collect())
    assert after == before
    assert read_index(spark, store).count() == index_before


def test_transitive_chain_split_across_batches_matches_one_shot(spark, tmp_path):
    """a~b and b~c but a!~c, with b and c in DIFFERENT batches: one-shot
    drops both b and c (each matches an earlier doc), and the sliced run
    must agree — the regression that survivor-only indexing caused."""
    rng = random.Random(0)
    base = [" ".join(rng.choices(VOCAB, k=60)) for _ in range(10)]
    a = base[0].split()
    # 3 spread token changes keep 3-shingle Jaccard ≈ 0.73 (above the 0.6
    # threshold); 6 cumulative changes drop it to ≈ 0.53 (below) — so a~b
    # and b~c but a!~c. Verified against the actual signature estimator for
    # THIS seed (estimates are deterministic; other seeds can flip the
    # borderline premises, see the b~c miss at seed 3).
    b = list(a)
    for pos in (0, 20, 40):
        b[pos] = rng.choice(VOCAB)
    c = list(b)
    for pos in (10, 30, 50):
        c[pos] = rng.choice(VOCAB)
    rows = [(i, t) for i, t in enumerate(base)]
    rows.append((100, " ".join(b)))
    rows.append((101, " ".join(c)))
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")

    # one doc per slice → b and c are guaranteed to land in different batches
    sliced = decisions_map(spark, _run(spark, df, tmp_path, slices=12))
    oneshot = decisions_map(spark, _run(spark, df, tmp_path, slices=1))
    assert sliced == oneshot
    # chain premises, so the invariant assert above is not vacuous:
    assert oneshot[100] == 0, "b must match a"
    assert oneshot[101] == 100, "c must match b (and only b)"


def test_base_corpus_mostly_survives(spark, corpus, tmp_path):
    """Random 60-token docs over a 500-word vocab are not near-duplicates of
    each other at threshold 0.6 — false-positive sanity."""
    df, planted = corpus
    got = decisions_map(spark, _run(spark, df, tmp_path, slices=2))
    base_ids = set(range(df.count() - len(planted)))
    flagged_base = {d for d in base_ids if got[d] is not None}
    assert not flagged_base
