"""Incremental near-duplicate detection over a document stream.

The training-data-pipeline shape: crawl shards arrive continuously, and each
new document must be checked against EVERYTHING ingested so far — without
re-running dedup over the whole corpus per shard. The state is a persistent
NORMALIZED MinHash-LSH index (two parquet tables: ``sigs`` with one
``(doc_id, sig)`` row per doc, ``bands`` with ``(doc_id, band, bucket)``
rows of 3 longs — the signature is stored once, not once per band, and the
candidate bucket join shuffles ids only). Per micro-batch:

1. index the batch's docs (signatures + banded buckets);
2. candidate pairs = bucket equi-join of batch band rows against the stored
   band table (new-vs-corpus) plus the batch's self-join (new-vs-new) —
   id-only; signatures are attached afterwards for candidate ids only
   (semi-join prefilter on the sig store);
3. verify candidates by signature agreement (``signature_similarity``,
   stderr ≈ 1/√k — the estimator the S-curve is built on; exact-Jaccard
   re-verification would need the corpus TEXT retained, which the index
   deliberately does not store);
4. decision rule: a doc is a duplicate iff it matches ANY earlier doc —
   any previously ingested doc (survivor or not) or a smaller-id doc of the
   same batch. "Any earlier" (rather than "earlier survivor") keeps the
   rule associative, so slicing the stream differently — or running the
   whole corpus as one batch — yields byte-identical decisions (asserted in
   tests, including a transitive chain split across batches); the cost is
   that a chain a~b~c drops both b and c even though b was itself dropped.
5. ALL batch index rows are appended to the store (the seen-set — indexing
   only survivors would break associativity exactly on chains that span a
   batch boundary); decisions ``(doc_id, dup_of, est_jaccard)`` are
   appended to ``<store>/decisions``. Consumers take the clean corpus as
   ``decisions WHERE dup_of IS NULL``.

Scale: the per-batch work is bucket-join-sized (candidates only, never
all-pairs against the corpus); the store grows linearly with the stream —
k longs per DOC in ``sigs`` plus 3 longs per (doc, band) in ``bands``
(the old single-table form repeated the k-long signature on every band
row: ~bands× more signature bytes at rest and in every bucket-join
shuffle). Both are plain parquet tables — compactable with
``sources.layout.compact``; ``bands`` is bucketable by ``(band, bucket)``
to make the candidate join co-located.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.operators.dedup import (
    lsh_band_rows,
    lsh_signatures,
    signature_similarity,
)

_INDEX = "index"
_SIGS = "index/sigs"
_BANDS = "index/bands"
_DECISIONS = "decisions"


def near_dedup_batch_fn(
    spark: SparkSession,
    store_path: str,
    threshold: float = 0.7,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    seed: int = 42,
):
    """The per-micro-batch upsert as a standalone ``(batch_df, batch_id)``
    callable — used by :func:`run_incremental_near_dedup` under foreachBatch
    and directly by the scale probe (which feeds shards without a streaming
    query to time each one)."""
    from pyspark.sql.utils import AnalysisException

    sigs_path = os.path.join(store_path, _SIGS)
    bands_path = os.path.join(store_path, _BANDS)
    decisions_path = os.path.join(store_path, _DECISIONS)

    def _read_or_empty(path: str, schema: str) -> DataFrame:
        try:
            return spark.read.parquet(path)
        except AnalysisException:
            return spark.createDataFrame([], schema)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # signatures materialized ONCE; band rows derive from the
        # checkpointed frame (UDFs don't rerun per consumer)
        sigs = lsh_signatures(batch_df, n=n, k=k, seed=seed).localCheckpoint()
        entries = lsh_band_rows(sigs, k=k, bands=bands).localCheckpoint()
        stored_bands = _read_or_empty(
            bands_path, "doc_id BIGINT, band INT, bucket BIGINT"
        )
        # candidate discovery is ID-ONLY: the bucket joins shuffle
        # (band, bucket, id) triples — never signatures
        new_ids = entries.select(
            "band", "bucket", F.col("doc_id").alias("id_new")
        )
        new_vs_corpus = new_ids.join(
            stored_bands.select("band", "bucket", F.col("doc_id").alias("id_old")),
            ["band", "bucket"],
        ).where(
            # same "earlier" guard as the in-batch join. On a RETRIED batch
            # (foreachBatch is at-least-once) this also stops re-ingested
            # docs from self-pairing at est_jaccard 1.0; the retry's WRITES
            # are made idempotent separately — both appends land in a
            # batch_id-keyed subdirectory that a retry overwrites in place.
            F.col("id_old") < F.col("id_new")
        )
        new_vs_new = new_ids.join(
            entries.select("band", "bucket", F.col("doc_id").alias("id_old")),
            ["band", "bucket"],
        ).where(F.col("id_old") < F.col("id_new"))
        cand = (
            new_vs_corpus.unionByName(new_vs_new)
            .select("id_new", "id_old")
            .dropDuplicates(["id_new", "id_old"])
            .localCheckpoint()  # consumed by two sig-attach joins
        )
        # verify-side signature attach, candidate ids only. The old side may
        # be a stored doc OR a same-batch doc (or both on a retry, when the
        # store already holds this batch) — union + dropDuplicates gives one
        # sig per id either way.
        old_ids = cand.select(F.col("id_old").alias("doc_id")).distinct()
        old_sigs = (
            _read_or_empty(sigs_path, "doc_id BIGINT, sig ARRAY<BIGINT>")
            .select("doc_id", "sig")
            .join(old_ids, "doc_id", "left_semi")
            .unionByName(sigs.join(old_ids, "doc_id", "left_semi"))
            .dropDuplicates(["doc_id"])
        )
        matches = (
            cand.join(
                sigs.select(F.col("doc_id").alias("id_new"), F.col("sig").alias("sig_new")),
                "id_new",
            )
            .join(
                old_sigs.select(
                    F.col("doc_id").alias("id_old"), F.col("sig").alias("sig_old")
                ),
                "id_old",
            )
            .withColumn(
                "est_jaccard", signature_similarity(F.col("sig_new"), F.col("sig_old"))
            )
            .where(F.col("est_jaccard") >= threshold)
        )
        # one decision per dup: the smallest matching earlier doc, WITH that
        # doc's own similarity (a min(id)/max(jaccard) pair could describe
        # two different matches and mis-credit the attribution)
        best = F.min(F.struct("id_old", "est_jaccard")).alias("m")
        dups = (
            matches.groupBy("id_new")
            .agg(best)
            .select(
                "id_new",
                F.col("m.id_old").alias("dup_of"),
                F.round(F.col("m.est_jaccard"), 4).alias("est_jaccard"),
            )
            .localCheckpoint()  # consumed by the decisions left-join
        )
        batch_ids = batch_df.select(F.col("doc_id")).distinct()
        decisions = (
            batch_ids.join(dups, batch_ids["doc_id"] == dups["id_new"], "left")
            .select(
                "doc_id",
                "dup_of",
                "est_jaccard",
                F.lit(batch_id).alias("batch_id"),
            )
        )
        # IDEMPOTENT append: each batch owns a hive-keyed subdirectory and
        # OVERWRITES it. foreachBatch replays a batch with the same batch_id
        # after a crash-before-checkpoint-commit, so a blind append would
        # double-write this batch's decision rows and bloat the index store;
        # overwrite-own-subdir makes the retry converge to the same store
        # state (exactly-once effect on top of at-least-once execution).
        # Readers see batch_id as an inferred partition column.
        decisions.drop("batch_id").write.mode("overwrite").parquet(
            os.path.join(decisions_path, f"batch_id={int(batch_id)}")
        )
        # index EVERY ingested doc, not just survivors: the associativity of
        # "matches any earlier doc" (and with it slicing-invariance) depends
        # on later batches seeing dropped docs too — a chain a~b~c with b
        # dropped in an earlier batch must still drop c.
        sigs.write.mode("overwrite").parquet(
            os.path.join(sigs_path, f"batch_id={int(batch_id)}")
        )
        entries.write.mode("overwrite").parquet(
            os.path.join(bands_path, f"batch_id={int(batch_id)}")
        )

    return upsert


def run_incremental_near_dedup(
    spark: SparkSession,
    stream: DataFrame,
    store_path: str,
    threshold: float = 0.7,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> None:
    """Drain ``stream`` (docs with ``doc_id``/``text``) through the
    incremental dedup, maintaining the LSH store at ``store_path``."""
    from distributed_graph_database_system_spark.streaming.events import (
        run_foreach_batch,
    )

    run_foreach_batch(
        stream,
        near_dedup_batch_fn(
            spark, store_path, threshold=threshold, n=n, k=k, bands=bands, seed=seed
        ),
        mode="append",
    )


def read_decisions(spark: SparkSession, store_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(store_path, _DECISIONS))


def read_index(spark: SparkSession, store_path: str) -> DataFrame:
    """The band table joined to its signatures — the denormalized view of
    the seen-set (one row per doc × band, as the old single-table store
    had), for consumers/tests that inspect the index."""
    sigs = spark.read.parquet(os.path.join(store_path, _SIGS))
    bands = spark.read.parquet(os.path.join(store_path, _BANDS))
    return bands.drop("batch_id").join(sigs.drop("batch_id"), "doc_id")


def replay_documents(
    spark: SparkSession, docs: DataFrame, out_dir: str, slices: int = 4
) -> str:
    """Materialize ``docs`` as ``slices`` parquet files in doc_id order (the
    arrival order the decision rule is defined over) for file-stream replay;
    returns the source dir. Mirrors events.replay_dir."""
    import glob
    import shutil

    from pyspark.sql import Window as W

    src = os.path.join(out_dir, "docs_stream_src")
    if os.path.isdir(src):
        shutil.rmtree(src)
    os.makedirs(src, exist_ok=True)
    sliced = docs.withColumn("_slice", F.ntile(slices).over(W.orderBy("doc_id")))
    sliced = sliced.persist()
    try:
        for i in range(1, slices + 1):
            tmp = os.path.join(out_dir, f"_dslice_{i}")
            (
                sliced.where(F.col("_slice") == i)
                .drop("_slice")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            shutil.move(part, os.path.join(src, f"slice-{i:03d}.parquet"))
            shutil.rmtree(tmp)
    finally:
        sliced.unpersist()
    return src


def documents_stream(spark: SparkSession, src: str) -> DataFrame:
    return (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
