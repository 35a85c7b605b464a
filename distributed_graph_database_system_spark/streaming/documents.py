"""Incremental near-duplicate detection over a document stream.

The training-data-pipeline shape: crawl shards arrive continuously, and each
new document must be checked against EVERYTHING ingested so far — without
re-running dedup over the whole corpus per shard. The state is a persistent
MinHash-LSH index (``lsh_index_entries`` rows in parquet); per micro-batch:

1. index the batch's docs (signatures + banded buckets);
2. candidate pairs = bucket equi-join of batch entries against the stored
   index (new-vs-corpus) plus the batch's self-join (new-vs-new);
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
all-pairs against the corpus); the store grows linearly with the stream
(k+2 longs per band row) and is a plain parquet table — compactable with
``sources.layout.compact`` and bucketable by ``(band, bucket)`` to make
the candidate join co-located.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.operators.dedup import (
    lsh_index_entries,
    signature_similarity,
)

_INDEX = "index"
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

    index_path = os.path.join(store_path, _INDEX)
    decisions_path = os.path.join(store_path, _DECISIONS)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        entries = lsh_index_entries(
            batch_df, n=n, k=k, bands=bands, seed=seed
        ).localCheckpoint()  # consumed 3× (two candidate joins + append)
        try:
            stored = spark.read.parquet(index_path)
        except AnalysisException:
            stored = spark.createDataFrame(
                [], "doc_id BIGINT, sig ARRAY<BIGINT>, band INT, bucket BIGINT"
            )
        new_vs_corpus = entries.select(
            "band", "bucket", F.col("doc_id").alias("id_new"), F.col("sig").alias("sig_new")
        ).join(
            stored.select(
                "band", "bucket", F.col("doc_id").alias("id_old"),
                F.col("sig").alias("sig_old"),
            ),
            ["band", "bucket"],
        ).where(
            # same "earlier" guard as the in-batch join. On a RETRIED batch
            # (foreachBatch is at-least-once) this also stops re-ingested
            # docs from self-pairing at est_jaccard 1.0; the retry's WRITES
            # are made idempotent separately — both appends land in a
            # batch_id-keyed subdirectory that a retry overwrites in place.
            F.col("id_old") < F.col("id_new")
        )
        new_vs_new = entries.select(
            "band", "bucket", F.col("doc_id").alias("id_new"), F.col("sig").alias("sig_new")
        ).join(
            entries.select(
                "band", "bucket", F.col("doc_id").alias("id_old"),
                F.col("sig").alias("sig_old"),
            ),
            ["band", "bucket"],
        ).where(F.col("id_old") < F.col("id_new"))
        cand = (
            new_vs_corpus.unionByName(new_vs_new)
            .select("id_new", "id_old", "sig_new", "sig_old")
            .dropDuplicates(["id_new", "id_old"])
        )
        matches = cand.withColumn(
            "est_jaccard", signature_similarity(F.col("sig_new"), F.col("sig_old"))
        ).where(F.col("est_jaccard") >= threshold)
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
        entries.write.mode("overwrite").parquet(
            os.path.join(index_path, f"batch_id={int(batch_id)}")
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
    return spark.read.parquet(os.path.join(store_path, _INDEX))


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
