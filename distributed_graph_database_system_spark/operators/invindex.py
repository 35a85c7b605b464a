"""Persisted inverted index: token → postings, stored partitioned by a
token-hash shard so a term lookup prunes to ONE partition directory.

Same storage discipline as the persisted ANN indexes
(operators/similarity.py write_srp_index / write_ivf_index): the index is
plain hive-partitioned parquet, the probe is a partition-pruned scan
(PartitionFilters in the scan node — asserted in tests/test_invindex.py),
so a term lookup over a 100 TB corpus reads 1/shards of the index plus
parquet row-group skipping on the token column inside the shard — never
the corpus and never the whole index.

Sharding by hash(token) rather than by token keeps directory counts
bounded (shards dirs, not |vocab| dirs — a million tiny directories is
its own scale failure) while still pruning lookups to one directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_postings(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    shards: int = 64,
) -> DataFrame:
    """Postings rows ``(shard, tok, doc_id, tf)`` — one shuffle on the
    (token, doc) key with map-side partial counts."""
    u = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    return (
        u.groupBy("tok", "doc_id")
        .agg(F.count("*").alias("tf"))
        .withColumn(
            "shard", F.pmod(F.xxhash64("tok"), F.lit(shards)).cast("int")
        )
        # the modulus TRAVELS WITH the postings: the writer records it in
        # the _meta sidecar from this column, so no caller can declare a
        # different shard count than the one the rows were hashed with
        .withColumn("n_shards", F.lit(int(shards)))
    )


def write_inverted_index(postings: DataFrame, path: str) -> None:
    """Write the index plus a 1-row ``_meta`` sidecar recording the shard
    count — lookups recompute the token's shard from that recorded value,
    so a reader can never probe with a different modulus than the writer
    used (which would return empty postings for present terms,
    indistinguishable from token-absent). The modulus is taken from the
    postings' own ``n_shards`` column (stamped by :func:`build_postings`),
    never re-supplied by the caller — there is nothing to get out of sync.
    The sidecar is written FIRST so a reader racing a re-shard sees a
    modulus at least as new as any shard directory it can list. Same
    sidecar pattern as the IVF index's persisted centroids
    (operators/similarity.py)."""
    # ONE distinct modulus across all rows, asserted — postings assembled
    # from builds with different shard counts would otherwise record a
    # wrong _meta silently, making lookups return empty for present terms,
    # exactly the failure the sidecar exists to prevent.
    moduli = [
        r["n_shards"]
        for r in postings.select("n_shards").distinct().limit(2).collect()
    ]
    if not moduli:
        raise ValueError("write_inverted_index: empty postings")
    if len(moduli) > 1:
        raise ValueError(
            "write_inverted_index: postings mix shard moduli "
            f"{sorted(moduli)} — rebuild with one shard count"
        )
    postings.sparkSession.createDataFrame(
        [(int(moduli[0]),)], "shards INT"
    ).coalesce(1).write.mode("overwrite").parquet(path.rstrip("/") + "_meta")
    postings.drop("n_shards").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(path)


def lookup_token(spark: SparkSession, path: str, token: str) -> DataFrame:
    """One term's postings via a partition-pruned scan. The shard modulus
    comes from the index's own ``_meta`` sidecar and the shard id is
    computed with the SAME JVM xxhash64 as the writer (a 1-row job — the
    hash is not reimplemented Python-side, so writer and reader cannot
    drift), then the read filters shard = <id> AND tok = <token>: the
    former prunes directories, the latter is pushed into the parquet scan
    inside the shard."""
    shards = spark.read.parquet(path.rstrip("/") + "_meta").first()["shards"]
    shard = (
        spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit(token)), F.lit(shards)).cast("int").alias("s")
        )
        .first()["s"]
    )
    return (
        spark.read.parquet(path)
        .where((F.col("shard") == shard) & (F.col("tok") == token))
        .select("tok", "doc_id", "tf")
    )
