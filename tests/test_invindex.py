"""Persisted inverted index: lookup correctness + partition-pruned scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_graph_database_system_spark.operators.invindex import (
    build_postings,
    lookup_token,
    write_inverted_index,
)


def test_lookup_matches_direct_computation_and_prunes(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "invindex")
    write_inverted_index(build_postings(docs, shards=16), path)

    token = "vector"
    got = {
        (r.doc_id, r.tf)
        for r in lookup_token(spark, path, token).collect()
    }
    want = {
        (r.doc_id, r.tf)
        for r in docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        )
        .where(F.col("tok") == token)
        .groupBy("doc_id")
        .agg(F.count("*").alias("tf"))
        .collect()
    }
    assert got == want and got

    plan = (
        lookup_token(spark, path, token)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the shard predicate must land in PartitionFilters (directory pruning)
    # and the token predicate in PushedFilters (row-group skipping)
    assert "PartitionFilters: [" in plan and "shard" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    assert "EqualTo(tok," in plan, plan


def test_unknown_token_lookup_is_empty_not_an_error(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "invindex2")
    write_inverted_index(build_postings(docs, shards=8), path)
    assert lookup_token(spark, path, "xyzzy-never").isEmpty()


def test_mixed_modulus_postings_are_rejected(spark, sf_dir, tmp_path):
    """Postings assembled from builds with different shard counts must be
    refused — a single-modulus _meta over mixed-modulus rows makes lookups
    return empty for present terms, the failure the sidecar prevents."""
    import pytest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    mixed = build_postings(docs, shards=8).unionByName(
        build_postings(docs, shards=16)
    )
    with pytest.raises(ValueError, match="mix shard moduli"):
        write_inverted_index(mixed, str(tmp_path / "invindex_mixed"))
