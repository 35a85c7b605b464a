"""Versioned snapshot store: monotone versions, as-of reads, immutability,
vacuum retention, and composition with snapshot_diff."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.sources.versioned import (
    list_versions,
    read_version,
    vacuum,
    write_version,
)


def test_versions_are_monotone_and_as_of_reads_resolve(spark, sf_dir, tmp_path):
    root = str(tmp_path / "docs_versions")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    v0 = write_version(docs.where(F.col("doc_id") < 100), root)
    v1 = write_version(docs.where(F.col("doc_id") < 150), root)
    v2 = write_version(docs.where(F.col("doc_id") < 120), root)
    assert (v0, v1, v2) == (0, 1, 2)
    assert list_versions(spark, root) == [0, 1, 2]

    assert read_version(spark, root).count() == 120          # latest
    assert read_version(spark, root, 0).count() == 100       # as-of
    assert read_version(spark, root, 1).count() == 150

    with pytest.raises(FileNotFoundError):
        read_version(spark, root, 9)
    with pytest.raises(FileNotFoundError):
        read_version(spark, str(tmp_path / "nope"))


def test_writes_never_touch_existing_versions(spark, sf_dir, tmp_path):
    import os

    root = str(tmp_path / "immutable")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    write_version(docs, root)

    def state(v):
        d = f"{root}/version={v}"
        return {
            f: os.stat(os.path.join(d, f)).st_mtime_ns
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before = state(0)
    write_version(docs.limit(10), root)
    assert state(0) == before  # version 0 files bit-for-bit untouched


def test_vacuum_keeps_newest_and_diff_composes(spark, sf_dir, tmp_path):
    from distributed_graph_database_system_spark.operators.diff import snapshot_diff

    root = str(tmp_path / "vac")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for lim in (30, 40, 50, 60):
        write_version(docs.where(F.col("doc_id") < lim), root)
    dropped = vacuum(spark, root, keep_last=2)
    assert dropped == [0, 1]
    assert list_versions(spark, root) == [2, 3]

    d = snapshot_diff(
        read_version(spark, root, 2),
        read_version(spark, root, 3),
        key_cols=["doc_id"],
    )
    added = d.where(F.col("change_type") == "added").count()
    assert added == 10

    with pytest.raises(ValueError):
        vacuum(spark, root, keep_last=0)


def test_history_read_tolerates_schema_drift(spark, sf_dir, tmp_path):
    """A column added in a later snapshot must read as NULL in earlier
    versions (mergeSchema), with version as a prunable partition column."""
    from distributed_graph_database_system_spark.sources.versioned import (
        read_history,
    )

    root = str(tmp_path / "drift")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    write_version(docs.select("doc_id", "lang"), root)
    write_version(
        docs.select("doc_id", "lang", F.length("text").alias("n_chars2")),
        root,
    )
    h = read_history(spark, root)
    assert set(h.columns) == {"doc_id", "lang", "n_chars2", "version"}
    assert h.where((F.col("version") == 0) & F.col("n_chars2").isNotNull()).isEmpty()
    assert h.where((F.col("version") == 1) & F.col("n_chars2").isNull()).isEmpty()
    # the version predicate prunes directories
    plan = (
        h.where(F.col("version") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "version" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
