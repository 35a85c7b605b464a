"""CSV / JSON / Parquet readers and writers (SURVEY.md §2.2 scans/sinks).

Thin, schema-explicit wrappers: readers always take a DDL schema (schema
inference is a full extra pass at 100 TB — never default to it), writers
default to overwrite for idempotent pipelines. Paths are directories of
part-files, the layout every Spark sink/scan uses."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    # parquet embeds its schema; no DDL needed
    return spark.read.parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    # ORC embeds its schema like parquet
    return spark.read.orc(path)


def audit_parquet_files(spark: SparkSession, path: str) -> DataFrame:
    """Distributed corrupt-file audit: ``(file STRING, ok BOOLEAN, error
    STRING)`` — one row per part-file, ok=false where the parquet FOOTER
    fails to parse (truncation, garbage, zero bytes). The file list is
    parallelized and each task validates its files with a pyarrow footer
    read (metadata-only — a few KB per file, never a data pass), so
    auditing a million-file lake is an embarrassingly parallel metadata
    sweep, not a scan. Local/NFS paths; object stores would route the
    pyarrow read through their fsspec filesystem."""
    import glob as pyglob

    files = sorted(pyglob.glob(f"{path.rstrip('/')}/**/*.parquet", recursive=True))
    flist = spark.createDataFrame([(f,) for f in files], "file STRING")

    def check(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                try:
                    pq.read_schema(f)
                    rows.append({"file": f, "ok": True, "error": None})
                except Exception as exc:  # noqa: BLE001 — the point
                    rows.append(
                        {"file": f, "ok": False, "error": str(exc)[:200]}
                    )
            yield pd.DataFrame(rows, columns=["file", "ok", "error"])

    return flist.mapInPandas(check, schema="file STRING, ok BOOLEAN, error STRING")


def read_parquet_resilient(
    spark: SparkSession, path: str, quarantine_log: str | None = None
) -> DataFrame:
    """Parquet scan that survives corrupt or truncated part-files — the
    operational reality of a 100 TB lake, where one bad file must cost a
    quarantine entry, not the job. ``ignoreCorruptFiles`` is set per-READ
    via the DataFrameReader option (not session-wide: silently skipping
    data is a policy each scan must opt into, and flipping the session
    conf would leak that policy into every other read in flight).

    When ``quarantine_log`` is given, the corrupt files are identified by
    :func:`audit_parquet_files` (a distributed footer-only sweep — Spark's
    own skip happens at execution time and is not reported back, so the
    planned-file list cannot tell you what was dropped) and written one
    path per line — the operator's audit trail of exactly what the
    resilient scan ignored.
    """
    df = spark.read.option("ignoreCorruptFiles", "true").parquet(path)
    if quarantine_log is not None:
        bad = [
            r.file
            for r in audit_parquet_files(spark, path)
            .where("NOT ok")
            .collect()
        ]
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        out = fs.create(jvm.org.apache.hadoop.fs.Path(quarantine_log), True)
        try:
            out.write(("\n".join(bad) + "\n").encode() if bad else b"")
        finally:
            out.close()
    return df
