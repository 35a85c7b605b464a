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
