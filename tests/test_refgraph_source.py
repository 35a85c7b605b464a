"""Spark 4 Python DataSource for the reference graph format."""

from __future__ import annotations

import pytest

from distributed_graph_database_system_spark.sources.refgraph import (
    ReferenceGraphDataSource,
    ReferenceGraphReader,
    write_reference_file,
)


def test_roundtrips_reference_format_distributed(spark, tmp_path):
    from distributed_graph_database_system_spark.queries.graph import G1, G2

    for name, g, n in (("g1", G1, 5), ("g2", G2, 6)):
        path = str(tmp_path / f"{name}.txt")
        write_reference_file(path, n, g)
        spark.dataSource.register(ReferenceGraphDataSource)
        df = (
            spark.read.format("reference_graph")
            .option("numPartitions", "3")
            .load(path)
        )
        assert {(r.src, r.dst) for r in df.collect()} == set(g)
        assert df.rdd.getNumPartitions() == 3

    # the matrix writer/reader agree with GraphStore's driver-side parser
    from distributed_graph_database_system_spark.operators.graph import GraphStore

    n, matrix = GraphStore.parse_reference_file(
        open(str(tmp_path / "g1.txt")).read()
    )
    assert n == 5 and sum(sum(r) for r in matrix) == len(G1)


def test_reader_rejects_malformed_files(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("")
    with pytest.raises(ValueError, match="empty"):
        ReferenceGraphReader({"path": str(p)})
    p.write_text("3\n1 0\n")  # declares 3 vertices, has 2 cells
    r = ReferenceGraphReader({"path": str(p)})
    with pytest.raises(ValueError, match="cells"):
        list(r.read(r.partitions()[0]))
    p.write_text("2\n1 0\n2 0\n")  # non-0/1 cell rejected, not dropped
    r = ReferenceGraphReader({"path": str(p)})
    with pytest.raises(ValueError, match="0/1"):
        list(r.read(_all(r)))
    p.write_text("2\n1 0\nx 0\n")  # garbage cell raises like the driver path
    r = ReferenceGraphReader({"path": str(p)})
    with pytest.raises(ValueError):
        list(r.read(_all(r)))
    with pytest.raises(ValueError, match="required"):
        ReferenceGraphReader({})


def _all(r):
    class _Span:
        start, end = 0, r.n
    return _Span()
