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


def test_block_local_parse_on_large_synthetic_file(spark, tmp_path):
    """≥1000-vertex file across many row blocks: every block parses only
    its own line range, and the union of blocks reproduces exactly the
    edge set the writer put in — including edges in the first and last
    rows (off-by-one at the block seams is the failure mode). Trailer
    validation (last block) and mid-file blank rows are rejected."""
    from distributed_graph_database_system_spark.sources.refgraph import (
        write_reference_file,
    )

    n = 1000
    # deterministic sparse digraph: i -> (i*7)%n+1 and i -> (i*13)%n+1
    edges = set()
    for i in range(1, n + 1):
        edges.add((i, (i * 7) % n + 1))
        edges.add((i, (i * 13) % n + 1))
    edges.add((1, n))  # first-row edge
    edges.add((n, 1))  # last-row edge
    p = str(tmp_path / "big.txt")
    write_reference_file(p, n, sorted(edges))

    r = ReferenceGraphReader({"path": p, "numPartitions": "8"})
    parts = r.partitions()
    assert len(parts) == 8
    # blocks are disjoint, contiguous, and cover 0..n
    spans = sorted((b.start, b.end) for b in parts)
    assert spans[0][0] == 0 and spans[-1][1] == n
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
    got = set()
    for b in parts:
        block_edges = list(r.read(b))
        assert all(b.start + 1 <= s <= b.end for s, _ in block_edges)
        got.update(block_edges)
    assert got == edges

    # through the registered source end-to-end
    spark.dataSource.register(ReferenceGraphDataSource)
    df = (
        spark.read.format("reference_graph")
        .option("numPartitions", "8")
        .load(p)
    )
    assert df.rdd.getNumPartitions() == 8
    assert {(r2.src, r2.dst) for r2 in df.collect()} == edges

    # trailer content after the declared rows → last block rejects
    with open(p, "a") as fh:
        fh.write("1 0\n")
    r2 = ReferenceGraphReader({"path": p, "numPartitions": "4"})
    last = max(r2.partitions(), key=lambda b: b.end)
    with pytest.raises(ValueError, match="railing"):
        list(r2.read(last))


def test_writer_roundtrips_through_source_api(spark, tmp_path):
    """The writer half of the Python DataSource: df.write.format(
    'reference_graph') emits the reference's vertex-count + 0/1-matrix
    bytes, mode('errorifexists') mirrors AddGraph-vs-ModifyGraph, id
    validation refuses out-of-range edges, and read-back through the
    reader half returns the exact edge set."""
    spark.dataSource.register(ReferenceGraphDataSource)
    path = str(tmp_path / "g.txt")
    edges = [(1, 2), (2, 3), (3, 1), (1, 4)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    df.write.format("reference_graph").option("n", "4").mode("append").save(
        path
    )
    lines = open(path).read().splitlines()
    assert lines[0] == "4" and len(lines) == 5
    assert lines[1].split() == ["0", "1", "0", "1"]
    back = spark.read.format("reference_graph").load(path)
    assert sorted((r.src, r.dst) for r in back.collect()) == sorted(edges)

    # AddGraph semantics: the Python writer API only exposes append /
    # overwrite, so append == create-if-absent → existing file refused
    with pytest.raises(Exception, match="exists"):
        df.write.format("reference_graph").option("n", "4").mode(
            "append"
        ).save(path)
    # ModifyGraph semantics: overwrite replaces; n inferred when omitted
    df2 = spark.createDataFrame([(1, 2)], "src BIGINT, dst BIGINT")
    df2.write.format("reference_graph").mode("overwrite").save(path)
    assert open(path).read().splitlines()[0] == "2"  # n = max id
    # out-of-range ids refused, file left as-is
    bad = spark.createDataFrame([(1, 9)], "src BIGINT, dst BIGINT")
    with pytest.raises(Exception, match="outside"):
        bad.write.format("reference_graph").option("n", "4").mode(
            "overwrite"
        ).save(path)
    assert open(path).read().splitlines()[0] == "2"  # untouched
