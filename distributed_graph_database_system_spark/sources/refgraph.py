"""Spark 4 Python DataSource for the reference's at-rest graph format.

The reference stores a graph as a text file: a vertex-count line followed
by an n×n 0/1 adjacency matrix (``primaryServer.c:43-49``, written by the
client's ``client.c:77-94``). ``GraphStore.add_reference_file`` already
parses it driver-side; this module exposes the SAME format through
Spark's native source API so it composes with everything a source can —

    spark.dataSource.register(ReferenceGraphDataSource)
    edges = spark.read.format("reference_graph").load("/path/graph.txt")

yielding ``(src BIGINT, dst BIGINT)`` edge rows, 1-indexed exactly like
``secondaryServer.c:292``.

Distribution: the vertex count is read from the header at planning time
(one tiny driver-side read — the same place Spark's own file sources list
footers), then matrix ROWS are split into ``n_partitions`` contiguous
blocks; each task re-opens the file, skips preceding lines WITHOUT
parsing them (lines are variable-width, so byte offsets aren't knowable
in advance; discarding is pure IO), and int-parses/validates ONLY its
own block's lines — per-task parse cost is O(block), not O(file). The
row-per-line layout this requires is exactly what the reference's writer
(``client.c:77-94``) and :func:`write_reference_file` emit; a file with
re-wrapped lines fails the per-row cell-count check with a pointer at
the driver-side whole-file path, which tokenizes layout-independently.
A 30-vertex reference file is one partition in practice, but the
partitioning makes the format scale-correct rather than driver-bound —
the point of routing it through the source API.
"""

from __future__ import annotations

import threading
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_register_lock = threading.Lock()


def ensure_registered(spark) -> None:
    """Register the ``reference_graph`` source exactly once per session,
    safely under concurrency. ``spark.dataSource.register`` is a
    check-then-put: two driver threads building refgraph queries at the
    same time (the parallel parity sweep, guide §2.6) can both pass the
    existence check and the loser dies with DATA_SOURCE_ALREADY_EXISTS.
    Serialize the registration and treat "already exists" as success —
    every caller registers the SAME class, so whichever copy won is
    interchangeable."""
    with _register_lock:
        try:
            spark.dataSource.register(ReferenceGraphDataSource)
        except Exception as exc:  # noqa: BLE001
            if "DATA_SOURCE_ALREADY_EXISTS" not in str(exc):
                raise


class _RowBlock(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class ReferenceGraphReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("reference_graph: .load(path) is required")
        self.n_partitions = int(options.get("numPartitions", "4"))
        with open(self.path) as fh:
            first = fh.readline().split()
        if not first:
            raise ValueError(f"reference_graph: empty graph file {self.path}")
        self.n = int(first[0])

    def partitions(self) -> Sequence[InputPartition]:
        n, k = self.n, max(1, min(self.n_partitions, self.n or 1))
        if n == 0:
            return [_RowBlock(0, 0)]
        step = (n + k - 1) // k
        return [_RowBlock(i, min(i + step, n)) for i in range(0, n, step)]

    def read(self, partition: _RowBlock) -> Iterator[tuple[int, int]]:
        # Block-local parse through THE canonical per-row validator
        # (GraphStore.validate_matrix_row) — one validation contract for
        # the at-rest format whichever door it enters through: a
        # non-integer or non-0/1 cell raises here exactly as it does on
        # the driver-side add path. Lines before the block are skipped
        # unparsed; only partition.start..end are tokenized.
        from distributed_graph_database_system_spark.operators.graph import (
            GraphStore,
        )

        n = self.n
        with open(self.path) as fh:
            fh.readline()  # header (validated at planning time)
            for _ in range(partition.start):
                if not fh.readline():
                    raise ValueError(
                        f"reference_graph: file ended before matrix row "
                        f"{partition.start} of {n}"
                    )
            for i in range(partition.start, partition.end):
                line = fh.readline()
                if not line.strip():
                    raise ValueError(
                        f"reference_graph: missing or blank matrix row {i} "
                        f"of {n} — the block-local reader requires the "
                        "writer's row-per-line layout; for re-wrapped "
                        "files use GraphStore.add_reference_file"
                    )
                cells = GraphStore.validate_matrix_row(line.split(), n, i)
                for j, cell in enumerate(cells):
                    if cell == 1:
                        yield (i + 1, j + 1)
            if partition.end == n:
                # the last block also owns trailer validation: extra
                # non-blank lines mean the header undercounts the matrix
                trailer = fh.read()
                if trailer.strip():
                    raise ValueError(
                        f"reference_graph: trailing content after the "
                        f"declared {n} matrix rows"
                    )


class ReferenceGraphDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "reference_graph"

    def schema(self) -> str:
        return "src BIGINT, dst BIGINT"

    def reader(self, schema) -> ReferenceGraphReader:
        return ReferenceGraphReader(self.options)

    def writer(self, schema, overwrite: bool) -> "ReferenceGraphWriter":
        return ReferenceGraphWriter(self.options, overwrite)


class _EdgeBatch(WriterCommitMessage):
    """Per-task edge list. The reference format is a DENSE n×n matrix —
    bounded by the format itself (the reference caps graphs at 30
    vertices, ``primaryServer.c``), so task payloads are tiny by
    construction and driver-side assembly in ``commit`` is the correct
    topology (a dense matrix cannot be written row-block-parallel without
    knowing every row's edges anyway)."""

    def __init__(self, edges: list):
        self.edges = edges


class ReferenceGraphWriter(DataSourceWriter):
    """Writer half of the source API:
    ``df.write.format("reference_graph").option("n", 6).mode(...)
    .save(path)`` emits the reference's vertex-count + 0/1-matrix file
    from ``(src, dst)`` rows — the exact bytes ``client.c:77-94`` sends.
    Tasks stream their partitions into commit messages; ``commit``
    validates ids against ``n`` (or infers n as max id when the option is
    absent) and writes the file once, atomically via a temp sibling.
    ``abort`` leaves the target untouched. Spark's Python writer API only
    exposes Append and Overwrite modes; a dense-matrix file cannot be
    appended to, so Append means CREATE-IF-ABSENT here — refusing an
    existing file exactly like the reference's AddGraph, with Overwrite
    as ModifyGraph."""

    def __init__(self, options: dict, overwrite: bool):
        import os
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("reference_graph writer: path option required")
        self.n_opt = options.get("n")
        self.overwrite = overwrite
        # fail FAST on create-if-absent: the check needs no task output,
        # so refuse before any cluster work runs (commit re-checks as the
        # final race guard)
        if os.path.exists(self.path) and not overwrite:
            raise FileExistsError(
                f"reference_graph writer: {self.path} exists (use "
                "mode('overwrite') — the reference's ModifyGraph semantics)"
            )
        # per-writer unique temp sibling: a fixed '._tmp' name would let
        # two concurrent writes to the same target publish each other's
        # half-written bytes through os.replace
        self._tmp = f"{self.path}._tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"

    def write(self, iterator) -> _EdgeBatch:
        edges = [(int(r[0]), int(r[1])) for r in iterator]
        return _EdgeBatch(edges)

    def commit(self, messages) -> None:
        import os

        edges: list[tuple[int, int]] = []
        for m in messages:
            edges.extend(m.edges)
        if os.path.exists(self.path) and not self.overwrite:
            raise FileExistsError(
                f"reference_graph writer: {self.path} exists (use "
                "mode('overwrite') — the reference's ModifyGraph semantics)"
            )
        n = int(self.n_opt) if self.n_opt is not None else max(
            (max(s, d) for s, d in edges), default=0
        )
        bad = [(s, d) for s, d in edges if not (1 <= s <= n and 1 <= d <= n)]
        if bad:
            raise ValueError(
                f"reference_graph writer: edge ids outside 1..{n}: {bad[:3]}"
            )
        write_reference_file(self._tmp, n, edges)
        os.replace(self._tmp, self.path)

    def abort(self, messages) -> None:
        import os

        if os.path.exists(self._tmp):
            os.remove(self._tmp)


def write_reference_file(path: str, n: int, edges: Sequence[tuple[int, int]]) -> None:
    """Emit the reference's own format (vertex count + dense 0/1 matrix,
    1-indexed edges) — the writer-side twin used by tests and fixtures."""
    matrix = [[0] * n for _ in range(n)]
    for s, d in edges:
        matrix[s - 1][d - 1] = 1
    with open(path, "w") as fh:
        fh.write(f"{n}\n")
        for row in matrix:
            fh.write(" ".join(str(c) for c in row) + "\n")
