"""Hypothesis property tests: randomized graphs and documents checked against
pure-Python reference implementations. Example counts are kept small — every
example runs real Spark jobs."""

from __future__ import annotations

import zlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from distributed_graph_database_system_spark.operators.dedup import shingle_hash_udf
from distributed_graph_database_system_spark.operators.graph import bfs, dfs_leaves
from tests.test_graph import py_bfs, py_dfs_leaves, to_adj

SPARK_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def digraphs(draw):
    n = draw(st.integers(min_value=1, max_value=10))
    possible = [(i, j) for i in range(1, n + 1) for j in range(1, n + 1) if i != j]
    edges = draw(st.lists(st.sampled_from(possible), max_size=30, unique=True)) if possible else []
    start = draw(st.integers(min_value=1, max_value=n))
    return n, edges, start


@given(g=digraphs())
@SPARK_SETTINGS
def test_traversals_match_python_reference(spark, g):
    n, edges, start = g
    df = spark.createDataFrame(edges or [], "src BIGINT, dst BIGINT")
    adj = to_adj(edges)

    got_bfs = [(r.vid, r.level) for r in bfs(df, start).collect()]
    assert got_bfs == py_bfs(adj, start)

    got_leaves = {r.vid for r in dfs_leaves(df, start).collect()}
    assert got_leaves == py_dfs_leaves(adj, start)


def _py_shingle_hashes(text: str, n: int = 3) -> set[int]:
    P, B = 2_147_483_647, 1_000_003
    toks = text.strip().lower().split()
    if len(toks) < n:
        return {zlib.crc32(" ".join(toks).encode()) % P}
    out = set()
    for i in range(len(toks) - n + 1):
        acc = 0
        for j in range(n):
            acc = (acc * B + zlib.crc32(toks[i + j].encode())) % P
        out.add(acc)
    return out


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd"),
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
@SPARK_SETTINGS
def test_shingle_hash_udf_matches_python(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {
        r.doc_id: set(r.h)
        for r in df.select(
            "doc_id", shingle_hash_udf(3)(F.col("text")).alias("h")
        ).collect()
    }
    for i, t in rows:
        assert got[i] == _py_shingle_hashes(t), (i, t)


@st.composite
def grouped_int_sets(draw):
    """Two slices of grouped integer values with overlap."""
    vals_a = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),
                st.integers(min_value=0, max_value=5000),
            ),
            min_size=1,
            max_size=60,
        )
    )
    vals_b = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),
                st.integers(min_value=0, max_value=5000),
            ),
            min_size=1,
            max_size=60,
        )
    )
    k = draw(st.sampled_from([1, 4, 16]))
    return vals_a, vals_b, k


@given(g=grouped_int_sets())
@SPARK_SETTINGS
def test_kmv_semilattice_and_exactness_property(spark, g):
    """Bottom-k is a semilattice: merge(sketch(A), sketch(B)) equals
    sketch(A ∪ B) row-for-row on arbitrary grouped slices; and a group
    with < k distinct values is represented EXACTLY (its estimate is the
    true distinct count). Reference model is pure python over the same
    md5-60bit hash."""
    import hashlib

    from distributed_graph_database_system_spark.operators.sketch import (
        kmv_distinct_estimate,
        kmv_merge,
        kmv_sketch,
    )

    vals_a, vals_b, k = g
    df_a = spark.createDataFrame(vals_a, "g INT, v BIGINT")
    df_b = spark.createDataFrame(vals_b, "g INT, v BIGINT")
    sk_a = kmv_sketch(df_a, "v", k=k, group_cols=("g",))
    sk_b = kmv_sketch(df_b, "v", k=k, group_cols=("g",))
    merged = {
        (r.g, r.h)
        for r in kmv_merge(sk_a, sk_b, k=k, group_cols=("g",)).collect()
    }
    whole = {
        (r.g, r.h)
        for r in kmv_sketch(
            df_a.unionAll(df_b), "v", k=k, group_cols=("g",)
        ).collect()
    }
    assert merged == whole

    def h60(v: int) -> int:
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    model: dict[int, set[int]] = {}
    for gg, v in vals_a + vals_b:
        model.setdefault(gg, set()).add(h60(v))
    want = {
        (gg, h)
        for gg, hs in model.items()
        for h in sorted(hs)[:k]
    }
    assert whole == want

    est = {
        r.g: r.est_distinct
        for r in kmv_distinct_estimate(
            kmv_sketch(df_a.unionAll(df_b), "v", k=k, group_cols=("g",)),
            k=k,
            group_cols=("g",),
        ).collect()
    }
    for gg, hs in model.items():
        if len(hs) < k:
            assert est[gg] == float(len(hs))
