"""Operator library: graph traversals/analytics, dedup, similarity search,
text analysis, multimodal plumbing."""

from distributed_graph_database_system_spark.operators.graph import (
    GraphStore,
    bfs,
    connected_components,
    degrees,
    dfs_leaves,
    pagerank,
    pregel,
    shortest_path_lengths,
    sssp_weighted,
    triangle_count,
)

__all__ = [
    "GraphStore",
    "bfs",
    "connected_components",
    "degrees",
    "dfs_leaves",
    "pagerank",
    "pregel",
    "shortest_path_lengths",
    "sssp_weighted",
    "triangle_count",
]
