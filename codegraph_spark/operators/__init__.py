"""Operator library — the SURVEY §2 inventory as composable DataFrame
functions. Every operator is a pure DataFrame program (Catalyst
optimizes; DuckDB oracles can mirror it in ANSI SQL)."""

from codegraph_spark.operators.search import search_nodes
from codegraph_spark.operators.topk import top_k_per_group
from codegraph_spark.operators.traversal import bfs_reachable, enumerate_paths, transitive_closure

__all__ = [
    "search_nodes",
    "top_k_per_group",
    "bfs_reachable",
    "enumerate_paths",
    "transitive_closure",
]
