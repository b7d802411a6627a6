"""codegraph_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of techsavvyash/codegraph.

The reference (read-only at /root/reference) is a Neo4j-backed code
intelligence platform: a Code Property Graph of nodes + typed edges,
queried through a fixed library of Cypher patterns (pkg/neo4j/query.go)
wrapped by LSP / advanced-analysis / CLI / MCP services.

This engine re-expresses that capability surface Spark-first:

- the property graph is a pair of columnar DataFrames (``nodes``,
  ``edges``) — see :mod:`codegraph_spark.graph`;
- every Cypher pattern becomes a Catalyst-optimized DataFrame program —
  see :mod:`codegraph_spark.operators`;
- variable-length traversals (``[:CALLS*1..10]`` etc.) become iterative
  frontier joins with visited-set semantics — see
  :mod:`codegraph_spark.operators.traversal`;
- Neo4j MERGE upserts + uniqueness constraints become window-dedup
  merges + write-time invariant checks — see
  :mod:`codegraph_spark.operators.upsert`;
- the SCIP / document ingestion pipelines become Spark jobs — see
  :mod:`codegraph_spark.sources`;
- beyond reference parity, scale-oriented LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing) live in
  :mod:`codegraph_spark.pipelines`.
"""

from codegraph_spark.graph import PropertyGraph
from codegraph_spark.session import get_spark

__all__ = ["PropertyGraph", "get_spark"]
__version__ = "0.1.0"
