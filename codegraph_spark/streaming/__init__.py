"""Structured Streaming surface.

The reference has NO implemented streaming path — its incremental
(tree-sitter) pipeline is design-only (/root/reference/README.md
pipeline 2 "(planned)"; research.md:280-323 describes add/delete/modify
semantics as future work). This package implements that design point
Spark-first: file-source streams + watermarked windowed aggregation for
the event surface, ``foreachBatch`` + MERGE-parity upsert for
incremental graph ingestion, and ``applyInPandasWithState`` for custom
stateful operators.
"""

from codegraph_spark.streaming.incremental import (
    hourly_counts,
    incremental_graph_ingest,
    read_events_stream,
    run_available_now,
    running_user_totals,
)

__all__ = [
    "read_events_stream",
    "hourly_counts",
    "run_available_now",
    "incremental_graph_ingest",
    "running_user_totals",
]
