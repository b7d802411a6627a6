"""Size-aware compaction — the small-files / fat-partitions tool.

At 100 TB the two chronic layout failures are thousands of KB-sized
files (ingest micro-batches, over-parallel writes: each costs a task
launch + a namenode entry per query) and multi-GB partitions that spill
or OOM a single task. Compaction re-partitions to a byte target using
Catalyst's own size statistics rather than guesses:

- ``estimated_size_bytes`` reads the optimizer's stats for the plan
  (file-relation sizes, or CBO/cached stats when available) — no data
  scan.
- ``compact`` repartitions to ``ceil(size / target_bytes)`` partitions
  (round-robin for pure layout, or by columns to co-locate while
  compacting).
- Writers should pair this with ``maxRecordsPerFile`` /
  ``spark.sql.files.maxPartitionBytes`` so the on-disk layout matches
  the in-flight one.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the plan (bytes). For file scans
    this is the file footprint; for cached/CBO-analyzed relations the
    computed stats — either way it is the planner's number, so compact
    targets agree with what the optimizer believes."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def compact(
    df: DataFrame,
    target_bytes: int = 256 * 1024 * 1024,
    by: list[str | Column] | None = None,
    min_partitions: int = 1,
) -> DataFrame:
    """Repartition *df* so each partition targets ``target_bytes``.

    ``by`` columns co-locate rows while compacting (hash partitioning —
    lets a downstream keyed join/agg reuse the layout); without them
    the repartition is round-robin (pure layout fix). The partition
    count comes from planner stats, so a 10 KB table collapses to one
    partition and a 1 TB table fans out to ~4000.
    """
    size = estimated_size_bytes(df)
    n = max(min_partitions, math.ceil(size / max(target_bytes, 1)))
    if by:
        return df.repartition(n, *by)
    return df.repartition(n)
