"""Streaming queries surfaced through the driver contract.

``stream_hourly_counts`` actually runs a Structured Streaming job
(file source → watermark → tumbling window → availableNow drain into a
memory sink) and returns the sink table; the oracle is the plain batch
SQL over the same events — a hash match proves the incremental
computation converges to the batch answer (the streaming/batch
equivalence the reference's planned pipeline assumes,
research.md:280-323).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from codegraph_spark.streaming.incremental import (
    hourly_counts,
    read_events_stream,
    run_available_now,
)


def stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    # state = one row per (hour, event_type) — bounded cardinality, so
    # a few state-store partitions; see run_available_now docstring.
    return run_available_now(hourly_counts(ev), output_mode="complete", state_partitions=8)


_STREAM_HOURLY_SQL = """
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
       count(*) AS n, ROUND(CAST(sum(value) AS DOUBLE), 2) AS total_value
FROM events
GROUP BY 1, 2
"""

QUERIES = {"stream_hourly_counts": stream_hourly_counts}
ORACLES = {"stream_hourly_counts": _STREAM_HOURLY_SQL}
