"""Session-scoped serving caches for derived corpus structures.

The engine's deployment model is a warm store (the reference serves
every query from a long-lived Neo4j; SURVEY §3.3): structures that many
queries re-derive — the property-graph recast, co-occurrence edges,
text-dedup cliques, rep-level shingle postings — are built once per
(SparkSession, dataset) and persisted. This is the in-memory analog of
ingest-time materialized tables; on a cluster the same builds write
parquet alongside the source and refresh with it.

Bounded by construction: a handful of named entries per dataset dir.
Repeated query invocations REUSE one cached copy instead of stacking a
fresh ``.persist()`` per call (the leak class r4's ADVICE flagged).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}


def shared_df(
    spark: SparkSession,
    key: tuple,
    build: Callable[[], DataFrame],
    eager: bool = True,
) -> DataFrame:
    """Memoized persisted DataFrame keyed by (applicationId, *key).

    ``eager`` materializes at build time so the cost is paid exactly
    once and any builder-local scaffolding can be torn down before the
    handle escapes."""
    k = (spark.sparkContext.applicationId,) + key
    df = _CACHE.get(k)
    if df is None:
        df = build().persist()
        if eager:
            df.count()
        _CACHE[k] = df
    return df
