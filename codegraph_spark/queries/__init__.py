"""Declared query registry — the driver-facing inventory.

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB ANSI-SQL twins).
``__spark_entry__.py`` aggregates them. Naming follows SURVEY §2's
operator ids (p*/o*/a*/f*/j* + extension namespaces).

Column-name contract: every computed column is aliased identically in
the Spark program and the oracle SQL (the driver sorts columns by name
before hashing). Determinism contract: LIMIT only ever follows a total
ordering; doubles are rounded in-query on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = [
    "codegraph_spark.queries.relational",
    "codegraph_spark.queries.graph",
    "codegraph_spark.queries.traversals",
    "codegraph_spark.queries.docs",
    "codegraph_spark.queries.dedup",
    "codegraph_spark.queries.similarity",
    "codegraph_spark.queries.text",
    "codegraph_spark.queries.events",
    "codegraph_spark.queries.multimodal",
    "codegraph_spark.queries.streaming",
]


def _tuned(fn: QueryFn) -> QueryFn:
    """Wrap a query so it first applies engine session settings — the
    driver constructs its own SparkSession, so UTC timezone/AQE must be
    (re)applied on every entry point, not just ``entry()``."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from codegraph_spark.session import tune_session

        tune_session(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    import importlib

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        try:
            mod = importlib.import_module(modname)
        except ModuleNotFoundError:
            continue  # module not built yet
        for k, v in getattr(mod, "QUERIES", {}).items():
            if k in queries:
                raise ValueError(f"duplicate query name {k!r} in {modname}")
            queries[k] = _tuned(v)
        oracles.update(getattr(mod, "ORACLES", {}))
    missing = [k for k in oracles if k not in queries]
    if missing:
        raise ValueError(f"oracles without queries: {missing}")
    return queries, oracles
