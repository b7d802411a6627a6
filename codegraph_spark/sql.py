"""SQL surface: the whole warehouse as named temp views.

The engine's queries are DataFrame programs, but Spark's second
first-class dialect is SQL — registering the serving tables as views
lets a user run ``spark.sql("SELECT ... FROM nodes JOIN edges ...")``
directly (and lets BI/notebook tooling attach with zero glue). Views
are metadata only: each one resolves to the SAME cached DataFrames the
DataFrame API serves from (PropertyGraph caches, typed subsets,
closure), so Catalyst plans SQL text and DataFrame calls identically.

The reference's equivalent surface is the Cypher endpoint its MCP/CLI
expose (pkg/neo4j/query.go); here the dialect is ANSI SQL, which is
the point of building on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from codegraph_spark.graph import PropertyGraph
from codegraph_spark.sources.tables import load_tables

#: raw parquet table names (TESTDATA.md)
RAW_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every serving table as a temp view; returns the names.

    - raw tables: ``region`` ... ``embeddings``
    - graph: ``nodes``, ``edges`` (the recast property graph)
    - precomputes: ``contains_closure`` (anc, desc, hops)
    """
    names: list[str] = []
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
        names.append(name)
    g = PropertyGraph.from_tpch_recast(spark, sf_dir)
    g.nodes.createOrReplaceTempView("nodes")
    g.edges.createOrReplaceTempView("edges")
    g.closure("CONTAINS", max_depth=4).createOrReplaceTempView("contains_closure")
    names += ["nodes", "edges", "contains_closure"]
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-call SQL entry point: register views (idempotent), run the
    statement, return the DataFrame."""
    register_views(spark, sf_dir)
    return spark.sql(query)
