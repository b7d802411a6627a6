"""Schema system (K7/K8) tests: constraint registry, validate on clean
and corrupted graphs, info shape — schema.go:206-263/:410-488 parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraph_spark.graph import PropertyGraph
from codegraph_spark.schema import SchemaManager, UniqueConstraint, database_info

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def graph(spark):
    return PropertyGraph.from_tpch_recast(spark, SF_DIR)


def test_validate_clean_graph(graph):
    report = SchemaManager().validate(graph)
    assert report["valid"], report["failures"]


def test_validate_catches_duplicates(spark, graph):
    # duplicate a Part symbol: the Symbol.symbol IS UNIQUE analog trips
    dupe = graph.nodes.filter(F.col("label") == "Part").limit(1)
    broken = PropertyGraph(graph.nodes.unionByName(dupe), graph.edges)
    report = SchemaManager().validate(broken)
    assert not report["valid"]
    assert any("Part.symbol" in f for f in report["failures"])


def test_validate_catches_orphan_edges(spark, graph):
    orphan = spark.createDataFrame(
        [("nope:1", "nope:2", "CALLS")], "src string, dst string, type string"
    )
    broken = PropertyGraph(graph.nodes, graph.edges.unionByName(orphan))
    report = SchemaManager().validate(broken)
    assert not report["valid"]
    assert any("node ids" in f for f in report["failures"])


def test_create_drop_constraint(graph):
    m = SchemaManager()
    n0 = len(m.constraints)
    m.create_constraint("LineItem", "id")
    assert UniqueConstraint("LineItem", "id") in m.constraints
    m.drop_constraint("LineItem", "id")
    assert len(m.constraints) == n0


def test_info_and_database_info(spark, graph):
    info = SchemaManager().info(graph)
    assert "Part" in info["labels"] and "CONTAINS" in info["relationship_types"]
    assert any("IS UNIQUE" in c for c in info["constraints"])
    db = database_info(spark)
    assert db["engine"] == "Apache Spark" and db["version"]
