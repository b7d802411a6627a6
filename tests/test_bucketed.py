"""Bucketed-layout co-location: the graph-pattern join (edges.src =
nodes.id) must plan WITHOUT a shuffle when served from bucketed tables
— the on-disk analog of pre-partitioning that a 100 TB deployment
relies on (README sizing notes)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from codegraph_spark.graph import PropertyGraph


@pytest.fixture(scope="module")
def bucketed(spark):
    nodes = spark.range(200).select(
        F.concat(F.lit("n"), F.col("id")).alias("id"),
        F.lit("Thing").alias("label"),
        F.concat(F.lit("name"), F.col("id")).alias("name"),
    )
    edges = spark.range(199).select(
        F.concat(F.lit("n"), F.col("id")).alias("src"),
        F.concat(F.lit("n"), F.col("id") + 1).alias("dst"),
        F.lit("CALLS").alias("type"),
    )
    PropertyGraph(nodes, edges).write_bucketed(prefix="t_bkt", buckets=8)
    yield spark
    spark.sql("DROP TABLE IF EXISTS t_bkt_nodes")
    spark.sql("DROP TABLE IF EXISTS t_bkt_edges")


def test_bucketed_join_has_no_exchange(bucketed):
    # Force the shuffle-join path (at real scale neither side fits a
    # broadcast — that regime is exactly what bucketing is for): with
    # broadcast off, the bucketed scans must satisfy the join's
    # distribution requirement with NO Exchange on either side.
    spark = bucketed
    conf = spark.conf
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    old = {k: conf.get(k, None) for k in keys}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        nodes = spark.table("t_bkt_nodes")
        edges = spark.table("t_bkt_edges")
        joined = edges.join(nodes, edges.src == nodes.id)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 199
    finally:
        for k, v in old.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_bucketed_roundtrip_preserves_rows(bucketed):
    spark = bucketed
    assert spark.table("t_bkt_nodes").count() == 200
    assert spark.table("t_bkt_edges").count() == 199
