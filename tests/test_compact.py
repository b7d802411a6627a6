"""Compaction: partition counts must track the planner's size stats —
small inputs collapse, larger targets mean fewer partitions, and keyed
compaction preserves co-location (no Exchange for a same-key agg)."""

from __future__ import annotations

from pyspark.sql import functions as F

from codegraph_spark.operators.compact import compact, estimated_size_bytes


def test_small_input_collapses_to_one_partition(spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").repartition(16)
    out = compact(nation, target_bytes=256 * 1024 * 1024)
    assert out.rdd.getNumPartitions() == 1
    assert out.count() == nation.count()


def test_partition_count_tracks_target(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    size = estimated_size_bytes(li)
    assert size > 0
    small_target = max(size // 8, 1)
    n8 = compact(li, target_bytes=small_target).rdd.getNumPartitions()
    n1 = compact(li, target_bytes=size * 2).rdd.getNumPartitions()
    assert n8 >= 8
    assert n1 == 1


def test_keyed_compaction_preserves_colocation(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    size = estimated_size_bytes(li)
    out = compact(li, target_bytes=max(size // 4, 1), by=["l_orderkey"])
    agg = out.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # the aggregation reuses the compaction's hash layout: the only
    # Exchange in the plan is the compacting repartition itself
    assert plan.count("Exchange") == 1, plan
