"""Bloom semi-join reduction pins: zero false negatives (every true
match survives the prefilter), a bounded false-positive rate at the
configured sizing, and end-to-end equality with a plain semi-join."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_prefilter_has_no_false_negatives(spark, sf_dir):
    from codegraph_spark.operators.bloomjoin import bloom_bitmap, with_bloom_prefilter
    from codegraph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")

    bitmap = bloom_bitmap(orders, "o_orderkey")
    passed = {
        r.l_orderkey
        for r in with_bloom_prefilter(li, "l_orderkey", bitmap).distinct().collect()
    }
    true_keys = {r.o_orderkey for r in orders.collect()}
    li_keys = {r.l_orderkey for r in li.distinct().collect()}
    assert (true_keys & li_keys) <= passed, "bloom prefilter dropped a true match"


def test_false_positive_rate_bounded(spark):
    """Disjoint build/probe key ranges: every prefilter survivor is a
    false positive. With m=128Ki bits, k=3, n=2000 keys the theoretical
    fpp is ~2e-5; assert a slack bound of 1%."""
    from codegraph_spark.operators.bloomjoin import bloom_bitmap, with_bloom_prefilter

    build = spark.range(0, 2000).select(F.col("id").alias("key"))
    probe = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("key"))
    bitmap = bloom_bitmap(build, "key")
    fp = with_bloom_prefilter(probe, "key", bitmap).count()
    assert fp / 20_000 < 0.01, f"false-positive rate too high: {fp}/20000"


def test_bloom_semi_join_equals_plain_semi_join(spark, sf_dir):
    from codegraph_spark.operators.bloomjoin import bloom_semi_join
    from codegraph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    )
    via_bloom = bloom_semi_join(li, "l_orderkey", orders, "o_orderkey")
    plain = li.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
        "l_orderkey",
        "left_semi",
    )
    assert via_bloom.count() == plain.count()
    assert (
        via_bloom.select(F.sum("l_orderkey")).collect()[0][0]
        == plain.select(F.sum("l_orderkey")).collect()[0][0]
    )


def test_bitmap_is_small_and_broadcast(spark, sf_dir):
    """The bitmap must stay <= m_bits/64 entries (broadcastable), and
    the prefiltered plan must contain a broadcast exchange, not a
    shuffle, for the bitmap side."""
    from codegraph_spark.operators.bloomjoin import (
        _DEFAULT_M_BITS,
        bloom_bitmap,
        with_bloom_prefilter,
    )
    from codegraph_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    bitmap = bloom_bitmap(orders, "o_orderkey")
    row = bitmap.collect()[0]
    assert len(row.bloom) <= _DEFAULT_M_BITS // 64

    import io
    from contextlib import redirect_stdout

    li = load_table(spark, sf_dir, "lineitem")
    buf = io.StringIO()
    with redirect_stdout(buf):
        with_bloom_prefilter(li, "l_orderkey", bitmap).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
