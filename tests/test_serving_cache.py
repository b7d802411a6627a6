"""serving.shared_df: one build per (session, key), persisted reuse."""

from __future__ import annotations


def test_shared_df_builds_once_and_reuses(spark):
    from codegraph_spark.serving import shared_df

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10)

    a = shared_df(spark, ("t", "k1"), build)
    b = shared_df(spark, ("t", "k1"), build)
    assert calls["n"] == 1
    assert a is b
    assert a.storageLevel.useMemory  # persisted
    assert a.count() == 10


def test_shared_df_key_isolation(spark):
    from codegraph_spark.serving import shared_df

    x = shared_df(spark, ("t", "iso-a"), lambda: spark.range(1))
    y = shared_df(spark, ("t", "iso-b"), lambda: spark.range(2))
    assert x.count() == 1 and y.count() == 2
