"""Smoke checks on the driver contract surface."""

from __future__ import annotations


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "sum_qty" in df.columns


def test_registry_shape():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert len(q) > 0
    # every oracle key has a query
    assert set(o) <= set(q)
    # all callables
    for fn in q.values():
        assert callable(fn)
