"""Write-path tests: MERGE parity (SET += semantics), uniqueness
enforcement, idempotency — the reference's re-index invariant
(indexing_test.go: re-running the indexer leaves counts unchanged)."""

from __future__ import annotations

import pytest

from codegraph_spark.operators.upsert import (
    UniquenessViolation,
    assert_unique,
    idempotent,
    merge_upsert,
)


@pytest.fixture()
def nodes(spark):
    return spark.createDataFrame(
        [
            ("symbol:a", "Symbol", "A", 1),
            ("symbol:b", "Symbol", "B", 2),
        ],
        "id string, label string, name string, version int",
    )


def test_merge_insert_and_update(spark, nodes):
    incoming = spark.createDataFrame(
        [
            ("symbol:b", "Symbol", None, 3),      # update: name NULL → keep "B"
            ("symbol:c", "Symbol", "C", 1),       # insert
        ],
        "id string, label string, name string, version int",
    )
    out = merge_upsert(nodes, incoming, keys=["id"])
    rows = {r.id: r for r in out.collect()}
    assert set(rows) == {"symbol:a", "symbol:b", "symbol:c"}
    assert rows["symbol:b"].name == "B"        # SET += : null did not clobber
    assert rows["symbol:b"].version == 3       # provided value overwrote
    assert rows["symbol:c"].name == "C"


def test_merge_full_replace(spark, nodes):
    incoming = spark.createDataFrame(
        [("symbol:b", "Symbol", None, 3)],
        "id string, label string, name string, version int",
    )
    out = merge_upsert(nodes, incoming, keys=["id"], set_plus_equals=False)
    rows = {r.id: r for r in out.collect()}
    assert rows["symbol:b"].name is None       # replace semantics clobber


def test_merge_dedups_incoming_batch(spark, nodes):
    incoming = spark.createDataFrame(
        [
            ("symbol:d", "Symbol", "D1", 1),
            ("symbol:d", "Symbol", "D2", 2),
        ],
        "id string, label string, name string, version int",
    )
    out = merge_upsert(nodes, incoming, keys=["id"])
    assert out.filter("id = 'symbol:d'").count() == 1


def test_idempotent_remerge(spark, nodes):
    merged = merge_upsert(nodes, nodes, keys=["id"])
    assert idempotent(merged, nodes, keys=["id"])


def test_assert_unique(spark, nodes):
    assert_unique(nodes, ["id"])  # passes
    dup = nodes.unionByName(nodes)
    with pytest.raises(UniquenessViolation):
        assert_unique(dup, ["id"], label="Symbol.id")


def test_graph_recast_key_invariants(spark, sf_dir):
    """The FIXTURES.md §1.5 uniqueness parity on the recast graph."""
    from codegraph_spark.graph import PropertyGraph

    g = PropertyGraph.from_tpch_recast(spark, sf_dir)
    assert_unique(g.nodes, ["id"], label="nodes.id")
    assert_unique(
        g.nodes.filter("symbol IS NOT NULL"), ["symbol"], label="Symbol.symbol"
    )
