"""PageRank operator vs a pure-Python power iteration on the same
graph — identical damping/dangling semantics, agreement to 1e-9."""

from __future__ import annotations

import pytest

from codegraph_spark.operators.pagerank import pagerank


def reference_pagerank(node_ids, edge_list, iters=10, damping=0.85):
    n = len(node_ids)
    out = {}
    for s, d in edge_list:
        out.setdefault(s, []).append(d)
    ranks = {v: 1.0 / n for v in node_ids}
    for _ in range(iters):
        nxt = {v: (1.0 - damping) / n for v in node_ids}
        dangling = sum(r for v, r in ranks.items() if v not in out)
        for v, r in ranks.items():
            for d in out.get(v, []):
                nxt[d] += damping * r / len(out[v])
        for v in node_ids:
            nxt[v] += damping * dangling / n
        ranks = nxt
    return ranks


GRAPHS = [
    # chain with a sink (dangling) node
    (["a", "b", "c", "d"], [("a", "b"), ("b", "c"), ("c", "d")]),
    # hub-and-spoke plus a cycle
    (["h", "s1", "s2", "s3", "x"],
     [("s1", "h"), ("s2", "h"), ("s3", "h"), ("h", "x"), ("x", "s1")]),
    # isolated node keeps teleport mass
    (["a", "b", "iso"], [("a", "b"), ("b", "a")]),
]


@pytest.mark.parametrize("node_ids,edge_list", GRAPHS)
def test_pagerank_matches_reference(spark, node_ids, edge_list):
    nodes = spark.createDataFrame([(v,) for v in node_ids], "id string")
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    got = {r["id"]: r["rank"] for r in pagerank(nodes, edges, iters=10).collect()}
    want = reference_pagerank(node_ids, edge_list, iters=10)
    assert set(got) == set(want)
    for v in node_ids:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_ranks_hub_highest(spark):
    node_ids, edge_list = GRAPHS[1]
    nodes = spark.createDataFrame([(v,) for v in node_ids], "id string")
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    got = {r["id"]: r["rank"] for r in pagerank(nodes, edges).collect()}
    assert max(got, key=got.get) == "h"


def test_pagerank_empty(spark):
    nodes = spark.createDataFrame([], "id string")
    edges = spark.createDataFrame([], "src string, dst string")
    assert pagerank(nodes, edges).count() == 0
