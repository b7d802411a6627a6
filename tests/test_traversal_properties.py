"""Property-based checks of the custom traversal operators.

The iterative traversal library (`operators/traversal.py`) is the one
genuinely hand-written algorithmic piece of the engine (SURVEY §7.2 —
everything else is built-in DataFrame semantics Catalyst guarantees).
Hypothesis drives it with random directed graphs — including cycles,
self-loops, multi-edges, and disconnected seeds — and compares against
straightforward pure-Python reference implementations of the Cypher
semantics (`[:T*1..k]`, query.go:209/:250):

- ``bfs_reachable``  ≡ min-hop BFS with visited set (DISTINCT endpoints)
- ``enumerate_paths`` ≡ DFS enumeration of node-simple paths
- ``forest_closure`` ≡ ancestor/descendant pairs with exact depth

Examples are capped small (≤ 12 nodes) so each Spark comparison runs in
~a second; the value is in the adversarial shapes, not the scale.
"""

from __future__ import annotations

from collections import deque

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# node ids are small strings; graphs may contain cycles and self-loops
_nodes = st.integers(min_value=0, max_value=11)
_edges = st.lists(st.tuples(_nodes, _nodes), min_size=1, max_size=30)
_seeds = st.lists(_nodes, min_size=1, max_size=3)
_hops = st.integers(min_value=1, max_value=6)


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(f"n{a}", f"n{b}", "T") for a, b in edges], "src string, dst string, type string"
    )


def _seeds_df(spark, seeds):
    return spark.createDataFrame([(f"n{s}",) for s in set(seeds)], "id string")


def _ref_bfs(edges, seeds, max_hops):
    """Min-hop BFS over the adjacency list; returns {id: hops}, hops>=1."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    dist: dict[int, int] = {s: 0 for s in set(seeds)}
    q = deque(set(seeds))
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return {f"n{k}": d for k, d in dist.items() if d >= 1}


def _ref_paths(edges, seeds, max_hops):
    """All node-simple paths of length 1..max_hops from each seed."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    out: set[tuple[str, ...]] = set()

    def dfs(path):
        if len(path) - 1 >= max_hops:
            return
        for v in adj.get(path[-1], ()):
            if v in path:
                continue
            nxt = path + (v,)
            out.add(tuple(f"n{x}" for x in nxt))
            dfs(nxt)

    for s in set(seeds):
        dfs((s,))
    return out


@SETTINGS
@given(edges=_edges, seeds=_seeds, max_hops=_hops)
def test_bfs_reachable_matches_reference(spark, edges, seeds, max_hops):
    from codegraph_spark.operators.traversal import bfs_reachable

    got = {
        r["id"]: r["hops"]
        for r in bfs_reachable(
            _edges_df(spark, edges), _seeds_df(spark, seeds), max_hops, edge_type="T"
        ).collect()
    }
    assert got == _ref_bfs(edges, seeds, max_hops)


@SETTINGS
@given(edges=_edges, seeds=_seeds, max_hops=st.integers(min_value=1, max_value=4))
def test_enumerate_paths_matches_reference(spark, edges, seeds, max_hops):
    from codegraph_spark.operators.traversal import enumerate_paths

    rows = enumerate_paths(
        _edges_df(spark, edges), _seeds_df(spark, seeds), max_hops, edge_type="T"
    ).collect()
    got = {tuple(r["path"]) for r in rows}
    assert got == _ref_paths(edges, seeds, max_hops)
    # invariants: path endpoints and lengths line up with the columns
    for r in rows:
        assert r["path"][0] == r["start"] and r["path"][-1] == r["end"]
        assert len(r["path"]) == r["hops"] + 1
        assert len(set(r["path"])) == len(r["path"])  # node-simple


@SETTINGS
@given(
    # random forest: node i>0 gets parent drawn from [0, i) — acyclic by
    # construction, arbitrary depth/branching
    parents=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=11),
    max_depth=st.integers(min_value=1, max_value=6),
)
def test_forest_closure_matches_reference(spark, parents, max_depth):
    from codegraph_spark.operators.traversal import forest_closure

    edges = [(p % (i + 1), i + 1) for i, p in enumerate(parents)]
    ref: set[tuple[str, str, int]] = set()
    up = dict((c, p) for p, c in edges)
    for c in up:
        node, d = c, 0
        while node in up and d < max_depth:
            node, d = up[node], d + 1
            ref.add((f"n{node}", f"n{c}", d))
    got = {
        (r["anc"], r["desc"], r["hops"])
        for r in forest_closure(_edges_df(spark, edges), max_depth, edge_type="T").collect()
    }
    assert got == ref


@SETTINGS
@given(
    parents=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=10),
)
def test_transitive_closure_matches_reference(spark, parents):
    """Path-doubling all-pairs reachability on random forests equals
    the brute-force reachable-pairs set (hop counts not tracked)."""
    from codegraph_spark.operators.traversal import transitive_closure

    edges = [(p % (i + 1), i + 1) for i, p in enumerate(parents)]
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    ref: set[tuple[str, str]] = set()

    def reach(root, node):
        for nxt in adj.get(node, ()):
            ref.add((f"n{root}", f"n{nxt}"))
            reach(root, nxt)

    for r in adj:
        reach(r, r)
    got = {
        (r["src"], r["dst"])
        for r in transitive_closure(_edges_df(spark, edges)).collect()
    }
    assert got == ref


@pytest.mark.parametrize("direction", ["in", "both"])
def test_bfs_directions(spark, direction):
    """`in` climbs edges backwards; `both` treats them as undirected."""
    from codegraph_spark.operators.traversal import bfs_reachable

    edges = [(0, 1), (1, 2), (3, 1)]
    seeds = [2]
    got = {
        r["id"]: r["hops"]
        for r in bfs_reachable(
            _edges_df(spark, edges), _seeds_df(spark, seeds), 3, edge_type="T", direction=direction
        ).collect()
    }
    if direction == "in":
        assert got == {"n1": 1, "n0": 2, "n3": 2}
    else:
        assert got == {"n1": 1, "n0": 2, "n3": 2}  # same here: all paths climb
