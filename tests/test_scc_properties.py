"""Property test: the BSP SCC operator (operators/scc.py — trim +
FW-BW min-label coloring with peeling) agrees with an independent
pure-Python Kosaraju on ARBITRARY small digraphs, including the shapes
the fixture can't produce: nested SCCs feeding each other, self-loops,
parallel edges, SCCs that need multiple peel rounds because they reach
a smaller-labeled component without mutual reachability."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_round6_ops import _spark_scc, kosaraju_scc

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_nodes = st.integers(min_value=0, max_value=9)
_edges = st.lists(st.tuples(_nodes, _nodes), min_size=1, max_size=24)


@given(edges=_edges)
@SETTINGS
def test_scc_matches_kosaraju(spark, edges):
    edge_list = sorted({(f"n{a}", f"n{b}") for a, b in edges if a != b})
    if not edge_list:
        return
    assert _spark_scc(spark, edge_list) == kosaraju_scc(edge_list)
