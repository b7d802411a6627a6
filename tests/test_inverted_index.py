"""Trigram-index search must be result-identical to the scan
(SURVEY §7.3 risk 3 scale path): gram intersection is a candidate
PREFILTER, the contains verify makes it exact — including the case
where a node shares every gram of the term without containing it."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from codegraph_spark.operators.inverted_index import build_trigram_index, search_via_index
from codegraph_spark.operators.search import search_nodes


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("1", "Function", "merge_upsert"),
        ("2", "Function", "upsert_merge"),
        ("3", "Class", "MergeUpsertHelper"),
        ("4", "Variable", "totally_unrelated"),
        # shares all grams of "abcab" ('abc','bca','cab') without
        # containing it — must be pruned by the verify, not returned:
        ("5", "Function", "abcXcabXbca"),
        ("6", "Function", "xxabcabxx"),
        ("7", "File", "ab"),
    ]
    nodes = spark.createDataFrame(rows, "id string, label string, name string")
    return nodes, build_trigram_index(nodes).persist()


@pytest.mark.parametrize("term", ["merge", "upsert", "abcab", "ab", "zzz", "Merge_Up"])
def test_index_search_equals_scan(corpus, term):
    nodes, index = corpus
    want = {r["id"] for r in search_nodes(nodes, term, limit=0).collect()}
    got = {r["id"] for r in search_via_index(nodes, index, term, limit=0).collect()}
    assert got == want


def test_gram_collision_is_verified_away(corpus):
    nodes, index = corpus
    ids = {r["id"] for r in search_via_index(nodes, index, "abcab", limit=0).collect()}
    assert ids == {"6"}  # node 5 shares the grams but not the substring


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(term=st.text(alphabet="abcxme_", min_size=1, max_size=6))
def test_index_search_equals_scan_fuzz(corpus, term):
    nodes, index = corpus
    want = {r["id"] for r in search_nodes(nodes, term, limit=0).collect()}
    got = {r["id"] for r in search_via_index(nodes, index, term, limit=0).collect()}
    assert got == want


def test_index_roundtrip_and_served_search(corpus, spark, tmp_path):
    """Ingest-time persistence: write the posting table, load it back,
    and serve the search from the stored index — results identical to
    the scan, and the lookup plan pushes the gram filter to the scan."""
    from codegraph_spark.operators.inverted_index import load_index, write_index

    nodes, index = corpus
    path = str(tmp_path / "trigram_index")
    write_index(index, path)
    stored = load_index(spark, path)

    want = {r["id"] for r in search_nodes(nodes, "merge", limit=0).collect()}
    got = {r["id"] for r in search_via_index(nodes, stored, "merge", limit=0).collect()}
    assert got == want

    plan = stored.filter(stored.gram == "mer")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "mer" in plan


def test_graph_trigram_index_cached(spark):
    """PropertyGraph.trigram_index builds once and returns the same
    persisted frame on subsequent calls (no rebuild on the query path)."""
    from codegraph_spark.graph import PropertyGraph

    nodes = spark.createDataFrame(
        [("n1", "Function", "alpha", None), ("n2", "Function", "beta", None)],
        "id string, label string, name string, symbol string",
    )
    edges = spark.createDataFrame([], "src string, dst string, type string")
    g = PropertyGraph(nodes, edges)
    first = g.trigram_index(("name", "symbol"))
    assert first.storageLevel.useMemory
    assert g.trigram_index(("name", "symbol")) is first
