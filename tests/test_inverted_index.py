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
