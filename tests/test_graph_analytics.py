"""Semantic pins for the graph-analytics extensions: the degree-ordered
triangle enumeration must agree with a pure-Python brute force, and the
retrieval scores must behave like BM25 (monotone in tf, penalized by
df). Oracle parity is covered separately by test_oracle_parity."""

from __future__ import annotations

from itertools import combinations

import pytest


def _brute_force_triangles(edges):
    """Per-node triangle participation, adjacency-set brute force."""
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {}
    for u, v in edges:
        for w in adj[u] & adj[v]:
            if u < v < w:  # each triangle once, via its sorted edge pair
                for n in (u, v, w):
                    counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangle_count_matches_brute_force(spark, sf_dir):
    from codegraph_spark.queries.graph_analytics import (
        _cooccurrence_edges,
        graph_triangle_count,
    )

    edges = [(r.p1, r.p2) for r in _cooccurrence_edges(spark, sf_dir).collect()]
    assert edges, "co-occurrence graph must be non-vacuous"
    expected = _brute_force_triangles(edges)
    top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:15]

    got = [(r.part, r.n_triangles) for r in graph_triangle_count(spark, sf_dir).collect()]
    assert got == top
    assert got[0][1] > 0, "top node must sit in at least one triangle"


def test_cooccurrence_edges_canonical_and_thresholded(spark, sf_dir):
    from codegraph_spark.queries.graph_analytics import _cooccurrence_edges

    rows = _cooccurrence_edges(spark, sf_dir).collect()
    pairs = [(r.p1, r.p2) for r in rows]
    assert all(p1 < p2 for p1, p2 in pairs), "edges must be canonicalized p1 < p2"
    assert len(set(pairs)) == len(pairs), "edge list must be deduplicated"


def test_degree_profile_accounts_for_every_edge(spark, sf_dir):
    """sum(degree * n_nodes) over the profile == total edge count — the
    histogram must be a lossless rollup."""
    from pyspark.sql import functions as F

    from codegraph_spark.graph import PropertyGraph
    from codegraph_spark.queries.graph_analytics import graph_degree_profile

    prof = graph_degree_profile(spark, sf_dir)
    total = prof.select(F.sum(F.col("degree") * F.col("n_nodes"))).collect()[0][0]
    g = PropertyGraph.from_tpch_recast(spark, sf_dir)
    assert total == g.edges.count()


def test_bm25_scores_are_sane(spark, sf_dir):
    from codegraph_spark.queries.retrieval import text_bm25_search

    rows = text_bm25_search(spark, sf_dir).collect()
    assert len(rows) == 10
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores), "only matching docs are scored"


def test_bm25_monotone_in_tf():
    """The saturation curve tf*(k1+1)/(tf+k1*norm) must be increasing in
    tf and bounded by k1+1 — pins the formula's shape independent of
    any engine."""
    k1, b = 1.2, 0.75
    norm = 1.0 - b + b * 1.0  # dl == avgdl
    vals = [tf * (k1 + 1) / (tf + k1 * norm) for tf in range(1, 20)]
    assert all(x < y for x, y in zip(vals, vals[1:]))
    assert vals[-1] < k1 + 1


def test_vocab_top_df_consistency(spark, sf_dir):
    """doc_freq <= coll_freq and doc_freq <= corpus size, for every
    term; ordering is (df desc, term)."""
    from codegraph_spark.queries.retrieval import vocab_top_df
    from codegraph_spark.sources.tables import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = vocab_top_df(spark, sf_dir).collect()
    assert rows
    assert all(r.doc_freq <= r.coll_freq and r.doc_freq <= n_docs for r in rows)
    keys = [(-r.doc_freq, r.term) for r in rows]
    assert keys == sorted(keys)


def test_jaccard_links_match_brute_force(spark, sf_dir):
    from codegraph_spark.queries.graph_analytics import (
        _cooccurrence_edges,
        graph_jaccard_links,
    )

    edges = [(r.p1, r.p2) for r in _cooccurrence_edges(spark, sf_dir).collect()]
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expected = []
    for u, v in edges:
        common = len(adj[u] & adj[v])
        union = len(adj[u]) + len(adj[v]) - common
        expected.append((u, v, common, int(common * 1000 / union)))
    expected.sort(key=lambda t: (-t[3], t[0], t[1]))

    got = [
        (r.p1, r.p2, r.n_common, r.jaccard_pm)
        for r in graph_jaccard_links(spark, sf_dir).collect()
    ]
    assert got == expected[:20]


def test_filter_funnel_monotone(spark, sf_dir):
    from codegraph_spark.queries.text import corpus_filter_funnel

    rows = sorted(corpus_filter_funnel(spark, sf_dir).collect(), key=lambda r: r.stage_no)
    ns = [r.n_docs for r in rows]
    assert ns == sorted(ns, reverse=True), "each filter stage only removes docs"
    assert rows[0].yield_pm == 1000
    assert ns[-1] > 0, "pipeline must not be vacuously empty"


def test_label_propagation_matches_reference_impl(spark, sf_dir):
    """Pure-Python synchronous min-tie LPA over the same edges must
    produce the same community-size profile."""
    from collections import Counter, defaultdict

    from codegraph_spark.queries.graph_analytics import (
        _LPA_ITERS,
        _cooccurrence_edges,
        graph_label_propagation,
    )

    edges = [(r.p1, r.p2) for r in _cooccurrence_edges(spark, sf_dir).collect()]
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    labels = {n: n for n in adj}
    for _ in range(_LPA_ITERS):
        new = {}
        for n in adj:
            votes = Counter(labels[m] for m in adj[n])
            votes[labels[n]] += 1
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    sizes = Counter(labels.values())
    expected = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:15]

    got = [(r.community, r.n_members) for r in graph_label_propagation(spark, sf_dir).collect()]
    assert got == expected
