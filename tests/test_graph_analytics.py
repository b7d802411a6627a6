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


def _python_kcore(edges, k=3):
    """Reference fixpoint peel: surviving node -> in-core degree."""
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    while True:
        bad = [n for n, nb in adj.items() if len(nb) < k]
        if not bad:
            break
        for n in bad:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
        adj = {n: nb for n, nb in adj.items() if nb}
    return {n: len(nb) for n, nb in adj.items()}


def test_kcore_matches_python_fixpoint(spark, sf_dir):
    """graph_kcore output == a pure-Python peel-to-fixpoint over the
    same co-occurrence edges (top-15 by (core_deg desc, node))."""
    from codegraph_spark.queries.graph_analytics import (
        _KCORE_K,
        _cooccurrence_edges,
        graph_kcore,
    )

    edges = [(r.p1, r.p2) for r in _cooccurrence_edges(spark, sf_dir).collect()]
    ref = _python_kcore(edges, _KCORE_K)
    expected = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = [(r.node, r.core_deg) for r in graph_kcore(spark, sf_dir).collect()]
    assert got == expected


def test_kcore_converges_within_oracle_unroll(spark, sf_dir):
    """The generated CTE oracle unrolls _KCORE_ORACLE_ROUNDS rounds;
    the live fixpoint must converge within that on the gate corpus, or
    oracle and query could hash-diverge — fail loudly here instead."""
    from codegraph_spark.queries.graph_analytics import (
        _KCORE_K,
        _KCORE_ORACLE_ROUNDS,
        _kcore_peel,
        _symmetric_adjacency,
    )

    adj = _symmetric_adjacency(spark, sf_dir)
    _core, rounds = _kcore_peel(adj, _KCORE_K)
    assert rounds <= _KCORE_ORACLE_ROUNDS, (
        f"peel took {rounds} rounds, oracle unrolls only "
        f"{_KCORE_ORACLE_ROUNDS} — raise _KCORE_ORACLE_ROUNDS"
    )


@pytest.fixture(scope="module")
def deep_peel_dir(spark, tmp_path_factory):
    """Adversarial corpus whose 3-core peel cascades ONE node per round
    (r5 VERDICT item 2): a squared-path chain x_0..x_11 — x_i adjacent
    to x_i±1, x_i±2 — feeding a K5 clique. Only the free end is
    sub-degree, so each round exposes exactly the next chain node:
    12 peel rounds, true core = the K5. A fixed 8-round unroll leaves
    x_8..x_11 in the edge list, three of which still carry degree >= 3
    and would be reported as core. Encoded as a lineitem table: each
    desired co-occurrence edge becomes _SUPPORT orders holding exactly
    that part pair."""
    import pandas as pd

    from codegraph_spark.queries.graph_analytics import _SUPPORT

    clique = list(range(1, 6))
    chain = [100 + i for i in range(12)]
    edges = [(u, v) for u, v in combinations(clique, 2)]
    edges += [(chain[i], chain[i + 1]) for i in range(11)]
    edges += [(chain[i], chain[i + 2]) for i in range(10)]
    edges += [(chain[11], 1), (chain[11], 2), (chain[10], 1)]

    rows = []
    ok = 0
    for u, v in edges:
        for _ in range(_SUPPORT):
            ok += 1
            rows.append({"l_orderkey": ok, "l_partkey": u})
            rows.append({"l_orderkey": ok, "l_partkey": v})
    d = str(tmp_path_factory.mktemp("sf_deep_peel"))
    import os

    pd.DataFrame(rows).to_parquet(os.path.join(d, "lineitem.parquet"))
    return d


def test_kcore_deep_peel_needs_fixpoint_not_fixed_rounds(spark, deep_peel_dir):
    """The peel must run past 8 rounds and report EXACTLY the K5."""
    from codegraph_spark.queries.graph_analytics import (
        _KCORE_K,
        _kcore_peel,
        _symmetric_adjacency,
        graph_kcore,
    )

    adj = _symmetric_adjacency(spark, deep_peel_dir)
    _core, rounds = _kcore_peel(adj, _KCORE_K)
    assert rounds > 8, f"fixture too shallow: {rounds} rounds"

    got = [(r.node, r.core_deg) for r in graph_kcore(spark, deep_peel_dir).collect()]
    assert got == [(1, 4), (2, 4), (3, 4), (4, 4), (5, 4)]

    # and the old fixed-8 unroll is provably wrong on this graph: the
    # edge list after 8 rounds still contains chain nodes at degree >= 3
    from pyspark.sql import functions as F

    cur = adj
    for _ in range(8):
        deg = cur.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= _KCORE_K).select("node")
        cur = (
            cur.join(keep, "node", "left_semi")
            .join(keep.withColumnRenamed("node", "nbr"), "nbr", "left_semi")
            .localCheckpoint(eager=False)
        )
    stale = (
        cur.groupBy("node").agg(F.count(F.lit(1)).alias("core_deg"))
        .filter((F.col("core_deg") >= _KCORE_K) & (F.col("node") >= 100))
        .count()
    )
    assert stale > 0, "fixed-round build would have been accidentally right"
