"""Round-9 second-wave pins: prototypicality pruning invariants, the
token-budget planner's conservation laws, and hopping-window coverage
(each event in exactly 4 overlapping windows). Oracle parity for the
same queries is covered registry-wide by test_oracle_parity.py; these
pin the SEMANTIC invariants a hash match alone would not explain."""

from __future__ import annotations

from pyspark.sql import functions as F

from codegraph_spark.queries.events import ev_hopping_agg
from codegraph_spark.queries.similarity import (
    _PROTO_PRUNE_PCT,
    sim_prototypicality_prune,
)
from codegraph_spark.queries.text import (
    _BUDGET_X,
    _EPOCH_CAP_MILLI,
    corpus_token_budget_plan,
)
from codegraph_spark.sources.tables import load_table


def test_prototypicality_prunes_exact_fraction(spark, sf_dir):
    rows = sim_prototypicality_prune(spark, sf_dir).collect()
    assert rows, "no clusters"
    for r in rows:
        assert r.n_pruned == r.n_vecs * _PROTO_PRUNE_PCT // 100
        # pruned = the MOST prototypical: every pruned score is at or
        # above the best kept score (desc rank boundary)
        assert r.pruned_max_m4 >= r.kept_max_m4
        assert r.kept_min_m4 <= r.kept_max_m4


def test_token_budget_conservation(spark, sf_dir):
    plan = corpus_token_budget_plan(spark, sf_dir)
    rows = plan.collect()
    docs = load_table(spark, sf_dir, "documents")
    total_tok = docs.select(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("t")
    ).collect()[0].t
    budget = _BUDGET_X * total_tok
    allocated = sum(r.alloc_tokens for r in rows)
    freed = sum(r.freed_tokens for r in rows)
    # raw allocations never exceed the budget (integer floor division),
    # and what the caps free is exactly raw - final
    assert allocated + freed <= budget
    assert budget - (allocated + freed) < len(rows) * 2  # floor slack
    for r in rows:
        assert r.epochs_milli <= _EPOCH_CAP_MILLI
        assert (r.freed_tokens > 0) == bool(r.capped)


def test_ppjoin_identical_to_posting_join(spark, sf_dir):
    """The PPJoin candidate generator must reproduce the df-capped
    posting join's output EXACTLY — two independent candidate
    strategies, one semantics (the o1_search_indexed discipline)."""
    from codegraph_spark.queries.dedup import (
        dedup_jaccard_ppjoin,
        dedup_ngram_jaccard,
    )

    pp = sorted(map(tuple, dedup_jaccard_ppjoin(spark, sf_dir).collect()))
    pj = sorted(map(tuple, dedup_ngram_jaccard(spark, sf_dir).collect()))
    assert pp == pj


def test_hll_registers_merge_by_max(spark, sf_dir):
    """The HLL merge law: registers over any partition of the input,
    merged cell-wise by MAX, equal the whole-input registers — the
    property that makes the streaming twin ≡ the batch sketch."""
    from codegraph_spark.queries.events import hll_register_rows

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    whole = {
        (r.event_type, r.bucket): r.reg
        for r in hll_register_rows(ev)
        .groupBy("event_type", "bucket").agg(F.max("reg").alias("reg"))
        .collect()
    }
    lo = hll_register_rows(ev.filter(F.col("user_id") % 2 == 0))
    hi = hll_register_rows(ev.filter(F.col("user_id") % 2 == 1))
    merged = {
        (r.event_type, r.bucket): r.reg
        for r in lo.unionByName(hi)
        .groupBy("event_type", "bucket").agg(F.max("reg").alias("reg"))
        .collect()
    }
    assert merged == whole and whole


def test_hll_duplicate_insensitive(spark, sf_dir):
    """Feeding each event twice must not move a single register —
    the property that lets the streaming twin skip dropDuplicates."""
    from codegraph_spark.queries.events import hll_register_rows

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    once = sorted(
        map(tuple, hll_register_rows(ev)
            .groupBy("event_type", "bucket").agg(F.max("reg").alias("reg"))
            .collect())
    )
    twice = sorted(
        map(tuple, hll_register_rows(ev.unionByName(ev))
            .groupBy("event_type", "bucket").agg(F.max("reg").alias("reg"))
            .collect())
    )
    assert once == twice


def test_hll_error_within_bound(spark, sf_dir):
    from codegraph_spark.queries.events import ev_hll_distinct

    rows = ev_hll_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 3 sigma of HLL's 1.04/sqrt(64) = 13% per-register-set error
        assert r.err_pm <= 390, (r.event_type, r.err_pm)


def test_multi_source_bfs_equals_per_seed_bfs(spark, sf_dir):
    from codegraph_spark.operators.traversal import (
        bfs_multi_source,
        bfs_reachable,
    )
    from codegraph_spark.queries.graph import _graph

    g = _graph(spark, sf_dir)
    calls = g.typed_edges("CALLS").select("src", "dst")
    members = (
        calls.select(F.col("src").alias("id"))
        .unionByName(calls.select(F.col("dst").alias("id")))
        .distinct()
    )
    seed_ids = [r.id for r in members.orderBy("id").limit(3).collect()]
    seeds = members.orderBy("id").limit(3).select(
        F.col("id").alias("seed"), "id"
    )
    got = {
        (r.seed, r.id, r.hops)
        for r in bfs_multi_source(calls, seeds, max_hops=4).collect()
    }
    want = set()
    for s in seed_ids:
        src = spark.createDataFrame([(s,)], "id string")
        for r in bfs_reachable(calls, src, max_hops=4).collect():
            want.add((s, r.id, r.hops))
    assert got == want and want  # identical, and non-vacuous


def test_hopping_windows_cover_each_event_four_times(spark, sf_dir):
    agg = ev_hopping_agg(spark, sf_dir)
    n_events = load_table(spark, sf_dir, "events").count()
    total = agg.select(F.sum("n").alias("s")).collect()[0].s
    assert total == 4 * n_events
    # window starts are 15-minute aligned
    bad = agg.filter(
        F.minute("win_start").cast("int") % 15 != 0
    ).count()
    assert bad == 0
