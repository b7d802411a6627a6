"""Plan-quality invariants — the PLANS.md audit claims as enforced
tests, so a refactor that silently de-optimizes a query (drops a
pushed filter, turns a broadcast into a shuffle, introduces a
cartesian product) fails CI instead of surfacing in the next bench.

Checks run on the pre-execution plan string (`explain formatted`) at
sf0.001 — plan SHAPE, not timings, so they are host-noise-free.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest


def _plan(spark, sf_dir, name: str) -> str:
    from codegraph_spark.queries import collect

    queries, _ = collect()
    buf = io.StringIO()
    with redirect_stdout(buf):
        queries[name](spark, sf_dir).explain("formatted")
    return buf.getvalue()


#: queries whose plans legitimately contain a 1-row (or k-row) unkeyed
#: join — broadcast nested loop against a scalar aggregate / tiny
#: centroid set. CartesianProduct proper is still disallowed for them.
_UNKEYED_JOIN_OK = {
    "corpus_mix_summary",       # crossJoin(1-row total)
    "graph_pagerank",           # broadcast dangling-mass row
    "sim_ivf_label", "sim_ivf_kmeans", "sim_topk_bruteforce",  # broadcast k centroids / queries
    "sim_hard_negatives",       # broadcast FIXED anchor set (vec_id < 10)
    "sim_ivf_pq",               # broadcast m*k-row PQ codebook + shared
                                # coarse-quantizer seeding (k-row sides)
    "sim_pq_recall",            # same shared PQ/coarse artifacts
    "sim_lsh_recall",           # broadcast probe sample, BOUNDED by the
                                # corpus-adaptive stride (~1-2k rows at any n)
    "dedup_embedding_cosine",
    "dedup_semantic",           # broadcast k centroids (shared trained
                                # inverted file) + 1-row threshold scalars
    "corpus_split_semantic_leakage",  # same shared trained inverted file
    "corpus_temperature_mix",   # crossJoin(1-row integer weight totals)
    "corpus_token_budget_plan",  # crossJoin(1-row token/weight totals)
    "ev_kmv_overlap",           # sketch x sketch inequality join —
                                # BOTH sides are segment-count-sized
                                # (one 32-int64 sketch per day)
    "emb_alignment_audit",      # summary row = crossJoin chain of 1-row aggregates
    "corpus_dsir_sample",       # crossJoin(broadcast 1-row normalizer)
    "text_quality_classifier",  # crossJoin(broadcast 1-row vocab totals)
                                # into the vocab-dimension weight build
    "web_domain_curation",      # same nbq_model weight build (1-row
                                # totals into the vocab dimension)
    "text_classifier_calibration",  # same nbq_model weight build
    "web_crawl_plan",           # distributed_row_number offset table —
                                # broadcast (log2 buckets × n_sub) rows
    "emb_pca_power",            # broadcast d^2-row Gram grid + 64-row
                                # iterate/Rayleigh scalars
    "vocab_bpe_merges",         # per-round crossJoin(broadcast 1-row
                                # winning pair)
    "vocab_bpe_compression_curve",  # same per-round 1-row winners +
                                # crossJoin(1-row character baseline)
    "j8_mentions_topk",         # substring θ-join — non-equi BY SEMANTICS,
                                # small name-dim side broadcast (docs scan in place)
    "join_bloom_semi",          # crossJoin(1-row bloom bitmap)
    "graph_scc",                # crossJoin(broadcast 1-row flow-total
                                # aggregate) for the above-mean edge
                                # filter — previously hidden behind the
                                # BSP peel's eager checkpoints, visible
                                # in the r12 single-task path's plan
    "text_bm25_search",         # crossJoin(1-row corpus stats)
    "ev_range_join_tiers",      # band join against broadcast 3-row tier dim
    "stream_funnel",            # memory-sink table; tiny final stack/agg
    "corpus_filter_funnel",     # 1-row conditional-sum aggregate + stack
    "corpus_padding_waste",     # crossJoin(1-row id bounds / 1-row total)
                                # in distributed_row_number
    "corpus_quality_calibration",  # same 1-row bounds/total broadcasts
    "corpus_ccnet_buckets",     # same 1-row bounds broadcast (partitioned
                                # distributed_row_number)
}


def _query_names():
    from codegraph_spark.queries import collect

    queries, _ = collect()
    return sorted(queries)


@pytest.mark.parametrize("name", _query_names())
def test_no_cartesian_product(spark, sf_dir, name, capfd):
    """No registered query may plan a CartesianProduct — unkeyed joins
    must be broadcast (BroadcastNestedLoopJoin over a 1-row/k-row side
    is the sanctioned shape and stays O(n) at scale).

    Also asserts the analyzer logged no "Constructing trivially true
    equals predicate" while the query was built: that warning means a
    self-join's equality predicate compared a column with ITSELF (both
    sides resolving to one attribute), so the condition is not the one
    the author wrote — correct only by accident (r10 What's-wrong 1,
    the SemDeDup cluster==cluster joins). The warning leaves no trace
    in the final plan, so it is caught here at the log layer (capfd
    sees the JVM's stderr appender)."""
    plan = _plan(spark, sf_dir, name)
    jvm_err = capfd.readouterr().err
    assert "trivially true" not in jvm_err, (
        f"{name}: analyzer built a trivially-true join predicate — a "
        f"self-join condition resolved both sides to the same attribute; "
        f"alias the two sides and join on qualified columns"
    )
    assert "CartesianProduct" not in plan, (
        f"{name}: CartesianProduct in plan — an unkeyed join lost its "
        f"broadcast side"
    )
    if name not in _UNKEYED_JOIN_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected BroadcastNestedLoopJoin — a join lost "
            f"its equi-condition (add the query to _UNKEYED_JOIN_OK only "
            f"if the unkeyed side is a scalar/tiny aggregate)"
        )


@pytest.mark.parametrize(
    "name",
    ["q1_pricing_summary", "q3_shipping_priority", "p2_point_filter"],
)
def test_filters_reach_parquet_scan(spark, sf_dir, name):
    """Relational queries scan raw parquet — their predicates must be
    pushed into the scan (PushedFilters non-empty), or at 100 TB the
    scan reads the whole table to apply a row filter."""
    plan = _plan(spark, sf_dir, name)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any(p.strip() for p in pushed), f"{name}: no pushed filters\n{plan}"


#: queries whose plans legitimately contain an ORDERED UNPARTITIONED
#: window — permitted ONLY over histogram-bounded intermediates (the
#: window input is an aggregate whose row count is bounded by distinct
#: keys / bucket count, not by corpus size). Anything else must go
#: through operators/ranks.distributed_row_number or a histogram
#: reduction (the round-8 verdict's two corpus-sized global rank
#: windows are exactly what this gate exists to prevent).
_GLOBAL_WINDOW_OK = {
    "corpus_pack_shards": "bucket-offset cumsum over _PACK_BUCKETS rows",
    "corpus_pack_tokens": "same two-level prefix sum, bucket-count rows",
    "corpus_padding_waste": "distributed_row_number offset cumsums over "
                            "(distinct token counts | n_sub) histogram rows",
    "corpus_quality_calibration": "distributed_row_number key-offset "
                                  "cumsum over distinct quality cents",
    "ev_funnel": "lag over funnel STEPS (one row per step)",
    "web_crawl_plan": "distributed_row_number key-offset cumsum over "
                      "the ~60 log2-bucket histogram rows",
}


@pytest.mark.parametrize("name", _query_names())
def test_no_corpus_sized_global_window(spark, sf_dir, name):
    """No registered query may plan an ordered unpartitioned Window
    unless pinned here as histogram-bounded — a global rank/cumsum
    window moves its whole input through ONE task (the WindowExec `No
    Partition Defined` warning), which at 100 TB is a driver-killer."""
    from codegraph_spark.doctor import unpartitioned_windows

    plan = _plan(spark, sf_dir, name)
    hits = unpartitioned_windows(plan)
    if name in _GLOBAL_WINDOW_OK:
        return  # pinned: bounded input by construction (see dict value)
    assert not hits, (
        f"{name}: ordered unpartitioned Window in plan — use "
        f"operators/ranks.distributed_row_number or reduce to a "
        f"histogram first (add to _GLOBAL_WINDOW_OK only if the window "
        f"input is histogram-bounded): {hits[0][:200]}"
    )


def test_global_window_detector_red_on_regression(spark):
    """The detector itself must flag a corpus-shaped global rank window
    (regression fixture for the gate), stay quiet on partitioned and
    partition-only windows, and catch the empty-partition 3-list form."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from codegraph_spark.doctor import diagnose, plan_text, unpartitioned_windows

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("k")
    )
    bad = df.withColumn("rn", F.row_number().over(Window.orderBy("doc_id")))
    assert len(unpartitioned_windows(plan_text(bad))) == 1
    assert any(f.check == "global-window" and f.severity == "error"
               for f in diagnose(bad))
    good = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("doc_id"))
    )
    assert not unpartitioned_windows(plan_text(good))
    part_only = df.withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("k")))
    assert not unpartitioned_windows(plan_text(part_only))
    empty_part = df.withColumn(
        "s",
        F.sum("k").over(
            Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert unpartitioned_windows(plan_text(empty_part))


@pytest.mark.parametrize("name", ["j1_find_definition", "sim_topk_bruteforce"])
def test_seed_side_broadcast(spark, sf_dir, name):
    """Point-lookup / tiny-query-set joins must broadcast the small
    side — the big table scans in place with zero shuffle."""
    plan = _plan(spark, sf_dir, name)
    assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan, (
        f"{name}: no broadcast in plan — the seed side is being shuffled"
    )
