"""Dump physical plans (`explain formatted`) of the headline queries to
PLANS.md — the plan-quality audit loop: check PushedFilters reach the
parquet scans, small dims are broadcast, and hot expressions stay inside
WholeStageCodegen. Run after changing any query or the ingest layout.

Usage: python tools/plan_audit.py [query ...]   (default: audit set)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIT = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "o6_top5_orders_per_customer",
    "o1_search_ranked",
    "j1_find_definition",
    "j3_three_hop_chain",
    "j6_service_deps",
    "dedup_minhash_lsh",
    "dedup_cluster_cc",
    "o1_search_indexed",
    "sim_topk_bruteforce",
    "sim_ivf_kmeans",
    "j4_impact_bfs",
    "text_contamination",
    "graph_pagerank",
    "text_repetition",
    "graph_triangle_count",
    "graph_jaccard_links",
    "text_bm25_search",
    "join_bloom_semi",
    "ev_funnel",
    "ev_asof_join",
    "ev_rollup",
    "o7_moving_avg",
    "p7_set_ops",
    "layout_zorder",
    "graph_label_propagation",
    "dedup_edit_distance",
    "dedup_containment",
    "sim_lsh_cosine",
    "ev_retention",
    "ev_inactive_gap",
    "text_lm_score",
    "text_dup_ngram_coverage",
    "vocab_oov_rate",
    "graph_kcore",
    "mm_audio_vad",
    "emb_quantize_int8",
    "sim_lsh_recall",
    "dedup_minhash_est",
    "text_length_profile",
    "dedup_semantic",
    "text_cross_doc_coverage",
    "vocab_bpe_merges",
    "corpus_temperature_mix",
    "emb_alignment_audit",
    "text_gopher_quality",
    "vocab_bpe_encode",
    "sim_ivf_pq",
    "corpus_dsir_sample",
    "emb_pca_power",
    "text_cdc_chunks",
    "corpus_split_semantic_leakage",
    "graph_call_cycles",
    "sim_pq_recall",
    "mm_audio_fingerprint",
    "corpus_pack_tokens",
    "ev_cms_topk",
    "stream_cms_topk",
    "vocab_bpe_compression_curve",
    "ev_kmv_distinct",
    "stream_kmv_distinct",
    "ev_transition_matrix",
    "corpus_source_audit",
    "corpus_dedup_keep_best",
    "graph_ppr",
    "sim_hard_negatives",
    "mm_phash",
    "stream_transition_matrix",
    "ev_cusum_drift",
    "ev_outliers_mad",
    "mm_audio_zcr",
    "corpus_ccnet_buckets",
    "stream_cusum_drift",
    "corpus_padding_waste",
    "graph_scc",
    "text_tfidf_keywords",
    "corpus_quality_calibration",
    "stream_dedup_minhash",
    "text_contamination_bloom",
    "sim_ivf_assign",
    "sim_ivf_two_level_gate",
    "sim_ivf_sampled_purity",
    "stream_dedup_minhash_ooo",
    "stream_transitions_ooo",
    "mm_png_roundtrip",
    "mm_jpeg_roundtrip",
    "mm_stored_media_meta",
    "stream_image_meta",
    "mm_mjpeg_scene_cut",
    "ev_quantiles_sketch",
    "stream_quantiles_sketch",
    "mm_wav_roundtrip",
    "mm_stored_wav_meta",
    "sim_prototypicality_prune",
    "corpus_token_budget_plan",
    "ev_hopping_agg",
    "stream_hopping_counts",
    "graph_harmonic_sampled",
    "ev_hll_distinct",
    "stream_hll_distinct",
    "dedup_jaccard_ppjoin",
    "ev_kmv_overlap",
    "dedup_semantic_adaptive",
    "text_html_extract",
    "text_html_boilerplate_audit",
    "mm_stored_mjpeg_scene_cut",
    "web_extract_yield",
    "text_html_extract_dirty",
    "web_warc_extract",
    "web_url_canonical",
    "web_url_dedup",
    "web_charset_audit",
    "stream_html_extract_dirty",
    "web_warc_point_lookup",
    "dedup_exact_substr",
    "dedup_paragraph",
    "web_robots_gate",
    "web_crawl_plan",
    "stream_url_dedup",
    "text_quality_classifier",
    "web_sitemap_coverage",
    "web_domain_curation",
    "text_classifier_calibration",
    "web_crawl_delta",
    "stream_robots_gate",
    "web_wet_roundtrip",
    "web_boilerplate_freq",
    "dedup_incremental",
    "stream_dedup_incremental",
    "web_warc_media_door",
]

SUMMARY_MARKS = ("PushedFilters", "Exchange", "BroadcastExchange", "codegen id")


def serving_counts(df) -> tuple[int, int]:
    """(shuffles, broadcasts) on the SERVING path: walk the physical
    plan tree via the JVM handles, descending through AQE wrapper nodes
    and STOPPING at InMemoryTableScan — work below a cache boundary ran
    once at ingest. A text-depth heuristic over ``explain`` output
    breaks on AQE's nested ``== Final Plan ==`` dumps inside cached
    relations (they dedent below the owning InMemoryRelation line and
    leak build-time exchanges into the serving count)."""
    root = df._jdf.queryExecution().executedPlan()
    shuffles = broadcasts = reused = 0
    stack = [root]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if name.startswith("InMemoryTableScan"):
            continue  # cache boundary
        if name.startswith("ReusedExchange"):
            reused += 1  # pointer to an already-counted stage: no new work
            continue
        if "Exchange" in name:
            if "Broadcast" in name:
                broadcasts += 1
            else:
                shuffles += 1
        # AQE wrappers hide their subtree from .children()
        for accessor in ("executedPlan", "initialPlan", "plan"):
            try:
                stack.append(getattr(node, accessor)())
                break
            except Exception:
                continue
        else:
            kids = node.children()
            for i in range(kids.size()):
                stack.append(kids.apply(i))
    return shuffles, broadcasts, reused


def serving_tree(plan: str) -> str:
    """The operator tree minus subtrees under InMemoryRelation — those
    run once at cache build (ingest), not per query; counting their
    exchanges would misstate the serving cost."""
    import re

    out: list[str] = []
    skip_deeper_than: int | None = None
    started = False
    for ln in plan.splitlines():
        if re.match(r"^\(\d+\) ", ln):  # start of the per-operator details
            break
        if "==" in ln:
            started = True
            continue
        if started and not ln.strip():
            break  # blank line ends the operator tree
        body = ln.replace(":", " ").replace("+-", "  ")
        depth = len(body) - len(body.lstrip())
        if skip_deeper_than is not None:
            if depth > skip_deeper_than:
                continue
            skip_deeper_than = None
        if "InMemoryRelation" in ln:
            skip_deeper_than = depth
        out.append(ln)
    return "\n".join(out)


def main() -> None:
    names = sys.argv[1:] or AUDIT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from codegraph_spark.queries import collect
    from codegraph_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    queries, _ = collect()

    out = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Generated by `tools/plan_audit.py` at `{sf_dir}`. Things to check",
        "per plan: (a) `PushedFilters`/`ReadSchema` on every parquet scan —",
        "filters and pruned columns reach the source; (b) dimension/seed",
        "sides show `BroadcastExchange` (never shuffle the big side);",
        "(c) `Exchange` count = the shuffles the algorithm actually needs.",
        "",
        "`serving:` counts exclude subtrees under `InMemoryRelation` —",
        "that work runs once at ingest (cache build), not per query.",
        "Plans are pre-execution `AdaptiveSparkPlan`s (AQE finalizes join",
        "strategies and codegen spans at runtime; whole-stage codegen",
        "annotations only appear on executed plans).",
        "",
    ]
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"skip unknown query {name}", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        # EXECUTE before explaining: AQE only finalizes join strategies,
        # dedupes identical shuffle stages (ReusedExchange), and
        # annotates codegen spans at runtime — a pre-execution plan
        # overstates the work (duplicate subtrees that run once).
        df.collect()  # not count(): count() runs a DIFFERENT QueryExecution
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # compact: keep the operator tree + scan/join detail lines, drop
        # the long per-operator Input/Output column dumps
        lines = []
        for ln in plan.splitlines():
            s = ln.strip()
            if s.startswith(("Input", "Output", "Arguments", "Result")) and len(s) > 160:
                lines.append(ln[: ln.index(s)] + s[:157] + "...")
            else:
                lines.append(ln)
        tree = "\n".join(lines)
        shuffles, broadcasts, reused = serving_counts(df)
        pushed = plan.count("PushedFilters: [") - plan.count("PushedFilters: []")
        out.append(f"## {name}")
        out.append("")
        out.append(
            f"serving (executed, AQE-final): shuffles={shuffles} "
            f"broadcasts={broadcasts} reused-stages={reused} "
            f"(whole plan incl. one-time cache build: pushed-filter scans={pushed})"
        )
        out.append("")
        out.append("```")
        out.append(tree.rstrip())
        out.append("```")
        out.append("")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(names)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
