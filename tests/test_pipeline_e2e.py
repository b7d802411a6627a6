"""Capstone integration: the full training-data pipeline in one pass —
exact dedup → quality filter → stratified sample → token-budgeted
packing → WebDataset export → read-back audit. Every stage is a
component the engine ships individually (dedup.py, text.py, sinks.py,
sources/webdataset.py); this test pins that they COMPOSE: column
contracts line up, dedup survivors actually contain no duplicate
content, packing respects the sink's shard routing, and the exported
shards reload to exactly the curated corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import TEST_SF_DIR


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    from codegraph_spark.queries.dedup import dedup_exact
    from codegraph_spark.queries.text import (
        corpus_pack_shards,
        sample_stratified,
        text_quality_score,
    )
    from codegraph_spark.sinks import write_webdataset
    from codegraph_spark.sources.tables import load_table
    from codegraph_spark.sources.webdataset import read_webdataset

    docs = load_table(spark, TEST_SF_DIR, "documents")

    # 1. exact dedup: keep each content clique's representative
    keep = dedup_exact(spark, TEST_SF_DIR).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    deduped = docs.join(keep, "doc_id", "left_semi")

    # 2. quality floor (the quality score's corpus median keeps the
    # test corpus-agnostic)
    q = text_quality_score(spark, TEST_SF_DIR).select("doc_id", "quality")
    median = q.approxQuantile("quality", [0.5], 0.0)[0]
    quality_ids = q.filter(F.col("quality") >= median).select("doc_id")
    curated = deduped.join(quality_ids, "doc_id", "left_semi")

    # 3. stratified sample intersected with the curated set
    sampled_ids = sample_stratified(spark, TEST_SF_DIR).select("doc_id")
    final = curated.join(sampled_ids, "doc_id", "left_semi")

    # 4. token-budgeted packing, restricted to the surviving docs
    packing = corpus_pack_shards(spark, TEST_SF_DIR).select("doc_id", "shard_id")
    samples = (
        final.join(packing, "doc_id")
        .select(
            F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("key"),
            F.col("text").alias("txt"),
            F.col("lang").alias("cls"),
            F.col("shard_id"),
        )
    )

    # 5. export honoring the packing, 6. read back
    out = str(tmp_path_factory.mktemp("pipeline_wds"))
    manifest = write_webdataset(samples, out, shard_col="shard_id").collect()
    back = read_webdataset(spark, out)
    return {
        "docs": docs, "deduped": deduped, "final": final,
        "samples": samples, "manifest": manifest, "back": back,
    }


def test_pipeline_monotone_and_nonvacuous(pipeline):
    n_docs = pipeline["docs"].count()
    n_dedup = pipeline["deduped"].count()
    n_final = pipeline["final"].count()
    assert 0 < n_final <= n_dedup <= n_docs
    assert n_final < n_docs  # the funnel actually filtered something


def test_pipeline_survivors_have_unique_content(pipeline):
    survivors = pipeline["final"].select(F.md5(F.lower("text")).alias("h"))
    assert survivors.count() == survivors.distinct().count()


def test_pipeline_export_matches_curated_corpus(pipeline):
    n_final = pipeline["final"].count()
    assert sum(r.n_samples for r in pipeline["manifest"]) == n_final
    back = pipeline["back"]
    assert back.count() == n_final
    # keys round-trip exactly
    want = {
        r.key for r in pipeline["samples"].select("key").collect()
    }
    got = {r.key for r in back.select("key").collect()}
    assert got == want
    # spot-check one payload against the source text
    one = back.orderBy("key").first()
    src = (
        pipeline["samples"].filter(F.col("key") == one.key).first()
    )
    assert bytes(one.txt).decode() == src.txt
    assert bytes(one.cls).decode() == src.cls


def test_pipeline_shards_follow_packing(pipeline):
    # every manifest shard id must be one the packing produced
    packing_shards = {
        r.shard_id for r in pipeline["samples"].select("shard_id").distinct().collect()
    }
    assert {r.shard for r in pipeline["manifest"]} <= packing_shards
