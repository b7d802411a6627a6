"""Pathological-skew correctness: the salted/hot-key paths must produce
EXACTLY the oracle's answer when the data is maximally skewed —
half the corpus one identical document (one giant dup cluster, every
shingle corpus-hot), every event on a single user (one giant state
partition), half the vectors identical (one hot LSH bucket).

This drives the code paths the uniform driver corpus never exercises:
`salted_self_pairs`' hot branch, the df-cap completion joins, single-
partition stateful streaming, and tie-breaking in bucketed similarity.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.conftest import TEST_SF_DIR
from tests.test_oracle_parity import _normalize

_CONST_TEXT = (
    "the quick brown fox jumps over the lazy dog while rain falls on "
    "rooftops and the query engine keeps running its merge window"
)

#: skew-sensitive queries (pair generation, per-user state, buckets)
SKEW_SET = [
    "dedup_exact",
    "dedup_exact_substr",
    "dedup_paragraph",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_minhash_lsh",
    "dedup_minhash_est",
    "corpus_dedup_rate",
    "dedup_simhash_hamming",
    "dedup_edit_distance",
    "dedup_cluster_cc",
    "text_contamination",
    "text_dup_ngram_coverage",
    "text_cross_doc_coverage",
    "corpus_temperature_mix",
    "vocab_bpe_merges",
    "corpus_split_leakage",
    "text_lm_score",
    "sim_lsh_cosine",
    "dedup_semantic",
    "dedup_semantic_adaptive",
    "text_html_extract",
    "text_html_extract_dirty",
    "web_warc_extract",
    "web_wet_roundtrip",
    "web_warc_media_door",
    "web_boilerplate_freq",
    "dedup_incremental",
    "web_url_canonical",
    "web_url_dedup",
    "web_charset_audit",
    "web_robots_gate",
    "stream_robots_gate",
    "stream_url_dedup",
    "text_quality_classifier",
    "text_classifier_calibration",
    "web_crawl_plan",
    "web_sitemap_coverage",
    "web_domain_curation",
    "web_crawl_delta",
    "stream_html_extract_dirty",
    "web_warc_point_lookup",
    "text_html_boilerplate_audit",
    "web_extract_yield",
    "stream_html_extract",
    "sim_ivf_pq",
    "sim_lsh_recall",
    "emb_quantize_int8",
    "emb_alignment_audit",
    "ev_asof_join",
    "ev_funnel",
    "ev_retention",
    "ev_inactive_gap",
    "ev_dau_wau",
    "a8_first_event_per_user",
    "corpus_pack_shards",
    "text_cdc_chunks",
    "mm_audio_fingerprint",
    "corpus_dsir_sample",
    "vocab_bpe_encode",
    "ev_transition_matrix",
    "stream_transition_matrix",
    "corpus_source_audit",
    "corpus_dedup_keep_best",
    "sim_hard_negatives",
    "ev_cusum_drift",
    "ev_quantiles_sketch",
    "ev_outliers_mad",
    "corpus_ccnet_buckets",
    "stream_cusum_drift",
    "corpus_padding_waste",
    "text_tfidf_keywords",
    "corpus_quality_calibration",
    "stream_dedup_minhash",
    "text_contamination_bloom",
    # r8: the out-of-order variants' OWN worst cases (r7 VERDICT item
    # 7) — an all-duplicate corpus routes every band to ONE bucket
    # state key (single hot shard for the CRDT-min dedup), and the
    # single-user event stream concentrates the entire reorder buffer
    # in one key (whose event-time span the kernel now asserts ≤
    # horizon_us per batch)
    "stream_dedup_minhash_ooo",
    "stream_transitions_ooo",
]


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from codegraph_spark.sources.tables import load_table

    d = str(tmp_path_factory.mktemp("sf_skew"))
    # relational tables pass through (graph queries need integrity)
    import shutil

    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        shutil.copy(os.path.join(TEST_SF_DIR, f"{t}.parquet"), os.path.join(d, f"{t}.parquet"))

    docs = load_table(spark, TEST_SF_DIR, "documents").limit(200)
    skewed_text = F.when(F.col("doc_id") % 2 == 0, F.lit(_CONST_TEXT)).otherwise(F.col("text"))
    # ONE HOT DOMAIN (r10 VERDICT item 3): 3/4 of the corpus lands on a
    # single source → the web_url_* family's canonical-groupBy and
    # per-domain rollup run with one corpus-hot domain key
    skewed_source = F.when(
        F.col("doc_id") % 4 != 3, F.lit("srchot")
    ).otherwise(F.col("source"))
    (
        docs.select(
            "doc_id",
            skewed_text.alias("text"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("en")).otherwise(F.col("lang")).alias("lang"),
            skewed_source.alias("source"),
            F.length(skewed_text).cast("long").alias("n_chars"),
        )
        .coalesce(1).write.mode("overwrite")
        .parquet(os.path.join(d, "documents.parquet"))
    )
    emb = load_table(spark, TEST_SF_DIR, "embeddings").limit(200)
    first_vec = emb.orderBy("vec_id").first()["embedding"]
    (
        emb.select(
            "vec_id",
            F.when(F.col("vec_id") % 2 == 0, F.lit(first_vec).cast("array<float>"))
            .otherwise(F.col("embedding")).alias("embedding"),
            "label",
        )
        .coalesce(1).write.mode("overwrite")
        .parquet(os.path.join(d, "embeddings.parquet"))
    )
    ev = load_table(spark, TEST_SF_DIR, "events")
    (
        ev.select(
            "event_id", "ts",
            F.lit(1).cast("long").alias("user_id"),  # ONE hot user
            "event_type", "value", "props",
        )
        .coalesce(1).write.mode("overwrite")
        .parquet(os.path.join(d, "events.parquet"))
    )
    return d


@pytest.fixture(scope="module")
def skew_duck(skew_dir):
    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        path = os.path.join(skew_dir, f"{name}.parquet")
        glob = path if os.path.isfile(path) else path + "/*.parquet"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{glob}')")
    yield con
    con.close()


@pytest.mark.parametrize("name", SKEW_SET)
def test_skewed_corpus_matches_oracle(spark, skew_dir, skew_duck, name):
    from codegraph_spark.queries import collect

    queries, oracles = collect()
    spark_pd = queries[name](spark, skew_dir).toPandas()
    duck_pd = skew_duck.execute(oracles[name]).fetchdf()
    cols = sorted(spark_pd.columns)
    assert cols == sorted(duck_pd.columns)
    assert _normalize(spark_pd, cols) == _normalize(duck_pd, cols)


# --- prefix-skew: the PassJoin worst case (r5 VERDICT item 6) ----------------
#
# The identical-docs fixture above collapses under exact-dedup before the
# shingle detectors run, and gives edit-distance whole-prefix equality.
# The PassJoin candidate stage's OWN worst case is different: half the
# corpus sharing one identical 60-char PREFIX with divergent suffixes —
# every (lang, length-bucket, segment-gram) key becomes corpus-hot
# (the index side's 9 segments and the probe side's substrings all
# collide across the group) while documents stay pairwise distinct, so
# nothing collapses ahead of the join. Exactness under that load is
# what this fixture pins.

_CONST_PREFIX = (
    "shared boilerplate header that every generated document repeats "
    "verbatim before diverging "
)  # > _LEV_PREFIX chars, so skewed docs agree on the whole compared prefix

#: detectors whose candidate stage is content-keyed (gram/shingle joins)
PREFIX_SKEW_SET = [
    "dedup_edit_distance",
    "dedup_minhash_est",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_minhash_lsh",
]


@pytest.fixture(scope="module")
def prefix_skew_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from codegraph_spark.sources.tables import load_table

    d = str(tmp_path_factory.mktemp("sf_prefix_skew"))
    docs = load_table(spark, TEST_SF_DIR, "documents").limit(200)
    skewed = F.when(
        F.col("doc_id") % 2 == 0, F.concat(F.lit(_CONST_PREFIX), F.col("text"))
    ).otherwise(F.col("text"))
    (
        docs.select(
            "doc_id",
            skewed.alias("text"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("en"))
            .otherwise(F.col("lang")).alias("lang"),
            "source",
            F.length(skewed).cast("long").alias("n_chars"),
        )
        .coalesce(1).write.mode("overwrite")
        .parquet(os.path.join(d, "documents.parquet"))
    )
    return d


@pytest.fixture(scope="module")
def prefix_skew_duck(prefix_skew_dir):
    con = duckdb.connect()
    path = os.path.join(prefix_skew_dir, "documents.parquet")
    glob = path if os.path.isfile(path) else path + "/*.parquet"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    yield con
    con.close()


@pytest.mark.parametrize("name", PREFIX_SKEW_SET)
def test_prefix_skewed_corpus_matches_oracle(
    spark, prefix_skew_dir, prefix_skew_duck, name
):
    from codegraph_spark.queries import collect

    queries, oracles = collect()
    spark_pd = queries[name](spark, prefix_skew_dir).toPandas()
    duck_pd = prefix_skew_duck.execute(oracles[name]).fetchdf()
    cols = sorted(spark_pd.columns)
    assert cols == sorted(duck_pd.columns)
    assert _normalize(spark_pd, cols) == _normalize(duck_pd, cols)
    if name == "dedup_edit_distance":
        # the skew group must actually produce matches (prefix-equal
        # pairs within a shared length bucket) or the fixture is vacuous
        assert len(spark_pd) > 0
