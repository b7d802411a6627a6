"""Duplicate-cluster resolution: transitivity across candidate
generators. Doc A links to B by exact content hash, B links to C only
by order-insensitive token fingerprint — the cluster must still
collapse to one representative (min doc_id), which pairwise candidate
lists alone cannot express."""

from __future__ import annotations

import os
import tempfile

import pytest


@pytest.fixture(scope="module")
def chain_dir(spark):
    # B and C are word permutations (same fingerprint, different hash);
    # A and B are byte-identical (same hash). D is unrelated.
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),
            (3, "gamma beta alpha"),
            (4, "totally different words"),
        ],
        "doc_id long, text string",
    )
    d = tempfile.mkdtemp(prefix="dedup_cc_")
    docs.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_cluster_chains_across_generators(spark, chain_dir):
    from codegraph_spark.queries.dedup import dedup_cluster_cc

    rows = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in dedup_cluster_cc(spark, chain_dir).collect()
    }
    assert rows[1] == (1, True)
    assert rows[2] == (1, False)
    assert rows[3] == (1, False)  # linked only through doc 2's fingerprint
    assert rows[4] == (4, True)


def test_cluster_matches_duckdb_oracle_on_chain(spark, chain_dir):
    import duckdb

    from codegraph_spark.queries.dedup import _CLUSTER_SQL, dedup_cluster_cc

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{chain_dir}/documents.parquet/*.parquet')"
    )
    want = {tuple(r) for r in con.execute(_CLUSTER_SQL).fetchall()}
    got = {
        (r["doc_id"], r["cluster_id"], r["is_canonical"])
        for r in dedup_cluster_cc(spark, chain_dir).collect()
    }
    assert got == want


def test_embedding_cosine_finds_planted_duplicates(spark):
    """The planted-clone augmentation must surface every 40th vector as
    a (vec_id, vec_id+1_000_000) pair with cosine 1.0 — a zero-row green
    would mean the candidate join never ran (VERDICT r1 §wrong.4)."""
    from codegraph_spark.queries.dedup import dedup_embedding_cosine

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    pairs = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in dedup_embedding_cosine(spark, sf_dir).collect()
    }
    assert len(pairs) > 0
    expected = {(v, v + 1_000_000) for v in range(0, 500, 40)}
    assert expected <= set(pairs)
    assert all(abs(c - 1.0) < 1e-9 for c in pairs.values())
