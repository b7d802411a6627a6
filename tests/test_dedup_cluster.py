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
