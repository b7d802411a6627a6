"""vocab_bpe_merges semantics on a hand-built corpus: frequency-ranked
merge selection, overlapping-occurrence counting, and the leftmost-
non-overlapping parity rewrite (only observable when lhs = rhs)."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def bpe_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_bpe"))
    # "aaaa" twice: pair (a,a) counts 3 overlapping occurrences per
    # word occurrence = 6 total; after merging, each "aaaa" must become
    # [aa, aa] (positions 0 and 2 — the parity rule), so round 2 sees
    # (aa,aa) with count 2.
    rows = [(1, "aaaa xy"), (2, "aaaa xy"), (3, "xy zq")]
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .selectExpr("doc_id", "text", "'en' AS lang", "'unit' AS source",
                    "CAST(length(text) AS LONG) AS n_chars")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "documents.parquet"))
    )
    return d


def test_bpe_merge_rounds_follow_counts_and_parity(spark, bpe_dir):
    from codegraph_spark.queries.retrieval import vocab_bpe_merges

    rows = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["n"])
        for r in vocab_bpe_merges(spark, bpe_dir).collect()
    ]
    # round 1: (a,a) with 3 overlapping pairs x 2 occurrences = 6,
    # beating (x,y) at 3 and (z,q) at 1
    assert rows[0] == (1, "a", "a", "aa", 6)
    # round 2: "aaaa" is now [aa, aa] -> (aa,aa) count 2; (x,y) at 3
    # still wins round 2, THEN (aa,aa) wins round 3 (tie at 2 with
    # nothing: (z,q)=1), proving the parity rewrite produced [aa,aa]
    # and not [aa,a,a] or [a,aa,a]
    assert rows[1] == (2, "x", "y", "xy", 3)
    assert rows[2] == (3, "aa", "aa", "aaaa", 2)
    assert rows[3][0] == 4 and rows[3] == (4, "z", "q", "zq", 1)
