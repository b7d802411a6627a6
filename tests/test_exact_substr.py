"""Span-merge semantics of dedup_exact_substr (Lee et al. 2021 shape):
hand-computed maximal duplicated spans on a constructed corpus —
cross-doc overlap extension, within-doc repeats, adjacent-span merge,
and the sub-window blind spot (docs shorter than W emit nothing)."""

from __future__ import annotations

import os
import tempfile

import pytest


@pytest.fixture(scope="module")
def span_dir(spark):
    # doc1/doc2 share the overlapping windows "a b c d e" + "b c d e f"
    # (span extends to 6 tokens on each side); doc3 repeats a 6-token
    # phrase within itself (its two duplicated runs are ADJACENT after
    # merging, so they collapse to one 12-token span); doc4 is shorter
    # than W (invisible); doc5 shares only "b c d e f" (an exactly
    # W-sized span).
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j", "s1"),
            (2, "x a b c d e f y z w q", "s1"),
            (3, "p q r s t u p q r s t u v", "s1"),
            (4, "one two three four", "s2"),
            (5, "m n o b c d e f q r", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    d = tempfile.mkdtemp(prefix="exact_substr_")
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_hand_computed_spans(spark, span_dir):
    from codegraph_spark.queries.dedup import dedup_exact_substr

    rows = {r["source"]: r.asDict() for r in dedup_exact_substr(spark, span_dir).collect()}
    assert rows["s1"] == {
        "source": "s1",
        "n_docs": 3,
        "docs_with_dups": 3,
        "total_tokens": 34,
        # doc1 [1,6] + doc2 [2,7] + doc3 [1,12] (adjacent merge)
        "dup_tokens": 24,
        "n_spans": 3,
        "dup_pm": 24 * 1000 // 34,
        "span_checksum": 1006 + 2006 + 1012,
    }
    assert rows["s2"] == {
        "source": "s2",
        "n_docs": 2,
        "docs_with_dups": 1,
        "total_tokens": 14,
        "dup_tokens": 5,  # doc5 [4,8]; doc4 is below window width
        "n_spans": 1,
        "dup_pm": 5 * 1000 // 14,
        "span_checksum": 4005,
    }
