"""text_cross_doc_coverage semantics on a hand-built corpus: span
positions, island merging, and the cross-doc (not within-doc)
duplication requirement — the properties the random fixture can't pin
individually."""

from __future__ import annotations

import os

import pytest


def _doc(*parts: list[str]) -> str:
    toks: list[str] = []
    for p in parts:
        toks.extend(p)
    return " ".join(toks)


@pytest.fixture(scope="module")
def passage_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_passage"))
    shared = [f"p{i}" for i in range(12)]          # 12-token shared passage
    shared2 = [f"s{i}" for i in range(12)]
    shared3 = [f"t{i}" for i in range(12)]
    g = [f"g{i}" for i in range(8)]                # within-doc repeated 8-gram
    u = lambda tag, n: [f"{tag}{i}" for i in range(n)]  # noqa: E731
    rows = [
        # doc 1: passage embedded mid-doc (tokens 6..17 of 22)
        (1, _doc(u("a", 5), shared, u("b", 5))),
        # doc 2: same passage at the start
        (2, _doc(shared, u("c", 10))),
        # doc 3: an 8-gram repeated twice WITHIN one doc only — must
        # NOT count (cross-doc means >= 2 distinct documents)
        (3, _doc(u("d", 4), g, u("e", 4), g, u("f", 4))),
        # docs 4/5: two shared passages separated by > n unique tokens
        # — two disjoint islands per doc
        (4, _doc(shared2, u("h", 8), shared3)),
        (5, _doc(shared2, u("k", 8), shared3)),
    ]
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .selectExpr("doc_id", "text", "'en' AS lang", "'unit' AS source",
                    "CAST(length(text) AS LONG) AS n_chars")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "documents.parquet"))
    )
    return d


def test_planted_passages_cover_expected_spans(spark, passage_dir):
    from codegraph_spark.queries.text import text_cross_doc_coverage

    out = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"], r["covered_pm"])
        for r in text_cross_doc_coverage(spark, passage_dir).collect()
    }
    # docs 1/2 share one 12-token passage: exactly those 12 tokens are
    # covered regardless of where the passage sits in the doc
    assert out[1] == (22, 12, 545)
    assert out[2] == (22, 12, 545)
    # within-doc-only repetition is NOT cross-doc duplication
    assert out[3] == (28, 0, 0)
    # two shared passages with an 8+ token unique gap: two islands,
    # covered = 12 + 12, never bridged across the gap
    assert out[4] == (32, 24, 750)
    assert out[5] == (32, 24, 750)
