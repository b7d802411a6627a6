"""Pure-Python reference parity for the trickiest round-6 kernels.

``vocab_bpe_merges``' run-parity rewrite claims to equal classic
leftmost-non-overlapping BPE merging; ``text_cross_doc_coverage``'s
gaps-and-islands claims to equal a brute-force position-set union.
Both are checked here against direct reference implementations on
adversarial corpora (tiny alphabets force overlapping matches and
dense gram collisions — exactly where a rewrite rule diverges), in
addition to the DuckDB oracle which shares the windowed formulation.
"""

from __future__ import annotations

import math
import os
import random

import pytest


# --- references ---------------------------------------------------------------
def _ref_bpe(words_freq: dict[str, int], rounds: int):
    """Sennrich-style BPE: overlapping pair counts, single-pair merge
    per round applied leftmost-non-overlapping, tie-break
    (count DESC, lhs, rhs)."""
    syms = {w: list(w) for w in words_freq}
    merges = []
    for r in range(1, rounds + 1):
        cnt: dict[tuple[str, str], int] = {}
        for w, f in words_freq.items():
            s = syms[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] = cnt.get((s[i], s[i + 1]), 0) + f
        if not cnt:
            break
        (a, b), n = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((r, a, b, a + b, n))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def _ref_cross_doc(docs: dict[int, str], n: int = 8):
    toks = {d: t.split(" ") for d, t in docs.items()}
    grams: dict[str, set[int]] = {}
    for d, tk in toks.items():
        for i in range(len(tk) - n + 1):
            grams.setdefault(" ".join(tk[i : i + n]), set()).add(d)
    out = {}
    for d, tk in toks.items():
        covered: set[int] = set()
        for i in range(len(tk) - n + 1):
            if len(grams[" ".join(tk[i : i + n])]) >= 2:
                covered |= set(range(i, i + n))
        out[d] = (
            len(tk),
            len(covered),
            math.floor(len(covered) * 1000 / len(tk)) if tk else 0,
        )
    return out


def _write_docs(spark, tmp_path_factory, tag: str, texts: list[str]) -> str:
    d = str(tmp_path_factory.mktemp(tag))
    rows = [(i + 1, t) for i, t in enumerate(texts)]
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .selectExpr("doc_id", "text", "'en' AS lang", "'unit' AS source",
                    "CAST(length(text) AS LONG) AS n_chars")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "documents.parquet"))
    )
    return d


def _seeded_texts(seed: int, n_docs: int, vocab: list[str], lo: int, hi: int):
    rng = random.Random(seed)
    return [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(lo, hi)))
        for _ in range(n_docs)
    ]


# --- BPE ----------------------------------------------------------------------
@pytest.mark.parametrize("seed", [7, 42])
def test_bpe_merges_equal_reference_on_adversarial_corpora(
    spark, tmp_path_factory, seed
):
    from codegraph_spark.queries.retrieval import _BPE_ROUNDS, vocab_bpe_merges

    # tiny alphabet words maximize overlapping same-symbol runs
    vocab = ["aaa", "aaaa", "ab", "abab", "aabb", "ba", "bbb", "abc"]
    texts = _seeded_texts(seed, 12, vocab, 3, 9) + ["aaaaa aaaaa ababab"]
    d = _write_docs(spark, tmp_path_factory, f"sf_bpe_ref{seed}", texts)

    words: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                words[w] = words.get(w, 0) + 1
    expected = _ref_bpe(words, _BPE_ROUNDS)

    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["n"])
        for r in vocab_bpe_merges(spark, d).collect()
    ]
    assert got == expected


# --- cross-doc coverage -------------------------------------------------------
@pytest.mark.parametrize("seed", [3, 99])
def test_cross_doc_coverage_equals_reference_on_dense_corpora(
    spark, tmp_path_factory, seed
):
    from codegraph_spark.queries.text import text_cross_doc_coverage

    # 4-word vocabulary at 8-gram width: heavy cross-doc gram sharing,
    # overlapping and adjacent spans everywhere
    vocab = ["x", "y", "z", "w"]
    texts = _seeded_texts(seed, 15, vocab, 5, 30)
    d = _write_docs(spark, tmp_path_factory, f"sf_xdoc_ref{seed}", texts)

    expected = _ref_cross_doc(dict(enumerate(texts, start=1)))
    got = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"], r["covered_pm"])
        for r in text_cross_doc_coverage(spark, d).collect()
    }
    assert got == expected
