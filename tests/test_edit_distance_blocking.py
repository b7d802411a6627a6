"""Adversarial pins for dedup_edit_distance's candidate generation:
the PassJoin-style segment prefilter must be LOSSLESS against the
brute-force dual-offset ground truth on inputs chosen to stress every
branch — short-band docs, bucket straddlers, edits placed on segment
boundaries, and shifted (insert/delete) near-dups."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F


def _corpus():
    """(doc_id, text, lang, source, n_chars) rows covering the branches:

    - 1/2: identical 60+ char prefixes (lev 0), same bucket
    - 3: one substitution INSIDE segment 0 of doc 1's text
    - 4: an 8-char burst replacing the middle (lev == threshold)
    - 5: 4 chars INSERTED early — every later segment shifts (probe
      substring coverage), lengths straddle a 25-char bucket boundary
      for the dual-offset path
    - 6/7: short-band docs (< 36 chars) within lev 8 of each other
    - 8: short doc within lev 8 of nothing (control)
    - 9/10: same prefix, different lang (must NOT pair)
    - 11: beyond threshold (lev > 8, control)
    """
    base = "the quick brown fox jumps over the lazy dog while rain falls on rooftops"
    rows = [
        (1, base, "en", "s", len(base)),
        (2, base + " extra tail", "en", "s", len(base) + 11),
        (3, "Xhe" + base[3:], "en", "s", len(base)),
        (4, base[:26] + "ZZZZZZZZ" + base[34:], "en", "s", len(base)),
        (5, base[:5] + "ABCD" + base[5:], "en", "s", len(base) + 4),
        (6, "tiny doc here now", "en", "s", 17),
        (7, "tiny doc here nwo", "en", "s", 17),
        (8, "completely different short", "en", "s", 26),
        (9, base, "fr", "s", len(base)),
        (10, base, "fr", "s", len(base)),
        (11, "".join(chr(97 + (i * 7) % 26) for i in range(70)), "en", "s", 70),
    ]
    return rows


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("lev_corpus")
    spark.createDataFrame(
        _corpus(), "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_prefilter_is_lossless_vs_bruteforce(spark, corpus_dir):
    from codegraph_spark.queries.dedup import _LEV_SQL, dedup_edit_distance

    got = {
        (r["doc_a"], r["doc_b"], r["lev"])
        for r in dedup_edit_distance(spark, corpus_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(corpus_dir, 'documents.parquet')}/*.parquet')"
    )
    want = {tuple(r) for r in con.execute(_LEV_SQL).fetchall()}
    assert got == want


def test_expected_pairs_present(spark, corpus_dir):
    from codegraph_spark.queries.dedup import dedup_edit_distance

    pairs = {
        (r["doc_a"], r["doc_b"]): r["lev"]
        for r in dedup_edit_distance(spark, corpus_dir).collect()
    }
    assert pairs[(1, 3)] == 1          # substitution inside segment 0
    assert pairs[(1, 4)] == 8          # exactly at the threshold
    # insertion shifts all segments: 4 inserts + 4 tail chars pushed
    # out of the 60-char window = 8 edits on the prefix
    assert pairs[(1, 5)] == 8
    assert pairs[(6, 7)] == 2          # short band (transposition = 2 edits)
    assert pairs[(9, 10)] == 0         # same-lang twin pairs...
    assert (1, 9) not in pairs         # ...but cross-lang never pairs
    assert all(a != 11 and b != 11 for (a, b) in pairs)  # control outlier


def test_dual_offset_catches_bucket_straddlers(spark, corpus_dir):
    """Docs 1 (73 chars, lb=2) and 5 (77 chars, lb=3) disagree on the
    primary bucket and MUST pair through the +13 offset bucket — the
    r4 implementation missed exactly this class."""
    from codegraph_spark.queries.dedup import dedup_edit_distance

    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    lbs = {
        r["doc_id"]: (r["n_chars"] // 25, (r["n_chars"] + 13) // 25)
        for r in docs.collect()
    }
    assert lbs[1][0] != lbs[5][0] and lbs[1][1] == lbs[5][1]
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_edit_distance(spark, corpus_dir).collect()
    }
    assert (1, 5) in pairs
