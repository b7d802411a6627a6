"""Hand-computed CCNet paragraph-dedup semantics: cross-doc paragraph
drop (first doc_id wins), within-doc repeat drop (first pidx wins), a
doc whose EVERY paragraph is duplicated reassembles to the empty
string, and the cleaned-corpus hash-sum is exactly reproducible."""

from __future__ import annotations

import hashlib
import os
import tempfile

import pytest

_P = 2147483647


def _hnum(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % _P


_FILL4 = " ".join(f"w{i}" for i in range(12))  # doc4's first chunk
_FILL5 = " ".join(f"x{i}" for i in range(12))  # doc5's repeated chunk


@pytest.fixture(scope="module")
def para_dir(spark):
    docs = spark.createDataFrame(
        [
            (1, "aa bb cc", "s1"),                      # kept
            (2, "aa bb cc", "s1"),                      # fully duplicated
            (3, "aa bb cc dd", "s1"),                   # distinct para
            (4, _FILL4 + " aa bb cc", "s2"),            # tail chunk dup
            (5, _FILL5 + " " + _FILL5, "s2"),           # within-doc repeat
        ],
        "doc_id long, text string, source string",
    )
    d = tempfile.mkdtemp(prefix="dedup_para_")
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_hand_computed_paragraph_dedup(spark, para_dir):
    from codegraph_spark.queries.dedup import dedup_paragraph

    rows = {
        r["source"]: r.asDict() for r in dedup_paragraph(spark, para_dir).collect()
    }
    assert rows["s1"] == {
        "source": "s1",
        "n_docs": 3,
        "n_paras": 3,
        "n_kept": 2,
        "kept_pm": 2000 // 3,
        "clean_hashsum": (
            _hnum("aa bb cc") + _hnum("") + _hnum("aa bb cc dd")
        ),
    }
    assert rows["s2"] == {
        "source": "s2",
        "n_docs": 2,
        "n_paras": 4,
        "n_kept": 2,
        "kept_pm": 500,
        "clean_hashsum": _hnum(_FILL4) + _hnum(_FILL5),
    }
