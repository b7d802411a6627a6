"""Loud guard on the shingle-detector df cap (r5 ADVICE, dedup.py).

The df-capped candidate stage in dedup_ngram_jaccard /
dedup_containment is exact as long as every qualifying pair shares at
least one shingle with rep-level document frequency ≤ _CONTAIN_DF_CUTOFF
(pairs whose shared shingles are ALL hotter than the cap are counted
exactly by the hot-completion stage ONLY if they also share a rare
shingle; a pair sharing exclusively hot shingles is the known-miss
condition, recorded in COVERAGE.md). At the gate corpora the max
rep-level df sits far under the cap, so the miss condition is vacuous —
this test asserts that fact LOUDLY instead of leaving it as a comment,
so corpus drift past the cap fails the suite rather than silently
diverging from the uncapped oracle."""

from __future__ import annotations

import os

import pytest

from tests.conftest import TEST_SF_DIR

#: the driver's correctness-gate scale; skipped when absent
GATE_SF_DIR = "/root/testdata/sf0.01"

_DIRS = [TEST_SF_DIR] + ([GATE_SF_DIR] if os.path.isdir(GATE_SF_DIR) else [])


@pytest.mark.parametrize("sf_dir", _DIRS)
def test_rep_shingle_df_stays_under_candidate_cap(spark, sf_dir):
    from pyspark.sql import functions as F

    from codegraph_spark.queries import dedup

    sh = dedup._rep_shingles(spark, sf_dir)
    mx = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df"))
        .first()[0]
    )
    assert mx is not None, "rep shingle table is empty — fixture broken"
    assert mx <= dedup._CONTAIN_DF_CUTOFF, (
        f"max rep-level shingle df {mx} exceeds the candidate cap "
        f"{dedup._CONTAIN_DF_CUTOFF} at {sf_dir}: the df-capped candidate "
        "stage can now miss pairs whose shared shingles are all hot — "
        "re-derive the cap or add an all-hot candidate band (see "
        "COVERAGE.md known-miss note)"
    )
