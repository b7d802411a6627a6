"""Zero-row robustness: every registered query must run (and return an
empty result) against a schema-identical EMPTY dataset.

The class of bug this pins: driver-side peeks (`first()[0]` on None),
divisions by corpus aggregates, and train-on-data stages that assume at
least one row — r4's ADVICE caught exactly one of these in
`lsh_candidate_pairs`. A production pipeline meets empty partitions and
empty date-slices constantly; an operator that crashes on them is not
deployable."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import TEST_SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: queries whose SEMANTICS require data (trained/seeded models) and
#: declare a documented data-present precondition instead: they must
#: raise a CLEAR error (ValueError/IndexError surfaced by the seed
#: peek), never return wrong results. Everything else must yield [].
_REQUIRES_DATA: set[str] = set()

#: global aggregates / declared-step funnels: their CORRECT empty-input
#: output is a scaffolding row (count(*) of nothing = one 0 row; a
#: 3-step funnel reports 3 steps with no users) — require that they
#: run and report zero/NULL counts, not that they vanish.
#: dataset-INDEPENDENT gates: they synthesize their corpus from pure
#: arithmetic (the planted-cluster trainer/kernel gates need geometric
#: ground truth the random tables lack) and ignore sf_dir by design —
#: their output is identical on an empty dataset, so "runs and returns
#: its fixed gate rows" is the correct empty-input behavior.
_DATASET_INDEPENDENT = {
    "sim_ivf_assign",
    "sim_ivf_sampled_purity",
    "sim_ivf_two_level_gate",
}

_GLOBAL_ROWS = {
    "a6_stats_summary",
    "emb_alignment_audit",
    "vocab_bpe_compression_curve",
    "corpus_dedup_rate",
    "a7_health_counts",
    "corpus_filter_funnel",
    "ev_funnel",
    "q6_forecast_revenue",
    "stream_funnel",
    "web_extract_yield",
}


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        schema = pq.read_schema(os.path.join(TEST_SF_DIR, f"{t}.parquet"))
        schema = schema.remove_metadata()
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


def _all_queries():
    import __spark_entry__ as e

    return e.queries()


@pytest.mark.parametrize("name", sorted(_all_queries()))
def test_query_survives_empty_corpus(spark, empty_dir, name):
    fn = _all_queries()[name]
    if name in _REQUIRES_DATA:
        with pytest.raises(Exception):
            fn(spark, empty_dir).collect()
        return
    rows = fn(spark, empty_dir).collect()
    if name in _DATASET_INDEPENDENT:
        assert rows  # the fixed synthetic gate output, data or not
        return
    if name in _GLOBAL_ROWS:
        # scaffolding rows allowed; every COUNT cell must be 0 or NULL
        # (ordinal/label columns like step_no are exempt)
        import re

        count_col = re.compile(r"^(n_|n\d|count|total|sum_|forecast)")
        for r in rows:
            for k, v in r.asDict().items():
                if count_col.match(k) and isinstance(v, (int, float)):
                    assert v == 0 or v != v, f"{k}={v}"
    else:
        assert rows == []
