"""Property-based checks of MERGE-upsert semantics.

The reference applies Cypher ``MERGE (n {key}) SET n += $props`` one
row at a time (pkg/neo4j/client.go:135-179), so the batch algorithm in
``operators/upsert.py`` must reproduce *sequential* semantics: later
rows in the incoming batch win, and a NULL incoming property never
clobbers an existing value. Hypothesis drives random existing tables
and incoming batches (with intra-batch duplicate keys and NULLs) and
compares against a literal fold of the sequential rule.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_val = st.one_of(st.none(), st.integers(min_value=0, max_value=9))
_key = st.integers(min_value=0, max_value=4)
# existing: unique keys (constraint holds before the merge)
_existing = st.dictionaries(_key, st.tuples(_val, _val), max_size=5)
# incoming: ordered batch, duplicate keys allowed
_incoming = st.lists(st.tuples(_key, _val, _val), max_size=8)

_SCHEMA = "k int, a int, b int"


def _ref_merge(existing, incoming, set_plus_equals):
    state = {k: {"a": a, "b": b} for k, (a, b) in existing.items()}
    for k, a, b in incoming:
        if set_plus_equals:
            cur = state.get(k, {"a": None, "b": None})
            state[k] = {
                "a": a if a is not None else cur["a"],
                "b": b if b is not None else cur["b"],
            }
        else:
            state[k] = {"a": a, "b": b}
    return {(k, v["a"], v["b"]) for k, v in state.items()}


@SETTINGS
@given(existing=_existing, incoming=_incoming, plus=st.booleans())
def test_merge_upsert_matches_sequential_merge(spark, existing, incoming, plus):
    from codegraph_spark.operators.upsert import merge_upsert

    edf = spark.createDataFrame(
        [(k, a, b) for k, (a, b) in existing.items()], _SCHEMA
    )
    idf = spark.createDataFrame(list(incoming), _SCHEMA)
    got = {
        (r["k"], r["a"], r["b"])
        for r in merge_upsert(edf, idf, ["k"], set_plus_equals=plus).collect()
    }
    assert got == _ref_merge(existing, incoming, plus)


@SETTINGS
@given(existing=_existing)
def test_merge_upsert_idempotent(spark, existing):
    """Re-merging a table into itself is a no-op (the reference's
    re-index invariant, indexing_test.go)."""
    from codegraph_spark.operators.upsert import merge_upsert

    edf = spark.createDataFrame(
        [(k, a, b) for k, (a, b) in existing.items()], _SCHEMA
    )
    merged = merge_upsert(edf, edf, ["k"])
    got = {(r["k"], r["a"], r["b"]) for r in merged.collect()}
    want = {(k, a, b) for k, (a, b) in existing.items()}
    assert got == want


def test_merge_upsert_schema_mismatch_raises(spark):
    from codegraph_spark.operators.upsert import merge_upsert

    edf = spark.createDataFrame([(1, 2, 3)], _SCHEMA)
    idf = spark.createDataFrame([(1, 2)], "k int, a int")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(edf, idf, ["k"])
