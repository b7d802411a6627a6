"""Sequence-packing invariants — independent of the DuckDB oracle
(which mirrors the same prefix-sum spec, so parity alone cannot catch a
shared spec error): the packing must be a gapless linearization of the
corpus token stream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from codegraph_spark.queries.text import _PACK_BUDGET, corpus_pack_shards


def test_packing_is_gapless_linearization(spark, sf_dir):
    out = corpus_pack_shards(spark, sf_dir).withColumn(
        "start", F.col("shard_id") * _PACK_BUDGET + F.col("shard_pos")
    )
    rows = out.select("doc_id", "n_tokens", "start").collect()
    assert rows

    # every document's start equals the sum of all earlier documents'
    # tokens — i.e. the starts, sorted, tile [0, total) with no gaps
    # and no overlaps
    by_start = sorted(rows, key=lambda r: r["start"])
    expected = 0
    for r in by_start:
        assert r["start"] == expected, (
            f"doc {r['doc_id']}: start {r['start']} != running total {expected}"
        )
        expected += r["n_tokens"]

    # each doc appears exactly once
    assert len({r["doc_id"] for r in rows}) == len(rows)

    # shard ids are dense from 0
    shard_ids = {r["start"] // _PACK_BUDGET for r in by_start}
    assert min(shard_ids) == 0
    total = expected
    assert max(shard_ids) <= (total - 1) // _PACK_BUDGET
