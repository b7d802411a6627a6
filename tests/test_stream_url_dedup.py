"""Multi-batch determinism of the streaming URL seen-set: when the
corpus arrives as six INTERLEAVED micro-batches (every batch holds
doc_ids above and below every other's — so the first-seen keeper of a
canonical URL is routinely NOT in the batch that first created its
state row), the drained update-mode finalize (min keeper / max count)
must still equal the batch web_url_dedup rollup exactly."""

from __future__ import annotations


def test_shuffled_batches_match_batch_dedup(spark, sf_dir):
    from codegraph_spark.queries.streaming import _url_dedup_drain
    from codegraph_spark.queries.web import web_url_dedup
    from codegraph_spark.streaming.incremental import (
        read_documents_stream_shuffled,
    )

    streamed = _url_dedup_drain(
        read_documents_stream_shuffled(spark, sf_dir)
    ).collect()
    batch = web_url_dedup(spark, sf_dir).collect()
    assert sorted(map(tuple, streamed), key=lambda t: t[0]) == sorted(
        map(tuple, batch), key=lambda t: t[0]
    )
    assert len(batch) > 0


def test_shuffled_batches_match_batch_incremental_dedup(spark, sf_dir):
    """stream_dedup_incremental over six interleaved micro-batches
    equals the batch dedup_incremental rollup exactly — the door's
    per-row signature + store joins are stateless, and the drain
    finalize must recover the batch h-groups regardless of how the
    incoming multiset splits across batches."""
    from codegraph_spark.queries.dedup import dedup_incremental
    from codegraph_spark.queries.streaming import _incremental_door
    from codegraph_spark.streaming.incremental import (
        read_documents_stream_shuffled,
    )

    streamed = _incremental_door(
        spark, sf_dir, read_documents_stream_shuffled(spark, sf_dir)
    ).collect()
    batch = dedup_incremental(spark, sf_dir).collect()
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))
    assert len(batch) > 0
