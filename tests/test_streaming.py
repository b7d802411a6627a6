"""Streaming surface tests: streaming/batch equivalence for the window
rollup, MERGE-parity incremental graph ingest across micro-batches, and
the applyInPandasWithState running aggregate (reference's planned
incremental pipeline — research.md:280-323 — implemented Spark-first)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_stream_hourly_matches_batch(spark):
    from codegraph_spark.queries.events import ev_hourly_agg
    from codegraph_spark.queries.streaming import stream_hourly_counts

    got = {tuple(r) for r in stream_hourly_counts(spark, SF_DIR).collect()}
    want = {
        (r["hour"], r["event_type"], r["n"], r["total_value"])
        for r in ev_hourly_agg(spark, SF_DIR).collect()
    }
    assert got == want and got


def test_incremental_graph_ingest_merge_semantics(spark, tmp_path):
    from codegraph_spark.streaming.incremental import incremental_graph_ingest

    src = str(tmp_path / "incoming")
    table = str(tmp_path / "nodes_table")
    os.makedirs(src)

    schema = "id string, label string, name string, score long"
    batch1 = spark.createDataFrame(
        [("n1", "Function", "f1", 1), ("n2", "Class", "c1", 2)], schema
    )
    batch2 = spark.createDataFrame(
        # n2 updated (SET += : null name must NOT clobber), n3 inserted
        [("n2", "Class", None, 20), ("n3", "Function", "f3", 3)], schema
    )
    batch1.coalesce(1).write.parquet(os.path.join(src, "b1.parquet"))
    batch2.coalesce(1).write.parquet(os.path.join(src, "b2.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*.parquet")
    )
    incremental_graph_ingest(stream, table, keys=["id"])

    rows = {r["id"]: r for r in spark.read.parquet(table).collect()}
    assert set(rows) == {"n1", "n2", "n3"}
    assert rows["n2"]["score"] == 20
    assert rows["n2"]["name"] == "c1"  # SET += kept the existing value
    assert rows["n1"]["score"] == 1 and rows["n3"]["name"] == "f3"


def test_running_user_totals_stateful(spark, tmp_path):
    from codegraph_spark.streaming.incremental import (
        run_available_now,
        running_user_totals,
    )

    src = str(tmp_path / "ev")
    os.makedirs(src)
    schema = "user_id long, value double"
    spark.createDataFrame([(1, 1.0), (1, 2.0), (2, 5.0)], schema).coalesce(
        1
    ).write.parquet(os.path.join(src, "e1.parquet"))
    spark.createDataFrame([(1, 3.0), (3, 7.0)], schema).coalesce(1).write.parquet(
        os.path.join(src, "e2.parquet")
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*.parquet")
    )
    out = run_available_now(running_user_totals(stream), output_mode="update")
    # update mode emits one row per (user, batch); the running total is
    # monotone in n_events, so the final state is the max-n row per user
    last: dict[int, tuple] = {}
    for r in out.collect():
        cur = last.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            last[r["user_id"]] = (r["n_events"], r["total_value"])
    # final totals must match the batch aggregate regardless of how the
    # two micro-batches split the input
    assert last[1] == (3, 6.0)
    assert last[2] == (1, 5.0)
    assert last[3] == (1, 7.0)


def test_streaming_asof_carries_state_across_batches(spark, tmp_path):
    """A view in batch 1 must match a purchase in batch 2 (state carry),
    and an in-batch view must win over the carried one."""
    import datetime as dt

    from codegraph_spark.streaming.incremental import (
        run_available_now,
        streaming_asof,
    )

    src = str(tmp_path / "asof")
    os.makedirs(src)
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    # batch 1: user 1 views; user 2 purchases with no prior view
    spark.createDataFrame(
        [(10, 1, "view", t(1)), (20, 2, "purchase", t(2))], schema
    ).coalesce(1).write.parquet(os.path.join(src, "b1.parquet"))
    # batch 2: user 1 purchases (matches carried view 10), then views
    # again (id 12) and purchases again (matches 12, not 10)
    spark.createDataFrame(
        [(11, 1, "purchase", t(10)), (12, 1, "view", t(11)),
         (13, 1, "purchase", t(12))],
        schema,
    ).coalesce(1).write.parquet(os.path.join(src, "b2.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*.parquet")
    )
    out = {r.purchase_event_id: (r.view_event_id, r.gap_s)
           for r in run_available_now(streaming_asof(stream),
                                      output_mode="append").collect()}
    assert out[20] == (-1, -1)      # no prior view anywhere
    assert out[11] == (10, 9)       # carried from batch 1
    assert out[13] == (12, 1)       # in-batch view supersedes carry


def test_streaming_asof_preserves_snowflake_scale_ids(spark, tmp_path):
    """Ids above 2^53 must survive the state forward-fill exactly — a
    float64 detour would round 2^53+3 to a neighboring even value."""
    import datetime as dt

    from codegraph_spark.streaming.incremental import (
        run_available_now,
        streaming_asof,
    )

    big_view = (1 << 53) + 3
    big_purchase = (1 << 53) + 11
    src = str(tmp_path / "asof_big")
    os.makedirs(src)
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    spark.createDataFrame(
        [(big_view, 1, "view", t(1))], schema
    ).coalesce(1).write.parquet(os.path.join(src, "b1.parquet"))
    spark.createDataFrame(
        [(big_purchase, 1, "purchase", t(8))], schema
    ).coalesce(1).write.parquet(os.path.join(src, "b2.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*.parquet")
    )
    out = {r.purchase_event_id: (r.view_event_id, r.gap_s)
           for r in run_available_now(streaming_asof(stream),
                                      output_mode="append").collect()}
    assert out[big_purchase] == (big_view, 7)


def test_stream_interval_join_matches_across_batches(spark, tmp_path):
    """A view in micro-batch 1 must join a click arriving in batch 2
    (join state carries across batches); clicks outside the horizon or
    before the view must not match."""
    import datetime as dt

    from codegraph_spark.queries.streaming import interval_join_views_clicks
    from codegraph_spark.streaming.incremental import run_available_now

    src = str(tmp_path / "ij")
    os.makedirs(src)
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    t = lambda m: dt.datetime(2024, 1, 1, 0, m, 0)  # noqa: E731
    # batch 1: user 1 views at t0; user 2 clicks at t1 (no prior view)
    spark.createDataFrame(
        [(10, 1, "view", t(0)), (20, 2, "click", t(1))], schema
    ).coalesce(1).write.parquet(os.path.join(src, "b1.parquet"))
    # batch 2: user 1 clicks inside the 10-min horizon (MATCH, cross-
    # batch), again outside it (no match), and user 2 views AFTER its
    # click (no match — clicks only look back)
    spark.createDataFrame(
        [(11, 1, "click", t(5)), (12, 1, "click", t(30)),
         (21, 2, "view", t(6))],
        schema,
    ).coalesce(1).write.parquet(os.path.join(src, "b2.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*.parquet")
    )
    rows = run_available_now(
        interval_join_views_clicks(stream, horizon="10 minutes"),
        output_mode="append",
    ).collect()
    assert [(r.user_id, r.view_id, r.click_id, r.lag_us) for r in rows] == [
        (1, 10, 11, 300_000_000)
    ]
