"""Streaming queries surfaced through the driver contract.

``stream_hourly_counts`` actually runs a Structured Streaming job
(file source → watermark → tumbling window → availableNow drain into a
memory sink) and returns the sink table; the oracle is the plain batch
SQL over the same events — a hash match proves the incremental
computation converges to the batch answer (the streaming/batch
equivalence the reference's planned pipeline assumes,
research.md:280-323).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codegraph_spark.streaming.incremental import (
    hopping_counts,
    hourly_counts,
    read_events_stream,
    run_available_now,
    running_user_totals,
)


def stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    # state = one row per (hour, event_type) — bounded cardinality, so
    # a few state-store partitions; see run_available_now docstring.
    return run_available_now(hourly_counts(ev), output_mode="complete", state_partitions=8)


def stream_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hopping-window rollup as a STREAMING job — overlapping
    windows are where incremental window state earns its keep (a batch
    job recomputes all 4 overlaps per event every run; the stream pays
    each event once into 4 state rows). Oracle = the batch hopping SQL
    (queries/events.ev_hopping_agg): a hash match proves the
    incremental overlap bookkeeping converges to the batch answer."""
    ev = read_events_stream(spark, sf_dir)
    # state = one row per (15-min-start window, event_type) — 4× the
    # tumbling cardinality, still bounded by the time range
    return run_available_now(
        hopping_counts(ev), output_mode="complete", state_partitions=8
    )


_STREAM_HOURLY_SQL = """
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
       count(*) AS n, ROUND(CAST(sum(value) AS DOUBLE), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


_STREAM_HOPPING_SQL = """
WITH hops AS (
    SELECT event_type, value,
           make_timestamp(
               ((epoch_ms(ts) // 900000) * 900 - k.k * 900)
               * 1000000
           ) AS win_start
    FROM events, (SELECT unnest(range(0, 4)) AS k) k
)
SELECT CAST(win_start AS VARCHAR) AS win_start, event_type,
       count(*) AS n, ROUND(CAST(sum(value) AS DOUBLE), 2) AS total_value
FROM hops
GROUP BY 1, 2
"""


def stream_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Count-Min Sketch as a STREAMING aggregate — sketches are
    mergeable by construction (cell-wise sums), which makes them the
    canonical bounded-state streaming summary: the d×w cell table is
    maintained incrementally (complete-mode groupBy over the stateless
    probe projection, state = exactly 1024 rows at ANY input volume),
    drained availableNow, and then the batch estimate/audit phase of
    :func:`codegraph_spark.queries.events.ev_cms_topk` runs over the
    drained sketch. Oracle = the batch CMS SQL: a hash match proves the
    incremental sketch converges to the batch sketch bit for bit."""
    from codegraph_spark.queries.events import cms_probe_rows, cms_topk_from_sketch

    ev = read_events_stream(spark, sf_dir)
    sketch = run_available_now(
        cms_probe_rows(ev.select("event_type"))
        .groupBy("hrow", "bucket")
        .count()
        .withColumnRenamed("count", "cell"),
        output_mode="complete",
        state_partitions=8,
    )
    return cms_topk_from_sketch(spark, sf_dir, sketch)

def stream_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile dashboard maintained INCREMENTALLY — the cent
    histogram (events.cent_histogram) as a streaming aggregate: like
    the CMS/KMV twins, the sketch is mergeable by cell-wise sums, so
    complete-mode state = one row per (event_type, cent) — bounded by
    the VALUE DOMAIN at any input volume — and the drained histogram
    equals the batch histogram by merge commutativity. The shared
    exact-quantile tail (events.quantiles_from_cent_hist) runs over
    the drain; oracle = the batch histogram-quantile SQL, so a hash
    match proves incremental sketch ≡ batch sketch ≡ exact type-1
    quantiles, bit for bit."""
    from codegraph_spark.queries.events import quantiles_from_cent_hist

    ev = read_events_stream(spark, sf_dir)
    hist = run_available_now(
        ev.select(
            "event_type",
            F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cent"),
        )
        .groupBy("event_type", "cent")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c")),
        output_mode="complete",
        state_partitions=8,
    )
    return quantiles_from_cent_hist(hist)


def stream_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog maintained INCREMENTALLY — the register table is
    max-mergeable by construction (cell-wise MAX), so complete-mode
    state = at most 64 rows per event_type at ANY input volume, and
    the drained registers equal the batch registers by merge
    commutativity. The shared estimate tail
    (events.hll_estimate_from_registers) runs over the drain; oracle =
    the batch HLL SQL, so a hash match proves incremental sketch ≡
    batch sketch ≡ the owned estimate arithmetic, bit for bit."""
    from codegraph_spark.queries.events import (
        hll_estimate_from_registers,
        hll_register_rows,
    )

    ev = read_events_stream(spark, sf_dir)
    registers = run_available_now(
        hll_register_rows(ev.select("event_type", "user_id"))
        .groupBy("event_type", "bucket")
        .agg(F.max("reg").alias("reg")),
        output_mode="complete",
        state_partitions=8,
    )
    return hll_estimate_from_registers(spark, sf_dir, registers)


def _stream_hll_sql() -> str:
    from codegraph_spark.queries.events import _hll_sql

    return _hll_sql()


def stream_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming cardinality via the KMV sketch (custom stateful
    operator #4, :func:`streaming/incremental.streaming_kmv`): state =
    the ≤ k smallest distinct hashes per key — bounded at any input
    volume, unlike streaming exact distinct whose state grows with
    cardinality. The drained final state equals the batch sketch by
    the keep-smallest-k merge law (pinned in tests/test_sketches.py),
    so the estimate phase hash-matches ev_kmv_distinct's batch oracle
    exactly: incremental sketch ≡ batch sketch, bit for bit."""
    from codegraph_spark.queries.events import _KMV_H, _KMV_K
    from codegraph_spark.sources.tables import load_table
    from codegraph_spark.streaming.incremental import streaming_kmv

    ev = read_events_stream(spark, sf_dir)
    out = run_available_now(
        streaming_kmv(ev, _KMV_K), output_mode="update", state_partitions=8
    )
    # final state row per key: n_kept only grows; at capacity hk only
    # shrinks — (max n_kept, min hk) IS the last update
    w = Window.partitionBy("event_type").orderBy(
        F.desc("n_kept"), F.asc("hk")
    )
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "hk", "n_kept")
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    est = exact.join(final, "event_type").select(
        "event_type", "n_exact",
        F.when(F.col("n_kept") < _KMV_K, F.col("n_exact"))
        .otherwise(
            F.floor(F.lit(_KMV_K - 1) * F.lit(_KMV_H) / F.col("hk")).cast("bigint")
        )
        .alias("kmv_est"),
    )
    return est.select(
        "event_type", "n_exact", "kmv_est",
        F.expr("(abs(kmv_est - n_exact) * 1000) div n_exact").alias("err_pm"),
    ).orderBy("event_type")


def stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator end-to-end (§2.8): per-user running
    (count, total) via ``applyInPandasWithState``, drained availableNow;
    the final state row per user (max n_events — the running count is
    monotone) must equal the batch aggregate however the input splits
    into micro-batches. State shards by user_id — the 1000-executor
    layout is the shuffle partitioning itself."""
    ev = read_events_stream(spark, sf_dir)
    out = run_available_now(
        running_user_totals(ev), output_mode="update", state_partitions=8
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )


_STREAM_RUNNING_SQL = """
SELECT user_id, count(*) AS n_events,
       ROUND(CAST(sum(value) AS DOUBLE), 2) AS total_value
FROM events
GROUP BY user_id
"""


def stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest dedup — records deduped AT THE DOOR as
    micro-batches arrive (``dropDuplicates`` over a streaming source,
    append mode), the exactly-once ingest filter of a training-data
    pipeline. Key = (event_type, value bucket); the drained result must
    equal batch DISTINCT however the input splits into micro-batches.

    State holds one row per distinct key, sharded by the key shuffle —
    the 1000-executor layout is the partitioning itself. At 100 TB the
    unbounded-horizon variant swaps to ``dropDuplicatesWithinWatermark``
    so state is bounded by the dedup horizon; exact global dedup over
    history belongs to the batch layer (dedup_exact)."""
    ev = read_events_stream(spark, sf_dir)
    keyed = ev.select(
        "event_type", F.floor(F.col("value")).cast("bigint").alias("value_bucket")
    )
    deduped = keyed.dropDuplicates(["event_type", "value_bucket"])
    return run_available_now(deduped, output_mode="append", state_partitions=8)


_STREAM_DEDUP_SQL = """
SELECT DISTINCT event_type, CAST(FLOOR(value) AS BIGINT) AS value_bucket
FROM events
"""


def stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming conversion funnel (§2.8 custom stateful operator #2):
    per-user view→click→purchase state machine maintained across
    micro-batches (streaming/incremental.streaming_funnel), drained
    availableNow; the furthest-reached step per user (monotone within a
    drain — take the max) rolls up to the same 3-row step counts as the
    batch funnel oracle (ev_funnel's CTE chain sans conversion
    column)."""
    from codegraph_spark.streaming.incremental import streaming_funnel

    ev = read_events_stream(spark, sf_dir)
    out = run_available_now(
        streaming_funnel(ev, ("view", "click", "purchase")),
        output_mode="update",
        state_partitions=8,
    )
    per_user = out.groupBy("user_id").agg(F.max("reached").alias("reached"))
    # coalesce: sum over an EMPTY drain is NULL, but the funnel's
    # step counts are counts — 0 users, matching the batch twin
    agg = per_user.agg(
        F.coalesce(F.sum((F.col("reached") >= 1).cast("long")), F.lit(0)).alias("n1"),
        F.coalesce(F.sum((F.col("reached") >= 2).cast("long")), F.lit(0)).alias("n2"),
        F.coalesce(F.sum((F.col("reached") >= 3).cast("long")), F.lit(0)).alias("n3"),
    )
    return agg.select(
        F.expr(
            "stack(3, 1, 'view', n1, 2, 'click', n2, 3, 'purchase', n3)"
            " AS (step_no, step, n_users)"
        )
    )


_STREAM_FUNNEL_SQL = """
WITH s1 AS (
    SELECT user_id, min(ts) AS t_prev FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS t_prev
    FROM events e JOIN s1 USING (user_id)
    WHERE e.event_type = 'click' AND e.ts > s1.t_prev
    GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS t_prev
    FROM events e JOIN s2 USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > s2.t_prev
    GROUP BY e.user_id
)
SELECT 1 AS step_no, 'view' AS step, count(*) AS n_users FROM s1
UNION ALL SELECT 2, 'click', count(*) FROM s2
UNION ALL SELECT 3, 'purchase', count(*) FROM s3
"""


def stream_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming as-of join (§2.8 custom stateful operator #3):
    purchases enriched with the most recent prior view via a
    2-longs-per-user state machine (streaming/incremental
    .streaming_asof), drained availableNow; hash-matches the batch
    lateral-join oracle shared with ev_asof_join."""
    from codegraph_spark.streaming.incremental import streaming_asof

    ev = read_events_stream(spark, sf_dir)
    return run_available_now(
        streaming_asof(ev), output_mode="append", state_partitions=8
    )


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native gap-based session windows on a STREAM
    (``session_window(ts, '30 minutes')`` — the built-in stateful
    session operator, complementing the custom
    ``applyInPandasWithState`` family): per (user, session) event count
    and value total, drained availableNow. Sessions merge across
    micro-batches through the session state store (sharded by the
    grouping key — the 1000-executor layout is the shuffle itself);
    the drained result must equal the batch gaps-and-islands answer
    however the input splits. Session identity is reported as the
    exact session-start micros (= the first event's timestamp —
    integer, engine-exact) rather than an ordinal id, which is how a
    streaming operator can name a session without global ordering."""
    ev = read_events_stream(spark, sf_dir)
    sess = (
        ev.groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )
    out = run_available_now(sess, output_mode="complete", state_partitions=8)
    return out.select(
        "user_id",
        F.unix_micros(F.col("session_window.start").cast("timestamp"))
        .alias("session_start_us"),
        "n_events",
        "session_value",
    )


# batch twin: gaps-and-islands with the session_window boundary rule
# (a gap of EXACTLY the 30-min horizon starts a new session — the
# built-in merges only events strictly inside the gap window)
_STREAM_SESSIONIZE_SQL = """
SELECT user_id,
       CAST(min(epoch_us(ts)) AS BIGINT) AS session_start_us,
       count(*) AS n_events,
       ROUND(CAST(sum(value) AS DOUBLE), 2) AS session_value
FROM (
    SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM (
        SELECT *, CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id))
                           >= 1800 * 1000000
                         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       THEN 1 ELSE 0 END AS new_sess
        FROM events
    )
)
GROUP BY user_id, session_id
"""


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked STREAM-STREAM interval join (§2.8) — the
    ad-attribution shape: each click joins every view by the SAME user
    within the preceding 4 hours. Both sides are event-time watermarked
    and the join predicate carries an explicit time-range bound, so the
    engine derives a finite state-retention window per side (a view is
    droppable once the click watermark passes v_ts + horizon; a click
    once the view watermark passes c_ts) — state stays bounded by the
    horizon at any input rate, sharded by the user_id equi-key: the
    1000-executor layout is the join shuffle itself. Inner join +
    append mode emits each match exactly once as it forms; the drained
    result must equal the batch interval join however the input splits
    into micro-batches. Lag is reported in integer microseconds
    (engine-exact, no float hash surface)."""
    ev = read_events_stream(spark, sf_dir)
    return run_available_now(
        interval_join_views_clicks(ev), output_mode="append", state_partitions=8
    )


def interval_join_views_clicks(
    ev: DataFrame, horizon: str = "4 hours", watermark: str = "8 hours"
) -> DataFrame:
    """The view←click interval join over a (possibly streaming) events
    DataFrame — shared by :func:`stream_interval_join` and the
    cross-micro-batch tests."""
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    joined = views.join(
        clicks,
        F.expr(
            "v_user = c_user AND c_ts >= v_ts"
            f" AND c_ts <= v_ts + interval {horizon}"
        ),
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("lag_us"),
    )


_STREAM_INTERVAL_SQL = """
SELECT v.user_id AS user_id, v.event_id AS view_id, c.event_id AS click_id,
       CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT) AS lag_us
FROM events v JOIN events c
  ON c.user_id = v.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 4 HOUR
"""


def _asof_oracle() -> str:
    from codegraph_spark.queries.events import _ASOF_SQL

    return _ASOF_SQL


def _banded_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, band, key) banding of a documents stream with ONE
    signature evaluation per document. Two Generate barriers defeat
    projection collapse (which would inline the 64-permutation
    expression into every consumer — measured 5x re-evaluation):
    (1) explode a 1-element array of the single-pass 16-min signature
    (dedup.minhash_mins_column — md5 once per shingle), so the
    signature is MATERIALIZED per row; (2) explode the 4 band structs
    derived from the materialized array, then filter NULL keys
    per-row (zero-shingle docs NULL-propagate on every band, matching
    the batch oracle's shingles CTE exclusion). Measured at sf0.1:
    21.7 s -> ~2 s for the full intake drain."""
    from codegraph_spark.queries.dedup import band_structs_from_mins, minhash_mins_column

    m = docs.select(
        "doc_id", F.explode(F.array(minhash_mins_column())).alias("mins")
    )
    return (
        m.select("doc_id", F.explode(band_structs_from_mins("mins")).alias("bk"))
        .filter(F.col("bk.key").isNotNull())
        .select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )


def stream_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup dedup AT THE INGEST DOOR — the production shape of
    MinHash dedup (batch dedup_minhash_lsh sweeps history; intake has
    to decide per ARRIVING document): each streamed document is banded
    statelessly (dedup.minhash_band_structs — the identical row-local
    signature arithmetic), and custom stateful operator #6
    (streaming/incremental.streaming_bucket_prior, one int64 of state
    per LSH bucket) reports the earliest prior member of each of its
    4 band buckets. A document is an intake duplicate when ANY band
    had a prior member; dup_of = the earliest such. The drained
    verdicts hash-match the batch min-smaller-id-per-bucket oracle,
    proving the incremental index equals the batch index however the
    input splits into micro-batches."""
    from codegraph_spark.queries.dedup import minhash_band_structs
    from codegraph_spark.streaming.incremental import (
        read_documents_stream,
        streaming_bucket_prior,
    )

    # repartition ahead of the signature expression: a single-file
    # local source arrives as ONE partition, which would run the
    # 64-permutation MinHash chain on one core (measured 11 s at
    # sf0.1 vs <1 s spread); a production Kafka/multi-file source is
    # already partitioned and the hint is a no-op cost-wise
    docs = read_documents_stream(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    banded = _banded_docs(docs)
    out = run_available_now(
        streaming_bucket_prior(banded), output_mode="update", state_partitions=8
    )
    return (
        out.groupBy("doc_id")
        .agg(
            F.coalesce(
                F.min(F.when(F.col("prior") >= 0, F.col("prior"))), F.lit(-1)
            ).alias("dup_of"),
            F.sum((F.col("prior") >= 0).cast("long")).alias("n_hit_bands"),
        )
        .orderBy("doc_id")
    )


def stream_dedup_minhash_ooo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intake MinHash dedup under OUT-OF-ORDER delivery (r6 VERDICT
    item 3 — the Kafka-partition interleave the single-file source
    never produces): the documents table is split into 6 residue-class
    files streamed one per micro-batch, so every batch undercuts the
    previous one's max doc_id — the exact arrival pattern that makes
    the strict operator raise (tests/test_round7_streaming.py pins
    that) and used to silently mis-attribute dups. The
    order-INSENSITIVE operator (streaming/incremental
    .streaming_bucket_prior_unordered) maintains only the per-bucket
    running min — a commutative/idempotent merge, so the final state
    is interleaving-independent — and the dup verdict is taken at
    drain: prior(doc) = final bucket min when it undercuts doc. Same
    batch oracle as stream_dedup_minhash: a hash match proves the
    reordered stream converges to the identical answer."""
    from codegraph_spark.queries.dedup import minhash_band_structs
    from codegraph_spark.streaming.incremental import (
        read_documents_stream_shuffled,
        streaming_bucket_prior_unordered,
    )

    docs = read_documents_stream_shuffled(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    banded = _banded_docs(docs)
    out = run_available_now(
        streaming_bucket_prior_unordered(banded),
        output_mode="update",
        state_partitions=8,
    )
    # rename the keys on the agg side: a self-join of an agg of the
    # same memory-sink view hits "Conflicting attributes" otherwise
    finals = (
        out.groupBy(F.col("band").alias("f_band"), F.col("key").alias("f_key"))
        .agg(F.min("mn").alias("fmn"))
    )
    members = out.select("band", "key", F.explode("docs").alias("doc_id"))
    pri = members.join(
        finals,
        (members["band"] == finals["f_band"]) & (members["key"] == finals["f_key"]),
    ).select(
        "doc_id",
        F.when(F.col("fmn") < F.col("doc_id"), F.col("fmn")).otherwise(F.lit(-1)).alias("prior"),
    )
    return (
        pri.groupBy("doc_id")
        .agg(
            F.coalesce(
                F.min(F.when(F.col("prior") >= 0, F.col("prior"))), F.lit(-1)
            ).alias("dup_of"),
            F.sum((F.col("prior") >= 0).cast("long")).alias("n_hit_bands"),
        )
        .orderBy("doc_id")
    )


def _stream_minhash_dedup_sql() -> str:
    from codegraph_spark.queries.dedup import (
        _AB,
        _BANDS,
        _P,
        _SHINGLE_HASH_SQL,
        _SHINGLES_CTE,
    )

    mh = ",\n           ".join(
        f"min(({a} * h + {b}) % {_P}) AS mh{i}" for i, (a, b) in enumerate(_AB)
    )
    rows_per_band = len(_AB) // _BANDS
    band_selects = []
    for bidx in range(_BANDS):
        concat = " || ':' || ".join(
            f"CAST(mh{i} AS VARCHAR)"
            for i in range(bidx * rows_per_band, (bidx + 1) * rows_per_band)
        )
        band_selects.append(
            f"SELECT doc_id, {bidx} AS band, md5({concat}) AS key FROM sig"
        )
    bands = "\n    UNION ALL\n    ".join(band_selects)
    return f"""
WITH {_SHINGLES_CTE.strip()},
hashed AS (
    SELECT doc_id, {_SHINGLE_HASH_SQL} AS h FROM shingles
),
sig AS (
    SELECT doc_id,
           {mh}
    FROM hashed GROUP BY doc_id
),
banded AS (
    {bands}
),
hits AS (
    SELECT b.doc_id, b.band, min(a.doc_id) AS prior
    FROM banded b
    JOIN banded a ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    GROUP BY b.doc_id, b.band
)
SELECT s.doc_id,
       coalesce(min(h.prior), -1) AS dup_of,
       CAST(count(h.prior) AS BIGINT) AS n_hit_bands
FROM (SELECT DISTINCT doc_id FROM banded) s
LEFT JOIN hits h ON h.doc_id = s.doc_id
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


def stream_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection fed by a STREAMING rollup — the
    stream_cms_topk pattern: the (event_type, hour) count state is
    maintained incrementally (complete-mode groupBy; state = one row
    per hour×type at any input volume), drained availableNow, and the
    batch alarm phase (events.cusum_from_hourly — the exact prefix-min
    identity) runs over the drained table. μ is the full-series mean,
    so the alarm is inherently two-pass: the streaming layer's job is
    the rollup, the alarm reads the drained state. Oracle = the batch
    CUSUM SQL: a hash match proves the incremental rollup converges to
    the batch rollup exactly."""
    from codegraph_spark.queries.events import cusum_from_hourly

    ev = read_events_stream(spark, sf_dir)
    hourly = run_available_now(
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        ).agg(F.count(F.lit(1)).cast("bigint").alias("x")),
        output_mode="complete",
        state_partitions=8,
    )
    return cusum_from_hourly(hourly)


def stream_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Markov transition matrix maintained INCREMENTALLY (custom
    stateful operator #5, streaming/incremental.streaming_transitions):
    per-user last-event state pairs each micro-batch's first event with
    the previous batch's last, the emitted increments sum at drain, and
    the shared probability tail (events.transition_probabilities) runs
    over the totals. Oracle = the batch matrix SQL: a hash match proves
    the incremental pairing reconstructs every per-user adjacency
    exactly once across batch boundaries."""
    from codegraph_spark.queries.events import transition_probabilities
    from codegraph_spark.streaming.incremental import streaming_transitions

    ev = read_events_stream(spark, sf_dir)
    out = run_available_now(
        streaming_transitions(ev), output_mode="update", state_partitions=8
    )
    pairs = out.groupBy("from_type", "to_type").agg(
        F.sum("cnt").cast("bigint").alias("n_trans")
    )
    return transition_probabilities(pairs)


def stream_transitions_ooo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transition matrix under BOUNDED-DISORDER delivery (r6
    VERDICT item 3b): the events table arrives as adjacent-SWAPPED
    time slices (every second micro-batch's timestamps go backwards —
    the stream the strict operator rejects by raising, pinned in
    tests/test_round7_streaming.py), and the reorder-buffered operator
    (streaming/incremental.streaming_transitions_buffered) holds each
    user's rows until max event time advances past the measured
    disorder horizon before pairing. A final punctuation file (one
    __flush__ row per user) drains the tails at end-of-stream. Same
    batch oracle as stream_transition_matrix: a hash match proves the
    buffered pairing reconstructs every adjacency exactly once under
    reordering the in-order operator cannot survive."""
    from codegraph_spark.queries.events import transition_probabilities
    from codegraph_spark.streaming.incremental import (
        prepare_reordered_events,
        streaming_transitions_buffered,
    )

    src_dir, horizon_us = prepare_reordered_events(spark, sf_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(src_dir)
    )
    out = run_available_now(
        streaming_transitions_buffered(stream, horizon_us),
        output_mode="update",
        state_partitions=8,
    )
    pairs = out.groupBy("from_type", "to_type").agg(
        F.sum("cnt").cast("bigint").alias("n_trans")
    )
    return transition_probabilities(pairs)


def stream_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media decode AT THE INGEST DOOR: the documents stream is
    encoded into raw-gray payloads JVM-side and pushed through the
    SAME Arrow decode kernel the batch query uses
    (operators/multimodal.decode_image_stats — a stateless mapInPandas
    runs unchanged under Structured Streaming), one micro-batch at a
    time, append mode. This is the shape a 100 TB multimodal intake
    takes: decode/feature-extract per arriving batch, ~40 bytes out
    per row regardless of media size, no state at all — the kernel
    IS the operator, batch or stream. Same oracle as mm_image_meta: a
    hash match proves the streaming drain equals the batch decode
    however the input splits."""
    from codegraph_spark.operators.multimodal import (
        decode_image_stats,
        encode_documents_as_images,
    )
    from codegraph_spark.streaming.incremental import read_documents_stream

    docs = read_documents_stream(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    stats = decode_image_stats(encode_documents_as_images(docs))
    out = run_available_now(
        stats.select(
            "doc_id",
            "width",
            "height",
            "body_len",
            F.expr("checksum * 1000 div body_len").alias("mean_milli"),
            "checksum",
        ),
        output_mode="append",
    )
    return out.orderBy("doc_id")


def stream_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw-web front door AT THE INGEST DOOR (the stream_image_meta
    shape applied to r10's HTML family): each arriving document is
    HTML-wrapped and pushed through the SAME five-rule main-content
    extraction column program the batch query uses (queries/web.py —
    a stateless projection runs unchanged under Structured Streaming),
    one micro-batch at a time, append mode, NO state at all. This is
    how a 100 TB crawl intake actually runs extraction: per arriving
    WARC batch, emitting ~60 bytes of stats + a content hash per page.
    Same oracle as text_html_extract: a hash match proves the
    streaming drain equals the batch extraction however the input
    splits into micro-batches."""
    from codegraph_spark.queries.web import (
        _keep,
        html_block_stats,
        html_wrap,
    )
    from codegraph_spark.streaming.incremental import read_documents_stream

    docs = read_documents_stream(spark, sf_dir)
    page = html_wrap("text", "doc_id", "source")
    blocked = docs.select(
        "doc_id", html_block_stats(page).alias("b")
    ).select(
        "doc_id", "b",
        F.array_join(
            F.transform(F.filter("b", _keep), lambda s: s["txt"]), "\n"
        ).alias("x"),
    )
    proj = blocked.select(
        "doc_id",
        F.size("b").alias("n_blocks"),
        F.size(F.filter("b", _keep)).alias("n_kept"),
        F.length("x").cast("bigint").alias("extracted_len"),
        F.md5(F.col("x").cast("binary")).alias("extract_md5"),
    ).select(
        "doc_id", "n_blocks", "n_kept",
        F.expr("CAST(n_kept * 1000 div n_blocks AS BIGINT)")
        .alias("kept_pm"),
        "extracted_len", "extract_md5",
    )
    return run_available_now(proj, output_mode="append").orderBy("doc_id")


def stream_html_extract_dirty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TOLERANT tokenizer at the ingest door — the
    stream_html_extract shape with the adversarial wrap routed through
    the state-machine Arrow kernel (queries/web.tokenize_extract):
    mapInPandas is stateless, so the exact batch plan runs per arriving
    micro-batch in append mode with no state store at all. This is the
    realistic 100 TB intake: per WARC batch, adversarial real-crawl
    HTML in, ~60 bytes of stats + a content hash per page out. Shares
    text_html_extract_dirty's constructive oracle: a hash match proves
    the streaming drain equals the batch kernel however the input
    splits into micro-batches."""
    from codegraph_spark.queries.web import dirty_html_wrap, tokenize_extract
    from codegraph_spark.streaming.incremental import read_documents_stream

    # repartition BEFORE the wrap (r13, as in the batch twin): the
    # arriving micro-batch is a single file-source partition, and the
    # adversarial wrap is the heavy per-row string program — it must
    # run downstream of the exchange, not on one core ahead of it
    docs = read_documents_stream(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).select(
        "doc_id",
        dirty_html_wrap("text", "doc_id", "source").alias("page"),
    )
    return run_available_now(
        tokenize_extract(docs), output_mode="append"
    ).orderBy("doc_id")


from codegraph_spark.queries.multimodal import _MM_META_SQL as _STREAM_MM_META_SQL  # noqa: E402
from codegraph_spark.queries.web import _HTML_EXTRACT_SQL as _STREAM_HTML_EXTRACT_SQL  # noqa: E402
from codegraph_spark.queries.web import _HTML_DIRTY_SQL as _STREAM_HTML_DIRTY_SQL  # noqa: E402
from codegraph_spark.queries.events import _CMS_SQL as _STREAM_CMS_SQL  # noqa: E402
from codegraph_spark.queries.events import _KMV_SQL as _STREAM_KMV_SQL  # noqa: E402
from codegraph_spark.queries.events import _TRANSITION_SQL as _STREAM_TRANSITION_SQL  # noqa: E402
from codegraph_spark.queries.events import _CUSUM_SQL as _STREAM_CUSUM_SQL  # noqa: E402

def stream_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup AT THE INGEST DOOR (§2.8 custom stateful op —
    the streaming twin of web_url_dedup): each arriving fetch record is
    canonicalized (a stateless projection — the same rules as the batch
    query), then a stateful streaming aggregation per (domain,
    canonical URL) maintains the crawl's SEEN-SET: first-seen keeper
    (min doc_id) and fetch count, update mode. The drained updates are
    monotone per key — keeper only decreases, count only grows — so
    the batch-side finalize (min keeper / max count per key) recovers
    the exact final state however the input splits into micro-batches,
    and the per-domain rollup must equal web_url_dedup's oracle
    byte-for-byte.

    State = one row per canonical URL, sharded by the canonical-key
    shuffle — the layout a 1000-executor frontier dedup runs with; at
    100 TB the horizon-bounded variant swaps the agg for
    ``dropDuplicatesWithinWatermark`` and re-crawl policy owns eviction."""
    from codegraph_spark.streaming.incremental import read_documents_stream

    return _url_dedup_drain(read_documents_stream(spark, sf_dir))


def _url_dedup_drain(docs: DataFrame) -> DataFrame:
    """Canonicalize → stateful seen-set agg → drain → finalize →
    per-domain rollup (see :func:`stream_url_dedup`; split out so the
    out-of-order test can route the SHUFFLED multi-batch source
    through the identical pipeline)."""
    from codegraph_spark.queries.web import _raw_url, canonicalize_url
    from codegraph_spark.streaming.incremental import run_available_now

    # repartition ahead of the canonicalization projection: a
    # single-file local source arrives as ONE partition (the
    # stream_dedup_minhash rationale; no-op on a partitioned source)
    base = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
    ).select(
        "doc_id", _raw_url("doc_id", "source").alias("u")
    )
    c = canonicalize_url(F.col("u"))
    canon = base.select(
        "doc_id", c["canon"].alias("url_canon"), c["host"].alias("domain")
    )
    agg = canon.groupBy("domain", "url_canon").agg(
        F.min("doc_id").alias("mk"), F.count(F.lit(1)).alias("cnt")
    )
    drained = run_available_now(
        agg, output_mode="update", state_partitions=8
    )
    groups = drained.groupBy("domain", "url_canon").agg(
        F.min("mk").alias("keeper_id"), F.max("cnt").alias("n")
    )
    return (
        groups.groupBy("domain")
        .agg(
            F.sum("n").cast("bigint").alias("n_urls"),
            F.count(F.lit(1)).cast("bigint").alias("n_canonical"),
            (F.sum("n") - F.count(F.lit(1)))
            .cast("bigint").alias("n_dup_urls"),
            F.sum("keeper_id").cast("bigint").alias("keeper_idsum"),
        )
        .select(
            "domain", "n_urls", "n_canonical", "n_dup_urls",
            F.expr("CAST(n_dup_urls * 1000 div n_urls AS BIGINT)")
            .alias("dup_pm"),
            "keeper_idsum",
        )
        .orderBy("domain")
    )


def stream_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots enforcement AT THE INGEST DOOR — the stream-static join
    shape: the crawler's robots cache (per-domain parsed + compiled
    rule ARRAYS, a static dimension built once from the batch table)
    broadcasts against the arriving URL stream, and each micro-batch
    row decides its own verdict STATELESSLY via an array-expression
    argmax over its matching rules (F.filter + array_max over
    (plen, allow) structs — no per-URL window, no state store at
    all). This is how a fetch fleet actually consults robots: a
    broadcast rule cache and a per-URL O(rules) check.

    The drained per-URL decisions roll up batch-side to EXACTLY the
    web_robots_gate table (shared oracle): same longest-match /
    Allow-wins-ties /default-allow semantics, proven equal however
    the input splits into micro-batches."""
    from codegraph_spark.queries.web import (
        _raw_url,
        _robots_txt,
        canonicalize_url,
        compile_rules,
        parse_robots,
    )
    from codegraph_spark.sources.tables import load_table
    from codegraph_spark.streaming.incremental import (
        read_documents_stream,
        run_available_now,
    )

    bdocs = load_table(spark, sf_dir, "documents")
    bc = canonicalize_url(_raw_url("doc_id", "source"))
    domains = bdocs.select(bc["host"].alias("domain")).distinct()
    rules, delays = parse_robots(
        domains.select("domain", _robots_txt("domain").alias("txt"))
    )
    rules_arr = compile_rules(rules).groupBy("domain").agg(
        F.collect_list(F.struct("pat", "allow", "rx")).alias("rules")
    )

    docs = read_documents_stream(spark, sf_dir)
    c = canonicalize_url(_raw_url("doc_id", "source"))
    urls = docs.select(
        "doc_id",
        c["host"].alias("domain"),
        F.regexp_extract(
            c["canon"], r"^[a-z0-9+.\-]+://[^/]*(/.*)$", 1
        ).alias("path_query"),
    )
    matched = F.filter(
        F.col("rules"),
        lambda r: F.regexp_like(F.col("path_query"), r["rx"]),
    )
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                F.length(r["pat"]).alias("plen"), r["allow"].alias("allow")
            ),
        )
    )
    dec = urls.join(F.broadcast(rules_arr), "domain", "left").select(
        "doc_id",
        "domain",
        F.coalesce(best["allow"], F.lit(1)).alias("a"),
        F.coalesce(best["plen"], F.lit(0)).alias("plen"),
        F.when(best.isNull(), 1).otherwise(0).alias("isdef"),
    )
    drained = run_available_now(dec, output_mode="append")
    return (
        drained.groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.sum("a").cast("bigint").alias("n_allowed"),
            (F.count(F.lit(1)) - F.sum("a")).cast("bigint").alias("n_blocked"),
            F.coalesce(
                F.sum(F.when(F.col("a") == 0, F.col("doc_id"))), F.lit(0)
            ).cast("bigint").alias("blocked_idsum"),
            F.sum("isdef").cast("bigint").alias("n_default"),
            F.sum("plen").cast("bigint").alias("rule_lensum"),
        )
        .join(delays, "domain")
        .select(
            "domain", "crawl_delay_s", "n_urls", "n_allowed", "n_blocked",
            "blocked_idsum", "n_default", "rule_lensum",
        )
        .orderBy("domain")
    )


def stream_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-store dedup AT THE INGEST DOOR — the streaming twin of
    :func:`codegraph_spark.queries.dedup.dedup_incremental`, sharing
    its oracle byte-for-byte. The prior crawl's two persisted stores
    (distinct content hashes; distinct LSH (band, key) pairs) are
    static dimensions built batch-side once; each arriving fetch
    decides its prior-dup status with two stream-static joins and NO
    state store at all:

    - the per-doc MinHash signature is a PURE ARRAY EXPRESSION
      (array_min over the hashed shingle array, 16 components) — the
      same 3-word shingle set and band-key md5 as the batch machinery,
      so stream and batch signatures are bit-identical per text;
    - docs with < 3 words get an EMPTY band array (the batch side has
      no signature row for them), so a null-key can never
      false-match another shingle-less doc;
    - the crawl-overlap replay (%7 refetches, %11 in-batch mirrors)
      happens in-stream via a per-row instance explode, so the door
      sees exactly the batch's incoming multiset however the input
      splits into micro-batches.

    Only the within-batch first-seen (batch_dup vs new) finalizes in
    the drain rollup — that decision needs the batch's full h-groups
    (the stateful seen-set variant is stream_url_dedup's shape; here
    the door's job is the snapshot check). At 100 TB the h-store join
    is a per-micro-batch shuffle join against a parquet dimension (or
    a Bloom pre-filter ahead of it); the band store joins the ≤4
    exploded keys per doc."""
    from codegraph_spark.streaming.incremental import read_documents_stream

    return _incremental_door(
        spark, sf_dir, read_documents_stream(spark, sf_dir)
    )


def _incremental_door(
    spark: SparkSession, sf_dir: str, docs: DataFrame
) -> DataFrame:
    """Core of :func:`stream_dedup_incremental` over a caller-supplied
    document stream (split out so the multi-batch shuffled-stream test
    can inject read_documents_stream_shuffled)."""
    from codegraph_spark.queries.dedup import (
        _AB,
        _BANDS,
        _INC_MIRROR_OFF,
        _INC_REFETCH_OFF,
        _P,
        _shingle_array,
    )
    from codegraph_spark.sources.tables import load_table

    # --- static stores (the persisted snapshot dimensions) ---------------
    base = load_table(spark, sf_dir, "documents")
    prior_texts = (
        base.filter(F.col("doc_id") % 3 != 0)
        .select("text")
        .distinct()
    )

    def _mins_col() -> F.Column:
        """All 16 MinHash components in ONE traversal of the hashed
        shingle array: F.aggregate folds a 16-element running-min
        accumulator, zip_with'd against the constant (a, b) pairs. The
        obvious 16 x array_min(transform(...)) formulation rebuilds
        the shingle + md5 chain PER COMPONENT (measured ~5x the whole
        drain); here the hash chain evaluates once per row. Values lie
        in [0, P), so init = P is the identity. Empty shingle arrays
        keep the init accumulator and are masked by the size guard in
        _band_arr (batch side has no signature row for them)."""
        hs = F.transform(
            _shingle_array(),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
            .cast("bigint") % _P,
        )
        ab = F.array(
            *[
                F.struct(
                    F.lit(a).cast("bigint").alias("a"),
                    F.lit(b).cast("bigint").alias("b"),
                )
                for a, b in _AB
            ]
        )
        return F.aggregate(
            hs,
            F.array_repeat(F.lit(_P).cast("bigint"), len(_AB)),
            lambda acc, h: F.zip_with(
                acc, ab, lambda x, p: F.least(x, (p["a"] * h + p["b"]) % _P)
            ),
        )

    def _band_arr() -> F.Column:
        rows_per_band = len(_AB) // _BANDS
        cols = []
        for bidx in range(_BANDS):
            members = [
                F.element_at("mins", i + 1).cast("string")
                for i in range(bidx * rows_per_band, (bidx + 1) * rows_per_band)
            ]
            cols.append(
                F.struct(
                    F.lit(bidx).alias("band"),
                    F.md5(F.concat_ws(":", *members)).alias("key"),
                )
            )
        # < 3 words -> no shingles -> no signature batch-side: emit an
        # EMPTY band array, not keys folded from the init accumulator
        return F.when(
            F.col("has_sig"), F.array(*cols)
        ).otherwise(F.array().cast("array<struct<band:int,key:string>>"))

    # serving-cached like every store-shaped structure: in production
    # these ARE persisted tables the prior crawl wrote — rebuilding
    # them per drain would misprice the door's steady-state cost
    from codegraph_spark.serving import shared_df

    prior_bands = shared_df(
        spark, (sf_dir, "inc_prior_bands"),
        lambda: prior_texts.select(
            _mins_col().alias("mins"),
            (F.size(_shingle_array()) > 0).alias("has_sig"),
        )
        .filter("has_sig")
        .select(F.explode(_band_arr()).alias("bk"))
        .select(F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
        .distinct(),
    )
    prior_h = shared_df(
        spark, (sf_dir, "inc_prior_h"),
        lambda: base.filter(F.col("doc_id") % 3 != 0)
        .select(F.md5("text").alias("h"))
        .distinct()
        .withColumn("exactf", F.lit(1)),
    )

    # --- the door: arriving fetches ---------------------------------------
    nat = (F.col("doc_id") % 3 == 0)
    inst = F.filter(
        F.array(
            F.when(nat, F.col("doc_id")),
            F.when(
                ~nat & (F.col("doc_id") % 7 == 0),
                F.col("doc_id") + _INC_REFETCH_OFF,
            ),
            F.when(
                nat & (F.col("doc_id") % 11 == 0),
                F.col("doc_id") + _INC_MIRROR_OFF,
            ),
        ),
        lambda x: x.isNotNull(),
    )
    # repartition ahead of the signature fold: a single-file local
    # source arrives as ONE partition and would run the per-doc
    # shingle+MinHash chain on one core (the stream_dedup_minhash
    # rationale; no-op on a partitioned source)
    arriving = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
    ).select(
        "source", "text", F.explode(inst).alias("doc_id")
    )
    signed = arriving.select(
        "source", "doc_id",
        F.md5("text").alias("h"),
        _mins_col().alias("mins"),
        (F.size(_shingle_array()) > 0).alias("has_sig"),
    ).select(
        "source", "doc_id", "h",
        F.explode_outer(_band_arr()).alias("bk"),
    )
    dec = (
        signed.join(F.broadcast(prior_h), "h", "left")
        .join(
            F.broadcast(prior_bands),
            (F.col("bk.band") == F.col("band"))
            & (F.col("bk.key") == F.col("key")),
            "left",
        )
        .select(
            "source", "doc_id", "h",
            F.coalesce("exactf", F.lit(0)).alias("exactf"),
            F.when(F.col("band").isNotNull(), 1).otherwise(0).alias("bhit"),
        )
    )
    drained = run_available_now(dec, output_mode="append")

    # --- batch-side finalize (shared-oracle rollup) -----------------------
    per_doc = drained.groupBy("source", "doc_id", "h").agg(
        F.max("exactf").alias("exactf"),
        F.max("bhit").alias("nearf"),
    )
    # gh2 shares per_doc's lineage (the r10-verdict SemDeDup lesson):
    # rename its key so the join condition references two UNIQUE
    # column names and self-join resolution never has to guess
    gh2 = (
        per_doc.groupBy("h")
        .agg(F.min("doc_id").alias("min_in"))
        .withColumnRenamed("h", "h_g")
    )
    cls = per_doc.join(gh2, F.col("h") == F.col("h_g")).select(
        "source",
        F.when(F.col("exactf") == 1, "exact_prior")
        .when(F.col("nearf") == 1, "near_prior")
        .when(F.col("doc_id") > F.col("min_in"), "batch_dup")
        .otherwise("new")
        .alias("cls"),
        (
            F.conv(F.substring("h", 1, 15), 16, 10).cast("bigint") % _P
        ).alias("hnum"),
    )
    return (
        cls.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_incoming"),
            F.sum(F.when(F.col("cls") == "exact_prior", 1).otherwise(0))
            .cast("bigint").alias("n_exact_prior"),
            F.sum(F.when(F.col("cls") == "near_prior", 1).otherwise(0))
            .cast("bigint").alias("n_near_prior"),
            F.sum(F.when(F.col("cls") == "batch_dup", 1).otherwise(0))
            .cast("bigint").alias("n_batch_dup"),
            F.sum(F.when(F.col("cls") == "new", 1).otherwise(0))
            .cast("bigint").alias("n_new"),
            F.sum(F.when(F.col("cls") == "new", F.col("hnum")).otherwise(0))
            .cast("bigint").alias("admitted_hashsum"),
        )
        .orderBy("source")
    )


QUERIES = {
    "stream_url_dedup": stream_url_dedup,
    "stream_robots_gate": stream_robots_gate,
    "stream_dedup_incremental": stream_dedup_incremental,
    "stream_image_meta": stream_image_meta,
    "stream_html_extract": stream_html_extract,
    "stream_html_extract_dirty": stream_html_extract_dirty,
    "stream_dedup_minhash": stream_dedup_minhash,
    "stream_dedup_minhash_ooo": stream_dedup_minhash_ooo,
    "stream_transition_matrix": stream_transition_matrix,
    "stream_transitions_ooo": stream_transitions_ooo,
    "stream_cusum_drift": stream_cusum_drift,
    "stream_cms_topk": stream_cms_topk,
    "stream_quantiles_sketch": stream_quantiles_sketch,
    "stream_kmv_distinct": stream_kmv_distinct,
    "stream_hll_distinct": stream_hll_distinct,
    "stream_hourly_counts": stream_hourly_counts,
    "stream_hopping_counts": stream_hopping_counts,
    "stream_funnel": stream_funnel,
    "stream_asof": stream_asof,
    "stream_running_totals": stream_running_totals,
    "stream_dedup_exact": stream_dedup_exact,
    "stream_sessionize": stream_sessionize,
    "stream_interval_join": stream_interval_join,
}
from codegraph_spark.queries.events import (  # noqa: E402
    _QUANTILE_SKETCH_SQL as _STREAM_QSK_SQL,
)

from codegraph_spark.queries.web import (  # noqa: E402
    _URL_DEDUP_SQL as _STREAM_URL_DEDUP_SQL,
)

from codegraph_spark.queries.web import (  # noqa: E402
    _ROBOTS_SQL as _STREAM_ROBOTS_SQL,
)

from codegraph_spark.queries.dedup import (  # noqa: E402
    _incremental_sql as _stream_incremental_sql,
)

ORACLES = {
    "stream_url_dedup": _STREAM_URL_DEDUP_SQL,
    "stream_robots_gate": _STREAM_ROBOTS_SQL,
    "stream_dedup_incremental": _stream_incremental_sql(),
    "stream_image_meta": _STREAM_MM_META_SQL,
    "stream_html_extract": _STREAM_HTML_EXTRACT_SQL,
    "stream_html_extract_dirty": _STREAM_HTML_DIRTY_SQL,
    "stream_dedup_minhash": _stream_minhash_dedup_sql(),
    "stream_quantiles_sketch": _STREAM_QSK_SQL,
    "stream_dedup_minhash_ooo": _stream_minhash_dedup_sql(),
    "stream_transition_matrix": _STREAM_TRANSITION_SQL,
    "stream_transitions_ooo": _STREAM_TRANSITION_SQL,
    "stream_cusum_drift": _STREAM_CUSUM_SQL,
    "stream_cms_topk": _STREAM_CMS_SQL,
    "stream_kmv_distinct": _STREAM_KMV_SQL,
    "stream_hll_distinct": _stream_hll_sql(),
    "stream_interval_join": _STREAM_INTERVAL_SQL,
    "stream_sessionize": _STREAM_SESSIONIZE_SQL,
    "stream_hourly_counts": _STREAM_HOURLY_SQL,
    "stream_hopping_counts": _STREAM_HOPPING_SQL,
    "stream_funnel": _STREAM_FUNNEL_SQL,
    "stream_asof": _asof_oracle(),
    "stream_running_totals": _STREAM_RUNNING_SQL,
    "stream_dedup_exact": _STREAM_DEDUP_SQL,
}
