"""Event-stream operators on the events table — batch equivalents of
the Structured Streaming surface (codegraph_spark.streaming runs the
same aggregations incrementally; these batch twins are the oracle-
checkable semantics)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codegraph_spark.sources.tables import load_table


def ev_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate (1h × event_type): the windowed-agg
    shape of the streaming pipeline, as date_trunc for oracle parity."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("string").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


_HOURLY_SQL = """
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
       count(*) AS n, ROUND(CAST(sum(value) AS DOUBLE), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


def ev_hopping_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING-window aggregate (1 h windows sliding every 15 min ×
    event_type): the overlapping-window shape Structured Streaming's
    ``window(ts, '1 hour', '15 minutes')`` produces — each event lands
    in exactly 4 windows, so dashboards get a smoothed hourly rate
    without waiting for an hour boundary. Spark's built-in slide
    enumeration (epoch-aligned window starts) does the fan-out
    JVM-side; the oracle enumerates the same 4 starts by integer
    epoch arithmetic. Scale shape: one scan, a 4× map-side row
    fan-out, one (window, type)-keyed agg — partial aggregation
    absorbs the fan-out before the shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


_HOPPING_SQL = """
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


def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative
    sum of gap flags per user — the batch twin of
    ``session_window(ts, '30 minutes')``."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = (
        ev.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("session_id", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


_SESSIONIZE_SQL = """
SELECT user_id, session_id, count(*) AS n_events,
       ROUND(CAST(sum(value) AS DOUBLE), 2) AS session_value
FROM (
    SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM (
        SELECT *, CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       THEN 1 ELSE 0 END AS new_sess
        FROM events
    )
)
GROUP BY user_id, session_id
"""


def ev_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (the props overflow-map pattern —
    SURVEY §1.6 'props MapType' column; serving layer uses to_json)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.select("event_id", k.alias("k")).filter(F.col("k") > 50)


_JSON_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
"""


def ev_top3_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per type (window top-k on the stream
    table)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("event_type", "event_id", F.round("value", 2).alias("value"), "rn")
    )


_TOP3_SQL = """
SELECT event_type, event_id, ROUND(CAST(value AS DOUBLE), 2) AS value, rn
FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS INT) AS rn
    FROM events
) WHERE rn <= 3
"""


def ev_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile aggregation per event_type (p50/p90/p99 of value).

    Gate variant uses EXACT ``percentile`` (linear interpolation — same
    semantics as DuckDB ``quantile_cont``) so the oracle can match
    bit-for-bit after rounding. The 100 TB path swaps in
    ``approx_percentile`` (t-digest sketch, mergeable map-side partials,
    bounded memory per group) — one identifier change, same plan shape;
    exact percentile must hold a full per-group value buffer, which is
    the scale hazard."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            *[
                F.round(F.percentile("value", q), 4).alias(name)
                for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
            ],
        )
    )


_QUANTILES_SQL = """
SELECT event_type, count(*) AS n,
       ROUND(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS p50,
       ROUND(CAST(quantile_cont(value, 0.9) AS DOUBLE), 4) AS p90,
       ROUND(CAST(quantile_cont(value, 0.99) AS DOUBLE), 4) AS p99
FROM events
GROUP BY event_type
"""


# --- ev_asof_join: most-recent-prior match (as-of / point-in-time join) -------
def ev_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent view
    at-or-before the purchase time (ties on ts broken toward the
    highest event_id, views sorting before purchases at equal ts).

    Spark has no native as-of join; the naive plan is a per-key
    correlated top-1 (quadratic on hot users). This is the distributed
    union-and-carry pattern instead: tag both streams, union, ONE
    window per user ordered by (ts, tag, event_id) carrying the last
    view forward (``last(..., ignoreNulls)``), then keep the purchase
    rows. One shuffle on user_id total, row-linear, no Python in the
    hot path — the same shape at any scale. Gap is integer microsecond
    arithmetic (no float epoch)."""
    ev = load_table(spark, sf_dir, "events")
    tagged = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .select(
            "event_id", "user_id", "ts",
            F.when(F.col("event_type") == "view", 0).otherwise(1).alias("tag"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.select(
        "event_id", "user_id", "ts", "tag",
        F.last(F.when(F.col("tag") == 0, F.col("event_id")), ignorenulls=True)
        .over(w).alias("view_event_id"),
        F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True)
        .over(w).alias("view_ts"),
    )
    return (
        carried.filter(F.col("tag") == 1)
        .select(
            F.col("event_id").alias("purchase_event_id"),
            "user_id",
            # unmatched purchases keep left-join semantics but emit -1
            # sentinels: NULLs in an integer column make pandas/DuckDB
            # render the whole column float64, which is exactly the
            # dtype-mismatch class the gate hashes red.
            F.coalesce("view_event_id", F.lit(-1)).alias("view_event_id"),
            # ts is TIMESTAMP_NTZ; cast for unix_micros (session is
            # pinned UTC, and a difference cancels any zone anyway)
            F.coalesce(
                F.floor(
                    (
                        F.unix_micros(F.col("ts").cast("timestamp"))
                        - F.unix_micros(F.col("view_ts").cast("timestamp"))
                    )
                    / 1_000_000
                ).cast("bigint"),
                F.lit(-1).cast("bigint"),
            ).alias("gap_s"),
        )
    )


# Oracle: correlated top-1 — picks max (ts, event_id) among views at or
# before the purchase, exactly what the carry-forward window selects.
_ASOF_SQL = """
SELECT p.event_id AS purchase_event_id, p.user_id,
       CAST(COALESCE(v.event_id, -1) AS BIGINT) AS view_event_id,
       CAST(COALESCE((epoch_us(p.ts) - epoch_us(v.ts)) // 1000000, -1) AS BIGINT) AS gap_s
FROM events p
LEFT JOIN LATERAL (
    SELECT e.event_id, e.ts FROM events e
    WHERE e.user_id = p.user_id AND e.event_type = 'view' AND e.ts <= p.ts
    ORDER BY e.ts DESC, e.event_id DESC
    LIMIT 1
) v ON TRUE
WHERE p.event_type = 'purchase'
"""


# --- ev_range_join_tiers: band/range join against a tier dimension ------------
_TIERS = [(0.0, 10.0, "low"), (10.0, 100.0, "mid"), (100.0, 1e18, "high")]


def ev_range_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: classify each event's value into a tier
    [lo, hi) from a tiny dimension, then roll up per (event_type,
    tier). The dimension is broadcast so the range predicate evaluates
    at the scan (a shuffle range-join would be a scale bug for a
    bounded tier table); events with value outside every band drop out
    (inner join semantics)."""
    ev = load_table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(_TIERS, ["lo", "hi", "tier"])
    joined = ev.join(
        F.broadcast(tiers),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
    )
    return (
        joined.groupBy("event_type", "tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type", "tier")
    )


_RANGE_SQL = """
SELECT event_type, tier, count(*) AS n,
       ROUND(CAST(sum(value) AS DOUBLE), 2) AS total_value
FROM events e
JOIN (VALUES (0.0, 10.0, 'low'), (10.0, 100.0, 'mid'),
             (100.0, 1e18, 'high')) AS t(lo, hi, tier)
  ON e.value >= t.lo AND e.value < t.hi
GROUP BY event_type, tier
ORDER BY event_type, tier
"""


# --- ev_retention: signup-cohort retention matrix -----------------------------
def ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted by
    how many are active again k days later (k = 1..7). Two
    aggregations and one join, all keyed on user_id/cohort — the
    classic product-analytics matrix, shuffle-bounded by distinct
    (user, day) pairs, never raw events. Day arithmetic is integer
    (epoch days), output is integer counts + per-mille retention."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_date(F.to_date("ts")).alias("day")
    )
    user_days = ev.distinct()
    first_day = user_days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    joined = user_days.join(first_day, "user_id").select(
        "user_id", "cohort_day", (F.col("day") - F.col("cohort_day")).alias("k")
    )
    cohort_size = first_day.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    ret = (
        joined.filter((F.col("k") >= 1) & (F.col("k") <= 7))
        .groupBy("cohort_day", "k")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    return (
        ret.join(cohort_size, "cohort_day")
        .select(
            "cohort_day", "k", "n_active", "n_users",
            F.floor(F.col("n_active") * 1000 / F.col("n_users"))
            .cast("bigint").alias("retained_pm"),
        )
        .orderBy("cohort_day", "k")
    )


_RETENTION_SQL = """
WITH user_days AS (
    SELECT DISTINCT user_id, CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
    FROM events
),
first_day AS (
    SELECT user_id, min(day) AS cohort_day FROM user_days GROUP BY user_id
),
cohort_size AS (
    SELECT cohort_day, count(*) AS n_users FROM first_day GROUP BY cohort_day
),
ret AS (
    SELECT f.cohort_day, u.day - f.cohort_day AS k,
           count(DISTINCT u.user_id) AS n_active
    FROM user_days u JOIN first_day f USING (user_id)
    WHERE u.day - f.cohort_day BETWEEN 1 AND 7
    GROUP BY 1, 2
)
SELECT r.cohort_day, r.k, r.n_active, c.n_users,
       CAST(FLOOR(r.n_active * 1000 / CAST(c.n_users AS DOUBLE)) AS BIGINT) AS retained_pm
FROM ret r JOIN cohort_size c USING (cohort_day)
ORDER BY cohort_day, k
"""


# --- ev_hourly_dense: time-series gap filling ---------------------------------
def ev_hourly_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series for one event type: the calendar spine
    (sequence over the min..max hour range — generated, not scanned)
    left-joins the sparse hourly counts so missing hours surface as
    explicit zeros. The spine generation is O(#hours) on one row then
    exploded — never a shuffle of the fact table; the join key is the
    hour bucket both sides."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    hours = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    )
    sparse = hours.groupBy("hour").agg(F.count(F.lit(1)).alias("n"))
    bounds = hours.agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour")
    )
    return (
        spine.join(sparse, "hour", "left")
        .na.fill(0, ["n"])
        .select(F.col("hour").cast("string").alias("hour"), "n")
        .orderBy("hour")
    )


_DENSE_SQL = """
WITH sparse AS (
    SELECT date_trunc('hour', ts) AS hour, count(*) AS n
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM sparse),
spine AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
)
SELECT CAST(s.hour AS VARCHAR) AS hour, COALESCE(p.n, 0) AS n
FROM spine s LEFT JOIN sparse p ON p.hour = s.hour
ORDER BY hour
"""


# --- ev_outliers: quantile-threshold anomaly detection ------------------------
def ev_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type tail anomalies: events above their type's p99. The
    thresholds are a 5-row aggregate broadcast back onto the stream —
    the scan-side filter shape (never a sort of the full table); both
    engines compare against the 1e-4-rounded threshold so the
    membership boundary is on a shared grid, not a last-ULP
    interpolation difference. Exact percentile for the gate;
    approx_percentile (t-digest) is the 100 TB swap, as in
    ev_value_quantiles."""
    ev = load_table(spark, sf_dir, "events")
    thr = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99")
    )
    return (
        ev.join(F.broadcast(thr), "event_type")
        .filter(F.col("value") > F.col("p99"))
        .groupBy("event_type", "p99")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .orderBy("event_type")
    )


_OUTLIERS_SQL = """
WITH thr AS (
    SELECT event_type,
           ROUND(CAST(quantile_cont(value, 0.99) AS DOUBLE), 4) AS p99
    FROM events GROUP BY event_type
)
SELECT e.event_type, t.p99, count(*) AS n_outliers,
       ROUND(CAST(max(e.value) AS DOUBLE), 2) AS max_value
FROM events e JOIN thr t ON e.event_type = t.event_type
WHERE e.value > t.p99
GROUP BY e.event_type, t.p99
ORDER BY e.event_type
"""


# --- ev_rollup: hierarchical grouping-sets aggregate --------------------------
def ev_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (event_type, value tier): per-(type, tier) counts
    plus per-type subtotals plus the grand total in one pass —
    Catalyst expands the grouping sets into a single shuffle (each
    input row fans out to its grouping combinations map-side), vs the
    naive three separate aggregations. grouping_id() disambiguates the
    subtotal rows; NULL group values render as '(all)' so the gate
    hash is explicit about which NULL is a subtotal."""
    ev = load_table(spark, sf_dir, "events")
    tier = F.when(F.col("value") < 10, "low").when(F.col("value") < 100, "mid").otherwise("high")
    return (
        ev.select("event_type", tier.alias("tier"), "value")
        .rollup("event_type", "tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.grouping_id().alias("gid"),
        )
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce("tier", F.lit("(all)")).alias("tier"),
            "n", "total_value", "gid",
        )
        .orderBy("gid", "event_type", "tier")
    )


_ROLLUP_SQL = """
SELECT COALESCE(event_type, '(all)') AS event_type,
       COALESCE(tier, '(all)') AS tier,
       count(*) AS n,
       ROUND(CAST(sum(value) AS DOUBLE), 2) AS total_value,
       CAST(GROUPING(event_type) * 2 + GROUPING(tier) AS BIGINT) AS gid
FROM (
    SELECT event_type,
           CASE WHEN value < 10 THEN 'low'
                WHEN value < 100 THEN 'mid' ELSE 'high' END AS tier,
           value
    FROM events
)
GROUP BY ROLLUP (event_type, tier)
ORDER BY gid, event_type, tier
"""


# --- ev_pivot: wide per-user activity matrix ----------------------------------
_PIVOT_TYPES = ["view", "click", "purchase", "signup", "error"]


def ev_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT event_type into per-type count columns, one row per user
    bucket (user_id % 100) — the feature-matrix shape. The pivot value
    list is EXPLICIT (the five known types): with it, Catalyst compiles
    straight to one aggregation with conditional counters (exactly the
    oracle's CASE WHEN program); without it, Spark must first run a
    distinct-values job. Unlisted types would be dropped by design."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select((F.col("user_id") % 100).alias("user_bucket"), "event_type")
        .groupBy("user_bucket")
        .pivot("event_type", _PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _PIVOT_TYPES)
        .orderBy("user_bucket")
    )


_PIVOT_SQL = """
SELECT user_id % 100 AS user_bucket,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error
FROM events
GROUP BY 1
ORDER BY 1
"""


# --- ev_funnel: ordered-step conversion funnel -------------------------------
_FUNNEL_STEPS = ["view", "click", "purchase"]


def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user
    converts at step k only with an event of that type STRICTLY AFTER
    their step-(k-1) time (first-touch semantics: the earliest
    qualifying event defines each step time).

    Scale shape: each stage filters events to ONE type before any
    shuffle (the per-type slice is a fraction of the corpus), joins the
    previous stage's per-user step time on user_id, and re-aggregates —
    stage cost tracks the surviving cohort, which only shrinks. All
    stages shuffle on the same user_id key, so a pre-partitioned /
    bucketed events table co-locates every stage. The output is
    3 rows of integer counts + per-mille conversion (integer math)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_prev"))
    )
    stages = [s1]
    for step in _FUNNEL_STEPS[1:]:
        prev = stages[-1]
        stages.append(
            ev.filter(F.col("event_type") == step)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t_prev"))
        )
    counts = [s.agg(F.count(F.lit(1)).alias("n_users")) for s in stages]
    out = None
    for i, (step, c) in enumerate(zip(_FUNNEL_STEPS, counts)):
        row = c.select(
            F.lit(i + 1).alias("step_no"),
            F.lit(step).alias("step"),
            F.col("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    # conversion vs the previous step, per-mille, integer floor
    # division; NULLIF guards the empty-corpus case (0-user steps
    # yield NULL conversion, not a division error under ANSI mode)
    w = Window.orderBy("step_no")
    return out.select(
        "step_no", "step", "n_users",
        F.floor(
            F.col("n_users") * 1000
            / F.nullif(
                F.coalesce(F.lag("n_users").over(w), F.col("n_users")),
                F.lit(0),
            )
        ).cast("bigint").alias("conv_pm"),
    )


_FUNNEL_SQL = """
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
),
counts AS (
    SELECT 1 AS step_no, 'view' AS step, count(*) AS n_users FROM s1
    UNION ALL SELECT 2, 'click', count(*) FROM s2
    UNION ALL SELECT 3, 'purchase', count(*) FROM s3
)
SELECT step_no, step, n_users,
       CAST(FLOOR(n_users * 1000 / NULLIF(CAST(COALESCE(
           lag(n_users) OVER (ORDER BY step_no), n_users) AS DOUBLE), 0)) AS BIGINT) AS conv_pm
FROM counts
"""


# --- ev_inactive_gap: per-user maximum inactivity (churn signal) --------------
def ev_inactive_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user churn signal: the LONGEST gap (whole seconds) between
    consecutive events, the mean gap (integer-floored), and the event
    count — the inactivity profile a retention pipeline thresholds on.
    One lag window partitioned by user (no global window), one
    map-side-combining per-user agg; single-event users report NULL
    gaps rather than fabricating zeros."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact microsecond arithmetic: truncating each timestamp to whole
    # seconds before subtracting loses the sub-second field and is
    # engine-divergent; integer micros never are
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    return (
        ev.withColumn("gap_us", gap)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("max(gap_us) div 1000000").alias("max_gap_s"),
            F.expr("(sum(gap_us) div count(gap_us)) div 1000000").alias("mean_gap_s"),
        )
    )


_INACTIVE_SQL = """
SELECT user_id, count(*) AS n_events,
       CAST(max(gap_us) // 1000000 AS BIGINT) AS max_gap_s,
       CAST((sum(gap_us) // count(gap_us)) // 1000000 AS BIGINT) AS mean_gap_s
FROM (
    SELECT user_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               AS gap_us
    FROM events
)
GROUP BY user_id
"""


# --- ev_dau_wau: daily/weekly active users + stickiness -----------------------
def ev_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day active users, the calendar-week active-user pool, and
    the DAU/WAU stickiness ratio (per-mille, integer) — the
    top-of-dashboard engagement metric. One distinct over (day, user)
    — the only corpus-sized shuffle — then two map-side-combining
    rollups joined on the week key (a tiny dimension at any scale)."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("week", "ts").alias("week"),
        "user_id",
    ).distinct()
    dau = du.groupBy("day", "week").agg(F.count(F.lit(1)).alias("dau"))
    wau = du.groupBy("week").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "week")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.expr("dau * 1000 div wau").alias("stickiness_pm"),
        )
    )


_DAU_WAU_SQL = """
WITH du AS (
    SELECT DISTINCT date_trunc('day', ts) AS day,
                    date_trunc('week', ts) AS week,
                    user_id
    FROM events
),
dau AS (SELECT day, week, count(*) AS dau FROM du GROUP BY day, week),
wau AS (SELECT week, count(DISTINCT user_id) AS wau FROM du GROUP BY week)
SELECT CAST(dau.day AS VARCHAR) AS day, dau.dau AS dau, wau.wau AS wau,
       CAST(dau.dau * 1000 // wau.wau AS BIGINT) AS stickiness_pm
FROM dau JOIN wau USING (week)
"""


# --- ev_cms_topk: Count-Min Sketch heavy hitters + exactness audit ------------
#: sketch geometry (Cormode & Muthukrishnan 2005): d hash rows × w
#: buckets. Hashes are md5-derived (the repo's one cross-engine hash
#: rule), seeded by the row index, so both engines build the identical
#: sketch bit for bit.
_CMS_D, _CMS_W, _CMS_TOPK = 4, 256, 10


def ev_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection through a COUNT-MIN SKETCH, with the
    exact counts alongside as the overestimate audit: build the d×w
    sketch over event_type, estimate each type as min over rows of its
    bucket counter, rank top-10 by estimate, and report estimate vs
    exact (+overestimate in per-mille). The sketch is the bounded-state
    answer when the key domain is too large to count exactly (URLs,
    n-grams, IPs) — here the audit shape proves the machinery and
    MEASURES its error instead of trusting it.

    Scale shape: the sketch build is one explode(×d) + one map-side-
    combining GROUP BY into d·w = 1024 cells — bounded state
    regardless of corpus size (the reason the operator exists); the
    estimate stage joins the DISTINCT key set against the broadcast
    1024-cell sketch; exact counts ride the same pre-aggregated
    (type)-keyed rows. Everything int64."""
    sketch = cms_probe_rows(
        load_table(spark, sf_dir, "events").select("event_type")
    ).groupBy("hrow", "bucket").agg(F.count(F.lit(1)).alias("cell"))
    return cms_topk_from_sketch(spark, sf_dir, sketch)


def _cms_bucket() -> "F.Column":
    """md5-seeded bucket of (hrow, event_type) — identical expression
    in the batch op, the streaming op, and (interpolated) the oracle."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("hrow"), F.col("event_type"))),
                1, 15,
            ),
            16, 10,
        ).cast("bigint") % _CMS_W
    )


def cms_probe_rows(ev: DataFrame) -> DataFrame:
    """(hrow, bucket) probe stream — one row per (event, hash row);
    works identically on a batch or streaming DataFrame (stateless
    projections only)."""
    return ev.select(
        "event_type",
        F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)])).alias("hrow"),
    ).select("hrow", _cms_bucket().alias("bucket"))


def cms_topk_from_sketch(
    spark: SparkSession, sf_dir: str, sketch: DataFrame
) -> DataFrame:
    """Estimate + audit phase over a built d×w sketch: min-over-rows
    estimates for the distinct keys against the broadcast sketch,
    exact counts alongside, top-10 by estimate."""
    exact = load_table(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    keyed = exact.select(
        "event_type", "exact_n",
        F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)])).alias("hrow"),
    ).select("event_type", "exact_n", "hrow", _cms_bucket().alias("bucket"))
    est = (
        keyed.join(F.broadcast(sketch), ["hrow", "bucket"])
        .groupBy("event_type", "exact_n")
        .agg(F.min("cell").alias("cms_est"))
    )
    return (
        est.select(
            "event_type", "cms_est", "exact_n",
            F.expr("((cms_est - exact_n) * 1000) div exact_n").alias("overest_pm"),
        )
        .orderBy(F.desc("cms_est"), "event_type")
        .limit(_CMS_TOPK)
    )


_CMS_SQL = f"""
WITH probes AS (
    SELECT h.hrow,
           CAST(('0x' || substr(md5(CAST(h.hrow AS VARCHAR) || ':' || event_type),
                                1, 15)) AS BIGINT) % {_CMS_W} AS bucket
    FROM events CROSS JOIN (SELECT unnest(range(0, {_CMS_D})) AS hrow) h
),
sketch AS (
    SELECT hrow, bucket, CAST(count(*) AS BIGINT) AS cell
    FROM probes GROUP BY hrow, bucket
),
exact AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS exact_n
    FROM events GROUP BY event_type
),
keyed AS (
    SELECT e.event_type, e.exact_n, h.hrow,
           CAST(('0x' || substr(md5(CAST(h.hrow AS VARCHAR) || ':' || e.event_type),
                                1, 15)) AS BIGINT) % {_CMS_W} AS bucket
    FROM exact e CROSS JOIN (SELECT unnest(range(0, {_CMS_D})) AS hrow) h
),
est AS (
    SELECT k.event_type, k.exact_n, min(s.cell) AS cms_est
    FROM keyed k JOIN sketch s ON s.hrow = k.hrow AND s.bucket = k.bucket
    GROUP BY k.event_type, k.exact_n
)
SELECT event_type, CAST(cms_est AS BIGINT) AS cms_est, exact_n,
       CAST(((cms_est - exact_n) * 1000) // exact_n AS BIGINT) AS overest_pm
FROM est
ORDER BY cms_est DESC, event_type
LIMIT {_CMS_TOPK}
"""


# --- ev_kmv_distinct: K-minimum-values cardinality sketch + audit -------------
#: KMV (Bar-Yossef et al. 2002): keep the k smallest hash values of a
#: set; estimate |set| = (k-1)·H/h_k where h_k is the k-th smallest
#: and H the hash range (16^15 here — the md5-prefix space the repo's
#: hash rule already uses). Deterministic given the hash, so the
#: oracle matches bit for bit — the property HyperLogLog (whose
#: engine internals differ) can never give a cross-engine gate.
_KMV_K = 32
_KMV_H = float(16**15)


def ev_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user cardinality per event_type through a KMV sketch,
    with exact distinct counts alongside as the error audit — the
    bounded-state answer when the key domain (users, URLs, n-grams)
    is too large for exact distinct: the sketch is k int64 values per
    group, mergeable by keep-smallest-k, the streaming/partial-agg
    shape approx_count_distinct uses with HLL but deterministic.

    Small groups (< k distinct) report their exact count (the sketch
    is exact below its capacity). Scale shape: one distinct over
    (type, user) — the same two-stage distinct every exact count
    pays — then a per-type k-smallest window (state k rows per
    group); the estimate arithmetic is a per-row IEEE chain."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    hashed = ev.distinct().select(
        "event_type",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("bigint").alias("h"),
    )
    w = Window.partitionBy("event_type").orderBy("h")
    small = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("event_type")
        .agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("n_kept"))
    )
    exact = hashed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    est = (
        exact.join(small, "event_type")
        .select(
            "event_type", "n_exact",
            F.when(F.col("n_kept") < _KMV_K, F.col("n_exact"))
            .otherwise(
                F.floor(
                    F.lit(_KMV_K - 1) * F.lit(_KMV_H) / F.col("hk")
                ).cast("bigint")
            )
            .alias("kmv_est"),
        )
    )
    return (
        est.select(
            "event_type", "n_exact", "kmv_est",
            F.expr("(abs(kmv_est - n_exact) * 1000) div n_exact").alias("err_pm"),
        )
        .orderBy("event_type")
    )


_KMV_SQL = f"""
WITH hashed AS (
    SELECT DISTINCT event_type,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
    FROM events
),
small AS (
    SELECT event_type, CAST(max(h) AS BIGINT) AS hk,
           CAST(count(*) AS BIGINT) AS n_kept
    FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM hashed
    ) WHERE rn <= {_KMV_K}
    GROUP BY event_type
),
exact AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact FROM hashed
    GROUP BY event_type
),
est AS (
    SELECT e.event_type, e.n_exact,
           CASE WHEN s.n_kept < {_KMV_K} THEN e.n_exact
                ELSE CAST(floor({_KMV_K - 1} * {_KMV_H!r} / s.hk) AS BIGINT)
           END AS kmv_est
    FROM exact e JOIN small s USING (event_type)
)
SELECT event_type, n_exact, kmv_est,
       CAST((abs(kmv_est - n_exact) * 1000) // n_exact AS BIGINT) AS err_pm
FROM est
ORDER BY event_type
"""


# --- ev_kmv_overlap: set-overlap estimation from KMV sketches -----------------
def ev_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience OVERLAP between daily active-user sets
    estimated from KMV sketches — the set-OPERATION power cardinality
    sketches buy (Beyer et al. 2007; the theta-sketch idea): for
    segments A and B, the k smallest hashes of A∪B are computable
    from the two k-sets alone, and the fraction of them present in
    BOTH sketches is an unbiased Jaccard estimate. The full per-pair
    scan never runs — at 100 TB you keep one 32-int64 sketch per
    segment and answer any pairwise overlap (day-over-day retention
    overlap here; event types all share one audience in this corpus,
    so days are the NON-VACUOUS segmentation: exact Jaccard 0.77-0.84)
    from sketches. Exact Jaccard rides along as the error audit
    (gate-scale only). Deterministic given the md5 hash rule, so the
    oracle replays every step.

    Scale shape: one distinct + one per-segment k-smallest window
    (bounded state, as ev_kmv_distinct), then a segments×segments
    sketch join (never corpus-sized); the exact audit is one
    user-keyed self-join at gate scale."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select(F.dayofmonth("ts").alias("seg"), "user_id")
        .filter(F.col("seg") <= _OVERLAP_DAYS)
        .select(F.col("seg").cast("string").alias("seg"), "user_id")
    )
    hashed = ev.distinct().select(
        "seg", "user_id",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("bigint").alias("h"),
    )
    w = Window.partitionBy("seg").orderBy("h")
    sketches = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("seg")
        .agg(F.array_sort(F.collect_list("h")).alias("sk"))
    )
    a = sketches.select(F.col("seg").alias("seg_a"),
                        F.col("sk").alias("ska"))
    b = sketches.select(F.col("seg").alias("seg_b"),
                        F.col("sk").alias("skb"))
    est = (
        a.join(b, F.col("seg_a") < F.col("seg_b"))
        .select(
            "seg_a", "seg_b",
            F.expr(
                f"slice(array_sort(array_distinct(concat(ska, skb))),"
                f" 1, {_KMV_K})"
            ).alias("sku"),
            F.array_intersect("ska", "skb").alias("both"),
        )
        .select(
            "seg_a", "seg_b",
            F.expr(
                "CAST(size(array_intersect(sku, both)) * 1000"
                " div size(sku) AS BIGINT)"
            ).alias("jac_est_pm"),
        )
    )
    ua = hashed.select(F.col("seg").alias("seg_a"), "user_id")
    ub = hashed.select(F.col("seg").alias("seg_b"), "user_id")
    inter = (
        ua.join(ub, "user_id")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    nn = hashed.groupBy("seg").agg(F.count(F.lit(1)).alias("n"))
    exact = (
        inter
        .join(nn.select(F.col("seg").alias("seg_a"),
                        F.col("n").alias("na")), "seg_a")
        .join(nn.select(F.col("seg").alias("seg_b"),
                        F.col("n").alias("nb")), "seg_b")
        .select(
            "seg_a", "seg_b",
            F.expr("CAST(n_inter * 1000 div (na + nb - n_inter) AS BIGINT)")
            .alias("jac_pm"),
        )
    )
    return (
        exact.join(est, ["seg_a", "seg_b"])
        .select(
            "seg_a", "seg_b", "jac_pm", "jac_est_pm",
            F.expr("CAST(abs(jac_est_pm - jac_pm) AS BIGINT)")
            .alias("err_abs_pm"),
        )
        .orderBy("seg_a", "seg_b")
    )


#: day-of-month horizon for the overlap gate: first week only, so the
#: pair table stays 21 rows and the gate is quick.
_OVERLAP_DAYS = 7


_KMV_OVERLAP_SQL = f"""
WITH hashed AS (
    SELECT DISTINCT CAST(day(ts) AS VARCHAR) AS seg, user_id,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
    FROM events WHERE day(ts) <= {_OVERLAP_DAYS}
),
sketches AS (
    SELECT seg, list_sort(list(h)) AS sk
    FROM (
        SELECT seg, h,
               row_number() OVER (PARTITION BY seg ORDER BY h) AS rn
        FROM hashed
    ) WHERE rn <= {_KMV_K}
    GROUP BY seg
),
est AS (
    SELECT a.seg AS seg_a, b.seg AS seg_b,
           CAST(len(list_intersect(
                    (list_sort(list_distinct(a.sk || b.sk)))[1:{_KMV_K}],
                    list_intersect(a.sk, b.sk)))
                * 1000 // len((list_sort(list_distinct(a.sk || b.sk)))[1:{_KMV_K}])
                AS BIGINT) AS jac_est_pm
    FROM sketches a JOIN sketches b ON a.seg < b.seg
),
nn AS (SELECT seg, count(*) AS n FROM hashed GROUP BY seg),
inter AS (
    SELECT a.seg AS seg_a, b.seg AS seg_b,
           count(*) AS n_inter
    FROM hashed a JOIN hashed b
      ON a.user_id = b.user_id AND a.seg < b.seg
    GROUP BY 1, 2
),
exact AS (
    SELECT i.seg_a, i.seg_b,
           CAST(i.n_inter * 1000 // (na.n + nb.n - i.n_inter) AS BIGINT) AS jac_pm
    FROM inter i
    JOIN nn na ON na.seg = i.seg_a
    JOIN nn nb ON nb.seg = i.seg_b
)
SELECT e.seg_a, e.seg_b, e.jac_pm, s.jac_est_pm,
       CAST(abs(s.jac_est_pm - e.jac_pm) AS BIGINT) AS err_abs_pm
FROM exact e JOIN est s USING (seg_a, seg_b)
ORDER BY e.seg_a, e.seg_b
"""


# --- ev_hll_distinct: HyperLogLog cardinality sketch + audit ------------------
#: from-scratch HyperLogLog (Flajolet et al. 2007) over the repo's
#: md5-prefix hash rule: p = 6 -> m = 64 registers; register =
#: max(1 + leading-zeros of the 54-bit suffix) per bucket. The
#: KMV note above says a built-in HLL's engine internals can't gate
#: cross-engine — true, which is why this one OWNS the arithmetic:
#: every step (bucketing, bit-length via bin(), the 2^(55-reg)
#: integer harmonic sum, one literal-constant float division, a
#: literal linear-counting lookup) is replayed identically by the
#: DuckDB oracle. Registers are max-mergeable, so the streaming twin
#: (stream_hll_distinct) drains to the identical sketch.
_HLL_M = 64
#: alpha_64 * m^2 * 2^55 precomputed as ONE double literal so both
#: engines perform a single identical IEEE division + floor.
_HLL_C = 1.046802484394006e20
#: linear-counting estimates rounded to NEAREST from 64*ln(64/V), V =
#: count of zero registers 1..64 — a literal table, exact by
#: construction (round-half-up; pinned by
#: test_hll_linear_counting_table_matches_formula).
_HLL_LC = [266, 222, 196, 177, 163, 151, 142, 133, 126, 119, 113, 107,
           102, 97, 93, 89, 85, 81, 78, 74, 71, 68, 65, 63, 60, 58, 55,
           53, 51, 48, 46, 44, 42, 40, 39, 37, 35, 33, 32, 30, 28, 27,
           25, 24, 23, 21, 20, 18, 17, 16, 15, 13, 12, 11, 10, 9, 7, 6,
           5, 4, 3, 2, 1, 0]


def hll_register_rows(ev: DataFrame) -> DataFrame:
    """(event_type, bucket, reg): the stateless projection ahead of
    the register max — shared by the batch gate and the streaming
    twin. Hash = the 60-bit md5-prefix rule (see _KMV_H); bucket =
    low 6 bits; reg = 1 + leading zeros of the remaining 54 bits
    (bit-length via bin(), identical in Spark and DuckDB)."""
    # no pre-distinct: HLL is duplicate-insensitive by construction
    # (same key -> same bucket/reg -> MAX unchanged), which is exactly
    # what lets the streaming twin run this STATELESS ahead of a
    # 64-rows-per-type register max — no dropDuplicates state at all
    hashed = ev.select(
        "event_type",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("bigint").alias("h"),
    )
    return hashed.select(
        "event_type",
        (F.col("h") % _HLL_M).cast("int").alias("bucket"),
        # TRIM(LEADING ...) — Spark's two-arg ltrim takes (trimStr,
        # str), the REVERSE of DuckDB's; the standard form is
        # unambiguous in both engines
        F.expr(
            "CAST(55 - length(trim(LEADING '0' FROM bin(h div 64))) AS INT)"
        ).alias("reg"),
    )


def hll_estimate_from_registers(
    spark: SparkSession, sf_dir: str, registers: DataFrame
) -> DataFrame:
    """Estimate + exact-audit tail over a drained (event_type, bucket,
    reg) register table — the batch arithmetic both the batch gate and
    the streaming twin finish with."""
    lc = F.array(*[F.lit(v) for v in _HLL_LC])
    per_type = registers.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - reg)"))
        .alias("z_present"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    est = per_type.select(
        "event_type",
        F.expr(
            f"CAST(floor({_HLL_C!r} / CAST(z_present"
            f" + ({_HLL_M} - n_buckets) * shiftleft(CAST(1 AS BIGINT), 55)"
            " AS DOUBLE)) AS BIGINT)"
        ).alias("raw_est"),
        (F.lit(_HLL_M) - F.col("n_buckets")).cast("int").alias("zeros"),
    ).select(
        "event_type",
        F.when(
            (F.col("zeros") > 0) & (F.col("raw_est") <= 5 * _HLL_M / 2),
            F.element_at(lc, F.col("zeros")).cast("bigint"),
        ).otherwise(F.col("raw_est")).alias("hll_est"),
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    return (
        exact.join(est, "event_type")
        .select(
            "event_type", "n_exact", "hll_est",
            F.expr("(abs(hll_est - n_exact) * 1000) div n_exact")
            .alias("err_pm"),
        )
        .orderBy("event_type")
    )


def ev_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user cardinality per event_type through a from-scratch
    HyperLogLog sketch, exact counts alongside as the error audit —
    the industry-standard bounded-state cardinality answer
    (approx_count_distinct's algorithm, deterministic here because
    the hash and every estimate step are owned by this module).
    State = at most 64 one-byte-shaped register rows per group at ANY
    input volume, merged by MAX — cheaper than KMV's k int64s and the
    canonical 100 TB telemetry shape.

    Scale shape: one distinct over (type, user) — the same two-stage
    distinct the exact count pays — then a (type, bucket)-keyed max
    (map-side combining, 64 rows per type) and O(types) estimate
    arithmetic. The small-range branch applies Flajolet's
    linear-counting correction through a literal lookup table."""
    registers = hll_register_rows(
        load_table(spark, sf_dir, "events")
    ).groupBy("event_type", "bucket").agg(F.max("reg").alias("reg"))
    return hll_estimate_from_registers(spark, sf_dir, registers)


def _hll_sql() -> str:
    lc_list = ", ".join(str(v) for v in _HLL_LC)
    return f"""
WITH hashed AS (
    SELECT DISTINCT event_type,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
    FROM events
),
regs AS (
    SELECT event_type, CAST(h % {_HLL_M} AS INT) AS bucket,
           CAST(max(55 - length(ltrim(bin(h // 64), '0'))) AS INT) AS reg
    FROM hashed GROUP BY 1, 2
),
per_type AS (
    SELECT event_type,
           CAST(sum(1::BIGINT << (55 - reg)) AS BIGINT) AS z_present,
           count(*) AS n_buckets
    FROM regs GROUP BY event_type
),
est AS (
    SELECT event_type,
           CAST(floor({_HLL_C!r} / CAST(z_present
               + ({_HLL_M} - n_buckets) * (1::BIGINT << 55) AS DOUBLE))
               AS BIGINT) AS raw_est,
           CAST({_HLL_M} - n_buckets AS INT) AS zeros
    FROM per_type
),
picked AS (
    SELECT event_type,
           CASE WHEN zeros > 0 AND raw_est <= {5 * _HLL_M // 2}
                THEN CAST(list_extract([{lc_list}], zeros) AS BIGINT)
                ELSE raw_est END AS hll_est
    FROM est
),
exact AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact FROM hashed
    GROUP BY event_type
)
SELECT e.event_type, e.n_exact, p.hll_est,
       CAST(abs(p.hll_est - e.n_exact) * 1000 // e.n_exact AS BIGINT) AS err_pm
FROM exact e JOIN picked p USING (event_type)
ORDER BY e.event_type
"""


# --- ev_cusum_drift: CUSUM drift detection over hourly volumes ----------------
def ev_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection per event type over hourly
    volumes — the data-intake alarm for "this stream's rate shifted"
    (a pipeline feeding a training corpus watches exactly this).
    Textbook CUSUM is the recurrence S_t = max(0, S_{t−1} + x_t − μ −
    k), which no window function expresses — but it has the exact
    prefix identity S_t = P_t − min(0, min_{j≤t} P_j) with
    P_t = Σ_{i≤t}(x_i − μ − k), so TWO running windows (sum + min)
    per type compute it exactly. All milli-scaled integers (μ and the
    slack k = μ/20 via integer div), so both engines agree bit for
    bit. Output per type: hours observed, μ (milli), the peak CUSUM
    and its hour, and the FIRST hour the statistic crosses 2μ (the
    drift alarm; '-' when never).

    Scale shape: the hourly rollup is the only corpus-mass agg; the
    windows run over hours × types (tiny) — at 100 TB this is a
    dashboard query over an already-rolled-up table."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    return cusum_from_hourly(hourly)


def cusum_from_hourly(hourly: DataFrame) -> DataFrame:
    """The CUSUM alarm phase over an ``(event_type, hour, x)`` rollup —
    shared by the batch query and its streaming twin
    (queries/streaming.stream_cusum_drift), which maintains the rollup
    incrementally and drains it into this identical tail."""
    stats = hourly.groupBy(F.col("event_type").alias("et")).agg(
        F.expr("sum(x) * 1000 div count(*)").alias("mu_milli")
    )
    j = hourly.join(
        F.broadcast(stats), F.col("event_type") == F.col("et")
    ).withColumn(
        "step", F.expr("x * 1000 - mu_milli - (mu_milli div 20)")
    )
    w = Window.partitionBy("event_type").orderBy("hour")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    scored = (
        j.withColumn("p", F.sum("step").over(run))
        .withColumn("minp", F.least(F.min("p").over(run), F.lit(0)))
        .withColumn("s", F.col("p") - F.col("minp"))
    )
    wpk = Window.partitionBy("event_type").orderBy(F.desc("s"), "hour")
    scored = scored.withColumn("rn", F.row_number().over(wpk))
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.max("mu_milli").alias("mu_milli"),
            F.max("s").alias("max_cusum_milli"),
            F.min(
                F.when(F.col("rn") == 1, F.col("hour").cast("string"))
            ).alias("peak_hour"),
            F.coalesce(
                F.min(
                    F.when(
                        F.col("s") > 2 * F.col("mu_milli"),
                        F.col("hour").cast("string"),
                    )
                ),
                F.lit("-"),
            ).alias("first_drift_hour"),
        )
        .orderBy("event_type")
    )


_CUSUM_SQL = """
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS hour,
           CAST(count(*) AS BIGINT) AS x
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type, CAST(sum(x) * 1000 // count(*) AS BIGINT) AS mu_milli
    FROM hourly GROUP BY event_type
),
scored AS (
    SELECT h.event_type, h.hour, s.mu_milli,
           sum(h.x * 1000 - s.mu_milli - (s.mu_milli // 20))
               OVER (PARTITION BY h.event_type ORDER BY h.hour
                     ROWS UNBOUNDED PRECEDING) AS p
    FROM hourly h JOIN stats s USING (event_type)
),
cusum AS (
    SELECT event_type, hour, mu_milli,
           p - least(min(p) OVER (PARTITION BY event_type ORDER BY hour
                                  ROWS UNBOUNDED PRECEDING), 0) AS s
    FROM scored
),
ranked AS (
    SELECT *,
           row_number() OVER (PARTITION BY event_type ORDER BY s DESC, hour) AS rn
    FROM cusum
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_hours,
       max(mu_milli) AS mu_milli,
       CAST(max(s) AS BIGINT) AS max_cusum_milli,
       min(CASE WHEN rn = 1 THEN CAST(hour AS VARCHAR) END) AS peak_hour,
       coalesce(min(CASE WHEN s > 2 * mu_milli
                         THEN CAST(hour AS VARCHAR) END), '-') AS first_drift_hour
FROM ranked
GROUP BY event_type
ORDER BY event_type
"""


# --- ev_outliers_mad: robust (median/MAD) outlier profile ---------------------
def ev_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier profile per event type: median and MAD (median
    absolute deviation) instead of mean/stddev — the detector that
    does NOT move when the outliers themselves get bigger (the
    ev_outliers p99 threshold shifts with tail mass; the MAD is
    breakdown-point-0.5 stable). Values are floored to integer cents
    and both medians are LOWER-median order statistics (row_number at
    (n+1) div 2) — exact, interpolation-free, so both engines agree
    without a float quantile contract. Flags |x − med| > 3·MAD.

    Scale shape — histogram cumsum, NOT per-type row sorts (the
    text_length_profile shape): values are integer CENTS, so distinct
    cents ≪ rows; each median is a rank pick over the (type, cents)
    HISTOGRAM — GROUP BY shrinks first (map-side combine), the cumsum
    window runs over histogram rows only, and a hot event type costs
    its distinct-cents count, not its row count. Exact lower-median,
    same oracle; no corpus-fraction-sized sort partition exists at any
    skew."""
    ev = load_table(spark, sf_dir, "events")
    vals = ev.select(
        "event_type", F.floor(F.col("value") * 100).cast("bigint").alias("vc")
    )

    def hist_lower_median(df, val_col: str, out: str) -> DataFrame:
        """Per-type lower median (value at rank (n+1) div 2) via the
        histogram-cumsum rank pick — input rows per window partition =
        distinct values of one event type."""
        hist = df.groupBy("event_type", val_col).agg(
            F.count(F.lit(1)).alias("c")
        )
        wcum = (
            Window.partitionBy("event_type").orderBy(val_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = hist.withColumn("cum", F.sum("c").over(wcum)).withColumn(
            "n", F.sum("c").over(Window.partitionBy("event_type"))
        )
        return cum.groupBy("event_type").agg(
            F.min(
                F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col(val_col))
            ).alias(out)
        )

    med = hist_lower_median(vals, "vc", "med_cents").withColumnRenamed(
        "event_type", "met"
    )
    dev = vals.join(
        F.broadcast(med), F.col("event_type") == F.col("met")
    ).withColumn("dc", F.abs(F.col("vc") - F.col("med_cents")))
    mad = hist_lower_median(dev, "dc", "mad_cents").withColumnRenamed(
        "event_type", "mat"
    )
    return (
        dev.join(F.broadcast(mad), F.col("event_type") == F.col("mat"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("med_cents").alias("med_cents"),
            F.max("mad_cents").alias("mad_cents"),
            F.sum(
                (F.col("dc") > 3 * F.col("mad_cents")).cast("bigint")
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


_MAD_SQL = """
WITH vals AS (
    SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS vc FROM events
),
med AS (
    SELECT event_type, vc AS med_cents FROM (
        SELECT event_type, vc,
               row_number() OVER (PARTITION BY event_type ORDER BY vc) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM vals
    ) WHERE rn = (n + 1) // 2
),
dev AS (
    SELECT v.event_type, v.vc, m.med_cents, abs(v.vc - m.med_cents) AS dc
    FROM vals v JOIN med m USING (event_type)
),
mad AS (
    SELECT event_type, dc AS mad_cents FROM (
        SELECT event_type, dc,
               row_number() OVER (PARTITION BY event_type ORDER BY dc) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM dev
    ) WHERE rn = (n + 1) // 2
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n,
       max(d.med_cents) AS med_cents,
       max(a.mad_cents) AS mad_cents,
       CAST(sum(CASE WHEN d.dc > 3 * a.mad_cents THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers
FROM dev d JOIN mad a USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


# --- ev_transition_matrix: event-type Markov transitions ----------------------
def ev_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the product-analytics fixture behind next-action
    prediction and anomalous-flow detection (a sudden shift in the
    matrix is the pipeline-drift alarm): for each ordered pair of
    event types, how often does one IMMEDIATELY follow the other in
    the same user's timeline, and what row-normalized probability does
    that give (per-mille, integer — float normalization is summation-
    order dependent across engines, integer div is not).

    Scale shape: ONE window shuffle partitioned by user_id builds the
    (type, next_type) stream via ``lead`` (per-user state, never
    global), the pair counts are a map-side-combining aggregate over a
    key space of |types|² (tiny — the agg output is matrix-sized
    regardless of corpus size), and the row totals join back as a
    broadcast. At 100 TB the only data-sized work is the one per-user
    window every sessionization already pays."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_trans"))
    )
    return transition_probabilities(pairs)


def transition_probabilities(pairs: DataFrame) -> DataFrame:
    """Row-normalize ``(from_type, to_type, n_trans)`` counts into
    integer per-mille probabilities — shared by the batch matrix and
    its streaming twin (queries/streaming.stream_transition_matrix),
    so both emit the identical tail over their respective counts."""
    # totals keeps a RENAMED key: the join below is pairs ⋈ agg(pairs),
    # and a same-name self-join of a memory-sink view trips analyzer
    # attribute dedup (observed on the streaming drain path)
    totals = pairs.groupBy(F.col("from_type").alias("ft")).agg(
        F.sum("n_trans").alias("row_total")
    )
    return (
        pairs.join(F.broadcast(totals), F.col("from_type") == F.col("ft"))
        .select(
            "from_type", "to_type", "n_trans",
            F.expr("CAST(n_trans * 1000 div row_total AS BIGINT)").alias("p_pm"),
        )
        .orderBy("from_type", "to_type")
    )


_TRANSITION_SQL = """
SELECT from_type, to_type, n_trans,
       CAST(n_trans * 1000 // sum(n_trans) OVER (PARTITION BY from_type) AS BIGINT)
           AS p_pm
FROM (
    SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_trans
    FROM (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS to_type
        FROM events
    )
    WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
)
ORDER BY from_type, to_type
"""


def cent_histogram(ev: DataFrame) -> DataFrame:
    """(event_type, cent, c): the fixed-resolution value histogram —
    a MERGEABLE sketch (cell-wise sums, like the CMS/KMV family) whose
    state is bounded by the VALUE DOMAIN (distinct cents), not the row
    count. cent = floor(value·100 + 0.5): plain IEEE multiply/add/floor
    both engines run identically (no locale-dependent rounding mode)."""
    return (
        ev.select(
            "event_type",
            F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cent"),
        )
        .groupBy("event_type", "cent")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def quantiles_from_cent_hist(hist: DataFrame) -> DataFrame:
    """Exact lower quantiles (type-1: smallest value whose cumulative
    count reaches ⌈p·n⌉) from a cent histogram — integer arithmetic end
    to end, shared by the batch query and the streaming drain."""
    w_cum = Window.partitionBy("event_type").orderBy("cent")
    w_all = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "cent",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    picks = [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"(n * {p} + 99) div 100"), F.col("cent")
            )
        ).alias(f"p{p}_cent")
        for p in (50, 90, 99)
    ]
    return (
        cum.groupBy("event_type")
        .agg(F.max("n").cast("bigint").alias("n_events"), *picks)
        .select("event_type", "n_events", "p50_cent", "p90_cent", "p99_cent")
        .orderBy("event_type")
    )


def ev_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles from the mergeable cent HISTOGRAM — the runnable
    bounded-state twin of :func:`ev_value_quantiles` (whose exact
    ``percentile`` needs a full per-group value buffer; its docstring
    proposes approx_percentile as the 100 TB swap). For
    bounded-precision telemetry the histogram beats the t-digest swap:
    state = O(distinct cents) per group regardless of row count,
    map-side partials merge by cell-wise addition, and the quantiles
    are EXACT (type-1 lower quantile, integer rank arithmetic), not
    approximate. One shuffle to the histogram + one domain-sized
    window pass; the shared tail also serves the streaming twin
    (stream_quantiles_sketch), whose drained histogram is
    batch-identical by merge commutativity."""
    ev = load_table(spark, sf_dir, "events")
    return quantiles_from_cent_hist(cent_histogram(ev))


_QUANTILE_SKETCH_SQL = """
WITH h AS (
    SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cent,
           count(*) AS c
    FROM events GROUP BY 1, 2
),
w AS (
    SELECT event_type, cent,
           sum(c) OVER (PARTITION BY event_type ORDER BY cent) AS cum,
           sum(c) OVER (PARTITION BY event_type) AS n
    FROM h
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n_events,
       min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN cent END) AS p50_cent,
       min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN cent END) AS p90_cent,
       min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN cent END) AS p99_cent
FROM w GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "ev_quantiles_sketch": ev_quantiles_sketch,
    "ev_cusum_drift": ev_cusum_drift,
    "ev_outliers_mad": ev_outliers_mad,
    "ev_transition_matrix": ev_transition_matrix,
    "ev_cms_topk": ev_cms_topk,
    "ev_kmv_distinct": ev_kmv_distinct,
    "ev_hll_distinct": ev_hll_distinct,
    "ev_kmv_overlap": ev_kmv_overlap,
    "ev_hourly_agg": ev_hourly_agg,
    "ev_hopping_agg": ev_hopping_agg,
    "ev_dau_wau": ev_dau_wau,
    "ev_inactive_gap": ev_inactive_gap,
    "ev_funnel": ev_funnel,
    "ev_asof_join": ev_asof_join,
    "ev_range_join_tiers": ev_range_join_tiers,
    "ev_rollup": ev_rollup,
    "ev_pivot": ev_pivot,
    "ev_outliers": ev_outliers,
    "ev_retention": ev_retention,
    "ev_hourly_dense": ev_hourly_dense,
    "ev_sessionize": ev_sessionize,
    "ev_json_props": ev_json_props,
    "ev_top3_per_type": ev_top3_per_type,
    "ev_value_quantiles": ev_value_quantiles,
}

ORACLES = {
    "ev_quantiles_sketch": _QUANTILE_SKETCH_SQL,
    "ev_cusum_drift": _CUSUM_SQL,
    "ev_outliers_mad": _MAD_SQL,
    "ev_transition_matrix": _TRANSITION_SQL,
    "ev_cms_topk": _CMS_SQL,
    "ev_kmv_distinct": _KMV_SQL,
    "ev_hll_distinct": _hll_sql(),
    "ev_kmv_overlap": _KMV_OVERLAP_SQL,
    "ev_hourly_agg": _HOURLY_SQL,
    "ev_hopping_agg": _HOPPING_SQL,
    "ev_dau_wau": _DAU_WAU_SQL,
    "ev_inactive_gap": _INACTIVE_SQL,
    "ev_funnel": _FUNNEL_SQL,
    "ev_asof_join": _ASOF_SQL,
    "ev_range_join_tiers": _RANGE_SQL,
    "ev_rollup": _ROLLUP_SQL,
    "ev_pivot": _PIVOT_SQL,
    "ev_outliers": _OUTLIERS_SQL,
    "ev_retention": _RETENTION_SQL,
    "ev_hourly_dense": _DENSE_SQL,
    "ev_sessionize": _SESSIONIZE_SQL,
    "ev_json_props": _JSON_SQL,
    "ev_top3_per_type": _TOP3_SQL,
    "ev_value_quantiles": _QUANTILES_SQL,
}
