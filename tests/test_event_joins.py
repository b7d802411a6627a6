"""Semantic pins for the as-of join, range join, and funnel operators —
brute-force per-user verification independent of the SQL oracle (which
shares no code with these checks)."""

from __future__ import annotations

from collections import defaultdict


def test_asof_join_matches_per_user_scan(spark, sf_dir):
    from pyspark.sql import functions as F

    from codegraph_spark.queries.events import ev_asof_join
    from codegraph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    ).select("event_id", "user_id", "ts", "event_type").collect()

    views = defaultdict(list)
    purchases = []
    for r in ev:
        if r.event_type == "view":
            views[r.user_id].append((r.ts, r.event_id))
        else:
            purchases.append(r)
    expected = {}
    for p in purchases:
        cand = [(ts, eid) for ts, eid in views[p.user_id] if ts <= p.ts]
        expected[p.event_id] = max(cand)[1] if cand else -1  # -1 = no-match sentinel

    got = {
        r.purchase_event_id: r.view_event_id
        for r in ev_asof_join(spark, sf_dir).collect()
    }
    assert got == expected


def test_asof_gap_nonnegative_and_null_consistent(spark, sf_dir):
    from codegraph_spark.queries.events import ev_asof_join

    for r in ev_asof_join(spark, sf_dir).collect():
        if r.view_event_id == -1:
            assert r.gap_s == -1
        else:
            assert r.gap_s >= 0


def test_range_join_tiers_partition_values(spark, sf_dir):
    """Every event with value inside some band lands in exactly one
    tier; totals add up to the filtered input."""
    from pyspark.sql import functions as F

    from codegraph_spark.queries.events import _TIERS, ev_range_join_tiers
    from codegraph_spark.sources.tables import load_table

    lo = min(t[0] for t in _TIERS)
    hi = max(t[1] for t in _TIERS)
    in_band = (
        load_table(spark, sf_dir, "events")
        .filter((F.col("value") >= lo) & (F.col("value") < hi))
        .count()
    )
    out = ev_range_join_tiers(spark, sf_dir).collect()
    assert sum(r.n for r in out) == in_band


def test_funnel_counts_monotone(spark, sf_dir):
    from codegraph_spark.queries.events import ev_funnel

    rows = sorted(ev_funnel(spark, sf_dir).collect(), key=lambda r: r.step_no)
    assert [r.step for r in rows] == ["view", "click", "purchase"]
    ns = [r.n_users for r in rows]
    assert ns[0] >= ns[1] >= ns[2] >= 0
    assert rows[0].conv_pm == 1000
    assert all(0 <= r.conv_pm <= 1000 for r in rows)
