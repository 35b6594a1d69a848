"""Hand-computed semantics tests for the temporal joins (operators/
temporal.py): backward as-of version pickup, equal-ts inclusion,
no-prior-version nulls, interval boundary rules, and bin-crossing
matches the binned range join must not lose."""

from __future__ import annotations

import datetime as dt
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from kafkastreams_tp3_is_spark.operators.temporal import (  # noqa: E402
    asof_join_df, interval_join_df)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_hand_computed(spark):
    left = spark.createDataFrame(
        [("k1", _ts("2024-01-01 10:00:00"), "e1"),
         ("k1", _ts("2024-01-01 12:00:00"), "e2"),
         ("k1", _ts("2024-01-01 09:00:00"), "e0"),   # before any version
         ("k2", _ts("2024-01-01 11:00:00"), "e3")],  # key with no versions
        ["k", "event_ts", "name"])
    right = spark.createDataFrame(
        [("k1", _ts("2024-01-01 10:00:00"), 100),    # equal ts: in effect
         ("k1", _ts("2024-01-01 11:30:00"), 200)],
        ["k", "event_ts", "v"])
    got = {r["name"]: (r["v"], r["version_ts"])
           for r in asof_join_df(left, right, on=["k"],
                                 value_cols=["v"]).collect()}
    assert got["e0"] == (None, None)                  # no prior version
    assert got["e1"] == (100, _ts("2024-01-01 10:00:00"))  # ties included
    assert got["e2"] == (200, _ts("2024-01-01 11:30:00"))  # latest <= ts
    assert got["e3"] == (None, None)                  # unversioned key
    assert len(got) == 4                              # left rows preserved


def test_asof_join_single_shuffle(spark):
    left = spark.createDataFrame([("k", _ts("2024-01-01 10:00:00"), 1)],
                                 ["k", "event_ts", "x"])
    right = spark.createDataFrame([("k", _ts("2024-01-01 09:00:00"), 2)],
                                  ["k", "event_ts", "v"])
    plan = (asof_join_df(left, right, on=["k"], value_cols=["v"])
            ._jdf.queryExecution().executedPlan().toString())
    # the union-trick as-of: exactly one hash exchange (the window's),
    # never a join operator at all
    assert plan.count("Exchange hashpartitioning") == 1
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in plan


def test_interval_join_boundaries_and_bin_crossing(spark):
    points = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00")),   # == start: excluded
         (2, "u", _ts("2024-01-01 10:00:01")),   # inside
         (3, "u", _ts("2024-01-01 10:15:00")),   # == end: included
         (4, "u", _ts("2024-01-01 10:15:01")),   # past end: excluded
         (5, "u", _ts("2024-01-01 10:14:59")),   # inside, crosses a bin
         (6, "w", _ts("2024-01-01 10:05:00"))],  # other key: excluded
        ["event_id", "user_id", "ts"])
    intervals = spark.createDataFrame(
        [(100, "u", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:15:00"))],
        ["incident_id", "user_id", "start_ts", "end_ts"])
    got = {r["event_id"]
           for r in interval_join_df(points, intervals, on=["user_id"],
                                     ts_col="ts", start_col="start_ts",
                                     end_col="end_ts",
                                     bin_width_sec=900).collect()}
    assert got == {2, 3, 5}


def test_interval_join_never_duplicates_pairs(spark):
    # an interval spanning two bins must still emit each matching point
    # exactly once (a point lives in exactly one bin)
    points = spark.createDataFrame(
        [(i, "u", _ts("2024-01-01 10:00:00")
          + dt.timedelta(seconds=60 * i)) for i in range(10)],
        ["event_id", "user_id", "ts"])
    intervals = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:30"), _ts("2024-01-01 10:08:30"))],
        ["incident_id", "user_id", "start_ts", "end_ts"])
    rows = interval_join_df(points, intervals, on=["user_id"], ts_col="ts",
                            start_col="start_ts", end_col="end_ts",
                            bin_width_sec=600).collect()
    ids = [r["event_id"] for r in rows]
    assert sorted(ids) == sorted(set(ids)) == [1, 2, 3, 4, 5, 6, 7, 8]


def test_asof_join_rejects_column_collision(spark):
    left = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00:00"), 1)], ["k", "event_ts", "v"])
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01 09:00:00"), 2)], ["k", "event_ts", "v"])
    with pytest.raises(ValueError, match="collision"):
        asof_join_df(left, right, on=["k"], value_cols=["v"])


def test_interval_join_rejects_column_collision(spark):
    # a shared non-key column would survive the join duplicate-named and
    # only blow up later as an ambiguous reference at the call site
    points = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00"))], ["event_id", "user_id", "ts"])
    intervals = spark.createDataFrame(
        [(2, "u", _ts("2024-01-01 09:00:00"), _ts("2024-01-01 11:00:00"))],
        ["event_id", "user_id", "start_ts", "end_ts"])
    with pytest.raises(ValueError, match="collision"):
        interval_join_df(points, intervals, on=["user_id"], ts_col="ts",
                         start_col="start_ts", end_col="end_ts",
                         bin_width_sec=600)


def test_interval_join_long_intervals_stay_exact(spark):
    # an interval 4x the bin width must still catch every point
    points = spark.createDataFrame(
        [(i, "u", _ts("2024-01-01 10:00:00") + dt.timedelta(minutes=i))
         for i in range(40)],
        ["event_id", "user_id", "ts"])
    intervals = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:30"), _ts("2024-01-01 10:35:30"))],
        ["incident_id", "user_id", "start_ts", "end_ts"])
    rows = interval_join_df(points, intervals, on=["user_id"], ts_col="ts",
                            start_col="start_ts", end_col="end_ts",
                            bin_width_sec=600).collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == list(range(1, 36))


def test_events_attribution_last_touch_semantics(spark, monkeypatch):
    """A purchase attributes to the LATEST click at-or-before it; a
    purchase with no prior click carries -1 sentinels; a click after the
    purchase never attributes."""
    import datetime as dt

    from kafkastreams_tp3_is_spark.operators import events as ev_mod
    from kafkastreams_tp3_is_spark.operators.temporal import (
        events_attribution)

    base = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, 1, "click", base),           # earlier click
        (2, 1, "click", base + 5 * m),   # latest prior click -> wins
        (3, 1, "purchase", base + 9 * m),
        (4, 2, "purchase", base),        # user 2: click only AFTER
        (5, 2, "click", base + 1 * m),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")
    monkeypatch.setattr(ev_mod, "load_events", lambda s, d: df)
    got = {r["purchase_id"]: r for r in
           events_attribution(spark, "unused").collect()}
    assert got[3]["click_id"] == 2
    assert got[3]["gap_us"] == 4 * 60 * 1_000_000
    assert got[4]["click_id"] == -1 and got[4]["gap_us"] == -1
