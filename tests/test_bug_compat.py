"""Bug-compatible mode for Q12/Q13 — pinned against HAND-COMPUTED
changelog collapses.

The engine's default semantics are the reference's *intent* (per-window
min-by, summed passengers — SURVEY fidelity notes 7.3/7.4). The
``bug_compatible=True`` flag instead reproduces what the reference
actually emits after the Connect upsert collapse, so a migration can
diff outputs 1:1 against the live system:

  Q12  the per-window aggregator returns newValue unconditionally
       (LeastOccupiedTransportTypeWindow.java:90-94) -> the surviving
       row per window is the occupancy of the type whose windowed count
       updated LAST;
  Q13  per-operator passengers keep the latest route-count instead of
       summing (MostOccupiedOperator.java:105-111) -> each operator
       reports the final count of the route of its latest trip.

Each test simulates the reference's changelog by hand on fixtures with
UNIQUE timestamps (arrival order == event order, so the latest-wins
collapse is well-defined) and asserts both modes."""

from __future__ import annotations

import datetime as dt

import pytest

from kafkastreams_tp3_is_spark.queries import q12_logic, q13_logic

_ROUTE_COLS = ("route_id string, origin string, destination string, "
               "transport_type string, capacity int, operator string, "
               "event_ts timestamp")
_TRIP_COLS = ("trip_id string, route_id string, origin string, "
              "destination string, transport_type string, "
              "passenger_name string, event_ts timestamp")


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def q12_fixture(spark):
    routes = spark.createDataFrame([
        ("R1", "O", "D", "TypeA", 100, "Op1", _ts("2024-01-01 00:00:00")),
        ("R2", "O", "D", "TypeB", 20, "Op1", _ts("2024-01-01 00:00:00")),
    ], _ROUTE_COLS)
    # window 10:00: arrivals A@10:05, A@10:10, B@10:20, B@10:40
    #   counts: A=2 (occ 2/100*100=2.0), B=2 (occ 2/20*100=10.0)
    #   last update: B -> reference emits B at 10.0; intent: min -> A at 2.0
    # window 11:00: single arrival A@11:30 -> both modes A at 1.0
    trips = spark.createDataFrame([
        ("t1", "R1", "O", "D", "TypeA", "P1", _ts("2024-01-01 10:05:00")),
        ("t2", "R1", "O", "D", "TypeA", "P2", _ts("2024-01-01 10:10:00")),
        ("t3", "R2", "O", "D", "TypeB", "P3", _ts("2024-01-01 10:20:00")),
        ("t4", "R2", "O", "D", "TypeB", "P4", _ts("2024-01-01 10:40:00")),
        ("t5", "R1", "O", "D", "TypeA", "P5", _ts("2024-01-01 11:30:00")),
    ], _TRIP_COLS)
    return routes, trips


def test_q12_intended_vs_bug_compatible(q12_fixture):
    routes, trips = q12_fixture
    w10, w11 = _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")

    intended = {r["window_start"]: (r["transportType"], r["occupancy"])
                for r in q12_logic(routes, trips).collect()}
    assert intended == {w10: ("TypeA", 2 / 100 * 100),
                        w11: ("TypeA", 1 / 100 * 100)}

    bug = {r["window_start"]: (r["transportType"], r["occupancy"])
           for r in q12_logic(routes, trips, bug_compatible=True).collect()}
    assert bug == {w10: ("TypeB", 2 / 20 * 100),
                   w11: ("TypeA", 1 / 100 * 100)}


@pytest.fixture(scope="module")
def q13_fixture(spark):
    # Op X: R1 cap 100 + R2 cap 50 = 150; Op Y: R3 cap 40
    routes = spark.createDataFrame([
        ("R1", "O", "D", "TypeA", 100, "OpX", _ts("2024-01-01 00:00:00")),
        ("R2", "O", "D", "TypeA", 50, "OpX", _ts("2024-01-01 00:00:00")),
        ("R3", "O", "D", "TypeB", 40, "OpY", _ts("2024-01-01 00:00:00")),
    ], _ROUTE_COLS)
    # arrivals: R1@1, R2@2, R1@3, R3@4, R2@5 (unique ts)
    #   OpX intent: pax = 2+2 = 4     -> occ 4/150*100 ~ 2.667 (winner)
    #   OpX bug: latest trip @5 on R2 -> pax = R2 final count = 2
    #            -> occ 2/150*100 ~ 1.333
    #   OpY: single route R3, pax 1   -> occ 1/40*100 = 2.5 (bug winner)
    trips = spark.createDataFrame([
        ("t1", "R1", "O", "D", "TypeA", "P1", _ts("2024-01-01 10:01:00")),
        ("t2", "R2", "O", "D", "TypeA", "P2", _ts("2024-01-01 10:02:00")),
        ("t3", "R1", "O", "D", "TypeA", "P3", _ts("2024-01-01 10:03:00")),
        ("t4", "R3", "O", "D", "TypeB", "P4", _ts("2024-01-01 10:04:00")),
        ("t5", "R2", "O", "D", "TypeA", "P5", _ts("2024-01-01 10:05:00")),
    ], _TRIP_COLS)
    return routes, trips


def test_q13_intended_vs_bug_compatible(q13_fixture):
    routes, trips = q13_fixture
    intended = [(r["operator"], r["occupancyPercentage"])
                for r in q13_logic(routes, trips).collect()]
    assert intended == [("OpX", 4 / 150 * 100)]

    bug = [(r["operator"], r["occupancyPercentage"])
           for r in q13_logic(routes, trips, bug_compatible=True).collect()]
    assert bug == [("OpY", 1 / 40 * 100)]


def test_q13_bug_mode_latest_route_count_is_final_count(q13_fixture):
    """The latest-wins value is the route's FINAL count, not its count at
    some earlier update — verify by isolating OpX's bug-mode occupancy:
    R2 updated last and had 2 trips total -> 2/150*100."""
    routes, trips = q13_fixture
    from pyspark.sql import functions as F

    only_x = trips.where(F.col("route_id").isin("R1", "R2"))
    bug = [(r["operator"], r["occupancyPercentage"])
           for r in q13_logic(routes, only_x,
                              bug_compatible=True).collect()]
    assert bug == [("OpX", 2 / 150 * 100)]
