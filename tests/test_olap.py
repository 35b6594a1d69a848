"""Rollup and sketch-quantile tests beyond the oracle mirror: plan shape
(one pass for all levels) and GK-sketch rank-error bounds."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from kafkastreams_tp3_is_spark.operators.events import load_events  # noqa: E402
from kafkastreams_tp3_is_spark.operators.olap import (  # noqa: E402
    events_value_quantiles, trip_time_rollup)
from tests.conftest import SF_DIR  # noqa: E402


def test_rollup_levels_are_consistent(spark):
    rows = trip_time_rollup(spark, SF_DIR).collect()
    by_level = {}
    for r in rows:
        by_level.setdefault(r["level"], []).append(r)
    assert set(by_level) == {0, 3, 1, 7}
    total = sum(r["cnt"] for r in by_level[0])
    # every coarser level must re-sum to the same grand total
    assert sum(r["cnt"] for r in by_level[1]) == total
    assert sum(r["cnt"] for r in by_level[3]) == total
    assert by_level[7][0]["cnt"] == total
    assert by_level[7][0]["transport_type"] == "ALL"


def test_rollup_is_one_pass(spark):
    plan = (trip_time_rollup(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Expand" in plan, "rollup must compile to Expand, not UNION"
    assert plan.count("Exchange hashpartitioning") == 1, \
        "all levels must share one shuffle"


def test_quantile_sketch_rank_error_bound(spark):
    approx = {(r["event_type"], r["quantile"]): r["value_approx"]
              for r in events_value_quantiles(spark, SF_DIR).collect()}
    ev = load_events(spark, SF_DIR).select("event_type", "value")
    counts = {r["event_type"]: (r["n"], r["le"]) for _ in [0] for r in []}
    for (etype, q), v in approx.items():
        n, le = (ev.where(F.col("event_type") == etype)
                   .agg(F.count(F.lit(1)).alias("n"),
                        F.sum((F.col("value") <= v).cast("long")).alias("le"))
                   .collect()[0])
        # GK guarantee: the returned value's rank is within eps*n of q*n;
        # accuracy=10000 -> eps=1e-4, loosened to 1% for discreteness of
        # the value domain
        assert q - 0.011 <= le / n, (etype, q, v, le, n)
        lt = (ev.where((F.col("event_type") == etype)
                       & (F.col("value") < v)).count())
        assert lt / n <= q + 0.011, (etype, q, v, lt, n)


def test_exact_quantiles_are_nearest_rank(spark):
    """The exact twin must return, per (event_type, q), the value at
    1-based rank ceil(q*n) of the sorted group — recomputed here with a
    driver-side sort as the independent reference — and the GK sketch's
    answer must sit within 1.1% rank error of it (tying the two registry
    entries together)."""
    import math

    from kafkastreams_tp3_is_spark.operators.olap import (
        events_value_quantiles_exact)

    got = {(r["event_type"], r["quantile"]): r["value"]
           for r in events_value_quantiles_exact(spark, SF_DIR).collect()}
    ev = load_events(spark, SF_DIR).select("event_type", "value").collect()
    groups = {}
    for r in ev:
        groups.setdefault(r["event_type"], []).append(r["value"])
    want = {}
    for etype, vals in groups.items():
        vals.sort()
        for q in (0.5, 0.9, 0.99):
            want[(etype, q)] = vals[math.ceil(q * float(len(vals))) - 1]
    assert got == want


def test_funnel_requires_strict_step_order(spark, monkeypatch, tmp_path):
    """A purchase BEFORE the first valid click must not count: the funnel
    is sequential-min, not per-type min."""
    import datetime as dt

    from kafkastreams_tp3_is_spark.operators import events as ev_mod

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1 completes in order: view@0, click@10, purchase@20
        (1, 1, "view", base), (2, 1, "click", base + dt.timedelta(minutes=10)),
        (3, 1, "purchase", base + dt.timedelta(minutes=20)),
        # user 2: purchase BEFORE its click -> only 2 steps complete
        (4, 2, "view", base), (5, 2, "purchase", base + dt.timedelta(minutes=5)),
        (6, 2, "click", base + dt.timedelta(minutes=10)),
        # user 3: click with no view -> 0 steps
        (7, 3, "click", base),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")
    monkeypatch.setattr(ev_mod, "load_events", lambda s, d: df)
    got = {r["user_id"]: r["steps_completed"]
           for r in ev_mod.funnel(spark, "unused").collect()}
    assert got == {1: 3, 2: 2, 3: 0}
    t = {r["user_id"]: r for r in ev_mod.funnel(spark, "unused").collect()}
    assert t[2]["t_purchase_us"] == -1
    assert t[3]["t_view_us"] == -1 and t[3]["t_click_us"] == -1
