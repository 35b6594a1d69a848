"""Temporal join operators Spark lacks as built-ins: as-of join and
point-in-interval range join — expressed as compositions of shuffle-
bounded DataFrame ops (no cartesian products, no per-row Python).

as-of join (backward): each left row picks the LATEST right row of the
same key with right_ts <= left_ts — the version of a dimension "in
effect" at event time (changelog enrichment, slowly-changing dims,
tick-to-quote). The naive realization (theta-join + per-left-row argmax)
shuffles twice and explodes on version-heavy keys; this one is the
single-shuffle union-trick: tag both inputs, union, ONE window per key
ordered by (ts, side) with last(value, ignorenulls) carrying the most
recent right-version forward into each left row. Cost: one hash shuffle
of left+right on the key, one per-partition sort — the optimal
distributed as-of, independent of versions-per-key.

range join (point-in-interval): pairs (interval, point) with point_ts in
(start, end] for the same key. A raw inequality join is a per-key cross
product; BINNING makes it an equi-join: intervals explode into the
fixed-width time bins they overlap, points map to exactly one bin, the
join runs on (key, bin) and the exact predicate filters within the
bucket. With bin_width >= the max interval length every interval spans
<= 2 bins, so the fan-out is constant and the shuffle stays linear in
rows — the standard trick production range joins (and Spark's own
DynamicPruning-less range-join strategies) rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..views import load
from .events import load_events


def asof_join_df(left: DataFrame, right: DataFrame, on: list[str],
                 left_ts: str = "event_ts", right_ts: str = "event_ts",
                 value_cols: list[str] | None = None,
                 version_ts_col: str = "version_ts") -> DataFrame:
    """Backward as-of join: every ``left`` row enriched with
    ``value_cols`` from the latest ``right`` row of the same ``on`` key
    whose ``right_ts`` <= ``left_ts`` (ties at equal ts include the right
    row, matching DuckDB's ASOF ``>=``). Left rows with no prior version
    keep nulls (left-join semantics). The right version's timestamp is
    exposed as ``version_ts_col``.

    Preconditions: right has at most one version per (key, ts) — the
    changelog invariant — and value_cols are non-null in right (nulls are
    the carry-forward sentinel).

    Scale: one shuffle of left+right on the key; per-key work is the
    sorted window scan. No join explosion on version-heavy keys."""
    if value_cols is None:
        value_cols = [c for c in right.columns
                      if c not in set(on) | {right_ts}]
    left_payload = [c for c in left.columns if c not in set(on) | {left_ts}]
    clash = (set(left_payload) & set(value_cols)) | \
        ({version_ts_col} & (set(left_payload) | set(value_cols)))
    if clash:
        raise ValueError(
            f"column name collision between left payload and right value "
            f"columns: {sorted(clash)} — rename before joining")
    ts = F.col("__ts")
    l_side = left.select(
        *on, F.col(left_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in value_cols],
        F.lit(None).cast("timestamp").alias(version_ts_col))
    r_side = right.select(
        *on, F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_payload],
        *[F.col(c) for c in value_cols],
        F.col(right_ts).cast("timestamp").alias(version_ts_col))
    # right rows sort BEFORE left rows at equal ts (__is_left asc), so a
    # version stamped exactly at the event time is already in effect
    w = (Window.partitionBy(*on).orderBy(ts.asc(), F.col("__is_left").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = l_side.unionByName(r_side).select(
        *on, "__ts", "__is_left", *left_payload,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
        F.last(version_ts_col, ignorenulls=True).over(w)
         .alias(version_ts_col))
    return (filled.where(F.col("__is_left") == 1)
                  .drop("__is_left")
                  .withColumnRenamed("__ts", left_ts))


def trips_asof_route_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: every trip enriched with the route capacity version in
    effect at the trip's event time, over the re-emitted route changelog
    (every 10th route has a second version one day later — views.py
    routes_reemitted). Trips predating the first version keep nulls.
    Oracle: DuckDB's native ASOF LEFT JOIN.

    Derivation pushdown (r16, the queries.py r15 pattern; guide §2.3):
    ``route_id``/``trip_id`` are injective functions of the raw parquet
    longs, so the union-trick window partitions and sorts on
    ``l_orderkey``/``o_orderkey`` (8-byte longs) and carries
    ``l_linenumber`` as the only trip payload; the decorated strings are
    built on the OUTPUT rows, after the shuffle+sort. Row set identical:
    the key map is injective, and within a (key, ts) the changelog
    invariant (one version per ts) keeps last(ignorenulls) order-free."""
    from ..queries import _capacity, _route_str

    li = load(spark, sf_dir, "lineitem")
    t = li.select(F.col("l_orderkey").alias("okey"),
                  F.col("l_linenumber").alias("lno"),
                  F.col("l_shipdate").alias("event_ts"))
    o = load(spark, sf_dir, "orders")
    reemit_cap = (((F.floor(F.col("o_totalprice")) + 37) % 200) + 1) \
        .cast("int")
    chg = (o.select(F.col("o_orderkey").alias("okey"),
                    _capacity().alias("capacity"),
                    F.col("o_orderdate").alias("event_ts"))
           .unionByName(
               o.where(F.col("o_orderkey") % 10 == 0)
               .select(F.col("o_orderkey").alias("okey"),
                       reemit_cap.alias("capacity"),
                       (F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"))
                       .alias("event_ts"))))
    out = asof_join_df(t, chg, on=["okey"], value_cols=["capacity"])
    # no-prior-version rows are kept (left-join semantics) but emitted
    # with total sentinels (-1 / epoch) instead of nulls: the driver's
    # value-hash compare treats float NaN as unequal to itself, so a gate
    # output must be null-free; the null behavior itself is pinned by
    # tests/test_temporal.py
    okey = F.col("okey")
    return out.select(
        F.concat(F.lit("Trip_"), okey.cast("string"), F.lit("_"),
                 F.col("lno").cast("string")).alias("trip_id"),
        _route_str(okey).alias("route_id"),
        F.col("event_ts").alias("trip_ts"),
        F.coalesce(F.col("capacity"), F.lit(-1)).alias("capacity_asof"),
        F.coalesce(F.col("version_ts"),
                   F.lit("1970-01-01 00:00:00").cast("timestamp"))
         .alias("version_ts"))


def interval_join_df(points: DataFrame, intervals: DataFrame,
                     on: list[str], ts_col: str,
                     start_col: str, end_col: str,
                     bin_width_sec: int) -> DataFrame:
    """Point-in-interval join: rows of ``points`` x ``intervals`` of the
    same key with ts in (start, end] — start-exclusive so an interval
    anchored at an event does not match the anchor itself. Intervals of
    any length are exact (the explode covers every bin they overlap);
    the per-interval fan-out is length/bin_width + 1 rows, so pick
    bin_width near the TYPICAL interval length — O(1) fan-out for the
    common case, graceful linear growth for outliers.

    Scale: one equi-shuffle on (key, bin); the inequality predicate only
    filters within hash buckets. Never a cartesian or theta join."""
    clash = (set(points.columns) & set(intervals.columns)) - set(on)
    if clash:
        raise ValueError(
            f"column name collision between points and intervals outside "
            f"the join key: {sorted(clash)} — rename before joining")
    p_bin = F.floor(F.col(ts_col).cast("long") / bin_width_sec)
    p = points.withColumn("__bin", p_bin)
    s_sec = F.col(start_col).cast("long")
    e_sec = F.col(end_col).cast("long")
    i = (intervals
         .withColumn("__bins",
                     F.sequence(F.floor(s_sec / bin_width_sec),
                                F.floor(e_sec / bin_width_sec)))
         .withColumn("__bin", F.explode("__bins"))
         .drop("__bins"))
    return (i.join(p, on + ["__bin"])
             .where((F.col(ts_col) > F.col(start_col))
                    & (F.col(ts_col) <= F.col(end_col)))
             .drop("__bin"))


def error_incident_events(spark: SparkSession, sf_dir: str,
                          window_minutes: int = 15) -> DataFrame:
    """Driver gate for the range join: each 'error' event opens a
    per-user incident window (ts, ts + window]; emit every event of the
    same user inside the window — the blast-radius query of incident
    analytics. Output: (incident_id, event_id, event_type)."""
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "ts", "event_type")
    inc = (ev.where(F.col("event_type") == "error")
             .select(F.col("event_id").alias("incident_id"), "user_id",
                     F.col("ts").alias("start_ts"),
                     (F.col("ts") + F.expr(f"INTERVAL {window_minutes} MINUTES"))
                     .alias("end_ts")))
    joined = interval_join_df(ev, inc, on=["user_id"], ts_col="ts",
                              start_col="start_ts", end_col="end_ts",
                              bin_width_sec=window_minutes * 60)
    return joined.select("incident_id", "event_id", "event_type")


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution over the event stream: every purchase is
    attributed to the same user's LATEST click at-or-before it — the
    classic marketing-attribution query, expressed as a direct reuse of
    the backward as-of join (asof_join_df: single-shuffle union trick,
    no join operator in the plan). Clicks are canonicalized to one row
    per (user, ts) (max event_id — deterministic under timestamp
    collisions, the changelog invariant the join requires). Output is
    null-free: -1 sentinels for never-clicked purchases.

    Scale: exactly the as-of join's shape — one shuffle of purchases +
    clicks on user_id, a sorted per-key scan, no explosion on
    click-heavy users."""
    from .events import load_events

    ev = load_events(spark, sf_dir)
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"),
                         "user_id", "ts"))
    clicks = (ev.where(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.max("event_id").alias("click_id")))
    joined = asof_join_df(purchases, clicks, on=["user_id"],
                          left_ts="ts", right_ts="ts",
                          value_cols=["click_id"],
                          version_ts_col="click_ts")
    return joined.select(
        "purchase_id", "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_purchase_us"),
        F.coalesce(F.col("click_id"), F.lit(-1).cast("bigint"))
         .alias("click_id"),
        F.coalesce(F.unix_micros(F.col("ts").cast("timestamp"))
                   - F.unix_micros(F.col("click_ts")),
                   F.lit(-1).cast("bigint")).alias("gap_us"))
